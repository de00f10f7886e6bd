package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StringType}

/** Intersection size of two SORTED, DISTINCT ARRAY<STRING> inputs as a
  * native Catalyst expression with whole-stage codegen — the verification
  * kernel of the exact set-similarity join ([[graft.Engine.jaccardJoin]]).
  *
  * Why not `size(array_intersect(a, b))`: array_intersect builds a hash
  * set of one side PER ROW and probes every element of the other — per
  * 7M-candidate verify pass that is 7M hash-set allocations and ~15M
  * string hashings. This expression instead assumes both inputs are
  * already sorted ascending in Spark's binary string order (`sort_array`
  * on the deduplicated n-gram arrays — done ONCE per document, not once
  * per candidate pair) and runs a single allocation-free merge walk:
  * ~|a|+|b| byte-wise `UTF8String.compareTo` steps per pair. The same
  * merge order is engine-portable because DuckDB's default collation is
  * also byte-wise binary.
  *
  * Inputs are TRUSTED sorted+distinct (the operator builds them; this is
  * not a general-purpose SQL function). Null in either side → null
  * (BinaryExpression's null-safe contract); null ELEMENTS are not
  * expected (n-grams of non-null text) and would sort first per Spark's
  * sort_array — compareTo on them would NPE, matching the trust contract.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<STRING> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (na, nb) = (xa.numElements(), xb.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = xa.getUTF8String(i).compareTo(xb.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (na, nb) = (ctx.freshName("na"), ctx.freshName("nb"))
      val (i, j, c) =
        (ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"))
      val cmp = ctx.freshName("cmp")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $na && $j < $nb) {
         |  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** [[SortedIntersectCount]] with a per-row REQUIRED-MINIMUM third argument
  * and early termination: the merge walk aborts as soon as
  * `count + min(remaining_a, remaining_b)` — an upper bound on the final
  * intersection — falls below `minRequired`. Contract:
  *  - pairs whose true intersection ≥ minRequired NEVER abort (the bound
  *    is ≥ the true count at every step), so they return the EXACT count;
  *  - aborted pairs return their partial count, which is provably
  *    < minRequired — any caller filtering on `count ≥ minRequired`
  *    (equivalently the integer Jaccard/containment threshold forms) gets
  *    identical survivors and identical surviving values.
  * This is the verify-stage answer to candidate floods on
  * low-gram-diversity corpora (the 10× fixture's 961-bigram saturation
  * put 31.9M candidates in front of 30 true containment pairs): a doomed
  * pair exits after ~minRequired steps instead of walking |a|+|b|. */
case class SortedIntersectAtLeast(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    val minOk = third.dataType == IntegerType || third.dataType == LongType
    if (arraysOk && minOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<STRING>, ARRAY<STRING>, INT|BIGINT), " +
        s"got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any, m: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val minReq = m match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    val (na, nb) = (xa.numElements(), xb.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb &&
        c + math.min(na - i, nb - j) >= minReq) {
      val cmp = xa.getUTF8String(i).compareTo(xb.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val (na, nb) = (ctx.freshName("na"), ctx.freshName("nb"))
      val (i, j, c) =
        (ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"))
      val cmp = ctx.freshName("cmp")
      val minReq = ctx.freshName("minReq")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |final long $minReq = (long) $m;
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $na && $j < $nb &&
         |    $c + java.lang.Math.min($na - $i, $nb - $j) >= $minReq) {
         |  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedIntersectAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectCount {
  val name = "sorted_intersect_count"

  private[plans] val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => SortedIntersectCount(a, b)
    case Seq(a, b, m) => SortedIntersectAtLeast(a, b, m)
    case exprs => throw new IllegalArgumentException(
      s"$name expects 2 or 3 arguments, got ${exprs.length}")
  }

  /** Make `sorted_intersect_count(a, b)` callable via `expr`/SQL on an
    * already-built session (same pattern as [[CosineSimilarity]]).
    * Idempotent: a session that already has the function is left alone,
    * so per-query callers don't spray `replaced a previously registered
    * function` warnings over a 152-query bench log. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
}
