package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Sign random projection as a native codegen expression:
  * `sign_project(x, signs)` with `signs` an ARRAY<ARRAY<INT>> literal
  * (outDims rows of ±1/0 over the input dims) returns ARRAY<DOUBLE> of
  * outDims elements, element j = Σ_i signs[j][i] · x_i under the same
  * DECIMAL(38,6) summation semantics as the zip_with/aggregate HOF
  * chain it replaces in `Engine.signProjection` (bit-equality asserted
  * in ExpressionSpec).
  *
  * Two structural savings over the HOF form, which allocated a
  * BigDecimal PER TERM (dims × outDims per row — 4 096 for the
  * registered 64→64 projection):
  *  - the per-term decimal round of `x·r` is ±round(x) or 0 (half-up
  *    is symmetric: away from zero for both signs), so each input dim
  *    is rounded ONCE into long fixed-point ([[PqBlockDists.round6]]
  *    on |x|, sign applied after) — dims roundings instead of
  *    dims × outDims;
  *  - the outDims dot products are then pure long multiply-adds in one
  *    fused primitive loop.
  * The exact long accumulation IS decimal addition, and the final
  * /10⁶ double division is the correctly-rounded quotient
  * Decimal.toDouble produces.
  *
  * ARRAY<FLOAT> and ARRAY<DOUBLE> inputs accepted; like the zip_with
  * form, the loop runs over min(dims, |x|) per output row (the caller
  * guards exact length with raise_error).
  */
case class SignProject(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val signsOk = right.dataType match {
      case ArrayType(ArrayType(IntegerType, _), _) => true
      case _ => false
    }
    if (vecOk && signsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<FLOAT|DOUBLE>, ARRAY<ARRAY<INT>>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sign_project"

  private def isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val signs = b.asInstanceOf[ArrayData]
    val outDims = signs.numElements()
    val n = x.numElements()
    val t = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      t(i) = if (v >= 0) PqBlockDists.round6(v) else -PqBlockDists.round6(-v)
      i += 1
    }
    val out = new Array[Double](outDims)
    var j = 0
    while (j < outDims) {
      val row = signs.getArray(j)
      val m = math.min(n, row.numElements())
      var acc = 0L
      var k = 0
      while (k < m) { acc += row.getInt(k) * t(k); k += 1 }
      out(j) = acc.toDouble / 1e6
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, outDims) = (ctx.freshName("n"), ctx.freshName("outDims"))
      val (t, out, row) =
        (ctx.freshName("t"), ctx.freshName("out"), ctx.freshName("row"))
      val (i, j, k, m) = (ctx.freshName("i"), ctx.freshName("j"),
        ctx.freshName("k"), ctx.freshName("m"))
      val (v, acc) = (ctx.freshName("v"), ctx.freshName("acc"))
      val get =
        if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |final int $outDims = $b.numElements();
         |final long[] $t = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = $get;
         |  $t[$i] = ($v >= 0) ? graft.plans.PqBlockDists.round6($v)
         |    : -graft.plans.PqBlockDists.round6(-$v);
         |}
         |final double[] $out = new double[$outDims];
         |for (int $j = 0; $j < $outDims; $j++) {
         |  final org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($j);
         |  final int $m = java.lang.Math.min($n, $row.numElements());
         |  long $acc = 0L;
         |  for (int $k = 0; $k < $m; $k++) {
         |    $acc += $row.getInt($k) * $t[$k];
         |  }
         |  $out[$j] = ((double) $acc) / 1e6;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignProject =
    copy(left = newLeft, right = newRight)
}

object SignProject {
  val name = "sign_project"

  private[plans] val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => SignProject(a, b)
    case exprs => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${exprs.length}")
  }

  /** Idempotent session registration (the [[CosineSimilarity.register]]
    * pattern). */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
}
