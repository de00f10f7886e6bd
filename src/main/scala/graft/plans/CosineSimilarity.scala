package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two ARRAY<FLOAT>/ARRAY<DOUBLE> embeddings as a
  * native Catalyst expression with whole-stage codegen (SURVEY §2 Q83
  * "fast path"; preference order (b) from the build mandate — a custom
  * Expression beats a UDF because it code-generates into the
  * surrounding stage with no boxing or iterator bridges).
  *
  * One fused loop accumulates the dot product and both squared norms.
  * Each accumulator sums LEFT-TO-RIGHT in double; float elements widen
  * exactly (every float is a double), so both element types are
  * bit-identical to the `zip_with`+`aggregate` HOF formulation
  * ([[graft.functions.Similarity.cosine]], which casts each element to
  * double the same way) and to DuckDB's
  * `list_reduce(list_transform(...))` — either form hash-matches the
  * same oracle (asserted in ExpressionSpec for both element types).
  * The double side exists for the iterating callers (kmeansRefine's
  * recomputed centroid means are doubles); sides may mix types.
  *
  * Null in either side → null (BinaryExpression's null-safe contract).
  * Dimensions are trusted equal (the embedding-table contract); extra
  * trailing elements on one side are ignored.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT>/ARRAY<DOUBLE> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (fa, fb) = (isFloat(left), isFloat(right))
    val n = math.min(xa.numElements(), xb.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (fa) xa.getFloat(i).toDouble else xa.getDouble(i)
      val y = if (fb) xb.getFloat(i).toDouble else xb.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i) = (ctx.freshName("n"), ctx.freshName("i"))
      val (dot, na, nb) =
        (ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"))
      val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
      def elem(arr: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = ${elem(a, left)};
         |  final double $y = ${elem(b, right)};
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val name = "cosine_sim"

  private[plans] val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case exprs => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${exprs.length}")
  }

  /** Make `cosine_sim(a, b)` callable (via `expr`/SQL) on an already-built
    * session — used by the query registry, whose sessions the driver owns.
    * Idempotent (see [[SortedIntersectCount.register]]). */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
}

/** Production registration hook: add
  * `spark.sql.extensions=graft.plans.GraftExtensions` and every session
  * gets the function without touching internal APIs at runtime. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(CosineSimilarity.name),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName,
        CosineSimilarity.name),
      CosineSimilarity.builder)) // same arity-checked builder as register()
    ext.injectFunction((FunctionIdentifier(SortedIntersectCount.name),
      new ExpressionInfo(classOf[SortedIntersectCount].getCanonicalName,
        SortedIntersectCount.name),
      SortedIntersectCount.builder))
    ext.injectFunction((FunctionIdentifier(PqBlockDists.name),
      new ExpressionInfo(classOf[PqBlockDists].getCanonicalName,
        PqBlockDists.name),
      PqBlockDists.builder))
    ext.injectFunction((FunctionIdentifier(SignProject.name),
      new ExpressionInfo(classOf[SignProject].getCanonicalName,
        SignProject.name),
      SignProject.builder))
  }
}
