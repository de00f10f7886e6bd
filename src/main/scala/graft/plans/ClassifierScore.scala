package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The hashing-trick linear-classifier kernel of
  * [[graft.Engine.hashClassifier]] (q95j) as a native Catalyst expression
  * with whole-stage codegen: ONE pass over the text computes, per
  * space-delimited token, the base-257 polynomial hash mod 1e9+7 (the
  * q90o/q90r recurrence), the weight slot `h mod buckets`, the
  * closed-form weight `((slot·2654435761 + 12345) mod 2^20)/2^20 − 1/2`,
  * and returns `struct(n_tokens BIGINT, score DOUBLE)` — the token count
  * and the weight sum.
  *
  * Why an expression: the HOF formulation (`aggregate(transform(filter(
  * split(...))))` with a nested per-character fold) is a higher-order
  * function tree, which Spark evaluates with interpreted lambdas OUTSIDE
  * whole-stage codegen — measured 10.7 s for the sf1 corpus scan. This
  * kernel is one multiply-add per character in generated code (the
  * [[CdcBoundaries]] discipline; the sf1 solo measurement is recorded in
  * SURVEY §8). Semantics are bit-identical to the HOF form — every
  * weight is an exact multiple of 2⁻²⁰, so the running double sum is
  * EXACT and order-insensitive — and ExpressionSpec pins the equivalence
  * on randomized strings.
  *
  * Tokenization contract (== `filter(split(text, ' '), t -> len(t) > 0)`):
  * tokens are maximal runs of non-space characters; consecutive /
  * leading / trailing spaces contribute nothing. The hash folds Unicode
  * CODE POINTS (surrogate pairs fold as one value), matching the HOF
  * formulation's `ascii(...)` and DuckDB's `ascii()` on ALL text, not
  * just the BMP. Null text → null.
  */
case class ClassifierScore(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && buckets >= 2)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, buckets >= 2), got " +
        s"(${child.dataType.simpleString}, $buckets)")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
  override def prettyName: String = "classifier_score"

  override def nullSafeEval(t: Any): Any =
    ClassifierScore.compute(t.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.ClassifierScore.compute($t, $buckets);")

  override protected def withNewChildInternal(
      newChild: Expression): ClassifierScore = copy(child = newChild)
}

object ClassifierScore {
  val name = "classifier_score"

  private[plans] val builder: Seq[Expression] => Expression = {
    case Seq(t, org.apache.spark.sql.catalyst.expressions
        .Literal(b: Int, IntegerType)) => ClassifierScore(t, b)
    case exprs => throw new IllegalArgumentException(
      s"$name expects (text, literal int buckets), got ${exprs.length} args")
  }

  /** Make `classifier_score(text, buckets)` callable via `call_function`
    * on an already-built session; idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")

  /** One linear pass; shared verbatim by the interpreted eval and the
    * generated code (the codegen emits a single static call, staying
    * inside whole-stage codegen). */
  def compute(text: UTF8String, buckets: Int): InternalRow = {
    val s = text.toString
    val len = s.length
    var n = 0L
    var sum = 0.0
    var h = 0L
    var inTok = false
    var i = 0
    while (i <= len) {
      // Code-point iteration: a surrogate pair folds as ONE value
      // (== the HOF/oracle ascii() contract), not two UTF-16 units.
      val cp = if (i < len) s.codePointAt(i) else ' '.toInt
      if (cp == ' '.toInt) {
        if (inTok) {
          val slot = h % buckets
          sum += (slot * 2654435761L + 12345L) % 1048576L / 1048576.0 - 0.5
          n += 1
          inTok = false
          h = 0L
        }
      } else {
        h = (h * 257L + cp) % 1000000007L
        inTok = true
      }
      i += (if (i < len) Character.charCount(cp) else 1)
    }
    new GenericInternalRow(Array[Any](n, sum))
  }
}
