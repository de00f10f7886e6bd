package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL word n-grams as a native codegen expression:
  * `word_ngrams_pos(words, n)` returns ARRAY<STRING> where element p
  * (0-based) is `concat_ws(' ', words[p], …, words[p+n-1])` — the
  * sliding n-gram starting at token p — and the empty array when the
  * input has fewer than `n` tokens.
  *
  * Why an expression: the HOF formulation
  * (`transform(arrays_zip(slice…), t -> concat_ws(...))`) is a
  * higher-order-function tree whose lambda Spark evaluates INTERPRETED,
  * outside whole-stage codegen — and the zip itself materializes
  * len−n+1 n-field structs per row before the lambda ever runs. The
  * SURVEY §8 r13 audit measured the q90f gram explode at 4.2 s of the
  * query's 7.8 s at the 10× fixture with the HOF kernel; this
  * expression is one fused loop building each window with
  * `UTF8String.concatWs` (byte-level concat, no struct
  * materialization, no lambda). Semantics are IDENTICAL to the HOF
  * form, including `concat_ws` null handling (null tokens are skipped,
  * not rendered) — ExpressionSpec pins the equivalence on randomized
  * inputs plus the null-token and short-input edges.
  *
  * [[graft.Engine.positionalNgrams]] routes through this expression;
  * [[graft.Engine.wordNgrams]] (the DISTINCT variant every shingling
  * join uses) is `array_distinct` over it — one registration serves
  * the whole n-gram family. NULL input array → EMPTY array, never
  * null — the exact semantics of the `when(size(...) >= n, …)
  * .otherwise(array())` HOF form it replaces (a null predicate takes
  * the otherwise branch), so no caller's null behavior moves.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<STRING>, n >= 1), got " +
        s"(${other.simpleString}, $n)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = WordNgrams.name
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordNgrams.empty()
    else WordNgrams.compute(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = c.code +
        code"""
          |$javaType ${ev.value} = ${c.isNull} ?
          |  graft.plans.WordNgrams.empty() :
          |  graft.plans.WordNgrams.compute(${c.value}, $n);
          |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)
}

object WordNgrams {
  val name = "word_ngrams_pos"

  private val Space = UTF8String.fromString(" ")
  private val EmptyArr = new GenericArrayData(new Array[Any](0))

  /** The NULL-input result (empty array) — a method so generated code
    * can call it. */
  def empty(): ArrayData = EmptyArr

  /** One pass; shared verbatim by interpreted eval and generated code
    * (the [[ClassifierScore]] static-call pattern). concat_ws parity:
    * null tokens inside a window are SKIPPED (no separator emitted for
    * them), exactly like the HOF form's concat_ws. */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return EmptyArr
    val out = new Array[Any](len - n + 1)
    val window = new Array[UTF8String](n)
    var p = 0
    while (p <= len - n) {
      var k = 0
      while (k < n) {
        window(k) = if (words.isNullAt(p + k)) null
          else words.getUTF8String(p + k)
        k += 1
      }
      out(p) = UTF8String.concatWs(Space, window: _*)
      p += 1
    }
    new GenericArrayData(out)
  }

  private[plans] val builder: Seq[Expression] => Expression = {
    case Seq(words, nArg) =>
      if (!nArg.foldable) throw new IllegalArgumentException(
        s"$name: n must be an integer literal, got ${nArg.sql}")
      val k = nArg.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$name: n must be an integer literal, got $other")
      }
      WordNgrams(words, k)
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
