package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk BOUNDARIES of a text column as a native Catalyst
  * expression with whole-stage codegen — the linear-pass kernel of
  * [[graft.Engine.cdcChunkDedup]] (the FastCDC/rsync idea as a query).
  *
  * Returns the 1-based chunk-start positions, always beginning with 1: a
  * boundary opens at position `i` (2 ≤ i ≤ L−window+1) iff the polynomial
  * rolling hash of the `window` characters starting at `i` satisfies
  * `H ≡ 0 (mod 16)`, where `H = fold(chars, (h, c) => (h·257 + c) mod
  * 1000000007)` — i.e. base-257 Rabin–Karp over UTF-16 code units, modulus
  * 1e9+7, boundary probability 1/16 → expected chunk ≈ `window` chars
  * (same statistics as the md5-nibble rule this replaces, at ~50× less
  * CPU: ONE multiply-add per character via the rolling recurrence
  * `H' = (H − c_out·257^{w−1})·257 + c_in`, instead of a full md5 digest
  * at every position).
  *
  * Engine-portability contract: the hash folds over UTF-16 code units
  * (`String.charAt`), which equal Unicode code points — and DuckDB's
  * `ascii()` — for all BMP text, and equal raw bytes for ASCII corpora.
  * The oracle re-expresses the identical fold as
  * `list_reduce(list_transform(range(0,16), k -> ascii(text[i+k])),
  * (a,b) -> (a*257+b) % 1000000007)` — bit-equal on the (ASCII) corpus.
  * Texts shorter than window+1 chars get the single boundary [1]
  * (one chunk = the whole text). Null text → null.
  */
case class CdcBoundaries(child: Expression, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && window >= 2) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, window >= 2), got " +
        s"(${child.dataType.simpleString}, $window)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(t: Any): Any =
    CdcBoundaries.boundaries(t.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.CdcBoundaries.boundaries($t, $window);")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  val name = "cdc_boundaries"
  private final val B = 257L
  private final val M = 1000000007L

  private[plans] val builder: Seq[Expression] => Expression = {
    case Seq(t, org.apache.spark.sql.catalyst.expressions.Literal(w: Int, IntegerType)) =>
      CdcBoundaries(t, w)
    case exprs => throw new IllegalArgumentException(
      s"$name expects (text, literal int window), got ${exprs.length} args")
  }

  /** Make `cdc_boundaries(text, window)` callable via `call_function` on
    * an already-built session (the [[SortedIntersectCount]] pattern);
    * idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")

  /** One linear pass: prime the window hash at position 1, roll it across
    * the text, collect positions where H % 16 == 0. Shared verbatim by the
    * interpreted eval and the generated code (the codegen emits a single
    * static call, staying inside whole-stage codegen). */
  def boundaries(text: UTF8String, window: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    if (len < window + 1)
      return UnsafeArrayData.fromPrimitiveArray(Array(1))
    // 257^(window-1) mod M, for the roll-out term
    var p = 1L
    var k = 0
    while (k < window - 1) { p = p * B % M; k += 1 }
    // hash of chars [0, window) — the (untested) window at position 1
    var h = 0L
    k = 0
    while (k < window) { h = (h * B + s.charAt(k)) % M; k += 1 }
    var buf = new Array[Int](math.max(4, len / 8))
    buf(0) = 1
    var n = 1
    var i = 2
    val last = len - window + 1
    while (i <= last) {
      // drop char i-2 (0-based), add char i+window-2: window now [i-1, i+window-1)
      h = ((h - s.charAt(i - 2) * p % M + M) % M * B + s.charAt(i + window - 2)) % M
      if (h % 16 == 0) {
        if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
        buf(n) = i
        n += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n))
  }
}
