package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JARO–WINKLER similarity (q66b) as a native Catalyst expression with
  * whole-stage codegen — the standard record-linkage / name-matching
  * metric (Winkler's Census string comparator): Jaro similarity
  * `(m/|a| + m/|b| + (m−t)/m) / 3` over window-bounded character matches
  * (window = ⌊max(|a|,|b|)/2⌋−1, t = half-transpositions = ⌊mismatched
  * matched-pairs / 2⌋), plus the Winkler common-prefix boost
  * `jaro + ℓ·0.1·(1−jaro)` (ℓ ≤ 4) applied only above the 0.7 Jaro
  * threshold. Complements levenshtein (q66: edit operations) with the
  * transposition-tolerant metric names actually need, and feeds the
  * q91d-style blocked fuzzy-join family as the verification scorer.
  *
  * SEMANTICS PINNED TO AN INDEPENDENT IMPLEMENTATION: every branch was
  * probed against DuckDB's `jaro_winkler_similarity` (empty → 0.0,
  * `ab`/`ba` window-0 → 0.0, odd mismatch count floors t —
  * `abcxyz`/`bcaxyz` = 0.9444, boost skipped at jaro ≤ 0.7, prefix
  * capped at 4 — `aaaaab`/`aaaaac` = 0.9333), so the q66b oracle match
  * is a cross-ENGINE, cross-IMPLEMENTATION equality — two algebraically
  * independent ports agreeing on every fixture row (the q93s argument).
  * Characters are Unicode code points; null input → null.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler = copy(newLeft, newRight)
}

object JaroWinkler {

  private def codePoints(u: UTF8String): Array[Int] = {
    val s = u.toString
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** One pass per string pair; shared verbatim by the interpreted eval
    * and the generated code (the ClassifierScore pattern). */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s = codePoints(a)
    val t = codePoints(b)
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && t(j) == s(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var mism = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s(i) != t(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val tr = mism / 2 // odd count floors — the DuckDB probe's behavior
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - tr) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxp = math.min(4, math.min(l1, l2))
    while (p < maxp && s(p) == t(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}
