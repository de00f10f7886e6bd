package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable lint for the ORACLE side of the registry (the q47j lesson
  * as a test, like PlanSpec's nested-output lint is the q92t lesson):
  * DuckDB sorts NULLS LAST by default while the Spark builders order
  * with `asc_nulls_first`, so ANY sort key in an oracle's final ORDER BY
  * that omits an explicit NULLS directive is a latent hash mismatch
  * waiting for the first null in that column — invisible on fixtures
  * where the column happens to be non-null (exactly how q47j's e1/e2/e3
  * shipped in r13 and was only caught by the judge's read). Every
  * registered oracle's final ORDER BY must spell NULLS FIRST/LAST on
  * every key.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Sort keys of `sql`'s FINAL (top-level) ORDER BY that lack an
    * explicit NULLS directive. Returns Nil when the statement has no
    * final ORDER BY — including when the last textual "ORDER BY" sits
    * inside parentheses (a window or ordered-aggregate clause), which
    * the paren-depth scan detects as the tail closing more parens than
    * it opens. */
  private def unNulledSortKeys(sql: String): Seq[String] = {
    val idx = sql.toUpperCase.lastIndexOf("ORDER BY")
    if (idx < 0) return Nil
    var tail = sql.substring(idx + "ORDER BY".length)
    var depth = 0
    if (tail.exists { c =>
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      depth < 0
    }) return Nil
    val lim = tail.toUpperCase.indexOf("LIMIT")
    if (lim >= 0) tail = tail.substring(0, lim)
    val keys = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    depth = 0
    tail.foreach { c =>
      if (c == ',' && depth == 0) { keys += cur.toString; cur.clear() }
      else {
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        cur += c
      }
    }
    keys += cur.toString
    keys.toSeq.map(_.trim).filter(_.nonEmpty).filterNot(k =>
      "(?is).*\\bNULLS\\s+(FIRST|LAST)\\b.*".r.matches(k))
  }

  test("oracle lint: every final ORDER BY key in every registered " +
      "oracle carries an explicit NULLS directive") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val keys = unNulledSortKeys(sql)
        if (keys.nonEmpty) Some(s"$name → ${keys.mkString(" | ")}")
        else None
    }
    assert(bad.isEmpty,
      "oracle ORDER BY keys without a NULLS directive (DuckDB defaults " +
        "NULLS LAST, Spark builders sort asc_nulls_first — spell it " +
        "out):\n" + bad.mkString("\n"))
  }

  test("oracle lint: the detector fires on a missing directive and " +
      "stays quiet on window/aggregate-internal ORDER BYs") {
    // one un-directed key among directed ones → exactly that key
    assert(unNulledSortKeys(
      "SELECT a, b FROM t ORDER BY a, b NULLS FIRST") == Seq("a"))
    assert(unNulledSortKeys(
      "SELECT a FROM t ORDER BY round(x / 2, 6) DESC, a NULLS FIRST")
      == Seq("round(x / 2, 6) DESC"))
    // a LIMIT after the keys is not a key
    assert(unNulledSortKeys(
      "SELECT a FROM t ORDER BY a NULLS FIRST LIMIT 5").isEmpty)
    // ORDER BY inside an ordered aggregate / window is NOT a final sort
    assert(unNulledSortKeys(
      "SELECT string_agg(x, ',' ORDER BY p) FROM t").isEmpty)
    assert(unNulledSortKeys(
      "SELECT row_number() OVER (PARTITION BY k ORDER BY v) FROM t")
      .isEmpty)
    // function args with commas stay one key
    assert(unNulledSortKeys(
      "SELECT a FROM t ORDER BY coalesce(a, b), c NULLS FIRST")
      == Seq("coalesce(a, b)"))
    // no ORDER BY at all
    assert(unNulledSortKeys("SELECT 1").isEmpty)
  }
}
