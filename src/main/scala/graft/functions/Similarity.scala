package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector similarity over ARRAY<FLOAT> embedding columns, built from
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDF in
  * the hot path (SURVEY §2 Q83, Q92).
  *
  * Cross-engine determinism: every product is computed in double and summed
  * LEFT-TO-RIGHT — the same sequence DuckDB's `list_reduce` over a
  * `list_transform` executes, so dot products match bit-for-bit (Spark's
  * `aggregate` seeds 0.0 + x₁ which is IEEE-identical to starting at x₁).
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two embedding arrays, in double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** DuckDB SQL reproducing [[dot]]'s exact operation sequence. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), " +
      s"i -> CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)), " +
      "(acc, x) -> acc + x)"

  /** DuckDB SQL reproducing [[cosine]]. */
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
}
