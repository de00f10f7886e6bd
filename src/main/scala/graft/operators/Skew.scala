package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §7 item 7 — "salting strategy
  * documented for skewed keys").
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime and is the first line of defense (enabled by default). Salting
  * is the plan-level fallback for the cases AQE cannot fix — e.g. a
  * skewed AGGREGATION key, or a skewed join where the runtime stats
  * arrive too late. `saltedJoin` spreads each hot left-side key over
  * `buckets` synthetic sub-keys and replicates the (small) right side
  * once per bucket: per-task work drops by ~`buckets`× on the hot key at
  * the cost of a `buckets`× blow-up of the right side — the standard
  * trade. Verified equal to the plain join in SkewSpec.
  */
object Skew {

  /** Equi-join `left` (skewed, large) with `right` (small enough to
    * replicate `buckets`×) on `leftKey === rightKey`. The salt is derived
    * from a row-local id, so rows of one hot key scatter across buckets;
    * the salt never reaches the output, so the result is exactly the
    * plain join's. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // Right/full outer would emit every unmatched right row once PER
    // REPLICA — only left-preserving join types are salting-equivalent.
    require(Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin does not preserve '$joinType' semantics " +
        "(the replicated right side duplicates unmatched right rows)")
    val salted = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated,
        leftKey === rightKey && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }
}
