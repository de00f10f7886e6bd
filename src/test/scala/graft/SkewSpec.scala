package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bag(d: org.apache.spark.sql.DataFrame): Map[String, Int] =
    d.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of the left rides one hot key — the salting target.
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, i)).toDF("k", "v")
      .repartition(8)
    val right = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (3L, "c"))
      .toDF("rk", "name")
    val plain = left.join(right, col("k") === col("rk"))
    val salted = Skew.saltedJoin(left, right, col("k"), col("rk"), 8)
    assert(bag(salted) == bag(plain))
    assert(salted.columns.toSeq == plain.columns.toSeq) // salt never leaks
  }

  test("AQE splits a skewed join partition at runtime (the pre-salting default)") {
    // The documented skew policy is: let AQE's runtime skew-join split
    // handle hot keys first, salt only when it can't (stats too late,
    // skewed aggregations). This proves the first half actually fires:
    // with thresholds scaled to test data, the hot key's partition is
    // split and the executed join is marked skew=true — while the
    // result stays identical to the plain join.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~100k rows on one hot key, a trickle elsewhere. The skew
      // detector compares COMPRESSED map-output sizes, so the payload
      // must be incompressible (md5 hex) and must survive into the join
      // output — a constant-ish column lz4s to nothing and a pruned one
      // never rides the shuffle at all, and either way no partition
      // crosses the threshold.
      val left = spark.range(100000)
        .select(when(col("id") % 100 =!= 0, 42L).otherwise(col("id") % 7)
          .as("k"), md5(col("id").cast("string")).as("payload"))
      val right = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (3L, "c"))
        .toDF("rk", "name")
      // collect() (not count()) executes THIS QueryExecution, so AQE
      // finalizes the inspected plan
      val joined = left.join(right, col("k") === col("rk"))
      val n = joined.collect().length
      assert(n > 90000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a runtime skew-split join in:\n$finalPlan")
    } finally old.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("saltedJoin preserves left rows under left-outer semantics") {
    import spark.implicits._
    val left = Seq((42L, 1), (42L, 2), (99L, 3)).toDF("k", "v")
    val right = Seq((42L, "hot")).toDF("rk", "name")
    val out = Skew.saltedJoin(left, right, col("k"), col("rk"), 4, "left")
    assert(out.count() == 3) // unmatched key survives exactly once
    assert(out.filter(col("name").isNull).count() == 1)
  }
}
