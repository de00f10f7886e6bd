package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{WeightedIn, WeightedMeanCents}

class AggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q33: HLL estimate is within ±5% of exact per group (SURVEY §2)") {
    val rows = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(approx >= exact * 0.95 && approx <= exact * 1.05,
        s"flag=${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("WeightedMeanCents: fold+merge equals the direct weighted mean") {
    val xs = Seq(WeightedIn(10.00, 2), WeightedIn(5.50, 3), WeightedIn(0.25, 1))
    val (a, b) = xs.splitAt(1)
    val partA = a.foldLeft(WeightedMeanCents.zero)(WeightedMeanCents.reduce)
    val partB = b.foldLeft(WeightedMeanCents.zero)(WeightedMeanCents.reduce)
    val merged = WeightedMeanCents.merge(partA, partB)
    val direct = xs.map(x => x.measure * x.weight).sum / xs.map(_.weight).sum
    assert(math.abs(WeightedMeanCents.finish(merged) - direct) < 1e-9)
    // merge is commutative (required for partial aggregation)
    assert(WeightedMeanCents.merge(partB, partA) == merged)
  }

  test("WeightedMeanCents: overflow fails loudly, never wraps") {
    val big = (Long.MaxValue - 10, 1L)
    intercept[ArithmeticException] {
      WeightedMeanCents.reduce(big, WeightedIn(1e15, 1e3))
    }
    intercept[ArithmeticException] {
      WeightedMeanCents.merge(big, big)
    }
  }

  test("q35 tie-break key: zero-padded string order == numeric order") {
    def key(epoch: Long, id: Long) = f"$epoch%019d$id%019d"
    assert(key(100, 999999999999L) < key(101, 0))
    assert(key(100, 5) < key(100, 50))
    assert(key(1700000000L, 1) < key(1700000900L, 0))
  }

  test("q49c EWMA fold: left-to-right recursion from the oldest value, " +
      "exact at alpha = 0.5; a NULL value poisons, never restarts") {
    // the registered fold's semantics, checked against the hand
    // recursion e_i = 0.5 v_i + 0.5 e_{i-1}, e_0 = v_0: for [1, 2, 4]
    // → 1, then 1.5, then 2.75 — every step exact in binary.
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ewma(vals: Seq[java.lang.Double]) = {
      val vs = col("__vs")
      Seq(vals).toDF("__vs")
        .select(aggregate(
          slice(vs, lit(2), greatest(size(vs) - 1, lit(0))),
          element_at(vs, 1),
          (acc, x) => lit(0.5) * x + lit(0.5) * acc).as("e"))
        .head()
    }
    assert(ewma(Seq(1.0, 2.0, 4.0)).getDouble(0) == 2.75)
    assert(ewma(Seq(7.0)).getDouble(0) == 7.0) // single event: seed only
    // a NULL mid-series must propagate to a NULL EWMA (DuckDB
    // list_reduce semantics) — NOT silently restart the smoothing at
    // the next value, which is what a null-seeded when(acc IS NULL, …)
    // fold would do
    assert(ewma(Seq(1.0, null, 4.0)).isNullAt(0))
  }
}
