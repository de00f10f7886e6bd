package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The public Engine facade under non-default parameters — the paths the
  * oracle-backed registry queries (which use defaults) don't exercise.
  */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("minHashNearDups: wider banding (32x2) finds the same J>=0.9 pairs as 16x4") {
    val docs = Tables.t(spark, TestSpark.sfDir, "documents")
    def pairsAt(bands: Int) =
      Engine.minHashNearDups(docs, "doc_id", "text",
          threshold = 0.9, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p16 = pairsAt(16)
    assert(p16.nonEmpty)
    // r=2 rows/band has miss probability (1-0.81)^32 ~ 1e-23 at J=0.9:
    // parameterization must not change the verified answer.
    assert(pairsAt(32) == p16)
    p16.foreach { case (a, b) => assert(a < b) }
  }

  test("nearDupClusters: components get the min id; singletons don't appear") {
    import spark.implicits._
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Engine.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("cosineTopK: rank 1 of every query is the query itself at cos 1.0") {
    val e = Tables.t(spark, TestSpark.sfDir, "embeddings")
    val top1 = Engine.cosineTopK(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 1)
      .collect()
    assert(top1.length == 5)
    top1.foreach { r =>
      assert(r.getLong(0) == r.getLong(2)) // query_id == vec_id
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-6)
    }
  }

  test("stableSample: partition-invariant and near the requested fraction") {
    val orders = Tables.t(spark, TestSpark.sfDir, "orders")
    def sampled(parts: Int) = orders.repartition(parts)
      .filter(Engine.stableSample(col("o_orderkey"), 10))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val s1 = sampled(1)
    assert(sampled(7) == s1) // same keys however the data is partitioned
    val frac = s1.size.toDouble / orders.count()
    assert(frac > 0.05 && frac < 0.16, s"fraction $frac")
  }

  test("jaccardJoin: prefix filtering finds EXACTLY the brute-force pairs (recall 1.0)") {
    val docs = Tables.t(spark, TestSpark.sfDir, "documents")
    val got = Engine.jaccardJoin(docs, "doc_id", "text",
        thresholdPct = 60, ngramWords = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Brute force: all pairs, exact bigram Jaccard, same integer-exact
    // threshold — the prefix-filter theorem says the sets must be EQUAL
    // (not just contained), unlike MinHash's probabilistic recall.
    val sets = docs
      .withColumn("sv", Engine.wordNgrams(split(col("text"), " "), 2))
      .filter(size(col("sv")) >= 1)
      .select(col("doc_id"), col("sv"))
    val a = sets.select(col("doc_id").as("doc_a"), col("sv").as("sa"))
    val b = sets.select(col("doc_id").as("doc_b"), col("sv").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    val uni = size(col("sa")) + size(col("sb")) - inter
    val want = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .filter(inter * 100 >= uni * 60)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "test needs at least one qualifying pair")
    assert(got == want)
  }

  test("exactDedup: doubled input halves to one keeper per distinct text") {
    val d = Tables.t(spark, TestSpark.sfDir, "documents")
    val out = Engine.exactDedup(d.unionAll(d), col("doc_id"), col("text"))
    assert(out.count() == d.select("text").distinct().count())
    assert(out.filter(col("n_copies") =!= 2).count() == 0)
  }
}
