package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DEDUP-RECALL probe (dev main, alongside RecallProbe): side-by-side of
  * the EXACT bipartite prefix-filter join ([[Engine.jaccardJoinAcross]],
  * the q90d path) and the banded-MinHash form
  * ([[Engine.minHashJoinAcross]], the q90l scale path) on the documents
  * table of SPARK_GRAFT_SF_DIR — pair counts, recall, candidate volume,
  * and wall time per arm.
  *
  * The oracle gate pins q90l's OUTPUT; what it cannot show is the
  * CONTRAST that justifies the banded path at scale: the exact join's
  * candidate set is a theorem-bound floor (every pair sharing a rare
  * prefix gram — 77.7M real candidates on the gram-saturated 10×
  * fixture, a 1.1 GB spill no loss-free pruning can cross), while
  * banding's is collision-bound (≈ bands·J^(rows/band) per background
  * pair). This probe measures both sides of that trade on the actual
  * fixture: recall = |banded ∩ exact| / |exact| over verified pairs at
  * the same τ, plus the banded candidate count from the production hash
  * family ([[Engine.minHashCandidatesAcross]] — not a reimplementation).
  * Prints one JSON line on stdout.
  */
object DedupRecall {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.t(spark, dir, "documents")
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)

    def pairsOf(df: DataFrame): Set[(Long, Long)] =
      df.select("left_id", "right_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (exact, tExact) = timed(pairsOf(Engine.jaccardJoinAcross(
      batch, hist, "doc_id", "text", thresholdPct = 60, ngramWords = 2,
      broadcastBounded = true)))
    val (banded, tBanded) = timed(pairsOf(Engine.minHashJoinAcross(
      batch, hist, "doc_id", "text", thresholdPct = 60, numHashes = 64,
      bands = 16, ngramWords = 2, broadcastBounded = true)))
    val hit = (banded intersect exact).size
    val falsePos = (banded diff exact).size // must be 0: verify is exact

    // candidate volume through the production band join (counted, not
    // collected — the count is the only driver-side value)
    def docTable(df: DataFrame) = df
      .withColumn("__words", split(col("text"), " "))
      .withColumn("__sv",
        sort_array(Engine.wordNgrams(col("__words"), 2)))
      .filter(size(col("__sv")) >= 1)
      .select(col("doc_id").as("__id"), col("__sv"))
    val nCands = Engine.minHashCandidatesAcross(
      docTable(batch), docTable(hist), numHashes = 64, bands = 16,
      broadcastBounded = true).count()

    val recall = if (exact.isEmpty) 1.0 else hit.toDouble / exact.size
    println(s"""{"metric":"dedup_recall_tau0.6","sf":"$dir"""" +
      s""","exact_pairs":${exact.size},"banded_pairs":${banded.size}""" +
      s""","recall":$recall,"banded_false_positives":$falsePos""" +
      s""","banded_candidates":$nCands""" +
      f""","sec_exact":$tExact%.1f,"sec_banded":$tBanded%.1f}""")
    spark.stop()
  }
}
