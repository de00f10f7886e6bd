package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DEDUP-RECALL probe (dev main, alongside RecallProbe): side-by-side of
  * the EXACT bipartite prefix-filter join ([[Engine.jaccardJoinAcross]],
  * the pre-r15 q90d path, now the library contrast operator) and the
  * banded-MinHash form ([[Engine.minHashJoinAcross]], the registered
  * q90d scale path since r15) on the documents
  * table of SPARK_GRAFT_SF_DIR — pair counts, recall, candidate volume,
  * and wall time per arm.
  *
  * The oracle gate pins the banded q90d's OUTPUT; what it cannot show is the
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

    // MaxValue opt-out: the probe's exact arm IS the flood the priced
    // gate refuses at this fixture (1.17e9 candidates ≥ the 5e8
    // budget) — measuring it is this tool's purpose
    val (exact, tExact) = timed(pairsOf(Engine.jaccardJoinAcross(
      batch, hist, "doc_id", "text", thresholdPct = 60, ngramWords = 2,
      broadcastBounded = true, maxCandidatePairs = Long.MaxValue)))
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

    // ---- CONTAINMENT recall under banding (r14, the q90h default
    // cutover): the oracle gate re-checks banded == exact at sf0.01/
    // sf0.1 every round, but the sf1 stress fixture never hash-compares
    // — this section is that comparison, with the production operators
    // on both arms (q90h's 5% stable-sample batch vs the full corpus).
    def cpairsOf(df: DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cbatch = docs.filter(Engine.stableSample(col("doc_id"), 5))
    val (cExact, tcExact) = timed(cpairsOf(Engine.containmentJoin(
      cbatch, docs, "doc_id", "text", thresholdPct = 80, ngramWords = 2,
      maxCandidatePairs = Long.MaxValue)))
    val (cBanded, tcBanded) = timed(cpairsOf(Engine.containmentJoinBanded(
      cbatch, docs, "doc_id", "text", thresholdPct = 80, ngramWords = 2)))
    val cHit = (cBanded intersect cExact).size
    val cRecall = if (cExact.isEmpty) 1.0 else cHit.toDouble / cExact.size
    println(s"""{"metric":"containment_recall_t0.8","sf":"$dir"""" +
      s""","exact_pairs":${cExact.size},"banded_pairs":${cBanded.size}""" +
      s""","recall":$cRecall""" +
      s""","banded_false_positives":${(cBanded diff cExact).size}""" +
      f""","sec_exact":$tcExact%.1f,"sec_banded":$tcBanded%.1f}""")

    // ---- τ-BOUNDARY recall vs band shape (r11 verdict item 4) ----
    // The corpus fixtures only carry mass at J ≥ 0.889 and J ≤ 0.08, so
    // the "~0.11 miss at J = 0.6 under 16×4" honesty bound was THEORY.
    // This fixture puts controlled mass exactly at the boundary:
    // per pair, a shared word block of s+1 words (s shared bigrams) and
    // per-doc unique tails (ta/tb extra bigrams each, junction bigrams
    // distinct by construction) → J = s/(s+ta+tb) exactly, with a
    // pair-unique vocabulary so cross-pair similarity is 0. Shapes span
    // J ∈ [0.579, 0.692]; the ≥ τ shapes are the measured population.
    val shapes = Seq( // (s, ta, tb) → J = s/(s+ta+tb)
      (11, 4, 4),  // 0.579 — sub-τ control
      (14, 5, 5),  // 0.583 — sub-τ control
      (15, 5, 5),  // 0.600 — the boundary itself
      (13, 4, 4),  // 0.619
      (16, 4, 4),  // 0.667
      (18, 4, 4))  // 0.692
    val nRep = 50
    import spark.implicits._
    val rows = for {
      (shape, si) <- shapes.zipWithIndex
      r <- 0 until nRep
      pid = si * nRep + r
      (s, ta, tb) = shape
      shared = (0 to s).map(j => s"p${pid}w$j")
      (docId, tail) <- Seq(
        (2L * pid, (1 to ta).map(j => s"p${pid}a$j")),
        (2L * pid + 1, (1 to tb).map(j => s"p${pid}b$j")))
    } yield (docId, (shared ++ tail).mkString(" "))
    val bDocs = rows.toDF("doc_id", "text")
    val bl = bDocs.filter(col("doc_id") % 2 === 0)
    val br = bDocs.filter(col("doc_id") % 2 === 1)
    val exactB = pairsOf(Engine.jaccardJoinAcross(bl, br, "doc_id",
      "text", thresholdPct = 60, ngramWords = 2, broadcastBounded = true))
    def shapeOf(p: (Long, Long)): Int = (p._1 / 2 / nRep).toInt
    def recallRow(bands: Int): String = {
      val got = pairsOf(Engine.minHashJoinAcross(bl, br, "doc_id",
        "text", thresholdPct = 60, numHashes = 64, bands = bands,
        ngramWords = 2, broadcastBounded = true))
      val fp = (got diff exactB).size // exact verification: must be 0
      val byShape = shapes.indices.map { si =>
        val t = exactB.count(shapeOf(_) == si)
        val h = (got intersect exactB).count(shapeOf(_) == si)
        if (t == 0) "null" else f"${h.toDouble / t}%.3f"
      }
      val r = if (exactB.isEmpty) 1.0
        else (got intersect exactB).size.toDouble / exactB.size
      f""""bands_${bands}x${64 / bands}":{"recall":$r%.4f""" +
        s""","false_positives":$fp""" +
        s""","recall_by_J":[${byShape.mkString(",")}]}"""
    }
    val jList = shapes.map { case (s, ta, tb) =>
      f"${s.toDouble / (s + ta + tb)}%.3f" }.mkString(",")
    println(s"""{"metric":"dedup_recall_boundary","tau":0.6""" +
      s""","pairs_per_shape":$nRep,"J_shapes":[$jList]""" +
      s""","exact_pairs":${exactB.size},${recallRow(16)}""" +
      s""",${recallRow(32)}}""")
    spark.stop()
  }
}
