package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kernel-stage profiler (dev main, beside Bench/RecallProbe): times the
  * SUB-STAGES of the kernels under the SURVEY §8 interpreted-HOF audit,
  * so a slow registered query is attributed to a stage (and the stage to
  * its plan shape) instead of guessed at. Each stage gets the Bench
  * discipline: noop sink, one warm-up, min of two timed passes, cache
  * cleared between stages. Prints one JSON line. */
object KernelProfile {
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

    def onceSec(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def stage(name: String)(df: => DataFrame): Unit = {
      val d = df
      onceSec(d) // warm-up
      out(name) = math.min(onceSec(d), onceSec(d))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.err.println(f"[profile] $name%-28s ${out(name)}%7.2fs")
    }

    // q90f decomposition: span DETECTION (3 window passes over the
    // 8-gram explode) vs span APPLICATION (posexplode + anti-join +
    // per-doc array reassembly). The spans input to the apply stage is
    // pinned so the detect cost is not double-billed.
    stage("q90f_grams_explode") {
      docs.select(col("doc_id").as("__id"),
          split(col("text"), " ").as("__w"))
        .filter(size(col("__w")) >= 8)
        .select(col("__id"),
          posexplode(Engine.positionalNgrams(col("__w"), 8))
            .as(Seq("__p", "__g")))
    }
    stage("q90f_grams_hashed") {
      docs.select(col("doc_id").as("__id"),
          split(col("text"), " ").as("__w"))
        .filter(size(col("__w")) >= 8)
        .select(col("__id"),
          posexplode(Engine.positionalNgrams(col("__w"), 8))
            .as(Seq("__p", "__g")))
        .select(col("__id"), col("__p"), unhex(md5(col("__g"))).as("__h"))
    }
    stage("q90f_dupspans") {
      Engine.dupSpans(docs, "doc_id", "text", n = 8)
    }
    val spans = Engine.dupSpans(docs, "doc_id", "text", n = 8)
      .persist()
    spans.count()
    stage("q90f_scrub_given_spans") {
      Engine.scrubSpans(docs, "doc_id", "text", spans)
    }
    stage("q90f_total") {
      Engine.scrubSpans(docs, "doc_id", "text",
        Engine.dupSpans(docs, "doc_id", "text", n = 8))
    }
    spans.unpersist()

    val body = out.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(s"""{"metric":"kernel_profile","sf":"$dir",$body}""")
    spark.stop()
  }
}
