package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DoubleType

/** Dev-only profiling scratchpad (test scope; not part of the library). */
object DebugProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.SortedIntersectCount.register(spark)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val thresholdPct = 60
    val docs = timed("docs prep + ckpt") {
      Tables.t(spark, dir, "documents")
        .withColumn("__words", split(col("text"), " "))
        .withColumn("__sv", sort_array(graft.Engine.wordNgrams(col("__words"), 2)))
        .filter(size(col("__sv")) >= 1)
        .select(col("doc_id").as("__id"), col("__sv"), size(col("__sv")).as("__n"))
        .localCheckpoint()
    }
    val tok = docs.select(col("__id"), col("__n"), explode(col("__sv")).as("__t"))
    val dfreq = tok.groupBy("__t").agg(count(lit(1)).as("__df"))
    val byDoc = Window.partitionBy(col("__id"))
    val pref = timed("prefix pipeline + ckpt") {
      tok.join(dfreq, Seq("__t"))
        .withColumn("__rn", row_number().over(
          byDoc.orderBy(col("__df").asc, col("__t").asc)))
        .filter(col("__rn") <=
          col("__n") - expr(s"(__n * $thresholdPct + 99) div 100") + 1)
        .select(col("__t"), col("__id"), col("__rn"), col("__n"))
        .localCheckpoint()
    }
    val a = pref.select(col("__t"), col("__id").as("doc_a"),
      col("__rn").as("__ra"), col("__n").as("__na"))
    val b = pref.select(col("__t"), col("__id").as("doc_b"),
      col("__rn").as("__rb"), col("__n").as("__nb"))
    val alpha = expr(s"(($thresholdPct * (__na + __nb) + ${100 + thresholdPct - 1})" +
      s" div ${100 + thresholdPct})")
    val filt = a.join(b, Seq("__t"))
      .filter(col("doc_a") < col("doc_b") &&
        col("__nb") * 100 >= col("__na") * thresholdPct &&
        col("__na") * 100 >= col("__nb") * thresholdPct &&
        least(col("__na") - col("__ra"), col("__nb") - col("__rb")) + 1 >= alpha)
      .select("doc_a", "doc_b")
    timed("filtered cand count")(println("filt=" + filt.count()))
    val cands = filt.dropDuplicates("doc_a", "doc_b")
    timed("dedup cand count")(println("cands=" + cands.count()))
    val verified = cands
      .join(docs.select(col("__id").as("doc_a"), col("__sv").as("__sa")),
        Seq("doc_a"))
      .join(docs.select(col("__id").as("doc_b"), col("__sv").as("__sb")),
        Seq("doc_b"))
    val inter = expr("sorted_intersect_count(__sa, __sb)")
    val uni = size(col("__sa")) + size(col("__sb")) - inter
    val out = verified
      .withColumn("jaccard", round(inter.cast(DoubleType) / uni, 6))
      .filter(inter * 100 >= uni * thresholdPct)
      .select("doc_a", "doc_b", "jaccard")
    timed("verify + output")(println("out=" + out.count()))
    timed("full jaccardJoin e2e (run1)") {
      graft.Engine.jaccardJoin(
        Tables.t(spark, dir, "documents"), "doc_id", "text",
        thresholdPct = 60, ngramWords = 2)
        .write.format("noop").mode("overwrite").save()
    }
    timed("full jaccardJoin e2e (run2)") {
      graft.Engine.jaccardJoin(
        Tables.t(spark, dir, "documents"), "doc_id", "text",
        thresholdPct = 60, ngramWords = 2)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
