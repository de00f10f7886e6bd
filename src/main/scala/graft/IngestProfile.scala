package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PER-SLOT ingest cost curve (dev main, beside Bench/RecallProbe/
  * StreamSizing): the engine's central 100 TB claim — `dedupIngest`'s
  * per-slot cost is O(batch) + O(collisions) with history never
  * re-hashed — measured the way StreamSizing measured the trigger
  * curve, instead of resting on Scaladoc prose. Fixed batch size
  * (docs partitioned by `doc_id % slots`), the accumulated index grows
  * one slot at a time, and every slot ledgers its PROBE wall, probe
  * shuffle read/write bytes, probe INPUT bytes (the history-scan
  * term), and its APPEND wall — for BOTH constructions:
  *
  *  - `path` — [[Engine.dedupIngest]]'s loop body (searchMinHashIndex /
  *    appendMinHashIndex over path parquet). MEASURED (32 slots, 10×
  *    fixture): probe shuffle FLAT at ~1.4 MB/slot and probe wall flat
  *    ~2 s/slot — AQE broadcasts the bounded candidate set, so the
  *    history docs attach streams without an exchange. That flatness
  *    is adaptive, not structural: it holds while candidates fit the
  *    broadcast threshold; a dup-burst batch past it re-plans into a
  *    full history shuffle (the 100 TB failure mode the bucketed form
  *    forecloses).
  *  - `bucketed` — [[Engine.dedupIngestBucketed]]'s loop body
  *    (searchMinHashIndexBucketed / appendMinHashIndexBucketed over
  *    catalog bucketBy tables). Exchange-free on the history side BY
  *    PLAN (PlanSpec q90y pins it after appends). MEASURED cost of
  *    that guarantee: each append adds one file per bucket, and probe
  *    wall grows 1.3 → 4.3 s across 31 appends from file-count
  *    overhead alone — the q90t in-bucket compaction cadence is what
  *    holds the deployment curve flat.
  *
  * Both arms' probe INPUT bytes grow with the accumulated index (the
  * documented read-once-per-batch columnar scan term); per-slot
  * shuffle never carries history payload in either arm at steady
  * state.
  *
  * Both arms run the REGISTERED operators' exact per-slot calls (the
  * loop here is the same body with timing seams between the probe and
  * append phases), so the curves describe q90n/q90y, not a model of
  * them. Metrics ride a SparkListener over task metrics; listener
  * events are async, so each phase boundary waits for a short quiet
  * window before snapshotting (outside the timed region). Prints one
  * JSON line on stdout; commit as INGEST_PROFILE.json.
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfx1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val slots = sys.env.getOrElse("SPARK_GRAFT_INGEST_SLOTS", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ioRead = new java.util.concurrent.atomic.AtomicLong()
    val ioWrite = new java.util.concurrent.atomic.AtomicLong()
    val ioInput = new java.util.concurrent.atomic.AtomicLong()
    val lastTaskEvent =
      new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            ioRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            ioWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ioInput.addAndGet(m.inputMetrics.bytesRead)
            ()
          }
          lastTaskEvent.set(System.nanoTime())
        }
      })
    def drain(): Unit = {
      val deadline = System.nanoTime() + 1_000_000_000L
      while (System.nanoTime() < deadline &&
          System.nanoTime() - lastTaskEvent.get() < 50_000_000L)
        Thread.sleep(10)
    }
    def snap(): (Long, Long, Long) = {
      drain(); (ioRead.get(), ioWrite.get(), ioInput.get())
    }
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).persist()
    val nDocs = docs.count()
    val batchOf = col("doc_id") % slots
    import spark.implicits._
    val batchIds = docs.select(batchOf.cast("long").as("__b"))
      .distinct().orderBy(col("__b")).as[Long].collect()

    final case class SlotCost(slot: Long, probeSec: Double,
        probeShufRead: Long, probeShufWrite: Long, probeInput: Long,
        appendSec: Double, keptDocs: Long)

    // one arm = the registered loop body with timing seams; `probe` and
    // `append` are the SAME Engine calls the operator makes per slot
    def runArm(indexPath: String,
        probe: DataFrame => DataFrame,
        build: DataFrame => Unit,
        append: DataFrame => Unit): Seq[SlotCost] = {
      locally {
        val acc = new org.apache.hadoop.fs.Path(indexPath, "accepted")
        val fs = acc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(acc)) fs.delete(acc, true)
      }
      batchIds.zipWithIndex.map { case (b, i) =>
        val batch = docs.filter(batchOf.cast("long") === b)
        val p0 = snap()
        val t0 = System.nanoTime()
        val kept0 =
          if (i == 0) batch
          else {
            val dups = probe(batch)
              .select(col("left_id").as("doc_id")).distinct()
            batch.join(dups, Seq("doc_id"), "left_anti")
          }
        // the probe phase ends where dedupIngest's does: survivors
        // materialized at the point-in-time index state
        kept0.select(col("doc_id"), col("text"))
          .write.mode("overwrite").parquet(s"$indexPath/accepted/batch=$b")
        val probeSec = (System.nanoTime() - t0) / 1e9
        val p1 = snap()
        val kept = spark.read.parquet(s"$indexPath/accepted/batch=$b")
        val t1 = System.nanoTime()
        if (i == 0) build(kept) else append(kept)
        val appendSec = (System.nanoTime() - t1) / 1e9
        drain()
        val cost = SlotCost(b, probeSec, p1._1 - p0._1, p1._2 - p0._2,
          p1._3 - p0._3, appendSec, kept.count())
        System.err.println(f"[ingest] slot=$b%2d probe=${cost.probeSec}%6.2fs " +
          f"shufR=${cost.probeShufRead}%12d shufW=${cost.probeShufWrite}%12d " +
          f"input=${cost.probeInput}%12d append=${cost.appendSec}%6.2fs " +
          f"kept=${cost.keptDocs}")
        cost
      }
    }

    val pathDir = s"/tmp/ingest_profile_path_$slots"
    val pathCosts = runArm(pathDir,
      b => Engine.searchMinHashIndex(b, "doc_id", "text", pathDir),
      k => Engine.buildMinHashIndex(k, "doc_id", "text", pathDir),
      k => Engine.appendMinHashIndex(k, "doc_id", "text", pathDir))
    val bktDir = s"/tmp/ingest_profile_bkt_$slots"
    val bktTable = "ingest_profile_idx"
    val bktCosts = runArm(bktDir,
      b => Engine.searchMinHashIndexBucketed(b, "doc_id", "text", bktTable),
      k => Engine.buildMinHashIndexBucketed(k, "doc_id", "text", bktTable),
      k => {
        // same maintenance cadence dedupIngestBucketed runs (r17): the
        // append phase's ledgered wall includes the periodic in-bucket
        // compaction, so the probe curve shows the deployment sawtooth
        // rather than the unmaintained growth line
        Engine.appendMinHashIndexBucketed(k, "doc_id", "text", bktTable)
        val compacted = Engine.maybeCompactBucketedIndex(spark, bktTable)
        if (compacted) System.err.println("[ingest]   (compacted)")
      })

    def armJson(cs: Seq[SlotCost]): String = cs.map { c =>
      f"""{"slot":${c.slot},"probe_sec":${c.probeSec}%.3f,""" +
        s""""probe_shuffle_read":${c.probeShufRead},""" +
        s""""probe_shuffle_write":${c.probeShufWrite},""" +
        s""""probe_input_bytes":${c.probeInput},""" +
        f""""append_sec":${c.appendSec}%.3f,"kept":${c.keptDocs}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"ingest_per_slot","slots":$slots,""" +
      s""""n_docs":$nDocs,"sf":"$dir",""" +
      s""""path":${armJson(pathCosts)},""" +
      s""""bucketed":${armJson(bktCosts)}}""")
    spark.stop()
  }
}
