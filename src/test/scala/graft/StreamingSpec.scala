package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming semantics the file-replay harness cannot show (its files are
  * time-ordered, so nothing ever arrives late): watermark-based late-data
  * DROPPING and cross-batch dedup, driven by an out-of-order MemoryStream
  * (SURVEY §5 item 5).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1704067200000L + minutes * 60000L) // 2024-01-01T00:00Z +

  test("watermark drops rows later than 45 minutes behind max event time") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "45 minutes")
      .groupBy(window(col("ts"), "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      // batch 1: two rows in window 00:00 + one far ahead at 03:00 that
      // will push the watermark to 02:15 after this batch commits.
      input.addData((ts(0), 1L), (ts(5), 2L), (ts(180), 3L))
      q.processAllAvailable()
      // batch 2: a LATE row for window 00:00 (ts=00:10 << watermark 02:15)
      // must be dropped, not added; plus a fresh row at 04:00 advancing
      // the watermark to 03:15 so window 03:00 flushes too.
      input.addData((ts(10), 4L), (ts(240), 5L))
      q.processAllAvailable()
      val out = spark.table("wm_test")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toMap
      // window 00:00 was finalized with 2 rows — the late row is gone
      assert(out(ts(0).getTime) == 2L)
      // window 03:00 flushed with exactly its one on-time row
      assert(out(ts(180).getTime) == 1L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "45 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("dd_test")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 100L), (ts(1), 101L))
      q.processAllAvailable()
      input.addData((ts(2), 100L), (ts(3), 102L)) // 100 is a re-delivery
      q.processAllAvailable()
      val ids = spark.table("dd_test").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(100L, 101L, 102L))
    } finally q.stop()
  }

  test("foreachBatch crash before commit replays the batch exactly-once (A16/A17)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = graft.sources.IO.scratch("crash_replay_test", "spec")
    val sink = s"$root/data"
    val bomb = new java.util.concurrent.atomic.AtomicBoolean(true)
    val input = MemoryStream[(Timestamp, Long)]
    def start() = input.toDF().toDF("ts", "v")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id == 1 && bomb.getAndSet(false))
          throw new RuntimeException("crash before commit")
        b.withColumn("batch_id", lit(id)).write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(sink)
      }
      .option("checkpointLocation", s"$root/chk").start()

    val q1 = start()
    input.addData((ts(0), 1L), (ts(1), 2L))
    q1.processAllAvailable() // batch 0 commits
    input.addData((ts(2), 3L))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable() // batch 1 crashes AFTER the offset was
      q1.awaitTermination()    // logged but BEFORE the sink commit
    }
    val q2 = start() // restart from the same checkpoint
    try {
      q2.processAllAvailable() // batch 1 replays; same partition, same rows
      val rows = spark.read.parquet(sink).select("v")
        .collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == Seq(1L, 2L, 3L)) // nothing lost, nothing doubled
    } finally q2.stop()
  }

  test("latest-state chain replays a crashed batch to identical content (q77b)") {
    // The q77b exactly-once argument: batch i's snapshot is a pure
    // function of snapshot i-1 (stable on disk) and batch i's rows
    // (replayed from the checkpoint), so a crash between the offset log
    // and the state write replays to byte-identical content.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = graft.sources.IO.scratch("upsert_crash_test", "spec")
    val stateRoot = s"$root/state"
    val bomb = new java.util.concurrent.atomic.AtomicBoolean(true)
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    def start() = input.toDF().toDF("user_id", "ts", "event_id", "value")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id == 1 && bomb.getAndSet(false))
          throw new RuntimeException("crash before state write")
        graft.streaming.StateChain.mergeAndCommit(b, id, stateRoot)
      }
      .option("checkpointLocation", s"$root/chk").start()
    val q1 = start()
    input.addData((1L, ts(0), 10L, 1.0), (2L, ts(1), 11L, 2.0))
    q1.processAllAvailable() // batch 0 commits state
    input.addData((1L, ts(2), 12L, 5.0)) // newer row for user 1
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable() // batch 1 crashes pre-write
      q1.awaitTermination()
    }
    // The crashed batch committed its offset but never moved the manifest:
    // the serving frontier must still point at batch 0.
    assert(graft.streaming.StateChain.latest(spark, stateRoot) == 0L)
    // Prove the snapshot write is genuinely partitioned (no coalesce(1)
    // bottleneck): with AQE's small-data fan-in switched off, the merge
    // agg's shuffle partitions reach the writer as-is, so the two user
    // keys (distinct hash partitions) land in two part files. Under AQE
    // (the default, and what q2 below runs with) tiny snapshots rightly
    // coalesce to few files while a large one fans out to many tasks.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesceKey, "false")
    val q2 = start()
    try {
      q2.processAllAvailable() // batch 1 replays against the same base
      assert(graft.streaming.StateChain.latest(spark, stateRoot) == 1L)
      val snap = graft.streaming.StateChain.snapshot(spark, stateRoot)
      val got = snap.collect().map(r => r.getLong(0) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(got == Map(1L -> ((12L, 5.0)), 2L -> ((11L, 2.0))))
      val parts = new java.io.File(
          graft.streaming.StateChain.stateDir(stateRoot, 1L))
        .listFiles().count(_.getName.startsWith("part-"))
      assert(parts > 1, s"expected a partitioned snapshot, got $parts file")
    } finally {
      q2.stop()
      spark.conf.unset(coalesceKey)
    }
  }

  test("transformWithState keeps typed state across a restart (state API v2)") {
    // The v2 analog of the cursor-replay guarantee: ValueState/MapState
    // written under the RocksDB provider must survive a stop + restart
    // from the checkpoint, so the post-restart emission continues the
    // pre-restart totals instead of starting from zero.
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val root = graft.sources.IO.scratch("tws_restart_test", "spec")
      val input = MemoryStream[(Long, Double, String)]
      def start() = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.UserAggProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.withColumn("batch_id", lit(id)).write.mode("append")
            .parquet(s"$root/log")
        }
        .option("checkpointLocation", s"$root/chk")
        .outputMode("update").start()
      val q1 = start()
      input.addData((1L, 1.5, "click"), (1L, 2.0, "view"), (2L, 3.0, "click"))
      q1.processAllAvailable()
      q1.stop()
      val q2 = start() // fresh query, same checkpoint + state store
      try {
        input.addData((1L, 0.5, "click"))
        q2.processAllAvailable()
        val last = spark.read.parquet(s"$root/log")
          .filter(col("user_id") === 1L)
          .orderBy(col("batch_id").desc).limit(1)
          .collect().head
        assert(last.getAs[Long]("n_events") == 3L)
        assert(last.getAs[Long]("sum_micros") == 4000000L) // 1.5+2.0+0.5
        assert(last.getAs[Long]("n_types") == 2L)
      } finally q2.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("Trigger.ProcessingTime fires repeated wall-clock micro-batches (A1)") {
    // The reference's defining cadence (`main.py:28-29`: an interval
    // trigger) — every other suite runs AvailableNow, so this is the one
    // place wall-clock triggering is actually exercised. Rate source →
    // memory sink, 250 ms trigger; wait until ≥2 distinct batches carried
    // rows, proving the trigger re-fired on the clock, then stop.
    import org.apache.spark.sql.streaming.Trigger
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").load()
      .writeStream.format("memory").queryName("pt_test")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      def dataBatches = q.recentProgress
        .filter(_.numInputRows > 0).map(_.batchId).distinct
      while (dataBatches.length < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(dataBatches.length >= 2,
        s"expected >=2 data-carrying batches, got ${dataBatches.toSeq}")
    } finally q.stop()
  }

  test("stateful cursor carries state across micro-batches (Q75 engine path)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import graft.streaming.CursorState
    implicit val ctx = spark.sqlContext
    val slotMin = 15L
    val input = MemoryStream[(Long, Timestamp)]
    val counted = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState[CursorState, (Long, Long, Long)](
        GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        var st = state.getOption.getOrElse(CursorState.zero)
        it.toArray.sortBy(_._2.getTime).foreach { e =>
          st = st.advance(e._2.getTime * 1000L)
        }
        state.update(st)
        (uid, st.nEvents, st.nSlots)
      }
    val q = counted.toDF("user_id", "n_events", "n_slots")
      .writeStream.format("memory").queryName("cur_test")
      .outputMode("update").start()
    try {
      input.addData((1L, ts(0)), (1L, ts(5)), (1L, ts(slotMin)))
      q.processAllAvailable()
      input.addData((1L, ts(slotMin + 1)), (1L, ts(3 * slotMin)))
      q.processAllAvailable()
      val last = spark.table("cur_test").collect()
        .map(r => (r.getLong(1), r.getLong(2))).last
      // 5 events total over slots {0, 1, 3} — state survived the batch gap
      assert(last == ((5L, 3L)))
    } finally q.stop()
  }

  test("RocksDB state store: same watermarked aggregation, same answer") {
    // The deployment-scale state backend (bounded executor heap; state
    // spills to disk instead of growing the JVM): the stateful pipeline
    // must produce identical results under it. Provider choice is
    // per-query via the session conf captured at stream start.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, Long)]
      val agg = input.toDF().toDF("ts", "v")
        .withWatermark("ts", "45 minutes")
        .groupBy(window(col("ts"), "15 minutes"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .select(col("window.start").as("wstart"), col("n"), col("s"))
      val q = agg.writeStream.format("memory").queryName("rocks_test")
        .outputMode("append").start()
      try {
        input.addData((ts(0), 1L), (ts(5), 2L), (ts(16), 3L))
        q.processAllAvailable()
        input.addData((ts(180), 4L)) // advances watermark, flushes all
        q.processAllAvailable()
        input.addData((ts(240), 5L))
        q.processAllAvailable()
        val got = spark.table("rocks_test").collect()
          .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
        // cross-batch state (window 00:00 accumulated rows from batch 1)
        // closed correctly under RocksDB
        assert(got.contains((ts(0), 2L, 3L)), got)
        assert(got.contains((ts(15), 1L, 3L)), got)
        assert(got.contains((ts(180), 1L, 4L)), got)
      } finally q.stop()
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
