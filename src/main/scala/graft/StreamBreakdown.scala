package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.jdk.CollectionConverters._

/** PER-TRIGGER COST DECOMPOSITION for the replay-heavy streaming family
  * (dev main, beside StreamSizing): WHERE the ~1 s/trigger fixed cost
  * of the mfpt=1 stream-stream joins goes — the question the r14
  * trigger-sizing curve pinned but could not answer (it measured that
  * cost is per-trigger and ~batching-invariant; this tool splits each
  * trigger's wall into Spark's own progress-event phases). Queries run
  * UNMODIFIED from the registry at their REGISTERED batching (no mfpt
  * override — the q78/q78b mfpt=1 contract is exactly the shape being
  * profiled).
  *
  * Per trigger, StreamingQueryProgress.durationMs decomposes into:
  * `addBatch` (the actual micro-batch execution, including state-store
  * reads/writes), `walCommit` (offset-log fsync BEFORE the batch),
  * `commitOffsets` (commit-log fsync AFTER it), `latestOffset`/
  * `getBatch` (source listing/planning), `queryPlanning` (incremental
  * plan re-derivation) — plus each stateful operator's own
  * `commitTimeMs` (state checkpoint upload, a component of addBatch).
  * Means per query land in one JSON line; merge into
  * STREAMING_PROFILE.json as `trigger_breakdown`.
  *
  * The fsync hypothesis is testable with the SAME binary: the offset/
  * commit logs live under the query's IO.scratch checkpoint dir, which
  * `-Dgraft.io.dir` relocates — run once on disk (default
  * target/graft-io) and once on tmpfs (/dev/shm/...) and compare the
  * walCommit/commitOffsets columns; the delta is the durable-fsync
  * share of the per-trigger floor. Events are keyed by stream RUN id
  * (the StreamSizing r15 discipline), so a prior query's async
  * stragglers cannot pollute the next query's rows. */
object StreamBreakdown {
  private final case class Trig(dur: Map[String, Long], stateMs: Long,
      rowsUpdated: Long)

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
    val events = new java.util.concurrent.ConcurrentHashMap[
      java.util.UUID, java.util.List[Trig]]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs.asScala.map { case (k, v) =>
          k -> v.longValue }.toMap
        val st = p.stateOperators.map(_.commitTimeMs).sum
        val up = p.stateOperators.map(_.numRowsUpdated).sum
        events.computeIfAbsent(p.runId,
          _ => java.util.Collections.synchronizedList(
            new java.util.ArrayList[Trig]()))
          .add(Trig(dur, st, up)): Unit
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val names = Seq("q78_stream_stream_join", "q78b_stream_stream_outer",
      "q79_stream_cusum")
    val cells = for (name <- names) yield {
      val before = events.keySet().asScala.toSet
      val start = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - start) / 1e9
      Thread.sleep(500) // drain this cell's own async stragglers
      val trigs = events.asScala.collect {
        case (rid, ts) if !before(rid) => ts.asScala.toSeq
      }.flatten.toSeq
      System.err.println(f"[breakdown] $name $sec%.2f s " +
        s"triggers=${trigs.size} rows=$n")
      (name, sec, trigs)
    }
    val body = cells.map { case (name, sec, trigs) =>
      val nt = math.max(trigs.size, 1)
      val keys = trigs.flatMap(_.dur.keys).distinct.sorted
      val durMeans = keys.map { k =>
        val m = trigs.map(_.dur.getOrElse(k, 0L)).sum.toDouble / nt
        f""""$k":$m%.1f"""
      }.mkString(",")
      val stMean = trigs.map(_.stateMs).sum.toDouble / nt
      val upMean = trigs.map(_.rowsUpdated).sum.toDouble / nt
      f""""$name":{"sec":$sec%.3f,"n_triggers":${trigs.size},""" +
        f""""mean_ms":{$durMeans},"state_commit_ms":$stMean%.1f,""" +
        f""""state_rows_updated":$upMean%.1f}"""
    }.mkString(",")
    val ioDir = sys.props.getOrElse("graft.io.dir", "target/graft-io")
    println(s"""{"metric":"stream_trigger_breakdown","sf":"$dir",""" +
      s""""io_dir":"$ioDir","queries":{$body}}""")
    spark.stop()
  }
}
