package graft.pipeline

import java.time.Instant
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Canon.orderAll
import graft.operators.{ImageIoDecoder, MediaBlob, Multimodal}
import graft.sources.IO

/** The Part-A END-TO-END capstone: the reference's whole main loop —
  * stub catalog → exact slot match → transport download → zip decode →
  * real image decode → slot-partitioned publish → atomic cursor commit
  * (A1/A2/A3/A4-analog/A6/A7/A8/A9/A15/A16/A17) — run as ONE registered,
  * oracle-checked query over the committed fixtures, instead of only as
  * spec-level golden traces of the individual classes. The q100-capstone
  * pattern applied to the reference's own semantics
  * (`sources/meteosat.py:82-122` + `utils/eumdacapi.py:73-87` +
  * `sources/meteosat.py:130-142`).
  *
  * Fixture discipline (the q94 rule): every byte is DERIVED from the
  * committed tables or from id arithmetic, so the codec-less DuckDB
  * oracle predicts the full trace —
  *  - the source stream is `events` with ts remapped into four 15-min
  *    slots from 2024-01-01T00:15Z (slot k = event_id % 4, in-slot
  *    offset event_id % 800 s — always inside the 900 s slot);
  *  - the catalog carries one product PROD-k at slot+3 s and a decoy
  *    ZPROD-k at slot+5 s per slot — both match the minute-truncated
  *    slot exactly, so first-(ts, id) selection (A6) is exercised, not
  *    assumed;
  *  - each product's archive is a REAL zip holding a REAL PNG
  *    ([[Multimodal.pngFor]] of k: w=k%13+1, h=k%7+1, every pixel
  *    k%251) plus a text member — unzip (A8) and the javax.imageio
  *    decode (A9) both run on genuine bytes while the oracle predicts
  *    the decoded statistics arithmetically;
  *  - `now` is pinned at 2024-01-01T01:00Z, so the A3 bootstrap
  *    (hour-truncated now − 45 min) lands exactly on slot 0, ticks
  *    advance through all four slots, and the fifth tick STALLS
  *    (no catalog product at 01:15) — the A1 serialized loop stops.
  *
  * The registered row returns, per processed slot: the slot key as the
  * sink PARTITION DIRECTORY spells it (read back from the published
  * layout, not echoed from the driver), the matched product, the row
  * count of the slot's published partition, the archive's member count,
  * the decoded image's pixel sum, and the committed cursor read back
  * from the atomic state file — so a silent failure anywhere in the
  * loop (missed slot, wrong product, torn cursor, lost partition,
  * corrupt decode) breaks the hash against the oracle's replay.
  */
object Capstone {

  private val Base = Instant.parse("2024-01-01T00:15:00Z")
  private val NowFixed = Instant.parse("2024-01-01T01:00:00Z")
  private val Slots = 4

  private def writeZips(dir: String): Unit =
    (0 until Slots).foreach { k =>
      val f = java.nio.file.Paths.get(dir, s"PROD-$k.zip")
      val out = new java.util.zip.ZipOutputStream(
        java.nio.file.Files.newOutputStream(f))
      try {
        out.putNextEntry(new java.util.zip.ZipEntry("img.png"))
        out.write(Multimodal.pngFor(k.toLong))
        out.closeEntry()
        out.putNextEntry(new java.util.zip.ZipEntry("meta.txt"))
        out.write(s"PROD-$k".getBytes("UTF-8"))
        out.closeEntry()
      } finally out.close()
    }

  val all: Seq[Q] = Seq(
    Q("q101_pipeline_capstone",
      """WITH src AS (SELECT CAST(event_id % 4 AS BIGINT) AS k
        |  FROM events WHERE event_id IS NOT NULL),
        |cnt AS (SELECT k, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM src GROUP BY k),
        |prod AS (SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 'PROD-0'), (CAST(1 AS BIGINT), 'PROD-1'),
        |  (CAST(2 AS BIGINT), 'PROD-2'), (CAST(3 AS BIGINT), 'PROD-3'))
        |  p(k, product_id))
        |SELECT
        |  strftime(TIMESTAMP '2024-01-01 00:15:00' + to_minutes(15 * k),
        |    '%Y-%m-%dT%H-%M-%SZ') AS slot_key,
        |  product_id, n_rows, CAST(2 AS BIGINT) AS n_entries,
        |  CAST((k % 13 + 1) * (k % 7 + 1) * (k % 251) AS BIGINT)
        |    AS img_byte_sum,
        |  '2024-01-01T01:00:00Z' AS cursor_date
        |FROM cnt JOIN prod USING (k)
        |ORDER BY slot_key NULLS FIRST, product_id NULLS FIRST,
        |  n_rows NULLS FIRST, n_entries NULLS FIRST,
        |  img_byte_sum NULLS FIRST, cursor_date NULLS FIRST""".stripMargin) {
      (s, dir) =>
        implicit val sp: SparkSession = s
        import s.implicits._
        // fixtures: archives on the "already-downloaded" shared layout
        // (the LocalDirFetcher transport), a fresh state file, a fresh
        // output root — the capstone measures the LOOP, so it rebuilds
        // per invocation (the q90n billing rule)
        val zipDir = IO.scratch("q101_blobs", dir)
        writeZips(zipDir)
        val state = IO.scratch("q101_state", dir) + "/cursor.json"
        val out = IO.scratch("q101_out", dir)
        val source = Tables.t(s, dir, "events")
          .filter(col("event_id").isNotNull)
          .select(col("event_id"),
            expr("timestampadd(SECOND, CAST((event_id % 4) * 900 + " +
              "event_id % 800 AS INT), " +
              "timestamp'2024-01-01 00:15:00')").as("ts"))
        val catalog = (0 until Slots).flatMap { k =>
          val slot = Base.plusSeconds(k * 900L)
          Seq((s"PROD-$k", java.sql.Timestamp.from(slot.plusSeconds(3))),
            (s"ZPROD-$k", java.sql.Timestamp.from(slot.plusSeconds(5))))
        }.toDF("identifier", "ts")
        val pipe = new SlotPipeline(s, state, out,
          Some(LocalDirFetcher(zipDir)))
        // A1: serialized ticks, stop at the first stall (slot 5 has no
        // catalog product). 4 Processed + 1 Stalled by construction.
        pipe.run(catalog, source, () => NowFixed, maxTicks = Slots + 1):
          Unit
        // read the trace BACK from what the loop published — partition
        // layout, blobs, and the committed cursor, never driver echoes
        val nRows = s.read.parquet(out)
          .groupBy(col("slot_key")).agg(count(lit(1)).as("n_rows"))
        val blobs = s.read.parquet(s"$out-blobs")
        val perSlot = blobs.groupBy(col("slot_key"))
          .agg(min(col("identifier")).as("product_id"),
            count(lit(1)).as("n_entries"))
          .withColumn("k",
            expr("CAST(substring(product_id, 6) AS BIGINT)"))
        // A9: decode the published PNGs with the real codec; the sum of
        // decoded pixels is the arithmetic the oracle predicts
        val feats = Multimodal.extractFeatures(
            blobs.filter(col("entry") === "img.png")
              .select(col("identifier"), col("content"))
              .as[(String, Array[Byte])]
              .map { case (id, bytes) =>
                MediaBlob(id.stripPrefix("PROD-").toLong, "image", "xx",
                  bytes)
              },
            ImageIoDecoder)
          .toDF()
          .select(col("doc_id").as("k"), col("byte_sum").as("img_byte_sum"))
        val cursor = CursorStore.read(state,
            s.sparkContext.hadoopConfiguration)
          .map(DateTimeFormatter.ISO_INSTANT.format(_))
          .getOrElse("UNCOMMITTED")
        orderAll(nRows
          .join(perSlot, Seq("slot_key"))
          .join(feats, Seq("k"))
          .select(col("slot_key"), col("product_id"), col("n_rows"),
            col("n_entries"), col("img_byte_sum"),
            lit(cursor).as("cursor_date")))
    })
}
