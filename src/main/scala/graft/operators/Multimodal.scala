package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Canon.orderAll

/** A multimodal record: opaque payload + typed metadata (SURVEY §1.1 D4 —
  * the raster-scene-as-binary-column model). */
final case class MediaBlob(doc_id: Long, modality: String, lang: String,
    content: Array[Byte])

/** Decoder output: per-blob features. */
final case class MediaFeatures(doc_id: Long, modality: String,
    n_bytes: Int, byte_sum: Long, feat_dim: Int)

/** Decoder SPI. A real deployment injects an image/audio/video codec here
  * (satpy/rasterio in the reference, `utils/conversion.py:9-19`); this
  * container ships no codecs, so [[StubDecoder]] is the clearly-marked
  * deterministic stand-in. The Spark-side plumbing — binary column in,
  * per-partition iterator (decoder initialized once per partition, the
  * mapInPandas batch shape), typed Dataset out — is the real thing.
  */
trait MediaDecoder extends Serializable {
  /** Called once per partition — codec init/native handles live here. */
  def open(): Unit = ()
  def decode(blob: MediaBlob): MediaFeatures
}

/** Deterministic fake decode: byte statistics instead of pixels. A real
  * decoder would return width/height/duration/frames; the byte_sum stands
  * in as the "content-derived feature" the oracle can reproduce. */
object StubDecoder extends MediaDecoder {
  override def decode(b: MediaBlob): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < b.content.length) { sum += b.content(i) & 0xff; i += 1 }
    MediaFeatures(b.doc_id, b.modality, b.content.length, sum,
      b.content.length % 64 + 1)
  }
}

/** Multimodal feature extraction (north-star mandate: decode /
  * feature-extract over opaque binary columns). */
object Multimodal {

  /** The mapPartitions feature-extract operator: one decoder per
    * partition, streamed iteration (no per-row codec setup, no
    * collect). */
  def extractFeatures(blobs: Dataset[MediaBlob], decoder: MediaDecoder)(
      implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    blobs.mapPartitions { it =>
      decoder.open()
      it.map(decoder.decode)
    }
  }

  val all: Seq[Q] = Seq(
    // Q94b (beyond-survey) — the decode/feature-extract path over the
    // multimodal blob column, stub decoder in place of a codec. The
    // oracle recomputes the byte statistics from the source text (the
    // corpus is pure ASCII, so UTF-8 byte values == character codes).
    // byte_sum is CAST to BIGINT because DuckDB types list_aggregate's
    // sum as HUGEINT, which pandas serializes as float64 and the hash
    // gate would mismatch Spark's BIGINT (round-2 red row). n_bytes and
    // feat_dim use strlen (octet length), matching the Spark side's
    // UTF-8 content.length even for non-ASCII text.
    Q("q94b_media_features",
      """SELECT doc_id, 'text' AS modality,
        |  CAST(strlen(text) AS INT) AS n_bytes,
        |  CAST(list_aggregate(list_transform(string_split(text, ''),
        |    c -> ascii(c)), 'sum') AS BIGINT) AS byte_sum,
        |  CAST(strlen(text) % 64 + 1 AS INT) AS feat_dim
        |FROM documents
        |ORDER BY doc_id NULLS FIRST, modality NULLS FIRST,
        |  n_bytes NULLS FIRST, byte_sum NULLS FIRST, feat_dim NULLS FIRST""".stripMargin) {
      (s, dir) =>
        implicit val sp: SparkSession = s
        import s.implicits._
        val blobs = Tables.t(s, dir, "documents")
          .select(col("doc_id"), lit("text").as("modality"), col("lang"),
            encode(col("text"), "UTF-8").as("content"))
          .as[MediaBlob]
        orderAll(extractFeatures(blobs, StubDecoder).toDF())
    })
}
