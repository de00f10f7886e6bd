package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Canon.orderAll

/** A multimodal record: opaque payload + typed metadata (SURVEY §1.1 D4 —
  * the raster-scene-as-binary-column model). */
final case class MediaBlob(doc_id: Long, modality: String, lang: String,
    content: Array[Byte])

/** Decoder output: per-blob features. For images, `n_bytes` is the
  * DECODED payload size (pixel count), `byte_sum` the pixel-value sum,
  * `feat_dim` the image width. */
final case class MediaFeatures(doc_id: Long, modality: String,
    n_bytes: Int, byte_sum: Long, feat_dim: Int)

/** Decoder SPI. A real deployment injects its codec stack here (satpy/
  * rasterio in the reference, `utils/conversion.py:9-19`). The Spark-side
  * plumbing — binary column in, per-partition iterator (decoder
  * initialized once per partition, the mapInPandas batch shape), typed
  * Dataset out — is identical whichever decoder is injected.
  */
trait MediaDecoder extends Serializable {
  /** Called once per partition — codec init/native handles live here. */
  def open(): Unit = ()
  def decode(blob: MediaBlob): MediaFeatures
}

/** Deterministic codec-free decode: byte statistics instead of pixels —
  * the stand-in for modalities whose codecs don't ship in the JVM
  * (audio/video). Kept as the second SPI implementation (MultimodalSpec
  * injects it to prove the seam) alongside the real [[ImageIoDecoder]]. */
object StubDecoder extends MediaDecoder {
  override def decode(b: MediaBlob): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < b.content.length) { sum += b.content(i) & 0xff; i += 1 }
    MediaFeatures(b.doc_id, b.modality, b.content.length, sum,
      b.content.length % 64 + 1)
  }
}

/** REAL image decode on the pure-JVM codec stack (`javax.imageio` ships
  * PNG/BMP/GIF/JPEG readers in every JDK — no container dependency): the
  * blob bytes go through an actual PNG parse, and the features come off
  * the decoded raster, closing the A9/A13 stub gap honestly. `open()`
  * does genuine per-partition codec init: ImageIO's temp-file stream
  * cache is disabled once per partition (executors may lack a writable
  * scratch dir, and a heap stream is faster for small blobs). */
object ImageIoDecoder extends MediaDecoder {
  override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)
  override def decode(b: MediaBlob): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b.content))
    require(img != null, s"undecodable ${b.modality} blob for doc ${b.doc_id}")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    MediaFeatures(b.doc_id, b.modality, w * h, sum, w)
  }
}

/** REAL audio decode on the pure-JVM codec stack (`javax.sound.sampled`
  * ships WAVE/AIFF/AU readers in every JDK, and stream parsing needs no
  * audio device — headless-safe): the blob goes through an actual RIFF/
  * WAVE parse, `n_bytes` is the decoded PCM frame count, `byte_sum` the
  * unsigned-sample sum, `feat_dim` the sample rate in kHz off the parsed
  * header. Extends the honest-decode coverage from image (q94b) to the
  * audio modality. */
object WavDecoder extends MediaDecoder {
  override def decode(b: MediaBlob): MediaFeatures = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b.content))
    val fmt = ais.getFormat
    val pcm = ais.readAllBytes()
    require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
      s"unexpected WAVE layout for doc ${b.doc_id}: $fmt")
    var sum = 0L
    var i = 0
    while (i < pcm.length) { sum += pcm(i) & 0xff; i += 1 }
    MediaFeatures(b.doc_id, b.modality, pcm.length, sum,
      (fmt.getSampleRate / 1000).toInt)
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

  /** Deterministic grayscale PNG for one document: width doc_id%13+1,
    * height doc_id%7+1, every pixel doc_id%251 — a REAL PNG encode
    * (`ImageIO.write`, run on the executors), whose decoded statistics an
    * engine with no codec can still predict from the id arithmetic. PNG
    * is lossless, so the decoded raster returns exactly these values. */
  def pngFor(docId: Long): Array[Byte] = {
    val w = (docId % 13 + 1).toInt
    val h = (docId % 7 + 1).toInt
    val v = (docId % 251).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, v); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 8 kHz unsigned-8-bit mono WAVE for one document:
    * doc_id%29+1 PCM frames, every sample doc_id%251 — a REAL RIFF
    * encode (`AudioSystem.write`, run on the executors) whose decoded
    * statistics a codec-less engine predicts from the id arithmetic.
    * PCM is lossless, so the parse returns exactly these values. */
  def wavFor(docId: Long): Array[Byte] = {
    val n = (docId % 29 + 1).toInt
    val v = (docId % 251).toInt
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 8, 1, false, false) // 8 kHz, unsigned 8-bit, mono, LE
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array.fill(n)(v.toByte)), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  val all: Seq[Q] = Seq(
    // Q94b (beyond-survey) — the decode/feature-extract path over the
    // multimodal blob column, now through a REAL codec: each document's
    // blob is a genuine PNG (encoded executor-side by pngFor), and
    // ImageIoDecoder runs an actual javax.imageio parse per blob with
    // per-partition codec init. The image CONTENT is derived from doc_id
    // so the DuckDB oracle — which has no image codec — predicts the
    // decoded statistics arithmetically; the decode itself is real bytes
    // through a real parser (the A9/A13 analog of conversion.py:9-19).
    // byte_sum is CAST to BIGINT (DuckDB products type as HUGEINT, which
    // pandas degrades to float64 — round-2 red row class).
    Q("q94b_media_features",
      """SELECT doc_id, 'image' AS modality,
        |  CAST((doc_id % 13 + 1) * (doc_id % 7 + 1) AS INT) AS n_bytes,
        |  CAST((doc_id % 13 + 1) * (doc_id % 7 + 1) * (doc_id % 251)
        |    AS BIGINT) AS byte_sum,
        |  CAST(doc_id % 13 + 1 AS INT) AS feat_dim
        |FROM documents
        |ORDER BY doc_id NULLS FIRST, modality NULLS FIRST,
        |  n_bytes NULLS FIRST, byte_sum NULLS FIRST, feat_dim NULLS FIRST""".stripMargin) {
      (s, dir) =>
        implicit val sp: SparkSession = s
        import s.implicits._
        val blobs = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("lang")).as[(Long, String)]
          .map { case (id, lang) => MediaBlob(id, "image", lang, pngFor(id)) }
        orderAll(extractFeatures(blobs, ImageIoDecoder).toDF())
    },

    // Q94d (beyond-survey) — the same decode path over the AUDIO
    // modality: each blob is a genuine RIFF/WAVE file (encoded
    // executor-side by wavFor), parsed by an actual javax.sound
    // AudioSystem stream read. Audio content derives from doc_id so the
    // codec-less oracle predicts the decoded PCM statistics
    // arithmetically; feat_dim (sample rate in kHz) comes off the
    // parsed header, proving the header path too. Same mapPartitions
    // shape as q94b — modality is a per-row dispatch, not a new
    // operator.
    Q("q94d_audio_features",
      """SELECT doc_id, 'audio' AS modality,
        |  CAST(doc_id % 29 + 1 AS INT) AS n_bytes,
        |  CAST((doc_id % 29 + 1) * (doc_id % 251) AS BIGINT) AS byte_sum,
        |  CAST(8 AS INT) AS feat_dim
        |FROM documents
        |ORDER BY doc_id NULLS FIRST, modality NULLS FIRST,
        |  n_bytes NULLS FIRST, byte_sum NULLS FIRST, feat_dim NULLS FIRST""".stripMargin) {
      (s, dir) =>
        implicit val sp: SparkSession = s
        import s.implicits._
        val blobs = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("lang")).as[(Long, String)]
          .map { case (id, lang) => MediaBlob(id, "audio", lang, wavFor(id)) }
        orderAll(extractFeatures(blobs, WavDecoder).toDF())
    })
}
