package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ClipShingle, ImageIoDecoder, MediaBlob,
  Multimodal, StubDecoder}

/** The media-decode SPI: a real javax.imageio round-trip and the
  * decoder-injection seam (two decoders through the same operator). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pngFor encodes a real PNG that ImageIO decodes to the exact raster") {
    // doc 40: 2x6 gray 40; doc 0 is the degenerate 1x1 zero image.
    val bytes = Multimodal.pngFor(40L)
    // PNG magic: a genuine codec artifact, not a fake container
    assert(bytes.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    val f = ImageIoDecoder.decode(MediaBlob(40L, "image", "en", bytes))
    assert(f == graft.operators.MediaFeatures(40L, "image", 12, 12L * 40, 2))
    val z = ImageIoDecoder.decode(
      MediaBlob(0L, "image", "en", Multimodal.pngFor(0L)))
    assert(z == graft.operators.MediaFeatures(0L, "image", 1, 0L, 1))
  }

  test("wavFor encodes a real WAVE that AudioSystem decodes to the exact PCM") {
    // doc 40: 12 frames of sample 40 at 8 kHz; doc 0 degenerates to one
    // zero frame.
    val bytes = Multimodal.wavFor(40L)
    // RIFF magic: a genuine container artifact, not a fake header
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    val f = graft.operators.WavDecoder.decode(
      MediaBlob(40L, "audio", "en", bytes))
    assert(f == graft.operators.MediaFeatures(40L, "audio", 12, 12L * 40, 8))
    val z = graft.operators.WavDecoder.decode(
      MediaBlob(0L, "audio", "en", Multimodal.wavFor(0L)))
    assert(z == graft.operators.MediaFeatures(0L, "audio", 1, 0L, 8))
  }

  test("WavCodec.open resolves the WAVE reader once; per-partition path " +
      "is output-identical to the per-blob AudioSystem path") {
    import graft.operators.{WavCodec, WavDecoder}
    val reader = WavCodec.open()
    // The resolved reader IS the JDK's RIFF/WAVE codec: a non-WAVE blob
    // must be rejected the same way AudioSystem would reject it.
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      WavCodec.pcm(reader, MediaBlob(1L, "audio", "en", Array[Byte](1, 2, 3)))
    }
    // Reader reuse across blobs (the per-partition contract): many blobs
    // through ONE resolved reader equal the one-shot decode per blob.
    for (id <- 0L until 64L) {
      val b = MediaBlob(id, "audio", "en", Multimodal.wavFor(id))
      assert(WavDecoder.decodeWith(reader, b) == WavDecoder.decode(b))
    }
  }

  test("decimateAudio fails loudly on a zero-sample WAVE (no silent NaN)") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // A structurally valid WAVE with an empty data chunk: the mean of
    // zero samples must raise per-doc, not propagate NaN downstream.
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array.emptyByteArray), fmt, 0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val blobs = Seq(MediaBlob(7L, "audio", "en", bos.toByteArray)).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decimateAudio(blobs, factor = 2).collect()
    }
    assert(e.getMessage.contains("empty PCM") ||
      Option(e.getCause).exists(_.getMessage.contains("empty PCM")))
  }

  test("ImageIoDecoder fails loudly on undecodable bytes") {
    ImageIoDecoder.open()
    intercept[IllegalArgumentException] {
      ImageIoDecoder.decode(
        MediaBlob(1L, "image", "en", Array[Byte](1, 2, 3)))
    }
  }

  test("geoTiffFor encodes a real GeoTIFF whose tags round-trip the decode") {
    // doc 40: 2x6 raster of gray 40, anchored at lon 40-180, lat 90-40.
    val bytes = Multimodal.geoTiffFor(40L)
    // TIFF magic (either byte order; the JDK writer emits big-endian
    // MM\0*): a genuine codec artifact
    val magic = bytes.take(4).toSeq
    assert(magic == Seq[Byte]('M', 'M', 0, 42) ||
      magic == Seq[Byte]('I', 'I', 42, 0), magic.toString)
    val f = graft.operators.GeoTiffDecoder.decode(
      MediaBlob(40L, "raster", "en", bytes))
    assert(f == graft.operators.GeoRasterFeatures(
      40L, "raster", 12, 12L * 40, 2, -140.0, 50.0, 0.035))
    // a plain TIFF without georeferencing must fail loudly, not return
    // fabricated coordinates
    val plain = {
      val img = new java.awt.image.BufferedImage(1, 1,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "tiff", bos)
      bos.toByteArray
    }
    intercept[IllegalArgumentException] {
      graft.operators.GeoTiffDecoder.decode(
        MediaBlob(1L, "raster", "en", plain))
    }
  }

  test("aviFor encodes a real RIFF/AVI that the chunk walk decodes exactly") {
    // doc 40: 1 frame (40%5+1=1) of 2x6 gray 40; doc 2: 3 frames of 3x3
    // with per-frame values 2,3,4 — exercises multi-frame iteration and
    // the stride-padding path (width 3 pads to a 4-byte stride).
    val bytes = Multimodal.aviFor(40L)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "AVI ")
    val f = graft.operators.AviDecoder.decode(
      MediaBlob(40L, "video", "en", bytes))
    assert(f == graft.operators.MediaFeatures(40L, "video", 12, 12L * 40, 1))
    val m = graft.operators.AviDecoder.decode(
      MediaBlob(2L, "video", "en", Multimodal.aviFor(2L)))
    assert(m == graft.operators.MediaFeatures(
      2L, "video", 27, 9L * (2 + 3 + 4), 3))
    // a truncated container (frame count lies) must fail loudly
    intercept[IllegalArgumentException] {
      graft.operators.AviDecoder.decode(
        MediaBlob(1L, "video", "en", bytes.dropRight(20)))
    }
  }

  test("regridNearest: overlapping off-grid tiles argmin deterministically") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Two 2x2 tiles, factor 2. Tile 1 anchored at (1,1) straddles all
    // four target cells around (1,1); tile 2 anchored at (1,1) too, so
    // every pixel collides and the id tie-break must pick tile 1's
    // values. Target cell (0,0) has center (0.5,0.5); of tile pixels
    // (1,1) is nearest. Cell (1,1) center (2.5,2.5): pixel (2,2) wins.
    val tiles = Seq(
      (1L, 1L, 1L, Seq(10L, 11L, 12L, 13L)),
      (2L, 1L, 1L, Seq(90L, 91L, 92L, 93L))).toDF("id", "r0", "c0", "px")
    val got = Engine.regridNearest(tiles, col("id"), col("r0"), col("c0"),
        col("px"), 2, 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (0L, 0L) -> 10L,  // pixel (1,1): val 10, beats tile 2's 90 on id
      (0L, 1L) -> 11L,  // pixel (1,2) nearest center (0.5, 2.5)
      (1L, 0L) -> 12L,  // pixel (2,1)
      (1L, 1L) -> 13L)) // pixel (2,2)
  }

  test("regridNearest: factor 1 is the identity grid on a single tile") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tiles = Seq((7L, 2L, 3L, Seq(10L, 11L, 12L, 13L)))
      .toDF("id", "r0", "c0", "px")
    val got = Engine.regridNearest(tiles, col("id"), col("r0"), col("c0"),
        col("px"), 2, 2, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((2L, 3L) -> 10L, (2L, 4L) -> 11L,
      (3L, 3L) -> 12L, (3L, 4L) -> 13L))
  }

  test("regridNearest: negative anchors bucket by FLOOR division") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // A 2x2 tile anchored at (-1,-1), factor 2: pixel (-1,-1) must land
    // in cell (-1,-1) — floor semantics — not cell (0,0) as truncating
    // div would put it. Cell (-1,-1) center is (-0.5,-0.5); its only
    // covering pixel is (-1,-1) → value 10. Cell (0,0) gets pixel (0,0).
    val tiles = Seq((1L, -1L, -1L, Seq(10L, 11L, 12L, 13L)))
      .toDF("id", "r0", "c0", "px")
    val got = Engine.regridNearest(tiles, col("id"), col("r0"), col("c0"),
        col("px"), 2, 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((-1L, -1L) -> 10L, (-1L, 0L) -> 11L,
      (0L, -1L) -> 12L, (0L, 0L) -> 13L))
  }

  test("geoTiffFor round-trips the degenerate doc-0 raster and anchor") {
    val f = graft.operators.GeoTiffDecoder.decode(
      MediaBlob(0L, "raster", "en", Multimodal.geoTiffFor(0L)))
    assert(f == graft.operators.GeoRasterFeatures(
      0L, "raster", 1, 0L, 1, -180.0, 90.0, 0.035))
  }

  test("geoTiffMultibandFor: 3-band encode round-trips pixels and tags") {
    val t = graft.operators.GeoTiffTileDecoder.decodeTile(
      graft.operators.MediaBlob(40L, "raster", "en",
        Multimodal.geoTiffMultibandFor(40L)))
    assert(t.w == 2 && t.h == 6)
    assert(t.lon0 == 100.0 && t.lat0 == 10.0 && t.scale_deg == 0.035)
    assert(t.bands.length == 3)
    for (b <- 0 until 3; y <- 0 until 6; x <- 0 until 2)
      assert(t.bands(b)(y * 2 + x) == (40 + 97 * b + 5 * y + 3 * x) % 251,
        s"band $b pixel ($x,$y)")
    // a single-band fixture decodes to one band through the same path
    val s1 = graft.operators.GeoTiffTileDecoder.decodeTile(
      graft.operators.MediaBlob(40L, "raster", "en",
        Multimodal.geoTiffFor(40L)))
    assert(s1.bands.length == 1 && s1.bands(0).forall(_ == 40))
  }

  test("extractFeatures injects either decoder through the same plumbing") {
    implicit val s = spark
    import s.implicits._
    val blobs = Seq(
      MediaBlob(7L, "image", "en", Multimodal.pngFor(7L)),
      MediaBlob(8L, "audio", "en", Array[Byte](1, 2, 3))).toDS()
    val img = Multimodal.extractFeatures(
      blobs.filter(_.modality == "image"), ImageIoDecoder).collect()
    assert(img.toSeq == Seq(
      graft.operators.MediaFeatures(7L, "image", 8, 8L * 7, 8)))
    // the codec-free stub handles the modality the JVM cannot decode
    val aud = Multimodal.extractFeatures(
      blobs.filter(_.modality == "audio"), StubDecoder).collect()
    assert(aud.toSeq == Seq(
      graft.operators.MediaFeatures(8L, "audio", 3, 6L, 4)))
  }

  test("thumbnails: NN resample reads exactly the index-mapped source pixels") {
    implicit val s = spark
    import s.implicits._
    // doc 40: 5x9 gradient. The expected 4x4 preview is computed from
    // the same index map the kernel owes us — sample (x*w/4, y*h/4) of
    // pixel (40 + 3x + 5y) mod 251; a transposed or off-by-one lookup
    // produces a different sum because the content is position-sensitive.
    val bytes = Multimodal.gradPngFor(40L)
    assert(bytes.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    val want = (for (y <- 0 until 4; x <- 0 until 4)
      yield (40L + 3 * (x * 5 / 4) + 5 * (y * 9 / 4)) % 251).sum
    val got = Multimodal.thumbnails(
      Seq(MediaBlob(40L, "image", "en", bytes)).toDS(), side = 4)
      .collect().toSeq
    assert(got == Seq(graft.operators.ThumbFeatures(
      40L, 5, 9, want, want.toDouble / 16)))
    // side=1 degenerates to the top-left pixel
    val one = Multimodal.thumbnails(
      Seq(MediaBlob(40L, "image", "en", bytes)).toDS(), side = 1)
      .collect().head
    assert(one.thumb_sum == 40L % 251 && one.thumb_mean == 40.0)
    // undecodable bytes fail loudly through the same guard as q94b
    intercept[org.apache.spark.SparkException] {
      Multimodal.thumbnails(
        Seq(MediaBlob(1L, "image", "en", Array[Byte](9, 9))).toDS(),
        side = 4).collect()
    }
  }

  test("decimateAudio: keeps exactly the stride-indexed samples of the decoded PCM") {
    implicit val s = spark
    import s.implicits._
    // doc 40: 15 gradient samples (40 + 7k) mod 251; stride 2 keeps
    // k = 0,2,…,14 — eight samples whose expected sum comes from the
    // same index map the kernel owes us. A transposed/off-by-one
    // stride produces a different sum because the signal is a gradient.
    val bytes = Multimodal.gradWavFor(40L)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    val want = (0 until 15 by 2).map(k => (40L + 7 * k) % 251).sum
    val got = Multimodal.decimateAudio(
      Seq(MediaBlob(40L, "audio", "en", bytes)).toDS(), factor = 2)
      .collect().toSeq
    assert(got == Seq(graft.operators.AudioSample(
      40L, 15, 8, want, want.toDouble / 8)))
    // factor=1 degenerates to the full decode
    val full = Multimodal.decimateAudio(
      Seq(MediaBlob(40L, "audio", "en", bytes)).toDS(), factor = 1)
      .collect().head
    assert(full.kept == 15 &&
      full.pcm_sum == (0 until 15).map(k => (40L + 7 * k) % 251).sum)
  }

  test("sampleFrames: every stride-th frame, exact per-frame means") {
    implicit val s = spark
    import s.implicits._
    // doc 7: 3 frames of constant values 7, 8, 9 — stride 2 keeps
    // frames 0 and 2; stride 1 is the full per-frame decode.
    val blob = MediaBlob(7L, "video", "en", Multimodal.aviFor(7L))
    assert(graft.operators.AviDecoder.frameMeans(blob, 1) ==
      Seq((0, 7.0), (1, 8.0), (2, 9.0)))
    val got = Multimodal.sampleFrames(Seq(blob).toDS(), stride = 2)
      .collect().toSeq
    assert(got == Seq(
      graft.operators.FrameSample(7L, 0, 7.0),
      graft.operators.FrameSample(7L, 2, 9.0)))
  }

  test("sceneChanges: wraparound jump is a boundary, smooth clip is not, " +
      "single-frame clip reports zero delta") {
    implicit val s = spark
    import s.implicits._
    // doc 249: 5 frames, means 249, 250, 0, 1, 2 — one 250-point drop
    // at the mod wrap; doc 7: 3 frames, means 7, 8, 9 — all jumps 1;
    // doc 250: a single frame — no deltas at all.
    val blobs = Seq(249L, 7L, 250L).map(id =>
      MediaBlob(id, "video", "en", Multimodal.aviFor(id))).toDS()
    val got = Multimodal.sceneChanges(blobs, threshold = 100.0)
      .collect().toSeq.sortBy(_.doc_id)
    assert(got == Seq(
      graft.operators.SceneStats(7L, 3, 0, 1.0),
      graft.operators.SceneStats(249L, 5, 1, 250.0),
      graft.operators.SceneStats(250L, 1, 0, 0.0)))
  }

  test("detectActivity: exact window energies through the real decode; " +
      "short tail discarded") {
    implicit val s = spark
    import s.implicits._
    // doc 3: n = 3%29+4 = 7 samples, values (3+7k)%251 = 3,10,17,24,
    // 31,38,45 — one complete 4-window [3,10,17,24] (energy 9+100+289
    // +576 = 974), tail [31,38,45] discarded.
    val blobs = Seq(MediaBlob(3L, "audio", "en",
      Multimodal.gradWavFor(3L))).toDS()
    val lo = Multimodal.detectActivity(blobs, window = 4, threshold = 900L)
      .collect().toSeq
    assert(lo == Seq(graft.operators.VadStats(3L, 1, 1, 974L)))
    val hi = Multimodal.detectActivity(blobs, window = 4, threshold = 974L)
      .collect().toSeq // strict >: energy == threshold is NOT active
    assert(hi == Seq(graft.operators.VadStats(3L, 1, 0, 974L)))
  }

  test("averageHashes: integer bit rule matches the fixture arithmetic, " +
    "and a pure brightness shift collides") {
    implicit val s = spark
    import s.implicits._
    // doc 40: 5x9 gradient; the expected hash replays the kernel's own
    // contract — sample (x*w/4, y*h/4) of pixel (40+3x+5y) mod 251,
    // bit i=(y*4+x) set iff v*16 > sum (strict, integer — no FP).
    def predicted(id: Long): Long = {
      val (w, h) = ((id % 13 + 4).toInt, (id % 7 + 4).toInt)
      val v = (for (y <- 0 until 4; x <- 0 until 4)
        yield (id + 3 * (x * w / 4) + 5 * (y * h / 4)) % 251).toArray
      val sum = v.sum
      v.zipWithIndex.collect { case (p, i) if p * 16 > sum => 1L << i }
        .foldLeft(0L)(_ | _)
    }
    def hashOf(id: Long): Long = Multimodal.averageHashes(
      Seq(MediaBlob(id, "image", "en", Multimodal.gradPngFor(id))).toDS(),
      side = 4).collect().head.ahash
    assert(hashOf(40L) == predicted(40L))
    // 131 = 40 + 91 (= 13*7): identical geometry class, every pixel
    // shifted by a constant 91 with no mod-251 wrap on either doc —
    // aHash's defining invariance says the fingerprints MUST collide
    assert(hashOf(131L) == hashOf(40L))
    // a geometry class with a genuinely different relief (7x4: row 0
    // already crosses the mean at x=3) produces a different bit pattern
    assert(hashOf(42L) == predicted(42L) && hashOf(42L) != hashOf(40L))
    // undecodable bytes fail loudly through the decoder-family guard
    intercept[org.apache.spark.SparkException] {
      Multimodal.averageHashes(
        Seq(MediaBlob(1L, "image", "en", Array[Byte](9, 9))).toDS(),
        side = 4).collect()
    }
  }

  test("clipShingles: every 3-frame window off the real AVI walk, " +
      "short clips yield none") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    // doc 7: n = 7%5+1 = 3 frames with means 7,8,9 -> ONE shingle
    val one = Multimodal.clipShingles(
      Seq(MediaBlob(7L, "video", "en", Multimodal.aviFor(7L))).toDS())
      .collect()
    assert(one.toSeq == Seq(ClipShingle(7L, 0, 7.0, 8.0, 9.0)))
    // doc 9: 5 frames -> shingles at 0,1,2; doc 11: 2 frames -> none
    val five = Multimodal.clipShingles(
      Seq(MediaBlob(9L, "video", "en", Multimodal.aviFor(9L))).toDS())
      .collect().sortBy(_.pos)
    assert(five.toSeq == Seq(
      ClipShingle(9L, 0, 9.0, 10.0, 11.0),
      ClipShingle(9L, 1, 10.0, 11.0, 12.0),
      ClipShingle(9L, 2, 11.0, 12.0, 13.0)))
    assert(Multimodal.clipShingles(
      Seq(MediaBlob(11L, "video", "en", Multimodal.aviFor(11L))).toDS())
      .collect().isEmpty)
  }
}
