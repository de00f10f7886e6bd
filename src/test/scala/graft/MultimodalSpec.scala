package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ImageIoDecoder, MediaBlob, Multimodal, StubDecoder}

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

  test("ImageIoDecoder fails loudly on undecodable bytes") {
    ImageIoDecoder.open()
    intercept[IllegalArgumentException] {
      ImageIoDecoder.decode(
        MediaBlob(1L, "image", "en", Array[Byte](1, 2, 3)))
    }
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
}
