package graft.pipeline

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{Dataset, SparkSession}

/** Transport SPI for the reference's product-download path
  * (`utils/eumdacapi.py:73-87`: authenticated HTTP GET of a product
  * archive). The sandbox has no network egress, so the HTTP transport
  * cannot be exercised here; the seam mirrors [[graft.operators.MediaDecoder]]:
  * a real deployment injects an HTTP client, tests inject
  * [[LocalDirFetcher]]. `open()` runs once per partition — connection
  * pools / auth tokens live there, never per blob.
  */
trait BlobFetcher extends Serializable {
  def open(): Unit = ()
  /** Fetch the raw archive bytes for one product identifier. */
  def fetch(identifier: String): Array[Byte]
}

/** Test/stage transport: reads `<dir>/<identifier>.zip` from a shared
  * filesystem (the "already-downloaded" layout). */
final case class LocalDirFetcher(dir: String) extends BlobFetcher {
  override def fetch(identifier: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, s"$identifier.zip"))
}

/** One decompressed archive member. */
final case class BlobEntry(identifier: String, entry: String,
    content: Array[Byte])

object Blobs {

  /** Zip decode (`sources/meteosat.py:130-142` — the reference unzips each
    * downloaded product before decoding). Pure-JDK `java.util.zip`,
    * streamed from memory; directories are skipped. */
  def unzip(identifier: String, bytes: Array[Byte]): Seq[BlobEntry] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .filterNot(_.isDirectory)
        .map(e => BlobEntry(identifier, e.getName, zin.readAllBytes()))
        .toVector
    } finally zin.close()
  }

  /** Distributed fetch + decompress: one transport per partition, entries
    * streamed out (no driver-side download — the reference's single-node
    * `download_data` loop becomes an executor-parallel map). At scale the
    * identifier set is one row per matched product per slot, so the fan-out
    * is bounded by the catalog, not the data volume. */
  def fetchAndExplode(ids: Dataset[String], fetcher: BlobFetcher)(
      implicit s: SparkSession): Dataset[BlobEntry] = {
    import s.implicits._
    ids.mapPartitions { it =>
      fetcher.open()
      it.flatMap(id => unzip(id, fetcher.fetch(id)))
    }
  }
}
