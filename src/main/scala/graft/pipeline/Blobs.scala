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

/** Production A7 transport: authenticated streaming HTTP download of a
  * product archive — `utils/eumdacapi.py:73-87` re-expressed over the
  * JDK `java.net.http.HttpClient` (no added dependency; the sandbox has
  * no egress, so PipelineSpec exercises it against an in-process stub
  * server).
  *
  * Auth is the OAuth2 client-credentials exchange the reference delegates
  * to its SDK (`eumdacapi.py:26-28`): [[open]] POSTs the consumer
  * key/secret to `<base>/token` once per PARTITION and caches the bearer
  * token for every fetch on that partition — never one exchange per blob
  * (the [[BlobFetcher.open]] contract; same once-per-partition shape as
  * the decoder SPI). The client/token are `@transient`: the case class
  * ships its four config strings to the executor and each task rebuilds
  * its transport locally.
  */
final case class HttpBlobFetcher(baseUrl: String, collection: String,
    consumerKey: String, consumerSecret: String) extends BlobFetcher {
  import java.net.URI
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}
  import java.nio.charset.StandardCharsets.UTF_8

  @transient private var client: HttpClient = _
  @transient private var bearer: String = _

  override def open(): Unit = {
    client = HttpClient.newHttpClient()
    val basic = java.util.Base64.getEncoder.encodeToString(
      s"$consumerKey:$consumerSecret".getBytes(UTF_8))
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"$baseUrl/token"))
        .header("Authorization", s"Basic $basic")
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(
          "grant_type=client_credentials"))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"token exchange failed: HTTP ${resp.statusCode()}")
    bearer = "\"access_token\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(resp.body()).map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        "token response carried no access_token"))
  }

  override def fetch(identifier: String): Array[Byte] =
    fetchNamed(identifier)._2

  /** Streaming GET of one product; returns (served filename, bytes).
    * Mirrors the reference's download contract: raise on non-2xx
    * (`eumdacapi.py:80`), filename recovered from the
    * `Content-Disposition` header via `filename="(.*?)"`
    * (`eumdacapi.py:70-71,81-83`), body consumed as a stream (the
    * response is never buffered by the HTTP layer; it drains straight
    * into the archive bytes the SPI hands to [[Blobs.unzip]]). */
  def fetchNamed(identifier: String): (String, Array[Byte]) = {
    // Path-segment encoding of the collection id (eumdacapi.py:75):
    // URLEncoder is form-encoding, so space must be %20, not '+'.
    val enc = java.net.URLEncoder.encode(collection, "UTF-8")
      .replace("+", "%20")
    val url = s"$baseUrl/collections/$enc/products/$identifier"
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .header("Authorization", s"Bearer $bearer").GET().build(),
      HttpResponse.BodyHandlers.ofInputStream())
    require(resp.statusCode() / 100 == 2,
      s"download failed: HTTP ${resp.statusCode()} for $url")
    val cd = resp.headers().firstValue("Content-Disposition").orElse("")
    val name = "filename=\"(.*?)\"".r.findFirstMatchIn(cd).map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"no Content-Disposition filename for $identifier"))
    val in = resp.body()
    try (name, in.readAllBytes()) finally in.close()
  }
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
