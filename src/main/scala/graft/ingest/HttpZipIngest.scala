package graft.ingest

import java.io.{BufferedInputStream, InputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.ZipInputStream
import scala.collection.mutable.ListBuffer

/** S8: fetch a remote `.zip` and extract its member files into the landing
  * zone — the reference's ingest Cloud Function
  * (cloud-function/main.py:14-31: download :14-17, unzip + extract :25-31).
  * Driver-side utility by design: it runs before any Spark compute exists,
  * exactly like the reference's function runs before the Dataproc cluster.
  *
  * `file:` URIs are served from disk so the ingest path is testable without
  * network egress.
  *
  * Member *paths* are preserved (the reference keeps the archive layout;
  * flattening to basenames would silently overwrite same-named members from
  * different directories). Zip-slip is blocked structurally: each entry's
  * normalized target must stay under the landing root or the entry is
  * rejected.
  */
object HttpZipIngest {

  def fetch(url: String): InputStream = {
    val uri = URI.create(url)
    if (uri.getScheme == "file") {
      Files.newInputStream(Paths.get(uri))
    } else {
      val client = HttpClient.newBuilder()
        .followRedirects(HttpClient.Redirect.NORMAL).build()
      val req = HttpRequest.newBuilder(uri).GET().build()
      client.send(req, HttpResponse.BodyHandlers.ofInputStream()).body()
    }
  }

  /** Download `url`, unzip, write every member file under `landingDir`
    * keeping the member's relative path. Returns the extracted paths.
    * Throws on entries that would escape the landing root (zip-slip) —
    * corrupt-or-hostile archives should fail the ingest task loudly, not
    * half-extract.
    */
  def ingest(url: String, landingDir: String): Seq[String] = {
    val outRoot = Paths.get(landingDir).toAbsolutePath.normalize()
    Files.createDirectories(outRoot)
    val extracted = ListBuffer.empty[String]
    val zin = new ZipInputStream(new BufferedInputStream(fetch(url)))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) {
          val target: Path = outRoot.resolve(entry.getName).normalize()
          require(target.startsWith(outRoot),
            s"zip entry escapes landing root: ${entry.getName}")
          Files.createDirectories(target.getParent)
          Files.copy(zin, target, StandardCopyOption.REPLACE_EXISTING)
          extracted += target.toString
        }
        zin.closeEntry()
        entry = zin.getNextEntry
      }
    } finally zin.close()
    extracted.toList
  }
}
