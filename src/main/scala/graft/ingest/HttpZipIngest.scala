package graft.ingest

import java.io.{BufferedInputStream, FileOutputStream, InputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
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

  /** Download `url`, unzip, write every member file under `landingDir`.
    * Returns the extracted paths. Member names are sanitized against
    * zip-slip (the reference extracts blindly; we don't cargo-cult that).
    */
  def ingest(url: String, landingDir: String): Seq[String] = {
    val outRoot = Paths.get(landingDir)
    Files.createDirectories(outRoot)
    val extracted = ListBuffer.empty[String]
    val zin = new ZipInputStream(new BufferedInputStream(fetch(url)))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) {
          val name = Paths.get(entry.getName).getFileName.toString
          val target = outRoot.resolve(name)
          val out = new FileOutputStream(target.toFile)
          try zin.transferTo(out) finally out.close()
          extracted += target.toString
        }
        zin.closeEntry()
        entry = zin.getNextEntry
      }
    } finally zin.close()
    extracted.toList
  }
}
