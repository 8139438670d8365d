package graft.ingest

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.Scratch
import org.scalatest.funsuite.AnyFunSuite

class HttpZipIngestSpec extends AnyFunSuite {

  private def makeZip(entries: Map[String, String]): String = {
    val dir = Scratch.fresh("zip")
    val path = s"$dir/payload.zip"
    val zout = new ZipOutputStream(new FileOutputStream(path))
    entries.foreach { case (name, content) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    zout.close()
    path
  }

  test("extracts zip members into the landing dir (S8)") {
    val zip = makeZip(Map(
      "airport-codes.json" -> """{"ident":"00A","type":"heliport"}""",
      "extra/readme.txt" -> "hello"))
    val landing = Scratch.fresh("landing")
    val out = HttpZipIngest.ingest(s"file://$zip", landing)
    assert(out.size == 2)
    val json = Files.readString(Paths.get(s"$landing/airport-codes.json"))
    assert(json.contains("heliport"))
  }

  test("member paths are preserved — same basename in two dirs is no loss") {
    val zip = makeZip(Map(
      "a/data.json" -> """{"v":1}""",
      "b/data.json" -> """{"v":2}"""))
    val landing = Scratch.fresh("landing")
    val out = HttpZipIngest.ingest(s"file://$zip", landing)
    assert(out.toSet == Set(s"$landing/a/data.json", s"$landing/b/data.json"))
    assert(Files.readString(Paths.get(s"$landing/a/data.json")).contains("1"))
    assert(Files.readString(Paths.get(s"$landing/b/data.json")).contains("2"))
  }

  test("real http:// fetch+extract via a loopback server (S8 end-to-end)") {
    // The gated DAG exercises S8 over file://; this drives the actual
    // network branch (HttpClient GET) the way the reference's cloud
    // function does (cloud-function/main.py:14-17) — against an
    // in-process loopback server, so it runs with zero egress.
    val zip = makeZip(Map(
      "airport-codes.json" -> """{"ident":"00A","type":"heliport"}""",
      "nested/extra.txt" -> "over http"))
    val bytes = Files.readAllBytes(Paths.get(zip))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext("/data.zip",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          ex.getResponseHeaders.add("Content-Type", "application/zip")
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        })
      server.start()
      val port = server.getAddress.getPort
      val landing = Scratch.fresh("landing")
      val out = HttpZipIngest.ingest(
        s"http://127.0.0.1:$port/data.zip", landing)
      assert(out.size == 2)
      assert(Files.readString(Paths.get(s"$landing/airport-codes.json"))
        .contains("heliport"))
      assert(Files.readString(Paths.get(s"$landing/nested/extra.txt"))
        == "over http")
    } finally server.stop(0)
  }

  test("zip-slip members are rejected, nothing escapes the landing root") {
    val zip = makeZip(Map("../../evil.txt" -> "nope"))
    val landing = Scratch.fresh("landing")
    intercept[IllegalArgumentException] {
      HttpZipIngest.ingest(s"file://$zip", landing)
    }
    assert(!Files.exists(Paths.get(landing).getParent.resolve("evil.txt")))
    assert(!Files.exists(
      Paths.get(landing).getParent.getParent.resolve("evil.txt")))
  }
}
