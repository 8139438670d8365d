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
