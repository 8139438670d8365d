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

  test("zip-slip member names are flattened to their file name") {
    val zip = makeZip(Map("../../evil.txt" -> "nope"))
    val landing = Scratch.fresh("landing")
    val out = HttpZipIngest.ingest(s"file://$zip", landing)
    assert(out == Seq(s"$landing/evil.txt"))
    assert(!Files.exists(Paths.get(landing).getParent.resolve("evil.txt")))
  }
}
