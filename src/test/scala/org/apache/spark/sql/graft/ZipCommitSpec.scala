package org.apache.spark.sql.graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.spark.util.SerializableConfiguration
import org.scalatest.funsuite.AnyFunSuite

/** FileSystem whose rename always REPORTS failure without throwing —
  * exactly what HDFS does when the destination already exists. Local-FS
  * tests can't reproduce that natively (POSIX rename overwrites), so the
  * commit loop's loud-failure contract is driven through this wrapper.
  */
class RenameRefusingFs extends RawLocalFileSystem {
  override def getScheme: String = "norename"
  override def getUri: URI = URI.create("norename:///")
  override def rename(src: Path, dst: Path): Boolean = false
}

class ZipCommitSpec extends AnyFunSuite {

  test("commit aborts loudly when fs.rename reports failure (HDFS semantics)") {
    val dir = graft.Scratch.fresh("zipcommit")
    val tmp = java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, "tmp-0.zip"))
    val conf = new Configuration()
    conf.set("fs.norename.impl", classOf[RenameRefusingFs].getName)
    conf.setBoolean("fs.norename.impl.disable.cache", true)
    val write = new ZipBatchWrite(s"norename://$dir", 0, 1,
      truncate = false, queryId = "q-test",
      conf = new SerializableConfiguration(conf))
    val ex = intercept[java.io.IOException] {
      write.commit(Array(ZipCommitMessage(s"norename://$tmp", 0)))
    }
    assert(ex.getMessage.contains("rename"))
    assert(ex.getMessage.contains("q-test"), // dest name embeds the queryId
      s"commit error should name the destination: ${ex.getMessage}")
  }

  test("abort deletes the partition's tmp archive") {
    val dir = graft.Scratch.fresh("zipabort")
    val tmp = java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, "tmp-0.zip"))
    val write = new ZipBatchWrite(dir, 0, 1,
      truncate = false, queryId = "q-test",
      conf = new SerializableConfiguration(new Configuration()))
    write.abort(Array(ZipCommitMessage(tmp.toString, 0)))
    assert(!java.nio.file.Files.exists(tmp))
  }
}
