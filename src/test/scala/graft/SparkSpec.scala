package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. One session per JVM (all suites share the
  * forked test JVM), few cores, UI off — spec speed over parallelism.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  protected def sf(name: String): String =
    s"/root/testdata/sf0.001/$name.parquet"
}

object SparkSpec {
  lazy val session: SparkSession = Sessions.local(cores = "4", app = "graft-test")
}
