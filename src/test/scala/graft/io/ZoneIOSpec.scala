package graft.io

import graft.{Scratch, SparkSpec}
import graft.model.{Format, Zone}
import org.apache.spark.sql.functions._

class ZoneIOSpec extends SparkSpec {

  private def lineitem = spark.read.parquet(sf("lineitem"))

  private def roundTrip(fmt: Format): Unit = {
    val dir = Scratch.fresh(s"rt-${fmt.name}")
    val in = lineitem.limit(500)
    Writers.write(in, fmt, dir)
    val back = Readers.read(spark, fmt, dir)
    assert(back.count() == 500)
    assert(back.columns.sorted.sameElements(in.columns.sorted))
  }

  test("parquet round-trip preserves rows and schema (S2/S3)") {
    val dir = Scratch.fresh("rt-parquet")
    Writers.write(lineitem, Format.Parquet, dir)
    val back = Readers.read(spark, Format.Parquet, dir)
    assert(back.count() == lineitem.count())
    assert(back.schema == lineitem.schema)
  }

  test("avro round-trip preserves rows, columns and timestamp values (S4)") {
    val dir = Scratch.fresh("rt-avro")
    Writers.write(lineitem, Format.Avro, dir)
    val back = Readers.read(spark, Format.Avro, dir)
    assert(back.count() == lineitem.count())
    // avro surfaces the value as TIMESTAMP_NTZ; compare wall-clock rendering
    val a = lineitem.agg(date_format(max("l_shipdate"), "yyyy-MM-dd HH:mm:ss"))
      .head.getString(0)
    val b = back.agg(date_format(max("l_shipdate"), "yyyy-MM-dd HH:mm:ss"))
      .head.getString(0)
    assert(a == b, "timestamp survived avro round-trip")
  }

  test("json write + inferred-schema read round-trips row count (S1)") {
    roundTrip(Format.Json)
  }

  test("orc round-trip") { roundTrip(Format.Orc) }

  test("overwrite mode truncates, not appends") {
    val dir = Scratch.fresh("rt-overwrite")
    Writers.write(lineitem.limit(100), Format.Parquet, dir)
    Writers.write(lineitem.limit(40), Format.Parquet, dir)
    assert(Readers.read(spark, Format.Parquet, dir).count() == 40)
  }

  test("glob read unions matching files (S2 glob semantics)") {
    val dir = Scratch.fresh("rt-glob")
    lineitem.limit(10).write.parquet(s"$dir/a")
    lineitem.limit(5).write.parquet(s"$dir/b")
    val n = spark.read.parquet(s"$dir/*/*.parquet").count()
    assert(n == 15)
  }

  test("loadTable truncate-loads a warehouse table (S9)") {
    val dir = Scratch.fresh("rt-table")
    val z = Zone(dir, Format.Avro)
    Writers.zone(lineitem.limit(25), z)
    Writers.loadTable(spark, z, "", "graft_test", "t1")
    assert(spark.table("graft_test.t1").count() == 25)
    Writers.zone(lineitem.limit(7), z)
    Writers.loadTable(spark, z, "", "graft_test", "t1")
    assert(spark.table("graft_test.t1").count() == 7)
  }
}
