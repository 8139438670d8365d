package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Sessions

/** One-off probe: does this Spark build support WITH RECURSIVE and the
  * VARIANT type on the SQL surface? (Local iteration only; not shipped
  * behavior.)
  */
object FeatureProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.withDefaults(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def probe(name: String)(body: => Unit): Unit =
      try { body; println(s"PROBE $name OK") }
      catch { case e: Throwable =>
        println(s"PROBE $name FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }

    probe("recursive_cte") {
      val rows = spark.sql(
        """WITH RECURSIVE r(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM r WHERE n < 5
          |) SELECT sum(n) AS s FROM r""".stripMargin).collect()
      require(rows.head.getLong(0) == 15L, s"got ${rows.head}")
    }

    probe("variant") {
      val rows = spark.sql(
        """SELECT variant_get(parse_json('{"a": {"b": 7}, "c": [1,2,3]}'), '$.a.b', 'int') AS v,
          |       variant_get(parse_json('{"a": {"b": 7}, "c": [1,2,3]}'), '$.c[1]', 'int') AS w""".stripMargin).collect()
      require(rows.head.getInt(0) == 7 && rows.head.getInt(1) == 2, s"got ${rows.head}")
    }

    probe("try_variant_schema") {
      spark.sql("SELECT schema_of_variant(parse_json('{\"a\":1}')) AS s").show(false)
    }

    spark.stop()
  }
}
