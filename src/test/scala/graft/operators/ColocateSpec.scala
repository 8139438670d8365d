package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColocateSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange; unbucketed tables shuffle") {
    val li = spark.read.parquet(sf("lineitem"))
    val o = spark.read.parquet(sf("orders"))
    Colocate.writeBucketed(li, "graft_test", "li_b", Seq("l_orderkey"), 8)
    Colocate.writeBucketed(
      o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "graft_test", "o_b", Seq("l_orderkey"), 8)

    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // let AQE finalize the plan
      df.queryExecution.executedPlan.toString
        .linesIterator
        .count(l => l.contains("Exchange") && !l.contains("Broadcast"))
    }

    // force merge joins so the comparison isolates bucketing (both sides
    // would otherwise broadcast at this scale)
    val bucketed = spark.table("graft_test.li_b")
      .join(spark.table("graft_test.o_b").hint("merge"), "l_orderkey")
      .groupBy().count()
    val plain = li
      .join(o.withColumnRenamed("o_orderkey", "l_orderkey").hint("merge"),
        "l_orderkey")
      .groupBy().count()
    // the bucketed merge join reads pre-partitioned, pre-sorted buckets: its
    // join needs no shuffle at all, only the final agg exchange remains
    assert(shuffles(bucketed) < shuffles(plain),
      s"bucketed=${shuffles(bucketed)} plain=${shuffles(plain)}")

    val a = spark.table("graft_test.li_b")
      .join(spark.table("graft_test.o_b"), "l_orderkey").count()
    val b = li.join(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "l_orderkey").count()
    assert(a == b, "bucketed join returns identical results")
  }

  test("saltedJoin equals the plain join on skewed data") {
    // heavily skewed: 90% of rows share one key
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong else 7L, s"v$i")).toDF("k", "payload")
    val small = Seq((7L, "hot"), (20L, "cold"), (999L, "never")).toDF("k", "tag")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "tag").as[(Long, String, String)]
      .collect().sorted.toSeq
    val salted = Colocate.saltedJoin(big, small, Seq("k"), factor = 8)
      .select("k", "payload", "tag").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == 7L) == 1800)
  }
}
