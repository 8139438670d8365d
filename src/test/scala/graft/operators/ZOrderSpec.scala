package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known values)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 10).as("z"))
      .as[Long].collect().toSeq
    // z(3,5) = x bits {0,1} -> positions 0,2 ; y bits {0,2} -> positions 1,5
    assert(out == Seq(0L, 1L, 2L, 3L, 1L + 4L + 2L + 32L))
  }

  test("zValue is codegen'd projection — no exchange, no udf") {
    val df = spark.read.parquet(sf("lineitem"))
      .select(ZOrder.zValue(col("l_partkey") % 1024, col("l_suppkey") % 1024, 10))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"))
  }

  test("z-range buckets bound BOTH key ranges (the skipping property)") {
    // Fixing the top 2 z-bits of each dimension (bucket = z >> 16) caps
    // every bucket's px and sy spread at 2^8 - 1 = 255 for 10-bit keys.
    val spread = spark.read.parquet(sf("lineitem"))
      .select((col("l_partkey") % 1024).as("px"), (col("l_suppkey") % 1024).as("sy"))
      .withColumn("z", ZOrder.zValue(col("px"), col("sy"), 10))
      .groupBy(shiftright(col("z"), 16))
      .agg((max("px") - min("px")).as("dx"), (max("sy") - min("sy")).as("dy"))
      .agg(max(greatest(col("dx"), col("dy"))))
      .as[Long].head()
    assert(spread <= 255L, s"bucket key-spread $spread")
  }

  test("cluster range-partitions by z and sorts within partitions") {
    val li = spark.read.parquet(sf("lineitem"))
    val out = ZOrder.cluster(li, "l_partkey", "l_suppkey", bits = 10, files = 4)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.count() == li.count())
    // each partition's rows are z-sorted
    val zs = out
      .select(ZOrder.zValue(col("l_partkey") % 1024, col("l_suppkey") % 1024, 10)
        .as("z"))
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect()
    zs.foreach(p => assert(p == p.sorted))
  }
  test("hilbertIndex: bijective and unit-step on the 8x8 grid") {
    val cells = for { x <- 0 until 8; y <- 0 until 8 } yield (x.toLong, y.toLong)
    val out = cells.toDF("x", "y")
      .withColumn("d", ZOrder.hilbertIndex(col("x"), col("y"), bits = 3))
      .select("d", "x", "y").as[(Long, Long, Long)].collect().sortBy(_._1)
    // bijection onto 0..63
    assert(out.map(_._1).toSeq == (0L until 64L))
    // the defining Hilbert property: consecutive indices are grid neighbors
    out.sliding(2).foreach { case Array((_, x0, y0), (_, x1, y1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1)
    }
  }

}
