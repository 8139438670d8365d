package graft.tools

import org.apache.spark.sql.functions._
import graft.{Scratch, Sessions}
import graft.model.Tables
import graft.operators.{Dedup, TextOps}

/** Dev tool: phase-level timing + plan dumps for the heavy near-dup
  * operators. Not part of the driver contract.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")

    val sh = Dedup.shingleSet(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingleSet")(println("  rows=" + sh.count()))

    val sigCols = (0 until 16).map(j =>
      min(md5(concat(lit(s"$j|"), col("shingle")))).as(s"m$j"))
    val sig = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("signatures")(println("  rows=" + sig.count()))

    val bandDf = (0 until 4).map { b =>
      val cols = (b * 4 until (b + 1) * 4).map(j => col(s"m$j").cast("string"))
      sig.select(col("doc_id"), lit(b).as("band"),
        md5(concat_ws("|", cols: _*)).as("bh"))
    }.reduce(_ unionAll _).persist()
    time("bands")(println("  rows=" + bandDf.count()))

    val cand = bandDf.as("x").join(bandDf.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db")).distinct()
      .persist()
    time("candidates")(println("  rows=" + cand.count()))

    val docsIn = cand.select(col("da").as("doc_id"))
      .union(cand.select(col("db"))).distinct().persist()
    time("candidate docs")(println("  rows=" + docsIn.count()))

    val shc = sh.join(docsIn, "doc_id").persist()
    time("restricted shingles")(println("  rows=" + shc.count()))

    val inter = shc.as("a").join(shc.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("ni"))
    time("intersections")(println("  rows=" + inter.count()))

    time("full minHashLsh")(println("  rows=" +
      Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.8, portable = true)
        .count()))
    spark.stop()
  }
}
