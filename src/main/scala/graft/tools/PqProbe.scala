package graft.tools

import graft.Sessions
import graft.operators.Similarity

/** Dev probe: print trained PQ codebooks with full double precision for
  * cross-engine comparison.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local("8", "pq-probe")
    val e = graft.model.Tables.load(spark, sfDir, "embeddings")
    val cbs = Similarity.pqTrain(e, "vec_id", "embedding", m = 2, k = 4, iters = 1)
    cbs.zipWithIndex.foreach { case (cb, j) =>
      cb.zipWithIndex.foreach { case (cv, cid) =>
        println(s"CB $j $cid " + cv.map(d => f"$d%.17g").mkString(","))
      }
    }
    spark.stop()
  }
}
