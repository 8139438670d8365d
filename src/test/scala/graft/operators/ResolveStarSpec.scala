package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force equivalence for the star-contraction resolveClusters
  * (round 12): on randomized graphs and the adversarial shapes that made
  * the old pointer-jumping loop slow, the engine's labels must equal a
  * local union-find's component-min ground truth exactly.
  */
class ResolveStarSpec extends SparkSpec {
  import spark.implicits._

  /** Union-find ground truth: component min per node. */
  private def groundTruth(nodes: Seq[Long],
                          edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val par = scala.collection.mutable.Map(nodes.map(v => v -> v): _*)
    def find(x0: Long): Long = {
      var x = x0
      while (par(x) != x) { par(x) = par(par(x)); x = par(x) }
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) par(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(v => v -> find(v)).toMap
  }

  private def resolve(nodes: Seq[Long],
                      edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.resolveClusters(nodes.toDF("doc_id"), "doc_id",
        edges.toDF("da", "db"))
      .as[(Long, Long)].collect().toMap

  test("randomized graphs replay the union-find ground truth exactly") {
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { _ =>
      val n = 2 + rnd.nextInt(60)
      val nodes = rnd.shuffle((0L until 100000L).toVector).take(n)
      val m = rnd.nextInt(2 * n + 1)
      val edges = (0 until m).map { _ =>
        val a = nodes(rnd.nextInt(n)); val b = nodes(rnd.nextInt(n))
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      assert(resolve(nodes, edges) == groundTruth(nodes, edges))
    }
  }

  test("adversarial paths: increasing, decreasing, shuffled ids") {
    val l = 120
    val inc = (10L until (10L + l)).toVector
    val dec = inc.reverse
    val shuf = new scala.util.Random(11).shuffle(inc)
    Seq(inc, dec, shuf).foreach { ids =>
      val edges = ids.sliding(2).map(p =>
        (math.min(p(0), p(1)), math.max(p(0), p(1)))).toSeq
      val got = resolve(ids, edges)
      assert(got == groundTruth(ids, edges))
      assert(got.values.toSet == Set(10L), "one component, min-id label")
    }
  }

  test("duplicate and self pairs are harmless; empty pair set is all singletons") {
    val nodes = Seq(3L, 1L, 2L)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L))
    assert(resolve(nodes, edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    assert(resolve(nodes, Seq.empty) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("two stars sharing nothing stay separate; bridged they merge to the global min") {
    val nodes = (1L to 10L)
    val starA = (2L to 5L).map(v => (1L, v))
    val starB = (7L to 10L).map(v => (6L, v))
    val got = resolve(nodes, starA ++ starB)
    assert(got == groundTruth(nodes, starA ++ starB))
    val bridged = starA ++ starB :+ ((5L, 7L))
    val got2 = resolve(nodes, bridged)
    assert(got2.values.toSet == Set(1L))
  }
}
