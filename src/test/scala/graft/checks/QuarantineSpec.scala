package graft.checks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    "pos" -> (col("v") > 0),
    "small" -> (col("v") < 100))

  test("valid/quarantined partition the input; reasons name violated rules") {
    val df = Seq((1L, Some(5)), (2L, Some(-3)), (3L, Some(500)),
      (4L, None: Option[Int])).toDF("id", "v")
    val ok = Quarantine.valid(df, rules).select("id").as[Long].collect().toSet
    assert(ok == Set(1L))
    val bad = Quarantine.quarantined(df, rules)
      .select(col("id"), col("reasons"))
      .as[(Long, Seq[String])].collect().toMap
    assert(bad.keySet == Set(2L, 3L, 4L))
    assert(bad(2L) == Seq("pos"))
    assert(bad(3L) == Seq("small"))
    // null comparisons are violations of BOTH rules — unknowns never pass
    assert(bad(4L) == Seq("pos", "small"))
    assert(ok.size + bad.size == 4)
  }

  test("audit counts per rule (zeros kept) plus the __valid row") {
    val df = Seq(1, 2, 300, -4).toDF("v")
    val a = Quarantine.audit(df, rules :+ ("never_fails" -> lit(true)))
      .as[(String, Long)].collect().toMap
    assert(a == Map("pos" -> 1L, "small" -> 1L, "never_fails" -> 0L,
      "__valid" -> 2L))
  }
}
