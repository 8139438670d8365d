package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some("en"), Some("hello world")),
    (2L, Some("de"), Some("hallo welt")),
    (3L, None, Some("no lang")),
    (4L, Some("en"), None))

  test("fingerprint is invariant to row order and partitioning") {
    val a = rows.toDF("id", "lang", "text")
    val b = rows.reverse.toDF("id", "lang", "text").repartition(7)
    val fa = Integrity.fingerprint(a, Seq("id", "lang", "text")).collect()
    val fb = Integrity.fingerprint(b, Seq("id", "lang", "text")).collect()
    assert(fa.sameElements(fb))
    assert(fa.head.getLong(0) == 4L)
  }

  test("any single-row change moves the checksum") {
    val base = rows.toDF("id", "lang", "text")
    val mut = rows.updated(1, (2L, Some("de"), Some("hallo Welt")))
      .toDF("id", "lang", "text")
    val fa = Integrity.fingerprint(base, Seq("id", "lang", "text")).collect().head
    val fb = Integrity.fingerprint(mut, Seq("id", "lang", "text")).collect().head
    assert(fa.getLong(0) == fb.getLong(0))
    assert(fa.getDecimal(1) != fb.getDecimal(1) ||
      fa.getDecimal(2) != fb.getDecimal(2))
  }

  test("null and empty string do not collide; null column position matters") {
    val x = Seq((1L, Some(""), Some("t"))).toDF("id", "lang", "text")
    val y = Seq((1L, Option.empty[String], Some("t"))).toDF("id", "lang", "text")
    val fx = Integrity.fingerprint(x, Seq("id", "lang", "text")).collect().head
    val fy = Integrity.fingerprint(y, Seq("id", "lang", "text")).collect().head
    assert(fx.getDecimal(1) != fy.getDecimal(1))
    val p = Seq((Some("a"), Option.empty[String])).toDF("u", "v")
    val q = Seq((Option.empty[String], Some("a"))).toDF("u", "v")
    assert(Integrity.fingerprint(p, Seq("u", "v")).collect().head.getDecimal(1) !=
      Integrity.fingerprint(q, Seq("u", "v")).collect().head.getDecimal(1))
  }

  test("fingerprintBy groups agree with per-group fingerprint") {
    val df = rows.toDF("id", "lang", "text")
    val by = Integrity.fingerprintBy(df, Seq("lang"), Seq("id", "text"))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getDecimal(2), r.getDecimal(3))).toMap
    assert(by.keySet == Set(Some("en"), Some("de"), None))
    val en = Integrity.fingerprint(
      df.filter(col("lang") === "en"), Seq("id", "text")).collect().head
    assert(by(Some("en")) == ((en.getLong(0), en.getDecimal(1), en.getDecimal(2))))
    assert(by(Some("en"))._1 == 2L)
  }

  test("reconcileColumns: per-column drift counts; null-safe compare") {
    val before = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("b"), Some(20L)),
      (3L, Some("c"), None), (4L, None, Some(40L))).toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("a"), Some(10L)),      // identical
      (2L, Some("B"), Some(20L)),      // s drifted
      (3L, Some("c"), Some(30L)),      // v null -> value
      (5L, Some("e"), Some(50L))).toDF("k", "s", "v") // insert; 4 deleted
    val out = Integrity.reconcileColumns(before, after, Seq("k"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("s") == (("s", 3L, 1L, 1L, 1L)))
    assert(out("v") == (("v", 3L, 1L, 1L, 1L)))
    // Null == null counts as agreement, not drift (k=4 is only_before
    // so its null never reaches the mismatch term).
    assert(out.keySet == Set("s", "v"))
  }

  test("reconcileColumns: identical snapshots report zero drift") {
    val df = Seq((1L, "x", 1L), (2L, "y", 2L)).toDF("k", "s", "v")
    val out = Integrity.reconcileColumns(df, df, Seq("k"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toSet == Set(("s", 2L, 0L, 0L, 0L), ("v", 2L, 0L, 0L, 0L)))
  }

  test("fkOrphans: orphans vs null keys counted separately") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Integrity.fkOrphans(child, "fk", parent, "pk", "c->p")
      .as[(String, Long, Long, Long)].head()
    // 5 child rows; one null key; one (9) orphan; duplicates of 1 both hit.
    assert(out == (("c->p", 5L, 1L, 1L)))
    // Duplicate parent keys must not multiply child rows.
    val dupParent = Seq(1L, 1L, 2L, 3L, 3L).toDF("pk")
    val out2 = Integrity.fkOrphans(child, "fk", dupParent, "pk", "c->p")
      .as[(String, Long, Long, Long)].head()
    assert(out2 == (("c->p", 5L, 1L, 1L)))
  }

  test("empty inputs report zeros, not null counts") {
    val empty = Seq.empty[(Long, String)].toDF("k", "s")
    val rec = Integrity.reconcileColumns(empty, empty, Seq("k"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(rec == Set(("s", 0L, 0L, 0L, 0L)))
    val fk = Integrity.fkOrphans(empty, "k",
        Seq.empty[Long].toDF("pk"), "pk", "e->e")
      .as[(String, Long, Long, Long)].head()
    assert(fk == (("e->e", 0L, 0L, 0L)))
  }
}
