package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite {

  test("cluster envelope carries the reference's execution knobs") {
    val e = Sessions.clusterEnvelope
    assert(e("spark.dynamicAllocation.enabled") == "true")
    assert(e("spark.shuffle.service.enabled") == "true")
    assert(e("spark.sql.adaptive.coalescePartitions.minPartitionNum") == "1")
    assert(e("spark.sql.adaptive.coalescePartitions.initialPartitionNum") == "10")
    // reference executor sizing (etl-on-gcp-vinicius-campos.py:81-83)
    assert(e("spark.dynamicAllocation.minExecutors") == "5")
    assert(e("spark.dynamicAllocation.initialExecutors") == "10")
    assert(e("spark.dynamicAllocation.maxExecutors") == "30")
  }

  test("local session runs with AQE + nanos + sized codegen cache") {
    val s = SparkSpec.session // shared spec session, built via withDefaults
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(s.conf.get("spark.sql.codegen.cache.maxEntries") == "5000")
    assert(s.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold") == "65536")
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
  }

  test("cluster builder composes without clobbering the base defaults") {
    val b = Sessions.cluster(SparkSession.builder())
    // the Builder keeps its pending configs in a (private) options map;
    // read it reflectively so the composition is actually verified
    def fields(c: Class[_]): Seq[java.lang.reflect.Field] =
      if (c == null) Nil else c.getDeclaredFields.toSeq ++ fields(c.getSuperclass)
    val f = fields(b.getClass).find(_.getName.endsWith("options"))
      .getOrElse(fail("Builder options field not found"))
    f.setAccessible(true)
    val opts = f.get(b).asInstanceOf[scala.collection.mutable.HashMap[String, String]]
    Sessions.clusterEnvelope.foreach { case (k, v) =>
      assert(opts.get(k).contains(v), s"cluster knob $k")
    }
    // base withDefaults settings must survive the envelope fold
    assert(opts.get("spark.sql.session.timeZone").contains("UTC"))
    assert(opts.get("spark.sql.adaptive.enabled").contains("true"))
  }
}
