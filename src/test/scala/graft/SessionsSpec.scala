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
  }

  test("local session runs with AQE + nanos + sized codegen cache") {
    val s = SparkSpec.session // shared spec session, built via withDefaults
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(s.conf.get("spark.sql.codegen.cache.maxEntries") == "5000")
    assert(s.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold") == "262144")
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
  }

  test("cluster builder composes without clobbering the base defaults") {
    val b = Sessions.cluster(SparkSession.builder())
    // builder is opaque; the composition contract is what we assert: the
    // same builder instance chains (no exception, fluent type)
    assert(b.isInstanceOf[SparkSession.Builder])
  }
}
