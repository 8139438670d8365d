package graft.checks

import org.apache.spark.sql.SparkSession

/** R5: boolean data-quality gate with BigQueryCheckOperator semantics
  * (reference k8s/dags/etl-gcp-vinicius-campos.py:144-155): run the SQL,
  * pass iff the FIRST row exists and every value in it is truthy —
  * non-null, non-zero, non-empty-string, not false.
  */
final case class Check(name: String, sql: String) {

  def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case n: Number => n.doubleValue() != 0.0
    case s: String => s.nonEmpty
    case _ => true
  }

  def run(spark: SparkSession): Boolean = {
    val rows = spark.sql(sql).limit(1).collect()
    rows.nonEmpty && rows.head.toSeq.forall(truthy)
  }

  def assertPasses(spark: SparkSession): Unit =
    if (!run(spark)) throw new IllegalStateException(s"check '$name' failed: $sql")
}
