package graft

import graft.sources.Tables

/** Selectivity-statistics parity (SURVEY.md §4): d-sparq keeps per-predicate
  * counts in MongoDB and reorders patterns by them; here the same role is
  * played by catalog statistics (`ANALYZE TABLE`) feeding Catalyst's CBO,
  * which plans join order/strategy from row counts and column NDVs.
  */
class CboSpec extends SparkSpec {


  test("ANALYZE TABLE feeds row counts and column stats into the optimizer") {
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    rmTree(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "cbo_orders"))
    Tables.orders(spark, sf0001).write.saveAsTable("cbo_orders")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")

    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val plan = spark.table("cbo_orders").queryExecution.optimizedPlan
      val stats = plan.stats
      assert(stats.rowCount.contains(BigInt(1500)), s"rowCount=${stats.rowCount}")
      assert(stats.attributeStats.nonEmpty, "expected column-level stats")
      val status = spark.sql("DESCRIBE EXTENDED cbo_orders o_orderstatus")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(status("distinct_count") === "3") // F / O / P
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }
}
