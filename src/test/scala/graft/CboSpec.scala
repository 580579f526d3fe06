package graft

import graft.sources.Tables

/** Selectivity-statistics parity (SURVEY.md §4): d-sparq keeps per-predicate
  * counts in MongoDB and reorders patterns by them; here the same role is
  * played by catalog statistics (`ANALYZE TABLE`) feeding Catalyst's CBO,
  * which plans join order/strategy from row counts and column NDVs.
  */
class CboSpec extends SparkSpec {


  test("analyzeAll wires row counts and column stats via the helper alone") {
    // ONE call: external tables + ANALYZE ... FOR ALL COLUMNS + current db
    val db = Tables.analyzeAll(spark, sf0001)
    val plan = spark.table(s"$db.orders").queryExecution.optimizedPlan
    val stats = plan.stats
    assert(stats.rowCount.contains(BigInt(1500)), s"rowCount=${stats.rowCount}")
    assert(stats.attributeStats.nonEmpty, "expected column-level stats")
    val status = spark.sql(s"DESCRIBE EXTENDED $db.orders o_orderstatus")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(status("distinct_count") === "3") // F / O / P
    // the database is current, so TPC-H's plain-name SQL hits the
    // analyzed tables
    assert(spark.catalog.currentDatabase === db)
    assert(spark.sql("SELECT count(*) FROM orders").head.getLong(0) === 1500)
    // idempotent: a second call is metadata-only and keeps the stats
    assert(Tables.analyzeAll(spark, sf0001) === db)
    assert(spark.table(s"$db.orders").queryExecution.optimizedPlan
      .stats.rowCount.contains(BigInt(1500)))
  }

  test("ingest paths auto-ANALYZE: persisted stores carry CBO stats " +
      "without caller opt-in") {
    // the encoded id-triple store (TripleStore.encodedFor registers +
    // analyzes at build)
    val (_, enc) = rdf.TripleStore.encodedFor(spark, sf0001)
    val encStats = enc.queryExecution.optimizedPlan.stats
    assert(encStats.rowCount.isDefined,
      s"expected an ingest-time row count on the encoded store: $encStats")
    // the co-located relational pair
    val (orders, _) = sources.BucketedTables.ordersLineitem(spark, sf0001)
    assert(orders.queryExecution.optimizedPlan.stats.rowCount.isDefined,
      "expected an ingest-time row count on the bucketed orders table")
    // the subject-bucketed string store
    spark.sql("DROP TABLE IF EXISTS cbo_auto_store")
    rdf.TripleStore.saveBucketed(
      rdf.Triples.build(spark, sf0001).limit(100), "cbo_auto_store")
    assert(spark.table("cbo_auto_store")
      .queryExecution.optimizedPlan.stats.rowCount.contains(BigInt(100)))
    spark.sql("DROP TABLE IF EXISTS cbo_auto_store"): Unit
  }

  test("CBO reorders a BGP chain so the selective pattern joins first") {
    // the analyzeAll test may have switched the current database — this
    // test's managed table lives in default, in a fresh location
    spark.catalog.setCurrentDatabase("default")
    spark.sql("DROP TABLE IF EXISTS cbo_triples")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    rmTree(new java.io.File(wh, "cbo_triples"))
    // leftover db-scoped locations from older runs (current-db drift)
    Option(new java.io.File(wh).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".db"))
      .foreach(d => rmTree(new java.io.File(d, "cbo_triples")))
    graft.rdf.Triples.build(spark, sf0001).write.saveAsTable("cbo_triples")
    Tables.analyze(spark, "cbo_triples")

    // the q_bgp_chain shape, WRITTEN with the worst pattern order: the big
    // unselective patterns join first, the '1-URGENT' filter dead last
    val chain = """
      SELECT t1.s AS ord, t1.o AS cust, t3.o AS seg, t4.o AS cname
      FROM cbo_triples t4, cbo_triples t1, cbo_triples t3, cbo_triples t2
      WHERE t4.p = 'name' AND t1.p = 'custkey' AND t3.p = 'mktsegment'
        AND t2.p = 'orderpriority' AND t2.o = '1-URGENT'
        AND t1.o = t4.s AND t1.o = t3.s AND t1.s = t2.s"""

    // leaf scan order of the optimized join tree, tagged by which triple
    // pattern each pushed-down filter belongs to (pre-order = left-to-right)
    def leafOrder(): Seq[String] = {
      import org.apache.spark.sql.catalyst.plans.logical.Filter
      spark.sql(chain).queryExecution.optimizedPlan.collect {
        case f: Filter =>
          val c = f.condition.toString
          if (c.contains("1-URGENT")) "urgent"
          else if (c.contains("custkey")) "custkey"
          else if (c.contains("mktsegment")) "mktsegment"
          else "name"
      }
    }

    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> spark.conf.get(k, "false"))
    try {
      keys.foreach(spark.conf.set(_, "false"))
      val ruleOrder = leafOrder()
      // without stats-driven reorder the join tree follows the written
      // (worst) order: the urgent pattern stays last
      assert(ruleOrder.last === "urgent", s"rule-based order: $ruleOrder")

      keys.foreach(spark.conf.set(_, "true"))
      val cboOrder = leafOrder()
      // with ANALYZE stats + CBO join reorder, the ~1/5-selectivity urgent
      // pattern moves off the tail into the first join — the behavior that
      // replaces d-sparq's selectivity-reorder heuristic (SURVEY.md §4)
      assert(cboOrder !== ruleOrder, "CBO did not change the join order")
      assert(cboOrder.indexOf("urgent") < 2, s"cbo order: $cboOrder")
      // and the reorder is a pure plan change: results stay identical
      keys.foreach(spark.conf.set(_, "false"))
      val viaRule = spark.sql(chain)
      keys.foreach(spark.conf.set(_, "true"))
      val viaCbo = spark.sql(chain)
      assert(viaCbo.count() > 0)
      assert(viaCbo.exceptAll(viaRule).count() === 0)
      assert(viaRule.exceptAll(viaCbo).count() === 0)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
