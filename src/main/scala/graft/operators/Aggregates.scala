package graft.operators

import graft.{Det, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Aggregation family: hash aggregate (with map-side partial aggregation),
  * distinct, approximate-distinct (HLL), rollup / cube / grouping sets.
  *
  * Scale notes: `groupBy.agg` compiles to partial + final HashAggregate —
  * the map-side combine means the shuffle carries one row per (partition ×
  * group), not per input row. COUNT(DISTINCT x) expands to a two-phase
  * aggregate keyed on (group, x); for 100 TB cardinality estimation prefer
  * `approx_count_distinct` (constant-size HLL sketch, mergeable, no second
  * shuffle) — both are exposed below.
  */
object Aggregates extends QueryModule {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape — the canonical partial-agg benchmark.
    "q_agg_hash" -> ((s, d) => {
      Tables.lineitem(s, d)
        // to_timestamp honors spark.sql.session.timeZone (pinned UTC by
        // GraftSession); java.sql.Timestamp.valueOf would parse in the host
        // JVM default zone. Catalyst constant-folds this to a literal, so
        // parquet pushdown is unaffected.
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_base_price"),
          Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
          Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          Det.davg(col("l_quantity")).as("avg_qty"),
          Det.davg(col("l_extendedprice")).as("avg_price"),
          Det.davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q_agg_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // HLL sketch — approximate, so no SQL oracle (checked rows-only +
    // ScalaTest asserts relative error vs exact).
    "q_agg_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // Mergeable PERSISTED-sketch workflow ([[Sketches]]): per-flag HLL
    // sketches (the ingest-time artifact) answer per-stratum AND unioned
    // global distinct questions from kilobytes, never rescanning the
    // corpus. Approximate ⇒ no SQL oracle; SketchesSpec bounds the error
    // and proves union-of-parts ≡ sketch-of-whole.
    "q_agg_hll_union" -> ((s, d) => {
      val sk = Sketches.hllSketches(Tables.lineitem(s, d),
        col("l_returnflag"), col("l_partkey"))
      Sketches.hllEstimates(sk).orderBy(col("stratum"))
    }),

    // Distinct-INTERSECTION estimate between two strata from summaries
    // alone ([[Sketches.setSketches]]): MinHash Jaccard × HLL union —
    // the question neither sketch answers by itself, answered without
    // any pairwise join of the data. Approximate ⇒ no SQL oracle;
    // SketchesSpec bounds the error against exact set arithmetic.
    "q_agg_set_overlap" -> ((s, d) => {
      val sk = Sketches.setSketches(Tables.lineitem(s, d),
        col("l_returnflag"), col("l_partkey"))
      Sketches.intersectionEstimate(sk, "A", "R")
    }),

    "q_agg_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    "q_agg_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    "q_agg_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    // exact per-group MODE with a total tie order (highest count, then
    // lexicographically smallest value): two hash aggregates — value
    // counts, then one min_by over the (−count, value) struct — both
    // map-side combining, so the second stage sees one row per
    // (group, value), never the raw rows
    "q_agg_mode" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("c_nationkey"))
        .agg(
          expr("min_by(c_mktsegment, struct(-cnt, c_mktsegment))")
            .as("mode_seg"),
          max(col("cnt")).as("n"))
        .orderBy(col("c_nationkey")))
  )

  private val tot = Det.dsumSql("o_totalprice")

  val oracleSql: Map[String, String] = Map(
    "q_agg_hash" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Det.dsumSql("l_quantity")} AS sum_qty,
         |  ${Det.dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${Det.dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
         |  ${Det.dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
         |  ${Det.davgSql("l_quantity")} AS avg_qty,
         |  ${Det.davgSql("l_extendedprice")} AS avg_price,
         |  ${Det.davgSql("l_discount", 6)} AS avg_disc,
         |  CAST(count(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n, $tot AS total
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n, $tot AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_agg_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n, $tot AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    // the same (count desc, value asc) total tie order via a window
    "q_agg_mode" ->
      """SELECT c_nationkey, mode_seg, n FROM (
        |  SELECT c_nationkey, c_mktsegment AS mode_seg,
        |    CAST(count(*) AS BIGINT) AS n,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY count(*) DESC, c_mktsegment) AS rn
        |  FROM customer GROUP BY c_nationkey, c_mktsegment) t
        |WHERE rn = 1 ORDER BY c_nationkey""".stripMargin
  )
}
