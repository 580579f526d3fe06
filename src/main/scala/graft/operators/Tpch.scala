package graft.operators

import graft.{Det, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Headline TPC-H-shape queries executed through the `spark.sql` string
  * path (SURVEY.md §2.2 addendum) — the same entry point a BI tool or a
  * migrating d-sparq user's SQL frontend would hit, as opposed to the
  * DataFrame combinators every other module exercises. The SQL text is
  * dialect-shared with the DuckDB oracle except where the engines name
  * functions differently, so the oracle is literally the same query.
  *
  * Q1/Q3/Q5 are adapted to the driver schema (TESTDATA.md): no
  * `o_shippriority`/`l_shipmode` columns, `l_shipdate`/`o_orderdate` are
  * timestamps. Scale notes, verified via `.explain`:
  *  - Q1 is one scan + one partial-aggregated hash aggregate — the shape
  *    that saturates scan bandwidth at 100 TB.
  *  - Q3's join order (customer ⋈ orders) ⋈ lineitem filters both small
  *    sides before the big probe; customer comfortably broadcasts after
  *    the segment filter (AQE re-plans if stats say otherwise at scale).
  *  - Q5 is the 6-way star: region→nation→supplier prune to a broadcast
  *    chain and only orders⋈lineitem⋈customer shuffle; the `c_nationkey =
  *    s_nationkey` residual keeps it a join-graph cycle that Catalyst
  *    breaks with a post-join filter, exactly what you want (no cartesian).
  *
  * Determinism: all money sums are decimal-exact ([[Det.dsumSql]] renders
  * identically in Spark SQL and DuckDB), ORDER BY is total, revenue ties
  * broken by the group key.
  */
object Tpch extends QueryModule {

  /** Register the tables this module reads as temp views (idempotent). */
  private def register(s: SparkSession, d: String): Unit =
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))

  private def run(sql: String): (SparkSession, String) => DataFrame =
    (s, d) => { register(s, d); s.sql(sql) }

  /** Q1 pricing summary — shared verbatim by both engines. */
  private val q1: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.dsumSql("l_quantity", 2)} AS sum_qty,
       |  ${Det.dsumSql("l_extendedprice", 2)} AS sum_base_price,
       |  ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
       |  ${Det.dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
       |  ${Det.davgSql("l_quantity", 2)} AS avg_qty,
       |  ${Det.davgSql("l_extendedprice", 2)} AS avg_price,
       |  ${Det.davgSql("l_discount", 2)} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q3 shipping-priority top 10, minus the absent o_shippriority; the
    * order date is projected as `$dateOut` (engine-specific yyyy-MM-dd). */
  private def q3(dateOut: String): String =
    s"""SELECT l_orderkey,
       |  ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
       |  $dateOut AS orderdate
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  /** Q5 local-supplier volume — shared verbatim by both engines. The
    * classic spec year 1994 predates this dataset (orders span
    * 1995-01..2001-08, TESTDATA.md), so the one-year window is 1996 —
    * same ~1/7 selectivity, and non-empty at every SF so the smoke
    * gate's rows>0 check actually exercises the 6-way join. */
  private val q5: String =
    s"""SELECT n_name,
       |  ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE c_nationkey = s_nationkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** Q6 forecasting-revenue change — the canonical single-scan aggregate:
    * no join, one filter, one global sum. At 100 TB this is a pure test of
    * scan bandwidth + pushdown (the three predicates all reach the parquet
    * reader; `.explain` shows them in PushedFilters). Same one-year shift
    * as Q5 (spec 1994 predates the data). Discounts are exact hundredths
    * in this dataset, so the double BETWEEN bounds compare identically in
    * both engines; the revenue sum is decimal-exact. */
  private val q6: String =
    s"""SELECT
       |  ${Det.dsumSql("l_extendedprice * l_discount", 4)} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_tpch_q1" -> run(q1),
    "q_tpch_q3" -> run(q3("date_format(o_orderdate, 'yyyy-MM-dd')")),
    "q_tpch_q5" -> run(q5),
    "q_tpch_q6" -> run(q6))

  val oracleSql: Map[String, String] = Map(
    "q_tpch_q1" -> q1,
    "q_tpch_q3" -> q3("strftime(o_orderdate, '%Y-%m-%d')"),
    "q_tpch_q5" -> q5,
    "q_tpch_q6" -> q6)
}
