package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Global sorts / limits and set operations.
  *
  * Scale notes: `orderBy(...).limit(k)` compiles to TakeOrderedAndProject —
  * each task keeps a k-row heap and the driver merges k-row partials; no
  * global sort materializes. UNION ALL is a zero-shuffle concatenation;
  * DISTINCT / INTERSECT / EXCEPT each need one shuffle on the full row
  * (Spark plans INTERSECT/EXCEPT as left-semi/anti joins over distinct
  * inputs — see `.explain`).
  */
object SetSortOps extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_sort_limit" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    }),

    "q_union" -> ((s, d) => {
      // UNION ALL (no dedup) then aggregate — bag semantics preserved.
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderpriority").as("pri"))
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        .select(col("o_orderpriority").as("pri"))
      f.unionByName(o).groupBy(col("pri")).agg(count(lit(1)).as("n"))
        .orderBy(col("pri"))
    }),

    "q_intersect" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_acctbal") < -500.0)
        .select(col("c_nationkey"), col("c_mktsegment"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 9500.0)
        .select(col("c_nationkey"), col("c_mktsegment"))
      a.intersect(b).orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),

    "q_except" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_acctbal") < -500.0)
        .select(col("c_nationkey"), col("c_mktsegment"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 9500.0)
        .select(col("c_nationkey"), col("c_mktsegment"))
      a.except(b).orderBy(col("c_nationkey"), col("c_mktsegment"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_union" ->
      """SELECT pri, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT o_orderpriority AS pri FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O') t
        |GROUP BY pri ORDER BY pri""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal < -500.0
        |INTERSECT
        |SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 9500.0
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal < -500.0
        |EXCEPT
        |SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 9500.0
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin
  )
}
