package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scans, projections, filters — the σ/π layer.
  *
  * Reference parity: D-SPARQ answers a single triple pattern with an indexed
  * MongoDB `find` on the bound fields (SURVEY.md §2 R4). In Spark the same
  * role is played by the parquet scan with pushed predicates and pruned
  * columns; `.explain("formatted")` must show PushedFilters and a ReadSchema
  * restricted to the selected columns. At 100 TB this is the difference
  * between reading 3 columns' row groups and reading the table.
  */
object Relational extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_scan_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_filter_pushdown" -> ((s, d) => {
      // String, numeric and timestamp predicates, all pushdown-eligible.
      Tables.lineitem(s, d)
        // to_timestamp: session-timezone-safe (see Aggregates.q_agg_hash).
        .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01 00:00:00"))
          && col("l_quantity") < 5.0 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          unix_millis(col("l_shipdate")).as("ship_ms"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // The generator (UDTF-shaped) surface as a first-class query: one
    // array row explodes to (position, element) rows inside whole-stage
    // codegen — no shuffle is introduced by the Generate node itself.
    "q_lateral_explode" -> ((s, d) => {
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("val").cast("double").as("val"))
        .orderBy(col("vec_id"), col("pos"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, epoch_ms(l_shipdate) AS ship_ms
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND l_quantity < 5.0 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // float→double widening is exact, so element values hash-match
    "q_lateral_explode" ->
      """SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
        |       CAST(embedding[i] AS DOUBLE) AS val
        |FROM (SELECT vec_id, embedding,
        |        unnest(generate_series(1, len(embedding))) AS i
        |      FROM embeddings WHERE vec_id < 50)
        |ORDER BY vec_id, pos""".stripMargin
  )
}
