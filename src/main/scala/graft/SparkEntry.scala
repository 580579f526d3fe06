package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's queries and DuckDB oracles. Each
  * module pairs a Spark-first implementation with a dialect-correct DuckDB
  * oracle; results are deterministic (decimal-exact sums, epoch-integer
  * timestamps, total ORDER BY) so the driver's hash compare is stable.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.Joins,
    operators.Aggregates,
    operators.Windows,
    operators.SetSortOps,
    operators.Analytics,
    operators.Tpch,
    functions.FunctionOps,
    rdf.RdfOps,
    rdf.GraphOps,
    llm.LlmOps,
    streaming.StreamOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    val m = all.toMap
    // toMap would silently shadow a duplicated name across modules,
    // dropping a query from Verify/Bench coverage with no test failure
    require(m.size == all.size, {
      val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
      s"duplicate query names across modules: ${dups.mkString(", ")}"
    })
    m
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
