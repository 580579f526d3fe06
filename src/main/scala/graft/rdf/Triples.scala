package graft.rdf

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational → RDF triples (EAV unpivot).
  *
  * Reference parity: D-SPARQ's data model is the RDF triple (s,p,o) parsed
  * from N-Triples and stored subject-grouped in MongoDB (ISWC 2013 demo
  * paper; the mounted reference snapshot was empty — SURVEY.md §0). Here the
  * canonical triples table is *derived* from the relational tables, giving
  * the same star (subject-grouped) shape: one subject per entity, one triple
  * per (entity, attribute).
  *
  * Scale: each source table is scanned ONCE and exploded k-ways
  * (`explode(array(struct...))`), rather than UNION ALL of k per-predicate
  * scans — at 100 TB that is 1 pass over parquet instead of k. The explode
  * stays inside whole-stage codegen; no shuffle is introduced. Only
  * string/int-valued attributes become triples (floats would introduce
  * cross-engine string-formatting ambiguity).
  */
object Triples {

  /** Unpivot one table: subject expression + (predicate → object column). */
  def fromTable(df: DataFrame, subj: Column, preds: Seq[(String, Column)]): DataFrame =
    df.select(
      subj.cast("string").as("s"),
      explode(array(preds.map { case (p, o) =>
        struct(lit(p).as("p"), o.cast("string").as("o"))
      }: _*)).as("po"))
      .select(col("s"), col("po.p").as("p"), col("po.o").as("o"))

  /** The canonical triples table over customer/orders/nation/region, with a
    * deliberate star+chain shape: order --custkey--> customer --nation-->
    * nation --region--> region.
    */
  def build(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    fromTable(c, concat(lit("c:"), col("c_custkey")), Seq(
      "name" -> col("c_name"),
      "mktsegment" -> col("c_mktsegment"),
      "nation" -> concat(lit("n:"), col("c_nationkey")),
      // a numeric-valued predicate (lexical form of an int) so FILTER range
      // comparisons have something real to coerce
      "nationkey" -> col("c_nationkey")))
      .unionByName(fromTable(o, concat(lit("o:"), col("o_orderkey")), Seq(
        "custkey" -> concat(lit("c:"), col("o_custkey")),
        "orderstatus" -> col("o_orderstatus"),
        "orderpriority" -> col("o_orderpriority"))))
      .unionByName(fromTable(n, concat(lit("n:"), col("n_nationkey")), Seq(
        "name" -> col("n_name"),
        "region" -> concat(lit("r:"), col("n_regionkey")))))
      .unionByName(fromTable(r, concat(lit("r:"), col("r_regionkey")), Seq(
        "name" -> col("r_name"))))
  }

  /** DuckDB rendering of [[build]] as a CTE body — the oracle reconstructs
    * the identical triples with UNION ALL over the same parquet.
    */
  val duckCte: String =
    """SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS s, 'name' AS p, c_name AS o FROM customer
      |UNION ALL SELECT 'c:' || CAST(c_custkey AS VARCHAR), 'mktsegment', c_mktsegment FROM customer
      |UNION ALL SELECT 'c:' || CAST(c_custkey AS VARCHAR), 'nation', 'n:' || CAST(c_nationkey AS VARCHAR) FROM customer
      |UNION ALL SELECT 'c:' || CAST(c_custkey AS VARCHAR), 'nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'custkey', 'c:' || CAST(o_custkey AS VARCHAR) FROM orders
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'orderstatus', o_orderstatus FROM orders
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'orderpriority', o_orderpriority FROM orders
      |UNION ALL SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'name', n_name FROM nation
      |UNION ALL SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'region', 'r:' || CAST(n_regionkey AS VARCHAR) FROM nation
      |UNION ALL SELECT 'r:' || CAST(r_regionkey AS VARCHAR), 'name', r_name FROM region""".stripMargin
}
