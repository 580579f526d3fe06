package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of additive grouped aggregates under a net
  * (adds, dels) change feed — the consumer side of
  * [[graft.rdf.QuadStore.changes]] and of any CDC stream: a materialized
  * COUNT/SUM-shaped summary of a 100 TB table is refreshed by shuffling
  * ONLY the delta (new = old ⊕ agg(adds) ⊖ agg(dels)), never rescanning
  * the base — the classic self-maintainable-view result for
  * insert/delete streams over distributive aggregates.
  *
  * Scope: COUNT and SUM are self-maintainable under deletes and handled
  * here; MIN/MAX are not (a deleted extremum needs the base to find the
  * runner-up) and are deliberately absent rather than approximated.
  */
object IncrementalAgg {

  /** Maintain per-group COUNT(*). `current` is (groupCols..., n); adds
    * and dels are raw row frames. Groups reaching zero leave the summary
    * (so a maintained summary never diverges from a recompute, which has
    * no empty groups). */
  def maintainCounts(current: DataFrame, adds: DataFrame, dels: DataFrame,
      groupCols: Seq[String]): DataFrame =
    maintain(current, adds, dels, groupCols, Map("n" -> lit(1L)))

  /** Maintain any set of additive measures: `measures` maps an output
    * column of `current` to the row-level expression whose SUM it holds
    * (COUNT(*) is SUM(1)). One union + one shuffle over delta-sized
    * frames; the summary itself is the third (small) union leg. */
  def maintain(current: DataFrame, adds: DataFrame, dels: DataFrame,
      groupCols: Seq[String], measures: Map[String, Column]): DataFrame = {
    val mCols = measures.keys.toSeq.sorted
    require(mCols.forall(current.columns.contains),
      s"summary is missing measure column(s) ${
        mCols.filterNot(current.columns.contains).mkString(", ")}")
    def contrib(df: DataFrame, sign: Int): DataFrame =
      df.select(groupCols.map(col) ++ mCols.map(m =>
        (measures(m).cast("long") * sign).as(m)): _*)
    current.select(groupCols.map(col) ++ mCols.map(col): _*)
      .unionByName(contrib(adds, 1))
      .unionByName(contrib(dels, -1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(mCols.head).as(mCols.head),
        mCols.tail.map(m => sum(m).as(m)): _*)
      // a group whose EVERY measure netted to zero has no surviving rows;
      // counts hitting zero prove it for any row set with a count measure
      .filter(mCols.map(m => col(m) =!= 0L).reduce(_ || _))
  }

  /** The from-scratch summary `maintain` must agree with. */
  def recompute(rows: DataFrame, groupCols: Seq[String],
      measures: Map[String, Column]): DataFrame = {
    val mCols = measures.keys.toSeq.sorted
    rows.groupBy(groupCols.map(col): _*)
      .agg(sum(measures(mCols.head).cast("long")).as(mCols.head),
        mCols.tail.map(m => sum(measures(m).cast("long")).as(m)): _*)
  }
}
