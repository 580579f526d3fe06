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
    * frames; the summary itself is the third (small) union leg.
    *
    * Contract (enforced): `countCol` names a measure that counts rows
    * (its expression sums to the group's row count, e.g. `lit(1L)`) —
    * it is the ONLY sound group-liveness test (a SUM measure can net to
    * zero over surviving rows); and every measure expression is
    * INTEGER-typed — long sums are exact and order-independent, where
    * double sums would make maintain diverge from recompute by combine
    * order (scale fractional measures to integers, the
    * [[graft.Det.dsum]] decimal discipline). */
  def maintain(current: DataFrame, adds: DataFrame, dels: DataFrame,
      groupCols: Seq[String], measures: Map[String, Column],
      countCol: String = "n"): DataFrame = {
    val mCols = measures.keys.toSeq.sorted
    require(mCols.forall(current.columns.contains),
      s"summary is missing measure column(s) ${
        mCols.filterNot(current.columns.contains).mkString(", ")}")
    require(measures.contains(countCol),
      s"measures must include the row-count measure '$countCol' — the " +
        "group-liveness test (drop groups whose count nets to zero) is " +
        "only sound on a count")
    requireIntegral(adds, measures)
    def contrib(df: DataFrame, sign: Int): DataFrame =
      df.select(groupCols.map(col) ++ mCols.map(m =>
        (measures(m).cast("long") * sign).as(m)): _*)
    current.select(groupCols.map(col) ++ mCols.map(col): _*)
      .unionByName(contrib(adds, 1))
      .unionByName(contrib(dels, -1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(mCols.head).as(mCols.head),
        mCols.tail.map(m => sum(m).as(m)): _*)
      // zero surviving rows ⇔ the count measure netted to zero
      .filter(col(countCol) =!= 0L)
  }

  /** Fractional measures would be silently truncated by the exactness
    * cast — reject them loudly instead. */
  private def requireIntegral(ref: DataFrame,
      measures: Map[String, Column]): Unit = {
    import org.apache.spark.sql.types._
    measures.foreach { case (name, e) =>
      val dt = ref.select(e.as(name)).schema.head.dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"measure '$name' is $dt — additive maintenance needs integer " +
          "measures (scale decimals/doubles to integer units first)")
    }
  }

  /** The from-scratch summary `maintain` must agree with. */
  def recompute(rows: DataFrame, groupCols: Seq[String],
      measures: Map[String, Column]): DataFrame = {
    requireIntegral(rows, measures)
    val mCols = measures.keys.toSeq.sorted
    rows.groupBy(groupCols.map(col): _*)
      .agg(sum(measures(mCols.head).cast("long")).as(mCols.head),
        mCols.tail.map(m => sum(measures(m).cast("long")).as(m)): _*)
  }
}
