package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling with gap filling — the missing-bucket problem
  * every metrics/feature pipeline hits: a groupBy over event time yields
  * rows only for buckets that HAVE events, so downstream windows/joins
  * silently skip empty periods.
  *
  * The bucket grid is generated distributed: one `sequence(min, max)` +
  * `explode` per group (codegen, no driver loop, no cross join against a
  * global calendar table). Grid size per group = time-span / step — the
  * caller picks a step that keeps span/step bounded (a group spanning
  * years at 1-second steps is a 10^7-row grid, and that is a modeling
  * choice, not something to hide).
  */
object TimeSeries {

  /** Per-(group, bucket) event counts with empty buckets filled as 0.
    * `tsCol` is an epoch-integer column; `bucket = tsCol div stepUnits`.
    * The grid spans each group's own [min, max] bucket range.
    */
  def resampleCounts(df: DataFrame, groupCol: String, tsCol: String,
      stepUnits: Long): DataFrame = {
    require(stepUnits > 0, s"stepUnits must be positive, got $stepUnits")
    val bucketed = df.select(col(groupCol).as("__g"),
      expr(s"$tsCol div $stepUnits").as("bucket"))
    val counts = bucketed.groupBy("__g", "bucket").agg(count(lit(1)).as("n"))
    val grid = bucketed.groupBy("__g")
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("__g"), explode(sequence(col("mn"), col("mx"))).as("bucket"))
    grid.join(counts, Seq("__g", "bucket"), "left")
      .select(col("__g").as(groupCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
