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

  /** Resample a VALUE metric to the bucket grid with LOCF gap fill (last
    * observation carried forward) — the other half of the missing-bucket
    * problem: [[resampleCounts]] zero-fills counts, but a LEVEL metric
    * (a balance, a temperature, a gauge) must carry its last observed
    * value across empty buckets, not drop to zero.
    *
    * Per (group, bucket) the observation is the value of the HIGHEST-id
    * event in the bucket (`max_by` — a deterministic pick where "last by
    * arrival" would depend on partition order). The fill is the
    * partition-free two-window form: a running count of observations
    * numbers the stretches (`grp`), then `max` over (group, grp) — whose
    * only non-null value is the stretch's head — broadcasts it to the
    * gap rows. BOTH windows sort the same (group, bucket) partition, so
    * the whole fill is ONE shuffle over the summary-sized grid frame
    * (groups × buckets), never over the raw events.
    *
    * Output: (group, bucket, v_raw nullable, v_filled). Buckets before a
    * group's first observation cannot occur (the grid starts at the
    * group's min observed bucket), so v_filled is always defined.
    */
  def fillForward(df: DataFrame, groupCol: String, tsCol: String,
      valCol: String, idCol: String, stepUnits: Long): DataFrame = {
    require(stepUnits > 0, s"stepUnits must be positive, got $stepUnits")
    import org.apache.spark.sql.expressions.Window
    val bucketed = df.select(col(groupCol).as("__g"),
      expr(s"$tsCol div $stepUnits").as("bucket"),
      col(valCol).as("__v"), col(idCol).as("__id"))
    val obs = bucketed.groupBy("__g", "bucket")
      .agg(expr("max_by(__v, __id)").as("v_raw"))
    val grid = bucketed.groupBy("__g")
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("__g"), explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val w = Window.partitionBy("__g").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("__g", "bucket"), "left")
      .withColumn("__grp",
        sum(when(col("v_raw").isNotNull, 1L).otherwise(0L)).over(w))
      .withColumn("v_filled",
        max(col("v_raw")).over(Window.partitionBy("__g", "__grp")))
      .select(col("__g").as(groupCol), col("bucket"), col("v_raw"),
        col("v_filled"))
  }

  /** Gap-based BATCH sessionization (the offline twin of
    * `session_window` in [[graft.streaming.StreamOps]]): per key, events
    * more than `gapUnits` apart start a new session. The classic two-window
    * form — `lag` marks session starts, a running sum numbers them — which
    * is ONE shuffle on the key (both windows share the (key, ts) partition
    * sort), then a hash aggregate per session. Nothing here is
    * gap-parameter-global: each key's sessions are derived independently,
    * so skewed keys parallelize with AQE like any other aggregate.
    *
    * `tsCol` is epoch-integer (exact — never a float timestamp), so
    * session boundaries are deterministic; output is one row per session:
    * (key, session_start, n_events, duration = last - first).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      gapUnits: Long): DataFrame = {
    require(gapUnits > 0, s"gapUnits must be positive, got $gapUnits")
    // ties on (key, ts) need no tiebreak: equal timestamps always share a
    // session (gap 0), and the per-session aggregates are order-free
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__ts"))
    df.select(col(keyCol), col(tsCol).as("__ts"))
      .withColumn("__new", when(
        col("__ts") - lag(col("__ts"), 1).over(w) > gapUnits || lag(col("__ts"), 1).over(w).isNull,
        1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__sess"))
      .agg(min(col("__ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        (max(col("__ts")) - min(col("__ts"))).as("duration"))
      .select(col(keyCol), col("session_start"), col("n_events"), col("duration"))
  }

  /** Integer FLOOR division for a positive divisor: Spark's `div`
    * truncates toward zero, so for a negative dividend that is one too
    * high; `a % b` carries the dividend's sign, so `a % b < 0` flags
    * exactly the rows needing the −1 correction. Matches DuckDB `//`. */
  private def floorDivExpr(a: String, b: Long): String =
    s"(($a div $b) - (CASE WHEN $a % $b < 0 THEN 1 ELSE 0 END))"

  /** Cohort retention matrix: users bucket into cohorts by their FIRST
    * event's period, then each (cohort, period-offset) cell counts the
    * distinct users active that many periods later. Two aggregations and
    * one equi-join on the user key — the first-touch aggregation is the
    * same partial-agg shape as [[funnel]]'s entry step, and the distinct
    * count shuffles (cohort, offset, user) triples, never event rows.
    * Periods are integer FLOOR-divisions of the epoch timestamp, so
    * bucketing is exact on every engine — including pre-epoch (negative)
    * timestamps, where Spark's `div` truncates toward zero but DuckDB's
    * `//` floors; [[floorDivExpr]] corrects the truncation so the two
    * agree on all inputs. */
  def cohortRetention(df: DataFrame, keyCol: String, tsCol: String,
      periodUnits: Long): DataFrame = {
    require(periodUnits > 0, s"periodUnits must be positive, got $periodUnits")
    val first = df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__first"))
      .select(col(keyCol), expr(floorDivExpr("__first", periodUnits)).as("cohort"))
    df.select(col(keyCol), expr(floorDivExpr(tsCol, periodUnits)).as("__p"))
      .join(first, Seq(keyCol))
      .select(col("cohort"), (col("__p") - col("cohort")).as("poffset"),
        col(keyCol))
      .distinct()
      .groupBy(col("cohort"), col("poffset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Rolling z-score anomaly detection in EXACT integer milli-units.
    *
    * Per `keyCol`, ordered by (`tsCol`, `idCol`) — a total order, so the
    * frame contents are identical on every engine and run — each row is
    * tested against the trailing `n`-row window (current row excluded):
    * anomalous iff the full window is present and |x − μ| > 2σ. The test
    * is evaluated WITHOUT floats: values quantize to milli-longs (a
    * float mul + floor both engines compute bit-identically), and
    * |x − μ| > 2σ is squared and scaled by n² into
    * `(n·x − S1)² > 4·(n·S2 − S1²)` over integer window sums S1 = Σxᵢ,
    * S2 = Σxᵢ² — so there is no division, no sqrt, and no
    * summation-order drift anywhere. (Bounds: |x| ≤ ~10⁶ milli keeps
    * every term under 2⁶³.)
    *
    * Scale: one window sort per key partition — the same shape as every
    * `q_win_*` operator; the sums are O(1) incremental within the
    * frame. */
  def rollingAnomaly(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, n: Int): DataFrame = {
    require(n > 1, s"window must have at least 2 rows, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-n, -1)
    df.select(col(keyCol), col(tsCol), col(idCol),
        expr(s"CAST(floor($valCol * 1000.0 + 0.5) AS BIGINT)").as("x_milli"))
      .withColumn("s1", sum(col("x_milli")).over(w))
      .withColumn("s2", sum(col("x_milli") * col("x_milli")).over(w))
      .withColumn("n_prev", count(col("x_milli")).over(w))
      // when(...).otherwise(0), not a boolean cast: a NULL value row makes
      // the comparison NULL, and the oracle's CASE emits 0 there — the
      // otherwise branch keeps both engines at 0 instead of diverging
      .withColumn("anomaly", when(col("n_prev") === n &&
        (lit(n) * col("x_milli") - col("s1")) *
          (lit(n) * col("x_milli") - col("s1")) >
          lit(4L) * (lit(n) * col("s2") - col("s1") * col("s1")),
        lit(1L)).otherwise(lit(0L)))
      .select(col(keyCol), col(tsCol), col(idCol), col("x_milli"),
        col("n_prev"), col("anomaly"))
  }

  /** Two-step conversion funnel: for each key's FIRST `fromType` event,
    * the first `toType` event strictly after it, and whether that
    * conversion landed inside `windowUnits`. Pure min-aggregations — the
    * entry step is one partial-agg shuffle, the conversion step one
    * equi-join on the key plus a conditional `min` — so order of arrival
    * and partitioning cannot perturb the result (no window sort at all).
    * Output: (key, from_us, to_us nullable, converted 0/1). Keys without
    * a `fromType` event don't enter the funnel. */
  def funnel(df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      fromType: String, toType: String, windowUnits: Long): DataFrame = {
    require(windowUnits > 0, s"windowUnits must be positive, got $windowUnits")
    val entered = df.filter(col(typeCol) === fromType)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("from_us"))
    val target = df.filter(col(typeCol) === toType)
      .select(col(keyCol), col(tsCol).as("__to"))
    entered.join(target, Seq(keyCol), "left")
      .groupBy(col(keyCol), col("from_us"))
      .agg(min(when(col("__to") > col("from_us"), col("__to"))).as("to_us"))
      .withColumn("converted",
        (col("to_us").isNotNull &&
          col("to_us") <= col("from_us") + windowUnits).cast("long"))
  }
}
