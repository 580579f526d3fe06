package graft.operators

import graft.{Det, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Second-wave relational operators: exact percentiles, scalar subqueries,
  * relational pivot/unpivot.
  *
  * Scale notes: exact `percentile` requires a per-group sort of values —
  * fine for bounded groups; for whole-table quantiles at 100 TB use
  * `approx_percentile` (t-digest sketch, mergeable) instead, same call
  * shape. The scalar subquery broadcasts its single-row result rather than
  * re-reading the fact table per row. Unpivot is `Dataset.unpivot`
  * (codegen'd Expand — rows multiply map-side, nothing shuffles); pivot
  * with explicit values avoids the extra distinct-values job.
  */
object Analytics extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_agg_percentile" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          Det.roundSafe(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
          Det.roundSafe(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
          Det.roundSafe(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // Variance/stddev from exact decimal moments rather than the built-in
    // Welford accumulators: both engines' streaming accumulations differ
    // in late ulps with partition order, while (Σx², Σx) are exact here.
    "q_agg_stats" -> ((s, d) => {
      val n = count(lit(1)).cast("double")
      val sx = Det.dsum(col("o_totalprice"))
      val sxx = Det.dsum(col("o_totalprice") * col("o_totalprice"), 6)
      val variance = (sxx - sx * sx / n) / (n - lit(1.0))
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          Det.roundSafe(variance, 4).as("var_price"),
          Det.roundSafe(sqrt(variance), 4).as("sd_price"),
          // struct ordering key = deterministic tiebreak: among equal
          // totalprice rows both engines would otherwise pick arbitrarily.
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("max_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("min_order"))
        .orderBy(col("o_orderstatus"))
    }),

    "q_scalar_subquery" -> ((s, d) => {
      // orders above the global average price: the aggregate is a 1-row
      // frame broadcast against the scan (no per-row recomputation)
      val avgPrice = Tables.orders(s, d)
        .agg(Det.davg(col("o_totalprice")).as("avg_price"))
      Tables.orders(s, d)
        .crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("avg_price"))
        .select(col("o_orderkey"), col("o_totalprice"),
          Det.roundSafe(col("avg_price"), 4).as("avg_price"))
        .orderBy(col("o_orderkey"))
    }),

    "q_pivot" -> ((s, d) => {
      // na.fill: Spark's pivot leaves NULL for a (priority,status) combo
      // with no rows, while the oracle's count(*) FILTER yields 0
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy(col("o_orderpriority"))
    }),

    "q_unpivot" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "measure", "value")
        .orderBy(col("p_partkey"), col("measure"))
    }),

    // Hourly event counts per type WITH empty hours as explicit zeros —
    // the gap-filled resample every downstream window/join needs
    // (TimeSeries.resampleCounts; ~6% of hours are empty in this corpus,
    // so the gap path is genuinely exercised).
    "q_ts_resample" -> ((s, d) =>
      TimeSeries.resampleCounts(Tables.events(s, d),
          "event_type", "ts_us_long", stepUnits = 3600000000L)
        .orderBy(col("event_type"), col("bucket"))),

    // LOCF gap fill of a level metric (the last event's value per hourly
    // bucket, carried across empty buckets) — deterministic max_by pick,
    // one shuffle over the grid frame
    "q_ts_fill" -> ((s, d) =>
      TimeSeries.fillForward(Tables.events(s, d),
          "event_type", "ts_us_long", "value", "event_id",
          stepUnits = 3600000000L)
        .orderBy(col("event_type"), col("bucket"))),

    // Gap-based batch sessionization (30-min gap over epoch-micros — the
    // precision DuckDB's parquet reader keeps for TIMESTAMP(NANOS), so the
    // oracle sees identical integers): the offline twin of the streaming
    // session_window query
    "q_sessionize" -> ((s, d) =>
      TimeSeries.sessionize(Tables.events(s, d),
          "user_id", "ts_us_long", gapUnits = 1800000000L)
        .orderBy(col("user_id"), col("session_start"))),

    // cohort retention matrix over 6-hour periods: first-touch cohorts,
    // distinct-active counts per (cohort, offset) — two aggs + one
    // equi-join, the distinct shuffles user triples, never event rows
    "q_cohort_retention" -> ((s, d) =>
      TimeSeries.cohortRetention(Tables.events(s, d), "user_id",
          "ts_us_long", periodUnits = 21600000000L)
        .orderBy(col("cohort"), col("poffset"))),

    // trailing-window z-score outliers per event type, float-free (see
    // TimeSeries.rollingAnomaly: milli-quantized, squared test — exact)
    "q_ts_anomaly" -> ((s, d) =>
      TimeSeries.rollingAnomaly(Tables.events(s, d), "event_type",
          "ts_us_long", "event_id", "value", n = 20)
        .orderBy(col("event_type"), col("ts_us_long"), col("event_id"))),

    // signup→purchase conversion inside an hour: the product-analytics
    // funnel as pure min-aggregations (no window sort — see
    // TimeSeries.funnel's scale note)
    "q_funnel" -> ((s, d) =>
      TimeSeries.funnel(Tables.events(s, d), "user_id", "ts_us_long",
          "event_type", fromType = "signup", toType = "purchase",
          windowUnits = 3600000000L)
        .orderBy(col("user_id")))
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_percentile" ->
      s"""SELECT o_orderstatus,
         |  ${Det.roundSafeSql("quantile_cont(o_totalprice, 0.25)", 4)} AS p25,
         |  ${Det.roundSafeSql("quantile_cont(o_totalprice, 0.5)", 4)} AS p50,
         |  ${Det.roundSafeSql("quantile_cont(o_totalprice, 0.75)", 4)} AS p75,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_stats" -> {
      val n = "CAST(count(*) AS DOUBLE)"
      val sx = Det.dsumSql("o_totalprice")
      val sxx = Det.dsumSql("o_totalprice * o_totalprice", 6)
      val variance = s"(($sxx - $sx * $sx / $n) / ($n - 1.0))"
      // arg_max with a composite tiebreak: DuckDB's arg_max rejects STRUCT
      // ordering values, so rank with a window (same (price, key) total
      // order as the Spark struct key) and pick rank-1 per group.
      s"""WITH r AS (
         |  SELECT o_orderstatus, o_orderkey, o_totalprice,
         |    row_number() OVER (PARTITION BY o_orderstatus
         |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
         |    row_number() OVER (PARTITION BY o_orderstatus
         |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
         |  FROM orders)
         |SELECT o_orderstatus,
         |  ${Det.roundSafeSql(variance, 4)} AS var_price,
         |  ${Det.roundSafeSql(s"sqrt$variance", 4)} AS sd_price,
         |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS max_order,
         |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS min_order
         |FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    "q_scalar_subquery" -> {
      val avg = s"(SELECT ${Det.davgSql("o_totalprice")} FROM orders)"
      s"""SELECT o_orderkey, o_totalprice,
         |  ${Det.roundSafeSql(avg, 4)} AS avg_price
         |FROM orders WHERE o_totalprice > $avg
         |ORDER BY o_orderkey""".stripMargin
    },

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, measure, value FROM (
        |  SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice', p_retailprice FROM part)
        |ORDER BY p_partkey, measure""".stripMargin,

    "q_ts_resample" ->
      """WITH ev AS (
        |  SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS bucket
        |  FROM events),
        |counts AS (
        |  SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type, unnest(generate_series(min(bucket), max(bucket))) AS bucket
        |  FROM ev GROUP BY event_type)
        |SELECT g.event_type, g.bucket, coalesce(c.n, 0) AS n
        |FROM grid g LEFT JOIN counts c USING (event_type, bucket)
        |ORDER BY event_type, bucket""".stripMargin,

    // identical LOCF derivation: arg_max pick per bucket, running
    // non-null count numbers the stretches, stretch-max broadcasts the
    // head value to its gap rows
    "q_ts_fill" ->
      """WITH ev AS (
        |  SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS bucket,
        |         value, event_id
        |  FROM events),
        |obs AS (
        |  SELECT event_type, bucket, arg_max(value, event_id) AS v_raw
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type, unnest(generate_series(min(bucket), max(bucket))) AS bucket
        |  FROM ev GROUP BY event_type),
        |joined AS (
        |  SELECT g.event_type, g.bucket, o.v_raw,
        |    count(o.v_raw) OVER (PARTITION BY g.event_type ORDER BY g.bucket
        |      ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM grid g LEFT JOIN obs o USING (event_type, bucket))
        |SELECT event_type, bucket, v_raw,
        |  max(v_raw) OVER (PARTITION BY event_type, grp) AS v_filled
        |FROM joined
        |ORDER BY event_type, bucket""".stripMargin,

    // identical lag/running-sum construction; ties on (user, ts) are
    // boundary-invariant (equal timestamps always share a session), so no
    // tiebreak column is needed on either engine
    "q_sessionize" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts - lag(ts) OVER w > 1800000000 THEN 1
        |             ELSE 0 END AS newsess
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts,
        |        sum(newsess) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  max(ts) - min(ts) AS duration
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin,

    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id,
        |             (epoch_ns(ts) // 1000) // 21600000000 AS p FROM events),
        |f AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT f.cohort, e.p - f.cohort AS poffset, e.user_id
        |      FROM e JOIN f ON e.user_id = f.user_id)
        |SELECT cohort, poffset, CAST(count(*) AS BIGINT) AS n_active
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_ts_anomaly" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS ts_us_long,
        |  event_id, CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS x_milli
        |  FROM events),
        |w AS (SELECT event_type, ts_us_long, event_id, x_milli,
        |        sum(x_milli) OVER win AS s1,
        |        sum(x_milli * x_milli) OVER win AS s2,
        |        count(x_milli) OVER win AS n_prev
        |      FROM e WINDOW win AS (
        |        PARTITION BY event_type ORDER BY ts_us_long, event_id
        |        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, ts_us_long, event_id, x_milli, n_prev,
        |  CAST(CASE WHEN n_prev = 20
        |         AND (20 * x_milli - s1) * (20 * x_milli - s1)
        |           > 4 * (20 * s2 - s1 * s1) THEN 1 ELSE 0 END AS BIGINT)
        |    AS anomaly
        |FROM w ORDER BY event_type, ts_us_long, event_id""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |             epoch_ns(ts) // 1000 AS us FROM events),
        |s AS (SELECT user_id, min(us) AS from_us FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT s.user_id, s.from_us,
        |        min(CASE WHEN e.us > s.from_us THEN e.us END) AS to_us
        |      FROM s LEFT JOIN e ON e.user_id = s.user_id
        |        AND e.event_type = 'purchase'
        |      GROUP BY 1, 2)
        |SELECT user_id, from_us, to_us,
        |  CAST(CASE WHEN to_us IS NOT NULL
        |              AND to_us <= from_us + 3600000000 THEN 1 ELSE 0 END
        |    AS BIGINT) AS converted
        |FROM p ORDER BY user_id""".stripMargin
  )
}
