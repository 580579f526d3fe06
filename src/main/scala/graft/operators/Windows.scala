package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Window (analytic) functions: ranking, lag/lead, sliding frames, top-k per
  * group.
  *
  * Scale notes: a window spec shuffles once on its partition key and sorts
  * within partitions — all four queries below share `partitionBy(key)` so
  * multiple window columns reuse ONE exchange (visible in `.explain`:
  * a single Exchange under several Window nodes). Frame sums go through
  * decimal for cross-engine determinism (DuckDB evaluates sliding frames
  * with a segment tree, i.e. different double-add order). Top-k per group is
  * `row_number <= k` — a full sort per partition but no global sort, unlike
  * `orderBy().limit()` which is a global top-k (TakeOrderedAndProject).
  */
object Windows extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_win_rank" -> ((s, d) => {
      val byBal = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc)
      val stable = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"),
          rank().over(byBal).as("rnk"),
          dense_rank().over(byBal).as("drnk"),
          row_number().over(stable).as("rn"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    }),

    "q_win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q_win_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val dec = col("o_totalprice").cast(DecimalType(27, 4))
      val frame3 = w.rowsBetween(-2, Window.currentRow)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec).over(run).cast(DoubleType).as("running_total"),
          (sum(dec).over(frame3).cast(DoubleType) /
            count(lit(1)).over(frame3)).as("moving_avg3"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q_win_range_frame" -> ((s, d) => {
      // RANGE frame over a TIME key (vs q_win_frame's ROWS frame): the
      // 30-day trailing spend per customer. Range frames are
      // tie-insensitive — all peers of the current order key are in the
      // frame — so the epoch-ms key needs no tiebreak for determinism;
      // decimal accumulation keeps the sliding sum engine-exact.
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("ms"))
        .rangeBetween(-30L * 86400000L, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("ms", unix_millis(col("o_orderdate")))
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_trailing"),
          sum(col("o_totalprice").cast(DecimalType(27, 4))).over(w)
            .cast(DoubleType).as("sum_trailing"))
        .orderBy(col("o_orderkey"))
    }),

    "q_win_distribution" -> ((s, d) => {
      // unique total order (custkey tiebreak) keeps ntile boundaries and
      // percent_rank/cume_dist deterministic across engines
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          graft.Det.roundSafe(percent_rank().over(w), 6).as("pr"),
          graft.Det.roundSafe(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    }),

    "q_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT c_nationkey, c_custkey,
        |  CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS rnk,
        |  CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS drnk,
        |  CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        |FROM customer ORDER BY c_nationkey, c_custkey""".stripMargin,

    "q_win_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  (CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   / count(*) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS moving_avg3
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(count(*) OVER w AS BIGINT) AS n_trailing,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) OVER w AS DOUBLE)
        |    AS sum_trailing
        |FROM (SELECT *, epoch_ms(o_orderdate) AS ms FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY ms
        |  RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q_win_distribution" -> {
      val w = "PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey"
      s"""SELECT c_nationkey, c_custkey,
         |  CAST(ntile(4) OVER ($w) AS INT) AS quartile,
         |  ${graft.Det.roundSafeSql(s"percent_rank() OVER ($w)", 6)} AS pr,
         |  ${graft.Det.roundSafeSql(s"cume_dist() OVER ($w)", 6)} AS cd
         |FROM customer ORDER BY c_nationkey, c_custkey""".stripMargin
    },

    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
  )
}
