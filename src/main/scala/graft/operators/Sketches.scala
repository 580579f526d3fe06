package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-summary workflow over Spark's DataSketches HLL builtins —
  * the 100 TB pattern for distinct counting: per-stratum sketches are
  * built ONCE at ingest (each a few KB, mergeable), persisted beside the
  * data, and every later question ("distinct across these strata?",
  * "...this month + last month?") is answered by UNIONING the sketches —
  * never by rescanning the corpus. `approx_count_distinct` (q_agg_approx
  * _distinct) answers one fixed question per scan; a sketch TABLE answers
  * all of them from kilobytes.
  *
  * Determinism: DataSketches HLL register state is a max-per-bucket fold
  * of a seeded hash — associative and commutative — so the union of
  * per-stratum sketches reaches the register state of a whole-corpus
  * sketch, and estimates are identical whatever the partitioning or merge
  * order (asserted in SketchesSpec). No oracle (DuckDB's approx engine
  * differs); the spec bounds error vs exact distinct counts instead.
  */
object Sketches {

  /** Per-stratum HLL sketch table: one binary sketch per group. `lgK`=12
    * is the DataSketches default (~1.6% relative standard error, ≤4 KB a
    * sketch); the aggregation is map-side-combining like any hash agg,
    * and the output is |strata| rows — this is the ingest-time artifact
    * to persist. */
  def hllSketches(df: DataFrame, stratum: Column, value: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(stratum.as("stratum"))
      .agg(hll_sketch_agg(value, lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Merge a sketch table (or any filtered subset of it) into one
    * estimate: a kilobytes-sized aggregation, never a data rescan. */
  def hllUnionEstimate(sketches: DataFrame): DataFrame =
    sketches
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("estimate"))

  /** Per-stratum estimates PLUS the global union row ("__all") from the
    * same sketch table — the query a persisted sketch store serves. */
  def hllEstimates(sketches: DataFrame): DataFrame = {
    val per = sketches.select(col("stratum"),
      hll_sketch_estimate(col("sketch")).as("estimate"))
    val all = sketches
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("estimate"))
      .select(lit("__all").as("stratum"), col("estimate"))
    per.unionByName(all)
  }

  /** Per-stratum set-sketch PAIR table: an HLL sketch (union
    * cardinality) AND a MinHash signature (Jaccard) per group — together
    * they answer the question neither answers alone: the DISTINCT
    * INTERSECTION between any two strata, |A∩B| ≈ J(A,B) · |A∪B|, from
    * kilobytes, no rescan, no pairwise join of the data. ONE scan: every
    * MinHash component, the HLL sketch and the row count are aggregates
    * of the same grouping, so the whole table is a single
    * map-side-combining groupBy. Both summaries are mergeable — fold
    * insert batches in with [[maintainSet]]. NULL values are excluded
    * from both summaries alike (min skips the null-gated hash exactly as
    * hll_sketch_agg skips null inputs), so the two sketches always
    * describe the same set. */
  def setSketches(df: DataFrame, stratum: Column, value: Column,
      lgK: Int = 12, numHashes: Int = 128): DataFrame = {
    // columnar MinHash: per seed, the group minimum of a seeded xxhash64
    // — every component a codegen'd min aggregate, merge = element-wise
    // min (associative), same estimator as functions.MinHashAggregator's
    // typed form
    val v = value.cast("string")
    val mins = (0 until numHashes).map(i =>
      min(when(v.isNotNull, xxhash64(concat(v, lit(s"#$i"))))).as(s"__h$i"))
    val aggs = mins ++ Seq(
      hll_sketch_agg(value, lit(lgK)).as("sketch"),
      count(lit(1)).as("n_rows"))
    df.groupBy(stratum.as("stratum"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("stratum"),
        array((0 until numHashes).map(i => col(s"__h$i")): _*).as("mh"),
        col("sketch"), col("n_rows"))
  }

  /** [[maintain]] for a [[setSketches]] table: HLL registers union,
    * MinHash components take the element-wise minimum, counts add —
    * every fold the summaries support, so the pair table ingests batches
    * without ever rescanning history. */
  def maintainSet(sketches: DataFrame, inserts: DataFrame, stratum: Column,
      value: Column, lgK: Int = 12, numHashes: Int = 128): DataFrame = {
    val delta = setSketches(inserts, stratum, value, lgK, numHashes)
      .withColumnRenamed("mh", "d_mh")
      .withColumnRenamed("sketch", "d_sketch")
      .withColumnRenamed("n_rows", "d_rows")
    sketches.join(delta, Seq("stratum"), "full_outer")
      .select(col("stratum"),
        when(col("mh").isNull, col("d_mh"))
          .when(col("d_mh").isNull, col("mh"))
          .otherwise(expr("zip_with(mh, d_mh, (x, y) -> least(x, y))"))
          .as("mh"),
        when(col("sketch").isNull, col("d_sketch"))
          .when(col("d_sketch").isNull, col("sketch"))
          .otherwise(hll_union(col("sketch"), col("d_sketch"),
            allowDifferentLgConfigK = false))
          .as("sketch"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_rows"), lit(0L)))
          .as("n_rows"))
  }

  /** Estimated |A∩B| between two strata of a [[setSketches]] table:
    * Jaccard from the MinHash signatures (fraction of agreeing
    * components) times the HLL union cardinality — inclusion-exclusion
    * from summaries alone. One broadcast-sized join; tolerance is
    * governed by numHashes (J stderr ≈ 1/√n) and lgK. An absent stratum
    * label fails loudly — an empty result would read as "no overlap". */
  def intersectionEstimate(sketches: DataFrame, a: String,
      b: String): DataFrame = {
    val left = sketches.filter(col("stratum") === a)
      .select(col("mh").as("mh_a"), col("sketch").as("sk_a"))
    val right = sketches.filter(col("stratum") === b)
      .select(col("mh").as("mh_b"), col("sketch").as("sk_b"))
    require(!left.isEmpty, s"stratum '$a' is not in the sketch table")
    require(!right.isEmpty, s"stratum '$b' is not in the sketch table")
    left.crossJoin(right)
      .select(
        expr("size(filter(zip_with(mh_a, mh_b, (x, y) -> x = y), v -> v))")
          .cast("double")./(size(col("mh_a"))).as("jaccard"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"),
          allowDifferentLgConfigK = false)).as("union_card"))
      .select(col("jaccard"), col("union_card"),
        round(col("jaccard") * col("union_card")).cast("long")
          .as("intersection_est"))
  }

  /** Incremental maintenance of the sketch store from an INSERT batch:
    * sketch the batch alone (batch-sized work), then outer-merge with the
    * existing strata-sized table — `hll_union` is exactly the additive
    * fold HLL supports, so the maintained store estimates within sketch
    * error of a from-scratch rebuild (asserted in SketchesSpec; unioning
    * may promote a still-sparse sketch to dense form, so low-cardinality
    * estimates can move a few counts — the error BOUND is unchanged)
    * while never rescanning history. Deletes are NOT maintainable in an
    * HLL (register maxes don't retract) — retraction-bearing feeds must
    * rebuild, which is why this takes an insert frame, not a change feed.
    */
  def maintain(sketches: DataFrame, inserts: DataFrame, stratum: Column,
      value: Column, lgK: Int = 12): DataFrame = {
    val delta = hllSketches(inserts, stratum, value, lgK)
      .withColumnRenamed("sketch", "d_sketch")
      .withColumnRenamed("n_rows", "d_rows")
    sketches.join(delta, Seq("stratum"), "full_outer")
      .select(col("stratum"),
        when(col("sketch").isNull, col("d_sketch"))
          .when(col("d_sketch").isNull, col("sketch"))
          .otherwise(hll_union(col("sketch"), col("d_sketch"),
            allowDifferentLgConfigK = false))
          .as("sketch"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_rows"), lit(0L)))
          .as("n_rows"))
  }
}
