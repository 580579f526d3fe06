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
    * kilobytes, no rescan, no pairwise join of the data. Both summaries
    * are mergeable (register max / element-wise min), so the table
    * maintains under the same insert-batch fold as [[maintain]]. */
  def setSketches(df: DataFrame, stratum: Column, value: Column,
      lgK: Int = 12, numHashes: Int = 128): DataFrame = {
    // columnar MinHash: per seed, the group minimum of a seeded xxhash64
    // — every component a codegen'd min aggregate with map-side combine,
    // merge = element-wise min (associative), same estimator as
    // functions.MinHashAggregator's typed form
    val v = value.cast("string")
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(concat(v, lit(s"#$i")))).as(s"__h$i"))
    val mh = df.groupBy(stratum.as("stratum"))
      .agg(mins.head, mins.tail: _*)
      .select(col("stratum"),
        array((0 until numHashes).map(i => col(s"__h$i")): _*).as("mh"))
    mh.join(hllSketches(df, stratum, value, lgK), "stratum")
  }

  /** Estimated |A∩B| between two strata of a [[setSketches]] table:
    * Jaccard from the MinHash signatures (fraction of agreeing
    * components) times the HLL union cardinality — inclusion-exclusion
    * from summaries alone. One broadcast-sized join; tolerance is
    * governed by numHashes (J stderr ≈ 1/√n) and lgK. */
  def intersectionEstimate(sketches: DataFrame, a: String,
      b: String): DataFrame = {
    val left = sketches.filter(col("stratum") === a)
      .select(col("mh").as("mh_a"), col("sketch").as("sk_a"))
    val right = sketches.filter(col("stratum") === b)
      .select(col("mh").as("mh_b"), col("sketch").as("sk_b"))
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
