package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins.
  *
  * A hot join key sends all of its rows to one shuffle partition; at
  * 100 TB that one straggler task dominates the stage. Salting splits each
  * key into `salt` sub-keys: the skewed side tags every row with a
  * pseudo-random salt in [0, salt), the other side is exploded once per
  * salt value, and the join runs on (key, salt) — the hot key's rows now
  * spread over `salt` partitions. Row-for-row identical to the plain join
  * (each skewed row matches exactly its own salt copy of the other side).
  *
  * This is the deterministic, works-everywhere complement to AQE's
  * OptimizeSkewedJoin (which splits skewed sort-merge partitions at
  * runtime but cannot help joins AQE does not cover, e.g. bucketed-table
  * joins that skip the exchange, or streaming state joins). Cost: the
  * non-skewed side is replicated `salt`× — use against a dimension-sized
  * right side.
  *
  * The row→salt mapping must be DETERMINISTIC per row CONTENT, not per
  * position: a positional salt (monotonically_increasing_id) changes on
  * stage retry, and a salt that moved between map-task attempts
  * loses/duplicates rows against reducers that already consumed the first
  * attempt's output. Hence xxhash64 over the row's columns. Corollary:
  * byte-identical duplicate rows share a salt — salting spreads a hot KEY
  * with varied payloads, not a hot row repeated verbatim.
  */
object SkewJoin {

  /** Equi-join `skewed ⨝ small` on the same-named `key` column with the
    * skewed side salted `salt` ways. `joinType`: "inner" or "left_outer"
    * (each left row carries exactly one salt, so left-outer semantics
    * survive salting; right/full outer would need the right side's
    * unmatched rows deduplicated across salt copies — unsupported).
    */
  def salted(skewed: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(Set("inner", "left_outer")(joinType),
      s"salting supports inner/left_outer, got $joinType")
    // withColumn would silently overwrite a pre-existing __salt and then
    // drop would delete the user's column — refuse instead
    require(!(skewed.columns ++ small.columns).contains("__salt"),
      "input already has a __salt column")
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salt.toLong)))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
