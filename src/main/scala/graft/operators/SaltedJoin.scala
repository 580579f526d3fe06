package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for hash joins: salt the skewed (big) side into
  * `factor` sub-keys and replicate the small side across all salts, so one
  * hot key spreads over `factor` reducers instead of stalling one.
  *
  * AQE's skew-join splitting (on by default) handles most cases at runtime;
  * reach for explicit salting when a *single* key dominates so heavily that
  * even split shuffle blocks overwhelm a task, or when the join runs inside
  * an operator AQE can't re-plan (e.g. streaming state joins). Any row→salt
  * mapping yields the same join result (the small side carries every salt
  * value), but the mapping must be DETERMINISTIC per row content: a
  * positional salt (monotonically_increasing_id) changes on stage retry,
  * and a salt that moved between map-task attempts loses/duplicates rows
  * against reducers that already consumed the first attempt's output.
  */
object SaltedJoin {

  def inner(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor >= 1)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(factor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
