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
  * an operator AQE can't re-plan (e.g. streaming state joins). The salt
  * assignment on the big side is arbitrary — any row→salt mapping yields
  * the same join result, since the small side carries every salt value.
  */
object SaltedJoin {

  def inner(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor >= 1)
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
