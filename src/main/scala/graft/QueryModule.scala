package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** A bundle of named queries plus their DuckDB oracle SQL. SparkEntry
  * aggregates all modules; the driver hash-compares each query's parquet
  * output against DuckDB running the oracle SQL on the same tables.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]
}

/** Determinism helpers shared by all modules.
  *
  * Double summation is order-dependent, and Spark's partial aggregation
  * combines partitions in nondeterministic order — so a raw `sum(double)`
  * can differ from DuckDB in late ulps and occasionally straddle a rounding
  * boundary. We instead cast each addend to a fixed-scale decimal (exact,
  * order-independent sum) and cast the exact total back to double. Both
  * engines round double→decimal to nearest, and exact decimal→double casts
  * agree, so results are bit-identical. This also survives 1000-executor
  * combine orders at 100 TB.
  */
object Det {
  /** Deterministic double sum: exact decimal accumulation. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(27, scale))).cast(DoubleType)

  /** Deterministic double avg: exact sum / count. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Oracle-side (DuckDB) rendering of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 4): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(27,$scale))) AS DOUBLE)"

  def davgSql(expr: String, scale: Int = 4): String =
    s"(${dsumSql(expr, scale)} / count($expr))"

  /** Tie-safe cross-engine rounding: floor(x·10^s + 0.5)/10^s.
    *
    * Spark's `round()` rounds the value's *shortest decimal repr*
    * (BigDecimal.valueOf) while DuckDB rounds the *binary* value — they
    * disagree whenever the repr sits exactly on a rounding tie (e.g.
    * round(0.59625, 4) → 0.5963 in Spark, 0.5962 in DuckDB). This form uses
    * only IEEE mul/add/floor, which both engines evaluate bit-identically.
    * (For negatives it rounds half toward +∞ rather than away from zero —
    * consistently on both sides, which is what matters for the oracle.)
    */
  def roundSafe(c: Column, scale: Int): Column = {
    val k = math.pow(10, scale)
    floor(c * k + lit(0.5)) / lit(k)
  }

  def roundSafeSql(expr: String, scale: Int): String = {
    val k = "1" + "0" * scale
    s"(floor(($expr) * $k.0 + 0.5) / $k.0)"
  }
}
