package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md).
  *
  * Design notes for scale: every loader is a plain parquet scan, so Catalyst
  * pushes filters and projections into the scan (PushedFilters / ReadSchema
  * in `.explain`), and partition-parallelism follows
  * `spark.sql.files.maxPartitionBytes`. No caching happens here — callers
  * decide persistence policy.
  *
  * The reference engine loads N-Triples into subject-sharded MongoDB
  * (D-SPARQ, ISWC 2013 demo; reference snapshot at /root/reference was empty
  * — see SURVEY.md §0). Our equivalent storage primitive is columnar parquet
  * + optional bucketing on the join key (see graft.rdf).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Plain scan, with one normalization: parquet files written with
    * isAdjustedToUTC=false are inferred as TIMESTAMP_NTZ by Spark 4 (the
    * scale-factor dirs differ on this flag) — cast those to TIMESTAMP. The
    * session timezone is pinned to UTC, so the cast preserves the instant
    * and time functions (unix_millis, date_trunc, window) apply uniformly.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == TimestampNTZType)
        acc.withColumn(f.name, col(f.name).cast(TimestampType))
      else acc
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
    * We read the raw nanos (legacy conf) and expose:
    *   - `ts_ns`: exact epoch nanos (Long) — use for arithmetic that must
    *     not lose precision (as-of joins, session gaps);
    *   - `ts_us`: micros-truncated TimestampType — use for window functions
    *     (`window`, `session_window`) which require TimestampType.
    * Truncation ns→us is a floor; window-bucket membership is unaffected
    * because bucket boundaries are whole seconds.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us_long", expr("ts_ns div 1000"))
      .withColumn("ts_us", timestamp_micros(col("ts_us_long")))
  }
}
