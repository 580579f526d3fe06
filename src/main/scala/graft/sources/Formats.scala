package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic batch sources/sinks: parquet (the default everywhere in
  * this engine), ORC (columnar alternative, same pushdown/pruning
  * behavior), CSV and JSON (interchange; schema supplied on read because
  * neither carries reliable types — inference costs an extra pass and
  * guesses).
  *
  * Scale note: CSV/JSON are line-splittable but row-oriented and
  * uncompressed-by-default — fine as ingestion boundaries, wrong as the
  * working set. The engine's canonical storage stays columnar
  * (parquet/ORC, optionally bucketed or partitioned — see
  * [[graft.rdf.TripleStore]]).
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "csv", "json")

  def write(df: DataFrame, path: String, format: String): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def read(spark: SparkSession, path: String, format: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.fold(r)(r.schema)
    (if (format == "csv") withSchema.option("header", "true") else withSchema)
      .load(path)
  }
}
