package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-Triples source — the reference's native input format (SURVEY.md §2
  * R1: MapReduce mappers parse N-Triples lines from HDFS).
  *
  * Spark-native equivalent: `spark.read.text` + codegen'd regex extraction;
  * line-oriented, so the text source splits files across tasks and the
  * parse runs inside whole-stage codegen — no UDF, no driver work,
  * arbitrarily parallel at 100 TB.
  *
  * Supported line forms (the fragment the reference's loader handles):
  * {{{
  *   <subj> <pred> <obj> .
  *   <subj> <pred> "literal" .
  *   <subj> <pred> "literal"^^<datatype> .
  *   <subj> <pred> "literal"@lang .
  * }}}
  * Comments (`# ...`) and blank lines are dropped. Malformed lines go to
  * [[corrupt]] rather than silently vanishing.
  */
object NTriples {

  private val line =
    """^\s*<([^>]*)>\s+<([^>]*)>\s+(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?)\s*\.\s*$"""

  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  def parse(lines: DataFrame): DataFrame =
    lines
      .filter(length(trim(col("value"))) > 0 && !trim(col("value")).startsWith("#"))
      .select(
        regexp_extract(col("value"), line, 1).as("s"),
        regexp_extract(col("value"), line, 2).as("p"),
        regexp_extract(col("value"), line, 3).as("o_iri"),
        regexp_extract(col("value"), line, 4).as("o_lit"))
      .filter(col("s") =!= "")
      .select(col("s"), col("p"),
        when(col("o_iri") =!= "", col("o_iri")).otherwise(col("o_lit")).as("o"))

  /** Non-empty, non-comment lines that failed to parse. */
  def corrupt(lines: DataFrame): DataFrame =
    lines
      .filter(length(trim(col("value"))) > 0 && !trim(col("value")).startsWith("#"))
      .filter(regexp_extract(col("value"), line, 1) === "")
}
