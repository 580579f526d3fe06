package graft.rdf

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** N-Quads source and sink — the dataset (named-graph) sibling of
  * [[NTriples]], feeding [[Sparql.runQuads]].
  *
  * Same Spark-native design: `spark.read.text` + codegen'd regex
  * extraction, line-oriented and arbitrarily parallel; the writer is the
  * symmetric `write.text`, and write∘parse is a fixpoint (parse → write →
  * parse reproduces the rows exactly).
  *
  * NORMALIZATION (as in [[NTriples]]): literal objects are reduced to
  * their unescaped LEXICAL form — `^^<datatype>` / `@lang` annotations are
  * accepted on input but not carried into the (s,p,o,g) columns, because
  * the engine's data model is plain lexical terms. A file using typed or
  * lang-tagged literals therefore re-renders them as plain literals.
  *
  * Line forms (W3C N-Quads: the graph label is an optional fourth IRI):
  * {{{
  *   <subj> <pred> <obj> [<graph>] .
  *   <subj> <pred> "literal"[^^<dt>|@lang] [<graph>] .
  * }}}
  * A line without a graph label belongs to the default graph, surfaced as
  * `g = ""` ([[Quads.DefaultGraph]]) — the same convention the GRAPH
  * solver uses, so `read → runQuads` composes directly. (An explicit `<>`
  * graph label coincides with the default graph, which is exactly W3C's
  * reading of an empty IRI reference here.) Literal bodies share
  * [[NTriples]]'s ECHAR/UCHAR escape handling; comments and blank lines
  * are dropped; malformed lines land in [[corrupt]].
  */
object NQuads {

  private val line =
    s"""^\\s*<([^>]*)>\\s+<([^>]*)>\\s+(?:<([^>]*)>|"(${NTriples.escapes})"(?:\\^\\^<[^>]*>|@[A-Za-z0-9-]+)?)(?:\\s+<([^>]*)>)?\\s*\\.\\s*$$"""

  private val litForm =
    s"""^\\s*<[^>]*>\\s+<[^>]*>\\s+"${NTriples.escapes}"(?:\\^\\^<[^>]*>|@[A-Za-z0-9-]+)?(?:\\s+<[^>]*>)?\\s*\\.\\s*$$"""

  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  /** (s, p, o, g) — the layout [[Sparql.runQuads]] consumes; `g` is ""
    * for default-graph lines. */
  def parse(lines: DataFrame): DataFrame =
    parseTyped(lines).select(col("s"), col("p"), col("o"), col("g"))

  /** (s, p, o, g, o_is_iri): keeps the object's node kind for the
    * writer. */
  def parseTyped(lines: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(lines.sparkSession)
    lines
      .filter(length(trim(col("value"))) > 0 && !trim(col("value")).startsWith("#"))
      .filter(col("value").rlike(line))
      .select(
        regexp_extract(col("value"), line, 1).as("s"),
        regexp_extract(col("value"), line, 2).as("p"),
        regexp_extract(col("value"), line, 3).as("o_iri"),
        regexp_extract(col("value"), line, 4).as("o_lit"),
        // an absent graph label extracts "" — identical to an explicit
        // `<>`, and both mean the default graph
        regexp_extract(col("value"), line, 5).as("g"),
        (!col("value").rlike(litForm)).as("o_is_iri"))
      .select(col("s"), col("p"),
        when(col("o_is_iri"), col("o_iri"))
          .otherwise(expr("nt_unescape(o_lit)")).as("o"),
        col("g"), col("o_is_iri"))
  }

  /** Non-empty, non-comment lines that failed to parse. */
  def corrupt(lines: DataFrame): DataFrame =
    lines
      .filter(length(trim(col("value"))) > 0 && !trim(col("value")).startsWith("#"))
      .filter(!col("value").rlike(line))

  /** Render (s, p, o, g, o_is_iri) rows to N-Quads lines; default-graph
    * rows (g = "") render without a graph label, i.e. as N-Triples. */
  def render(quads: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(quads.sparkSession)
    quads.select(concat(
      lit("<"), col("s"), lit("> <"), col("p"), lit("> "),
      when(col("o_is_iri"), concat(lit("<"), col("o"), lit(">")))
        .otherwise(concat(lit("\""), expr("nt_escape(o)"), lit("\""))),
      when(col("g") === Quads.DefaultGraph, lit(""))
        .otherwise(concat(lit(" <"), col("g"), lit(">"))),
      lit(" .")).as("value"))
  }

  /** N-Quads sink: distributed text write, one line per quad. */
  def write(quads: DataFrame, path: String): Unit =
    render(quads).write.mode(SaveMode.Overwrite).text(path)
}
