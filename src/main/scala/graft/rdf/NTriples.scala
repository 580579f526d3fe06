package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** N-Triples source and sink — the reference's native input format
  * (SURVEY.md §2 R1: MapReduce mappers parse N-Triples lines from HDFS).
  *
  * Spark-native equivalent: `spark.read.text` + codegen'd regex extraction;
  * line-oriented, so the text source splits files across tasks and the
  * parse runs inside whole-stage codegen — no UDF, no driver work,
  * arbitrarily parallel at 100 TB. The writer is the symmetric
  * `df.write.text` over a rendered line column, so round-trips are exact
  * (see RdfSpec's round-trip property).
  *
  * Supported line forms (the fragment the reference's loader handles):
  * {{{
  *   <subj> <pred> <obj> .
  *   <subj> <pred> "literal" .
  *   <subj> <pred> "literal"^^<datatype> .
  *   <subj> <pred> "literal"@lang .
  * }}}
  * Literal bodies decode the W3C ECHAR + UCHAR escapes (`\n`, `\"`, `\\`,
  * `\uXXXX`, `\UXXXXXXXX`, …) via the codegen'd [[NtUnescape]] expression.
  * Comments (`# ...`) and blank lines are dropped. Malformed lines go to
  * [[corrupt]] rather than silently vanishing.
  *
  * NORMALIZATION: literal objects are reduced to their unescaped LEXICAL
  * form — `^^<datatype>` / `@lang` annotations are accepted on input but
  * not carried into the (s,p,o) columns (the engine's data model is plain
  * lexical terms), so the writer re-renders typed/lang-tagged literals as
  * plain literals. Round-trip exactness holds from the parsed rows
  * (parse → write → parse is the identity), not from annotated files.
  */
object NTriples {

  // UCHAR in the escape alternative is stricter than the generic `\\.` so a
  // truncated `\u12` fails the line match and lands in `corrupt` instead of
  // throwing mid-decode. \U is range-restricted to code points ≤ U+10FFFF
  // (000XXXXX | 0010XXXX) for the same reason: `\UFFFFFFFF` is 8 hex digits
  // but not a code point, and must be a corrupt line, not a decode crash.
  private[rdf] val escapes =
    """(?:[^"\\]|\\u[0-9A-Fa-f]{4}|\\U(?:000[0-9A-Fa-f]{5}|0010[0-9A-Fa-f]{4})|\\[tbnrf"'\\])*"""
  private val line =
    s"""^\\s*<([^>]*)>\\s+<([^>]*)>\\s+(?:<([^>]*)>|"($escapes)"(?:\\^\\^<[^>]*>|@[A-Za-z0-9-]+)?)\\s*\\.\\s*$$"""

  // The literal-object alternative alone — decides IRI vs literal for a
  // line already known to match (regexp_extract can't distinguish "group
  // matched empty" from "group did not participate").
  private val litForm =
    s"""^\\s*<[^>]*>\\s+<[^>]*>\\s+"$escapes"(?:\\^\\^<[^>]*>|@[A-Za-z0-9-]+)?\\s*\\.\\s*$$"""

  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  /** (s, p, o) with IRIs and decoded literals coalesced into one string
    * column — the layout the dictionary/BGP layer consumes. */
  def parse(lines: DataFrame): DataFrame =
    parseTyped(lines).select(col("s"), col("p"), col("o"))

  /** (s, p, o, o_is_iri): keeps the object's node kind, which the writer
    * needs to re-render `<iri>` vs `"literal"` faithfully. */
  def parseTyped(lines: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(lines.sparkSession)
    lines
      .filter(length(trim(col("value"))) > 0 && !trim(col("value")).startsWith("#"))
      // match detection via rlike on the full pattern, NOT by testing an
      // extracted group for emptiness — `<> <p> <o> .` (empty IRI subject)
      // and `"" ` literals are valid lines, not corrupt ones
      .filter(col("value").rlike(line))
      .select(
        regexp_extract(col("value"), line, 1).as("s"),
        regexp_extract(col("value"), line, 2).as("p"),
        regexp_extract(col("value"), line, 3).as("o_iri"),
        regexp_extract(col("value"), line, 4).as("o_lit"),
        (!col("value").rlike(litForm)).as("o_is_iri"))
      .select(col("s"), col("p"),
        when(col("o_is_iri"), col("o_iri"))
          .otherwise(expr("nt_unescape(o_lit)")).as("o"),
        col("o_is_iri"))
  }

  /** Non-empty, non-comment lines that failed to parse. */
  def corrupt(lines: DataFrame): DataFrame =
    lines
      .filter(length(trim(col("value"))) > 0 && !trim(col("value")).startsWith("#"))
      .filter(!col("value").rlike(line))

  /** Render (s, p, o, o_is_iri) rows to N-Triples lines (one string column
    * `value`, ready for `write.text`). Literals get ECHAR-escaped. */
  def render(triples: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(triples.sparkSession)
    triples.select(concat(
      lit("<"), col("s"), lit("> <"), col("p"), lit("> "),
      when(col("o_is_iri"), concat(lit("<"), col("o"), lit(">")))
        .otherwise(concat(lit("\""), expr("nt_escape(o)"), lit("\""))),
      lit(" .")).as("value"))
  }

  /** Render (s, p, o) TERM-STRING rows ([[Terms]]' conventions) to
    * N-Triples lines — the serializer for CONSTRUCT/DESCRIBE results,
    * whose object node-kind is carried in the cell, not a flag column.
    * Bare s/p cells read as IRIs (the default stores' layout); a bare o
    * is a plain literal — Terms' own verdict on an unmarked value.
    * Literal payloads are stored RAW and ECHAR-escape at this boundary;
    * `@lang` / `^^<datatype>` annotations pass through. */
  def renderTerms(triples: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(triples.sparkSession)
    def subjPred(c: Column): Column =
      when(Terms.isIri(c) || Terms.isBlank(c), c)
        .otherwise(concat(lit("<"), c, lit(">")))
    def obj(c: Column): Column = {
      val lastQ = length(c) - instr(reverse(c), "\"") + 1
      val suffix = c.substr(lastQ + 1, length(c))
      when(Terms.isIri(c) || Terms.isBlank(c), c)
        .when(c.startsWith("\""),
          concat(lit("\""), call_function("nt_escape", Terms.lexical(c)),
            lit("\""), suffix))
        .otherwise(concat(lit("\""), call_function("nt_escape", c),
          lit("\"")))
    }
    triples.select(concat(subjPred(col("s")), lit(" "),
      subjPred(col("p")), lit(" "), obj(col("o")), lit(" .")).as("value"))
  }

  /** N-Triples sink: distributed text write, one line per triple. */
  def write(triples: DataFrame, path: String): Unit =
    render(triples).write.mode(SaveMode.Overwrite).text(path)
}
