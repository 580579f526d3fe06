package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TriG (W3C TriG 1.1) reader/writer — the quads member of the
  * serialization family ([[NTriples]], [[NQuads]], [[Turtle]], [[JsonLd]],
  * [[RdfXml]]): Turtle syntax plus `[GRAPH] label { ... }` named-graph
  * blocks and `{ ... }` / top-level statements for the default graph.
  *
  * The grammar is Turtle's — the parser IS [[Turtle.Parser]], entered
  * through its TriG production ([[Turtle.Parser.parseTrig]]), so every
  * Turtle feature (prefixes, `;`/`,` lists, blank node property lists,
  * long strings, numeric/boolean abbreviations) works inside graph blocks
  * with identical semantics and identical loud rejections.
  *
  * Distribution model matches [[Turtle]]: TriG is stateful (prefixes scope
  * the document, blocks span lines), so files are the unit of parallelism
  * — `wholetext` scan, one task per document. The default graph is
  * `g = ""` ([[Quads.DefaultGraph]]), aligning with [[Quads]] and the
  * SPARQL dataset rule; blank-node graph labels get the same
  * document-scoped rewrite as subject/object blank nodes.
  */
object Trig {

  final case class QRow(s: String, p: String, o: String, o_is_iri: Boolean,
      o_lang: String, o_datatype: String, g: String)

  /** (s, p, o, g) plain-lexical quads — the layout [[Quads]] consumes. */
  def read(spark: SparkSession, path: String): DataFrame =
    readTyped(spark, path).select("s", "p", "o", "g")

  /** Full-fidelity read: (s, p, o, o_is_iri, o_lang, o_datatype, g). */
  def readTyped(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("f"), col("value"))
      .as[(String, String)]
      .flatMap { case (file, doc) => parseDoc(doc, Turtle.docTag(file, doc)) }
      .toDF()
  }

  /** Parse one TriG document (driver- or executor-side Scala). */
  def parseDoc(doc: String, bnodeTag: String = "d"): Seq[QRow] =
    new Turtle.Parser(doc, bnodeTag).parseTrig().map { case (r, g) =>
      QRow(r.s, r.p, r.o, r.o_is_iri, r.o_lang, r.o_datatype, g)
    }

  /** TriG sink: named graphs as `<g> { ... }` blocks with subject-grouped
    * statements inside (the `;`/`,` list syntax), default-graph rows as
    * top-level statements. Input is (s, p, o, o_is_iri, g).
    * PRECONDITION (as [[Turtle.write]]): s/p/g are VALID IRI terms — RDF
    * IRIs cannot contain '>', '<' or whitespace, and the writer emits
    * them raw inside angle brackets; literal objects are the escaped
    * position. One output row per graph — three aggregations, paid once
    * at export; a single pathological graph holding most of the corpus
    * should be exported via [[NQuads.write]] (line-oriented, splittable)
    * instead. */
  def write(typedQuads: DataFrame, path: String): Unit = {
    graft.functions.GraftFunctions.register(typedQuads.sparkSession)
    val obj = when(col("o_is_iri"), concat(lit("<"), col("o"), lit(">")))
      .otherwise(concat(lit("\""), expr("nt_escape(o)"), lit("\"")))
    val stmts = typedQuads
      .groupBy(col("g"), col("s"), col("p"))
      .agg(concat_ws(" , ", array_sort(collect_list(obj))).as("objs"))
      .groupBy(col("g"), col("s"))
      .agg(concat_ws(" ; ", array_sort(collect_list(
        concat(lit("<"), col("p"), lit("> "), col("objs"))))).as("body"))
      .select(col("g"),
        concat(lit("<"), col("s"), lit("> "), col("body"), lit(" ."))
          .as("stmt"))
    stmts
      .groupBy(col("g"))
      .agg(concat_ws("\n", array_sort(collect_list(col("stmt")))).as("stmts"))
      .select(
        when(col("g") === Quads.DefaultGraph, col("stmts"))
          .otherwise(concat(lit("<"), col("g"), lit("> {\n"), col("stmts"),
            lit("\n}"))).as("value"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)
  }
}
