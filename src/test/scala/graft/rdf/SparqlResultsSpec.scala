package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SparqlResultsSpec extends SparkSpec {
  import spark.implicits._

  private def sols = Seq(
    ("<http://ex/a>", "\"hello\"@en", "plain"),
    ("_:b0", "\"3\"^^<http://www.w3.org/2001/XMLSchema#integer>", null),
    // payloads are stored RAW (Terms' convention): inner quotes unescaped
    ("<http://ex/q\"x>", "\"say \"hi\"\"", "tab\there")
  ).toDF("s", "v", "w")

  test("CSV: lexical forms only, RFC 4180 doubling, ONE header row") {
    val rows = SparqlResults.toCsvRows(sols)
      .as[(String, String, String)].collect()
    assert(rows(0) === (("http://ex/a", "hello", "plain")))
    assert(rows(1)._2 === "3" && rows(1)._3 === null)
    val dir = java.nio.file.Files.createTempDirectory("csvres").toString
    SparqlResults.writeCsv(sols.repartition(3), dir)
    // assemble the single document the way an endpoint would (getmerge):
    // exactly one header line — the per-part-file header option would
    // plant one per partition
    val raw = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv")).sortBy(_.getName)
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    assert(raw.count(_ == "s,v,w") === 1)
    // embedded quotes DOUBLE (RFC 4180), never backslash-escape
    assert(raw.exists(_.contains("\"say \"\"hi\"\"\"")),
      raw.mkString("\n"))
    assert(!raw.exists(_.contains("\\\"")))
    val back = spark.read.option("header", "true").option("escape", "\"")
      .csv(spark.createDataset(raw.toIndexedSeq)(
        org.apache.spark.sql.Encoders.STRING))
    assert(back.count() === 3)
    assert(back.filter(col("v") === "say \"hi\"").count() === 1)
  }

  test("TSV: full term syntax, raw payloads ECHAR-escaped at the boundary") {
    val lines = SparqlResults.toTsvRows(sols).as[String].collect()
    assert(lines(0) === "?s\t?v\t?w")
    assert(lines.exists(_ ==
      "<http://ex/a>\t\"hello\"@en\t\"plain\""))
    // unbound → empty cell; annotations survive re-serialization
    assert(lines.exists(_.startsWith(
      "_:b0\t\"3\"^^<http://www.w3.org/2001/XMLSchema#integer>\t")))
    // raw inner quotes and tabs in payloads are escaped, so every row
    // keeps exactly 3 columns and quoted literals parse under §4
    assert(lines.exists(_.contains("\"say \\\"hi\\\"\"")))
    assert(lines.exists(_.contains("\"tab\\there\"")))
    assert(lines.filter(_.nonEmpty).forall(_.split("\t", -1).length == 3))
  }

  test("JSON: typed term objects, unbound omitted, escaping delegated") {
    val doc = SparqlResults.jsonDocument(sols)
    // parse it back with the JSON reader to prove well-formedness
    val parsed = spark.read.json(Seq(doc).toDS())
    assert(parsed.select("head.vars").as[Seq[String]].head() ===
      Seq("s", "v", "w"))
    val b = parsed.selectExpr("explode(results.bindings) AS b")
    assert(b.count() === 3)
    assert(b.filter(col("b.s.type") === "uri").count() === 2)
    assert(b.filter(col("b.s.type") === "bnode").count() === 1)
    assert(b.filter(col("b.v.`xml:lang`") === "en").count() === 1)
    assert(b.filter(col("b.v.datatype") ===
      "http://www.w3.org/2001/XMLSchema#integer").count() === 1)
    // the unbound w is genuinely ABSENT from its binding object, and the
    // quote inside the literal survived JSON escaping
    assert(b.filter(col("b.w").isNull).count() === 1)
    assert(b.filter(col("b.v.value") === "say \"hi\"").count() === 1)
    // the row bound is enforced loudly
    val e = intercept[IllegalArgumentException](
      SparqlResults.jsonDocument(sols, maxRows = 2))
    assert(e.getMessage.contains("exceeds"))
  }

  test("XML: typed bindings, unbound omitted, round-trips a DOM parser") {
    // add XML-hostile payloads: &, <, > and quotes in every term position
    val hostile = Seq(
      ("<http://ex/a?x=1&y=<2>>", "\"a & b < c\"@en", "plain \"quoted\""),
      ("_:b0", "\"3\"^^<http://www.w3.org/2001/XMLSchema#integer>", null))
      .toDF("s", "v", "w")
    val doc = SparqlResults.xmlDocument(hostile)
    // well-formedness: the JDK DOM parser must accept the document
    val dom = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(doc.getBytes("UTF-8")))
    def elems(tag: String) = {
      val nl = dom.getElementsByTagName(tag)
      (0 until nl.getLength).map(nl.item)
    }
    assert(elems("variable").map(
      _.getAttributes.getNamedItem("name").getNodeValue) ===
      Seq("s", "v", "w"))
    assert(elems("result").size === 2)
    // typed term elements with ESCAPING undone by the parser
    assert(elems("uri").map(_.getTextContent) ===
      Seq("http://ex/a?x=1&y=<2>"))
    assert(elems("bnode").map(_.getTextContent) === Seq("b0"))
    val lits = elems("literal")
    assert(lits.map(_.getTextContent).toSet ===
      Set("a & b < c", "plain \"quoted\"", "3"))
    assert(lits.flatMap(l => Option(
        l.getAttributes.getNamedItem("xml:lang")).map(_.getNodeValue)) ===
      Seq("en"))
    assert(lits.flatMap(l => Option(
        l.getAttributes.getNamedItem("datatype")).map(_.getNodeValue)) ===
      Seq("http://www.w3.org/2001/XMLSchema#integer"))
    // the unbound w is ABSENT: row 2 carries two bindings, not three
    val perResult = elems("result").map(r =>
      r.getChildNodes.getLength)
    assert(perResult.sorted === Seq(2, 3))
    // the row bound is enforced loudly, like the JSON sibling
    val e = intercept[IllegalArgumentException](
      SparqlResults.xmlDocument(hostile, maxRows = 1))
    assert(e.getMessage.contains("exceeds"))
  }
}
