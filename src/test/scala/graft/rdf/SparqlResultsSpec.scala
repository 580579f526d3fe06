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

  test("CSV: lexical forms only, unbound empty, writer quotes") {
    val rows = SparqlResults.toCsvRows(sols)
      .as[(String, String, String)].collect()
    assert(rows(0) === (("http://ex/a", "hello", "plain")))
    assert(rows(1)._2 === "3" && rows(1)._3 === null)
    // round-trip through the actual CSV writer/reader (RFC 4180 quoting)
    val dir = java.nio.file.Files.createTempDirectory("csvres").toString
    SparqlResults.writeCsv(sols, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 3)
    assert(back.columns.toSeq === Seq("s", "v", "w"))
    assert(back.filter(col("v") === "hello").count() === 1)
  }

  test("TSV: full term syntax, bare cells become quoted literals") {
    val lines = SparqlResults.toTsvRows(sols).as[String].collect()
    assert(lines(0) === "?s\t?v\t?w")
    assert(lines.exists(_ ==
      "<http://ex/a>\t\"hello\"@en\t\"plain\""))
    // unbound → empty cell; term strings pass through untouched
    assert(lines.exists(_.startsWith(
      "_:b0\t\"3\"^^<http://www.w3.org/2001/XMLSchema#integer>\t")))
    // a tab INSIDE a bare literal is ECHAR-escaped, so columns stay 3
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
}
