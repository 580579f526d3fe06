package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RdfXmlSpec extends SparkSpec {
  import spark.implicits._

  test("striped-subset parse: about, typed nodes, literals, nesting") {
    val doc =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://example.org/">
        |  <ex:Person rdf:about="http://example.org/a" ex:nick="Al">
        |    <ex:name>Alice</ex:name>
        |    <ex:knows rdf:resource="http://example.org/b"/>
        |    <ex:label xml:lang="en">Alice</ex:label>
        |    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</ex:age>
        |    <ex:address>
        |      <ex:Addr ex:city="Springfield"/>
        |    </ex:address>
        |  </ex:Person>
        |  <rdf:Description rdf:nodeID="n1">
        |    <ex:name xml:lang="fr">Bob</ex:name>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    val rows = RdfXml.parseDoc(doc, "t")
    val a = "http://example.org/a"
    // typed node element → rdf:type
    assert(rows.exists(r => r.s == a &&
      r.p == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" &&
      r.o == "http://example.org/Person" && r.o_is_iri))
    // property attribute shorthand
    assert(rows.exists(r => r.s == a &&
      r.p == "http://example.org/nick" && r.o == "Al" && !r.o_is_iri))
    // plain / resource / lang / datatype properties
    assert(rows.exists(r => r.s == a && r.p.endsWith("/name") && r.o == "Alice"))
    assert(rows.exists(r => r.s == a && r.p.endsWith("/knows") &&
      r.o == "http://example.org/b" && r.o_is_iri))
    assert(rows.exists(r => r.o == "Alice" && r.o_lang == "en"))
    assert(rows.exists(r => r.o == "42" && r.o_datatype.endsWith("#integer")))
    // nested node element: fresh bnode subject, linked from the parent
    val link = rows.find(r => r.s == a && r.p.endsWith("/address")).get
    assert(link.o.startsWith("_:bt_"))
    assert(rows.exists(r => r.s == link.o && r.p.endsWith("/city") &&
      r.o == "Springfield"))
    // rdf:nodeID subject; nested lang scoping on the literal
    assert(rows.exists(r => r.s == "_:n1" && r.o == "Bob" && r.o_lang == "fr"))
  }

  test("xml:lang inherits from the node element per XML scoping") {
    val doc =
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://example.org/">
        |  <rdf:Description rdf:about="x:a" xml:lang="de">
        |    <ex:l1>eins</ex:l1>
        |    <ex:l2 xml:lang="it">uno</ex:l2>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    val rows = RdfXml.parseDoc(doc)
    assert(rows.find(_.o == "eins").get.o_lang === "de")
    assert(rows.find(_.o == "uno").get.o_lang === "it")
  }

  test("out-of-subset constructs and XXE reject loudly") {
    def rdf(body: String) =
      s"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         |         xmlns:ex="http://example.org/">$body</rdf:RDF>""".stripMargin
    intercept[IllegalArgumentException](RdfXml.parseDoc(rdf(
      """<rdf:Description rdf:about="x:a">
        |<ex:p rdf:parseType="Literal"><b>x</b></ex:p>
        |</rdf:Description>""".stripMargin)))
    intercept[IllegalArgumentException](RdfXml.parseDoc(rdf(
      """<rdf:Description rdf:ID="a"><ex:p>v</ex:p></rdf:Description>""")))
    intercept[IllegalArgumentException](RdfXml.parseDoc(rdf(
      """<rdf:Seq><rdf:li>x</rdf:li></rdf:Seq>""")))
    // a DOCTYPE (the XXE vector) is refused at the parser level
    intercept[Exception](RdfXml.parseDoc(
      """<?xml version="1.0"?><!DOCTYPE r [<!ENTITY x SYSTEM "file:///etc/passwd">]>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"/>"""
        .stripMargin))
  }

  test("write → read recovers the typed triple set modulo the graft: ns") {
    val typed = Triples.build(spark, sf0001)
      .withColumn("o_is_iri", col("o").rlike("^[conr]:"))
      .withColumn("o_lang", lit(""))
      .withColumn("o_datatype", lit(""))
    val dir = java.nio.file.Files.createTempDirectory("rdfxml-rt").toString
    RdfXml.write(typed, s"$dir/out")
    val back = RdfXml.readTyped(spark, s"$dir/out/part-*.txt")
      .withColumn("p", expr("substring(p, 7)"))
    assert(back.count() === typed.count())
    assert(back.exceptAll(typed).count() === 0)
    assert(typed.exceptAll(back).count() === 0)
  }

  test("full-IRI predicates round-trip through namespace splitting") {
    val typed = Seq(
      ("x:s", "http://example.org/name", "v", false, "en", ""),
      ("x:s", "http://example.org/vocab#age", "7", false, "",
        "http://www.w3.org/2001/XMLSchema#integer"),
      ("x:s", "http://example.org/knows", "x:o", true, "", ""))
      .toDF("s", "p", "o", "o_is_iri", "o_lang", "o_datatype")
    val dir = java.nio.file.Files.createTempDirectory("rdfxml-iri").toString
    RdfXml.write(typed, s"$dir/out")
    val back = RdfXml.readTyped(spark, s"$dir/out/part-*.txt")
    assert(back.exceptAll(typed).count() === 0)
    assert(typed.exceptAll(back).count() === 0)
  }
}
