package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonLdSpec extends SparkSpec {
  import spark.implicits._

  test("flat-subset parse: context, @graph, @type, value objects") {
    val doc =
      """{
        |  "@context": {
        |    "ex": "http://example.org/",
        |    "name": "ex:name",
        |    "@vocab": "http://voc.example/"
        |  },
        |  "@graph": [
        |    { "@id": "ex:a",
        |      "@type": ["ex:Person", "ex:Agent"],
        |      "name": "Alice",
        |      "ex:knows": { "@id": "ex:b" },
        |      "age": 42,
        |      "score": 1.5,
        |      "active": true,
        |      "label": { "@value": "Alice", "@language": "en" },
        |      "born": { "@value": "1990-01-01",
        |                "@type": "http://www.w3.org/2001/XMLSchema#date" } },
        |    { "@id": "ex:b", "name": "Bob" }
        |  ]
        |}""".stripMargin
    val rows = JsonLd.parseDoc(doc)
    val byPo = rows.map(r => (r.p, r.o)).toSet
    // @type → rdf:type IRIs, both array members
    assert(rows.count(_.p.endsWith("rdf-syntax-ns#type")) === 2)
    assert(byPo.contains(
      ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://example.org/Person")))
    // context TERM expansion (name → ex:name → full IRI)
    assert(byPo.contains(("http://example.org/name", "Alice")))
    // prefix expansion in key and @id reference positions
    val knows = rows.find(_.p == "http://example.org/knows").get
    assert(knows.o === "http://example.org/b" && knows.o_is_iri)
    // @vocab expands bare keys that are no context term
    assert(rows.exists(r => r.p == "http://voc.example/age" && r.o == "42" &&
      r.o_datatype.endsWith("#integer")))
    assert(rows.exists(r => r.p == "http://voc.example/score" &&
      r.o_datatype.endsWith("#double")))
    assert(rows.exists(r => r.p == "http://voc.example/active" &&
      r.o == "true" && r.o_datatype.endsWith("#boolean")))
    // value objects keep language / datatype fidelity
    assert(rows.exists(r => r.o == "Alice" && r.o_lang == "en"))
    assert(rows.exists(r => r.o == "1990-01-01" &&
      r.o_datatype.endsWith("#date")))
    // subjects expand too
    assert(rows.forall(r => r.s == "http://example.org/a" ||
      r.s == "http://example.org/b"))
  }

  test("embedded nodes become linked blank nodes; bare keys stay verbatim") {
    val doc =
      """[ { "@id": "x:1", "p": { "q": "deep" } },
        |  { "p": "root-bnode" } ]""".stripMargin
    val rows = JsonLd.parseDoc(doc, "t")
    // no context, no vocab: keys/ids kept verbatim (documented relaxation)
    val link = rows.find(r => r.s == "x:1" && r.p == "p").get
    assert(link.o.startsWith("_:bt_") && !link.o_is_iri)
    assert(rows.exists(r => r.s == link.o && r.p == "q" && r.o == "deep"))
    // a node without @id gets its own fresh blank node subject
    assert(rows.exists(r => r.s.startsWith("_:bt_") && r.o == "root-bnode"))
    // blank labels are distinct
    assert(rows.map(_.s).toSet.size === 3)
  }

  test("out-of-subset constructs reject loudly") {
    intercept[IllegalArgumentException](JsonLd.parseDoc(
      """{ "@id": "a", "@reverse": { "p": { "@id": "b" } } }"""))
    intercept[IllegalArgumentException](JsonLd.parseDoc(
      """{ "@id": "a", "p": { "@value": "v", "@language": "en",
        |  "@type": "t" } }""".stripMargin))
    intercept[IllegalArgumentException](JsonLd.parseDoc(
      """{ "@context": "http://remote.example/ctx", "@id": "a" }"""))
  }

  test("write → read is the identity on the typed triple set (≡ Turtle loop)") {
    val typed = Triples.build(spark, sf0001)
      .withColumn("o_is_iri", col("o").rlike("^[conr]:"))
      .withColumn("o_lang", lit(""))
      .withColumn("o_datatype", lit(""))
    val dir = java.nio.file.Files.createTempDirectory("jsonld-rt").toString
    JsonLd.write(typed, s"$dir/out")
    val back = JsonLd.readTyped(spark, s"$dir/out/part-*.txt")
    assert(back.count() === typed.count())
    assert(back.exceptAll(typed).count() === 0)
    assert(typed.exceptAll(back).count() === 0)
    // and the plain projection matches what the TURTLE loop round-trips:
    // the two front-ends are interchangeable on the same EAV graph
    val ttl = java.nio.file.Files.createTempDirectory("jsonld-ttl").toString
    Turtle.write(typed, s"$ttl/out")
    val viaTurtle = Turtle.read(spark, s"$ttl/out/part-*.txt")
    val viaJsonLd = JsonLd.read(spark, s"$dir/out/part-*.txt")
    assert(viaJsonLd.exceptAll(viaTurtle).count() === 0)
    assert(viaTurtle.exceptAll(viaJsonLd).count() === 0)
  }

  test("typed literals round-trip through write (lang and datatype)") {
    val typed = Seq(
      ("s1", "label", "hello", false, "en", ""),
      ("s1", "label", "bonjour", false, "fr", ""),
      ("s1", "age", "7", false, "", "http://www.w3.org/2001/XMLSchema#integer"),
      ("s1", "knows", "s2", true, "", ""),
      ("s2", "label", "plain", false, "", ""))
      .toDF("s", "p", "o", "o_is_iri", "o_lang", "o_datatype")
    val dir = java.nio.file.Files.createTempDirectory("jsonld-typed").toString
    JsonLd.write(typed, s"$dir/out")
    val back = JsonLd.readTyped(spark, s"$dir/out/part-*.txt")
    assert(back.exceptAll(typed).count() === 0)
    assert(typed.exceptAll(back).count() === 0)
  }

  test("named graphs: graph objects parse; writeQuads → readQuads identity") {
    // JSON-LD 1.1 named graphs: a node with @graph names a graph for its
    // contained nodes; its OTHER properties stay in the enclosing graph
    val doc =
      """{"@context": {"ex": "http://ex/"},
        | "@graph": [
        |   {"@id": "ex:g1", "ex:label": "graph one",
        |    "@graph": [
        |      {"@id": "ex:a", "ex:p": {"@id": "ex:b"}},
        |      {"@id": "ex:b", "ex:q": "v"}]},
        |   {"@id": "ex:top", "ex:p": "w"}]}""".stripMargin
    val rows = JsonLd.parseQuadsDoc(doc).toSet
    assert(rows === Set(
      Trig.QRow("http://ex/g1", "http://ex/label", "graph one",
        o_is_iri = false, o_lang = "", o_datatype = "", g = ""),
      Trig.QRow("http://ex/a", "http://ex/p", "http://ex/b",
        o_is_iri = true, o_lang = "", o_datatype = "", g = "http://ex/g1"),
      Trig.QRow("http://ex/b", "http://ex/q", "v",
        o_is_iri = false, o_lang = "", o_datatype = "", g = "http://ex/g1"),
      Trig.QRow("http://ex/top", "http://ex/p", "w",
        o_is_iri = false, o_lang = "", o_datatype = "", g = "")))
    // the triples read is the UNION of the graphs (never drops data)
    assert(JsonLd.parseDoc(doc).size === 4)
    // write→parse identity on a typed QUAD set, named + default graphs,
    // through multiple partitions (each part file a valid document)
    val typed = Seq(
      ("s1", "label", "hello", false, "en", "", "g:a"),
      ("s1", "age", "7", false, "",
        "http://www.w3.org/2001/XMLSchema#integer", "g:a"),
      ("s2", "knows", "s1", true, "", "", "g:b"),
      ("s3", "label", "default", false, "", "", ""))
      .toDF("s", "p", "o", "o_is_iri", "o_lang", "o_datatype", "g")
    val dir = java.nio.file.Files.createTempDirectory("jsonld-quads").toString
    JsonLd.writeQuads(typed.repartition(3), s"$dir/out")
    val back = JsonLd.readQuadsTyped(spark, s"$dir/out/part-*.txt")
    assert(back.exceptAll(typed).count() === 0)
    assert(typed.exceptAll(back).count() === 0)
  }
}
