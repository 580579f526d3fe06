package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TurtleSpec extends SparkSpec {
  import spark.implicits._

  private val rdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  test("parseDoc: prefixes, a, lists, blank node property lists, literals") {
    val doc =
      """@prefix ex: <http://ex/> .   # a comment
        |PREFIX x: <http://x/>
        |ex:alice a ex:Person ;
        |  ex:name "Alice" ;
        |  ex:likes ex:bob , x:carol .
        |ex:bob ex:age 42 ; ex:height 1.75 ; ex:score 1.0e3 ;
        |  ex:active true .
        |ex:carol ex:label "chat"@en ;
        |  ex:born "2001-01-01"^^<http://www.w3.org/2001/XMLSchema#date> ;
        |  ex:bio '''multi
        |line''' .
        |_:who ex:knows [ ex:name "Nested" ; ex:age 7 ] .
        |""".stripMargin
    val rows = Turtle.parseDoc(doc, "t")
    val spo = rows.map(r => (r.s, r.p, r.o)).toSet
    assert(spo.contains(("http://ex/alice", rdfType, "http://ex/Person")))
    assert(spo.contains(("http://ex/alice", "http://ex/name", "Alice")))
    assert(spo.contains(("http://ex/alice", "http://ex/likes", "http://ex/bob")))
    assert(spo.contains(("http://ex/alice", "http://ex/likes", "http://x/carol")))
    assert(spo.contains(("http://ex/bob", "http://ex/age", "42")))
    assert(spo.contains(("http://ex/bob", "http://ex/height", "1.75")))
    assert(spo.contains(("http://ex/bob", "http://ex/active", "true")))
    assert(spo.contains(("http://ex/carol", "http://ex/bio", "multi\nline")))
    // literal fidelity survives: tags, datatypes, numeric abbreviations
    val byO = rows.map(r => r.o -> r).toMap
    assert(byO("chat").o_lang === "en")
    assert(byO("2001-01-01").o_datatype.endsWith("#date"))
    assert(byO("42").o_datatype.endsWith("#integer"))
    assert(byO("1.75").o_datatype.endsWith("#decimal"))
    assert(byO("1.0e3").o_datatype.endsWith("#double"))
    assert(byO("true").o_datatype.endsWith("#boolean"))
    // the bnode property list introduces one generated node carrying its
    // own properties, linked from the labelled blank subject
    val gen = rows.find(r => r.p == "http://ex/knows").get.o
    assert(gen.startsWith("_:bt_g"))
    assert(spo.contains((gen, "http://ex/name", "Nested")))
    assert(spo.contains((gen, "http://ex/age", "7")))
    assert(rows.find(_.p == "http://ex/knows").get.s.startsWith("_:bt_l_who"))
  }

  test("parser edge cases: ;; lists, a: prefix, escaped quote before long close") {
    // consecutive ';' (empty predicate-object entries) are legal Turtle
    val r1 = Turtle.parseDoc(
      "@prefix ex: <http://ex/> .\nex:s ex:p ex:o ;; ex:q ex:r ; .\n", "t")
    assert(r1.map(r => (r.p, r.o)).toSet ===
      Set(("http://ex/p", "http://ex/o"), ("http://ex/q", "http://ex/r")))
    // 'a' and 'true' as PREFIX names, not keywords, when followed by ':'
    val r2 = Turtle.parseDoc(
      "@prefix a: <http://a/> .\n@prefix true: <http://t/> .\n" +
        "a:s a:p true:o .\n", "t")
    assert(r2.head === Turtle.Row("http://a/s", "http://a/p", "http://t/o",
      o_is_iri = true, "", ""))
    // a long string whose content ends with an escaped quote
    val r3 = Turtle.parseDoc(
      "@prefix ex: <http://ex/> .\nex:s ex:p \"\"\"say \\\"hi\\\"\"\"\" .\n", "t")
    assert(r3.head.o === "say \"hi\"")
    // leading-dot decimal
    val r4 = Turtle.parseDoc(
      "@prefix ex: <http://ex/> .\nex:s ex:p .5 .\n", "t")
    assert(r4.head.o === ".5")
    assert(r4.head.o_datatype.endsWith("decimal"))
    // malformed numbers fail loudly instead of parsing as plausible values
    intercept[IllegalArgumentException] {
      Turtle.parseDoc("@prefix ex: <http://ex/> .\nex:s ex:p 1.2.3 .\n", "t")
    }
    // long string whose content ENDS in 1-2 unescaped quotes: the last
    // three quotes of the run are the delimiter (STRING_LITERAL_LONG_QUOTE)
    val r5 = Turtle.parseDoc(
      "@prefix ex: <http://ex/> .\nex:s ex:p \"\"\"a\"\"\"\" .\n", "t")
    assert(r5.head.o === "a\"")
    val r6 = Turtle.parseDoc(
      "@prefix ex: <http://ex/> .\nex:s ex:p \"\"\"ab\"\"\"\"\" .\n", "t")
    assert(r6.head.o === "ab\"\"")
    // hyphenated prefix starting with keyword letters: a-b is a prefix
    // label, not the 'a' keyword followed by garbage (same for true-…)
    val r7 = Turtle.parseDoc(
      "@prefix a-b: <http://ab/> .\n@prefix true-x: <http://tx/> .\n" +
        "a-b:s a-b:p true-x:o .\n", "t")
    assert(r7.head === Turtle.Row("http://ab/s", "http://ab/p", "http://tx/o",
      o_is_iri = true, "", ""))
  }

  test("parseDoc rejects out-of-fragment syntax loudly") {
    intercept[IllegalArgumentException](
      Turtle.parseDoc("nope:a <http://p> \"x\" ."))
    intercept[IllegalArgumentException](
      Turtle.parseDoc("<http://s> <http://p> \"unterminated ."))
    intercept[IllegalArgumentException](
      Turtle.parseDoc("<http://s> <http://p> ( \"open list\" ."))
    intercept[IllegalArgumentException](
      Turtle.parseDoc("@unknown <http://ex/> ."))
  }

  test("distributed read round-trips through the N-Triples writer") {
    val dir = java.nio.file.Files.createTempDirectory("ttl").toString
    val doc =
      """@prefix ex: <http://ex/> .
        |ex:s1 ex:p "v1" , "v2"@en ; ex:q ex:s2 .
        |ex:s2 ex:p "esc\"aped\n" .
        |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.ttl"),
      doc.getBytes("UTF-8"))
    val typed = Turtle.readTyped(spark, s"$dir/*.ttl")
    assert(typed.count() === 4)
    // Turtle read → N-Triples write → N-Triples read: identical triples
    val ntDir = s"$dir/nt"
    NTriples.write(typed.select("s", "p", "o", "o_is_iri"), ntDir)
    val back = NTriples.read(spark, s"$ntDir/part-*.txt")
    val a = typed.select("s", "p", "o").as[(String, String, String)]
      .collect().toSet
    val b = back.as[(String, String, String)].collect().toSet
    assert(a === b)
    assert(a.contains(("http://ex/s2", "http://ex/p", "esc\"aped\n")))
  }

  test("Turtle write → read is the identity on a typed triple set") {
    val dir = java.nio.file.Files.createTempDirectory("ttlw").toString
    val typed = Seq(
      ("a:1", "name", "x", false), ("a:1", "knows", "a:2", true),
      ("a:2", "name", "multi\nline \"q\"", false),
      ("a:2", "knows", "a:1", true), ("a:2", "knows", "a:3", true))
      .toDF("s", "p", "o", "o_is_iri")
    Turtle.write(typed, dir)
    val back = Turtle.read(spark, s"$dir/part-*.txt")
      .as[(String, String, String)].collect().toSet
    assert(back === typed.select("s", "p", "o")
      .as[(String, String, String)].collect().toSet)
  }

  test("RFC 3986 reference resolution: the spec's own examples") {
    val base = "http://a/b/c/d;p?q"
    // §5.4.1 normal examples
    val normal = Seq(
      "g" -> "http://a/b/c/g", "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/", "/g" -> "http://a/g",
      "//g" -> "http://g", "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y", "#s" -> "http://a/b/c/d;p?q#s",
      "g#s" -> "http://a/b/c/g#s", "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x", "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s", "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/", "./" -> "http://a/b/c/",
      ".." -> "http://a/b/", "../" -> "http://a/b/",
      "../g" -> "http://a/b/g", "../.." -> "http://a/",
      "../../" -> "http://a/", "../../g" -> "http://a/g")
    // §5.4.2 abnormal examples (the dot-segment edge cases)
    val abnormal = Seq(
      "../../../g" -> "http://a/g", "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g", "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.", ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..", "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g", "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h", "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "http:g" -> "http:g")
    (normal ++ abnormal).foreach { case (ref, want) =>
      assert(Turtle.resolveIri(base, ref) === want, s"ref '$ref'")
    }
    // non-ASCII survives (the reason java.net.URI is not used)
    assert(Turtle.resolveIri("http://ex/café/", "ñ#frag")
      === "http://ex/café/ñ#frag")
  }

  test("@base scopes the document; relative IRIs resolve; re-basing works") {
    val doc =
      """@base <http://ex.org/data/> .
        |<alpha> <rel/p> <../top> .
        |BASE <other/>
        |<beta> <p2> "x" .
        |""".stripMargin
    val rows = Turtle.parseDoc(doc).map(r => (r.s, r.p, r.o)).toSet
    assert(rows === Set(
      ("http://ex.org/data/alpha", "http://ex.org/data/rel/p",
        "http://ex.org/top"),
      // the SPARQL-style bare BASE re-bases RELATIVE to the earlier base
      ("http://ex.org/data/other/beta", "http://ex.org/data/other/p2", "x")))
    // no base in scope → refs stay verbatim (the engine's plain-lexical
    // convention; its own exports write bare `<name>` predicates)
    assert(Turtle.parseDoc("<rel> <p> <o> .").map(r => (r.s, r.p, r.o))
      === Seq(("rel", "p", "o")))
  }

  test("RDF collections desugar to first/rest/nil chains") {
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val doc =
      """@prefix ex: <http://ex/> .
        |ex:s ex:list ( ex:a "two" 3 ) .
        |ex:t ex:empty ( ) .
        |( ex:x ) ex:tag "headstmt" .
        |""".stripMargin
    val rows = Turtle.parseDoc(doc, "t")
    val bySP = rows.map(r => (r.s, r.p) -> r).toMap
    // non-empty list: head cell chains through rest to nil, in order
    val head = rows.find(r => r.p == "http://ex/list").get
    assert(!head.o_is_iri && head.o.startsWith("_:bt_"))
    val c1 = head.o
    assert(bySP((c1, rdf + "first")).o === "http://ex/a")
    val c2 = bySP((c1, rdf + "rest")).o
    assert(bySP((c2, rdf + "first")).o === "two")
    val c3 = bySP((c2, rdf + "rest")).o
    assert(bySP((c3, rdf + "first")).o === "3")
    assert(bySP((c3, rdf + "first")).o_datatype.endsWith("integer"))
    val nil = bySP((c3, rdf + "rest"))
    assert(nil.o === rdf + "nil" && nil.o_is_iri)
    // the empty collection IS rdf:nil (an IRI, no cells)
    val empty = rows.find(r => r.p == "http://ex/empty").get
    assert(empty.o === rdf + "nil" && empty.o_is_iri)
    // a collection as SUBJECT: the statement hangs off the head cell
    val tag = rows.find(r => r.p == "http://ex/tag").get
    assert(tag.o === "headstmt" && tag.s.startsWith("_:bt_"))
    assert(bySP((tag.s, rdf + "first")).o === "http://ex/x")
    assert(bySP((tag.s, rdf + "rest")).o === rdf + "nil")
    // nested collections recurse
    val nested = Turtle.parseDoc(
      "@prefix e: <http://e/> . e:s e:l ( ( e:a ) e:b ) .", "n")
    val inner = nested.filter(r => r.p == rdf + "first")
    assert(inner.map(_.o).toSet.contains("http://e/a"))
    assert(nested.count(_.p == rdf + "rest") === 3)
  }

  test("termStrings feeds the SPARQL term introspection built-ins") {
    val dir = java.nio.file.Files.createTempDirectory("ttlt").toString
    val doc =
      """@prefix ex: <http://ex/> .
        |ex:s ex:label "chat"@en , "chatter"@fr , "plain" ;
        |     ex:n 5 ; ex:ref ex:o .
        |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.ttl"),
      doc.getBytes("UTF-8"))
    val terms = Turtle.termStrings(Turtle.readTyped(spark, s"$dir/*.ttl"))
    val en = Sparql.run(terms,
      """SELECT ?v WHERE {
        |  ?s <http://ex/label> ?l .
        |  FILTER (LANGMATCHES(LANG(?l), "en"))
        |  BIND (STR(?l) AS ?v)
        |}""".stripMargin).as[String].collect().toSeq
    assert(en === Seq("chat"))
    val numeric = Sparql.run(terms,
      """SELECT ?o WHERE { ?s <http://ex/n> ?o . FILTER (ISNUMERIC(?o)) }""")
    assert(numeric.count() === 1)
    val iris = Sparql.run(terms,
      """SELECT ?o WHERE { ?s ?p ?o . FILTER (ISIRI(?o)) }""")
      .as[String].collect().toSeq
    assert(iris === Seq("<http://ex/o>"))
  }
}
