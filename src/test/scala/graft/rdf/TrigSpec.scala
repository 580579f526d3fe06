package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrigSpec extends SparkSpec {
  import spark.implicits._

  test("parseDoc: graph blocks, default graph, full Turtle inside blocks") {
    val doc =
      """@prefix ex: <http://ex/> .
        |# top-level statements land in the default graph
        |ex:alice ex:knows ex:bob .
        |GRAPH ex:g1 {
        |  ex:alice a ex:Person ;
        |    ex:name "Alice" ;
        |    ex:likes ex:bob , ex:carol .
        |}
        |# the GRAPH keyword is optional
        |ex:g2 {
        |  ex:bob ex:age 42 .
        |  ex:bob ex:label "chat"@en
        |}
        |# a braced block without a label is the default graph
        |{
        |  ex:carol ex:name "Carol" .
        |}
        |# blank node graph labels
        |_:gb { ex:dan ex:name "Dan" . }
        |""".stripMargin
    val rows = Trig.parseDoc(doc, "t")
    val spog = rows.map(r => (r.s, r.p, r.o, r.g)).toSet
    assert(spog.contains(("http://ex/alice", "http://ex/knows",
      "http://ex/bob", "")))
    assert(spog.contains(("http://ex/alice",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://ex/Person",
      "http://ex/g1")))
    assert(spog.contains(("http://ex/alice", "http://ex/name", "Alice",
      "http://ex/g1")))
    assert(spog.contains(("http://ex/alice", "http://ex/likes",
      "http://ex/carol", "http://ex/g1")))
    // the final '.' before '}' is optional (TriG triplesBlock)
    assert(spog.contains(("http://ex/bob", "http://ex/label", "chat",
      "http://ex/g2")))
    assert(spog.contains(("http://ex/carol", "http://ex/name", "Carol", "")))
    // blank node label rewritten document-scoped, graph kept
    val dan = rows.find(_.o == "Dan").get
    assert(dan.g.startsWith("_:bt_l_gb"))
    // literal fidelity flows through the shared Turtle productions
    assert(rows.find(_.o == "chat").get.o_lang === "en")
    assert(rows.find(_.o == "42").get.o_datatype.endsWith("#integer"))
  }

  test("parseDoc edge cases: ANON label, rejections") {
    // [] as a graph label is a fresh blank node graph
    val anon = Trig.parseDoc("<s> <p> <o> . [] { <a> <b> <c> . }", "t")
    val blockRow = anon.find(_.o == "c").get
    assert(blockRow.g.startsWith("_:bt_g"))
    assert(anon.find(_.s == "s").get.g === "")
    // a non-empty blank node property list cannot label a graph
    intercept[IllegalArgumentException](
      Trig.parseDoc("[ <p> <o> ] { <a> <b> <c> . }"))
    // unterminated block fails loudly
    intercept[IllegalArgumentException](
      Trig.parseDoc("<g> { <a> <b> <c> ."))
    // Turtle-level errors inside blocks keep their offsets/messages
    intercept[IllegalArgumentException](
      Trig.parseDoc("<g> { <a> <b> \"unterminated . }"))
    // collections inside graph blocks desugar like anywhere else
    val coll = Trig.parseDoc("<g> { <a> <b> ( <c> ) . }", "t")
    assert(coll.exists(r => r.g == "g" &&
      r.p.endsWith("rdf-syntax-ns#first") && r.o == "c"))
  }

  test("write → read round-trips escapes and mixed graphs") {
    val typed = Seq(
      ("a:1", "name", "esc\"aped\nnewline\ttab\\slash", false, ""),
      ("a:1", "knows", "a:2", true, "g:one"),
      ("a:2", "name", "unicode é — ☃", false, "g:one"),
      ("a:2", "ref", "a:1", true, "g:two"),
      ("a:3", "name", "plain", false, ""))
      .toDF("s", "p", "o", "o_is_iri", "g")
    val dir = java.nio.file.Files.createTempDirectory("trig_esc").toString
    Trig.write(typed, dir)
    val back = Trig.read(spark, s"$dir/part-*.txt")
      .as[(String, String, String, String)].collect().toSet
    assert(back === typed.select("s", "p", "o", "g")
      .as[(String, String, String, String)].collect().toSet)
  }

  test("write → read round-trips the quads dataset") {
    val quads = Quads.build(spark, sf0001)
      .withColumn("o_is_iri", col("o").rlike("^[conr]:"))
    val dir = java.nio.file.Files.createTempDirectory("trig_rt").toString
    Trig.write(quads, dir)
    val back = Trig.read(spark, s"$dir/part-*.txt")
    val orig = quads.select("s", "p", "o", "g")
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).count() === 0)
    assert(orig.exceptAll(back).count() === 0)
    // named graphs landed as blocks, default graph as top-level statements
    assert(back.filter($"g" === "g:customer").count() > 0)
    assert(back.filter($"g" === "").count() > 0)
  }
}
