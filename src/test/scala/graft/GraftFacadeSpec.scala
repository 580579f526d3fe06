package graft

class GraftFacadeSpec extends SparkSpec {
  import spark.implicits._

  test("façade round trip: triples → typed → sparql → dictionary") {
    val t = Graft.triples(spark, sf0001)
    val typed = Graft.typedTriples(t)
    assert(typed.filter(_.p == "name").count() > 0)
    val rs = Graft.sparql(t,
      """SELECT ?c ?n WHERE { ?c <name> ?n . ?c <mktsegment> "BUILDING" . }""")
    assert(rs.columns.toSet === Set("c", "n") && rs.count() > 0)
    val dict = Graft.dictionary(spark, t)
    val back = Graft.decode(Graft.encode(t, dict), dict)
    assert(back.count() === t.count())
  }

  test("façade quads path: N-Quads file → sparqlQuads GRAPH query") {
    val dir = java.nio.file.Files.createTempDirectory("graft-facade-nq")
    java.nio.file.Files.writeString(dir.resolve("data.nq"),
      """<http://ex/s1> <http://ex/p> <http://ex/o1> <http://ex/g1> .
        |<http://ex/s2> <http://ex/p> <http://ex/o2> .
        |""".stripMargin)
    val quads = Graft.quadsFromNQuads(spark, dir.toString)
    val named = Graft.sparqlQuads(quads,
      "SELECT ?g ?o WHERE { GRAPH ?g { ?s <http://ex/p> ?o . } }")
    assert(named.as[(String, String)].collect().toSet ===
      Set("http://ex/g1" -> "http://ex/o1"))
  }

  test("façade store lifecycle: init → update → view → summary → protocol") {
    val store = java.nio.file.Files.createTempDirectory("gf_store").toString
    val view = java.nio.file.Files.createTempDirectory("gf_view").toString
    val agg = java.nio.file.Files.createTempDirectory("gf_agg").toString
    Graft.storeInit(Seq(
      ("c1", "seg", "B", ""), ("c1", "nat", "de", ""),
      ("c2", "seg", "B", ""), ("c2", "nat", "fr", ""))
      .toDF("s", "p", "o", "g"), store)
    Graft.summaryCreate(spark, store, view, agg,
      """SELECT ?nat (COUNT(*) AS ?n) WHERE {
        |  ?c <seg> "B" . ?c <nat> ?nat . } GROUP BY ?nat""".stripMargin)
    Graft.storeUpdate(spark, store,
      """INSERT DATA { <c3> <seg> "B" . <c3> <nat> "de" . }""")
    Graft.viewSync(spark, store, view)
    Graft.summarySync(spark, view, agg)
    assert(Graft.summaryRead(spark, agg)
      .as[(String, Long)].collect().toMap === Map("de" -> 2L, "fr" -> 1L))
    assert(Graft.viewRead(spark, view).count() === 3)
    assert(Graft.storeQuery(spark, store,
      """SELECT ?c WHERE { ?c <seg> "B" . }""").count() === 3)
    val (media, body) = Graft.protocolQuery(spark, store,
      "SELECT ?c WHERE { ?c <seg> \"B\" . } ORDER BY ?c",
      accept = "text/csv")
    assert(media === "text/csv" && body.contains("c3"))
    // span dedup + ExtVP delegates stay wired
    val docs = Seq((1L, "a b c d e f g h i"), (2L, "a b c d e f g h j"))
      .toDF("doc_id", "text")
    assert(Graft.spanDupStats(docs, k = 8, hashSpans = true).count() === 2)
    val t = Seq(("s1", "p", "o1"), ("o1", "q", "z")).toDF("s", "p", "o")
    val st = Graft.extVpMaintain(Graft.extVpBuild(t),
      Seq(("s2", "p", "o1")).toDF("s", "p", "o"), t.limit(0))
    assert(st.vp("p").count() === 2)
    Seq(store, view, agg).foreach(p => rmTree(new java.io.File(p)))
  }
}
