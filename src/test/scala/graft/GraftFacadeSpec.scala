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

  test("façade entailment, multimodal and LSH-index delegates stay wired") {
    // RDFS + OWL property/class rules
    val schema = rdf.Rdfs.Schema(Seq("C" -> "D"), Nil, Seq("p" -> "C"), Nil)
    assert(graft.Graft.rdfsEntail(
      Seq(("a", "p", "b")).toDF("s", "p", "o"), schema)
      .filter($"p" === "type").as[(String, String, String)]
      .collect().toSet === Set(("a", "type", "C"), ("a", "type", "D")))
    assert(graft.Graft.sameAsCanonical(
      Seq(("b", "sameAs", "a"), ("b", "k", "v")).toDF("s", "p", "o"))
      .as[(String, String, String)].collect().toSet === Set(("a", "k", "v")))
    assert(graft.Graft.owlEntail(
      Seq(("a", "t", "b"), ("b", "t", "c")).toDF("s", "p", "o"),
      transitive = Seq("t")).count() === 3)
    assert(graft.Graft.owlClassEntail(
      Seq(("x", "m", "B")).toDF("s", "p", "o"),
      rdf.Owl.ClassSchema(hasValue = Seq(("K", "m", "B"))))
      .as[(String, String, String)].collect().toSet ===
      Set(("x", "m", "B"), ("x", "type", "K")))
    // multimodal: real decode + embedding
    val docs = Seq((3L, "payload")).toDF("doc_id", "text")
    val feats = graft.Graft.decodeImages(
      llm.Multimodal.encodePng(docs)).collect()
    assert(feats.head.width === 4 && feats.head.height === 4) // 1+3%8, 1+3%5
    assert(graft.Graft.embedMedia(
      llm.Multimodal.withPayload(docs).as[llm.Multimodal.Media])
      .count() === 1)
    // HTTP serving + live federation through the facade
    val hroot = java.nio.file.Files.createTempDirectory("gf_http").toString
    Graft.storeInit(Seq(("r1", "kind", "remote", ""))
      .toDF("s", "p", "o", "g"), hroot)
    val srv = graft.Graft.serveHttp(spark, hroot)
    try {
      val fed = graft.Graft.sparqlHttpFederated(
        Seq(("r1", "tag", "x")).toDF("s", "p", "o"),
        """SELECT ?s ?k WHERE { ?s <tag> "x" .
          |  SERVICE <graft://r> { ?s <kind> ?k . } }""".stripMargin,
        urls = Map("graft://r" -> srv.url))
      assert(fed.as[(String, String)].collect().toSeq ===
        Seq(("r1", "remote")))
    } finally { srv.stop(); rmTree(new java.io.File(hroot)) }

    // round-8 continuation delegates: wire round-trip, URL hygiene,
    // radius search, k-core, funnel/anomaly, curriculum, stream duals
    val spoT = Seq(("s1", "p1", "o1")).toDF("s", "p", "o")
    assert(graft.Graft.parseNTriples(graft.Graft.renderNTriples(spoT))
      .as[(String, String, String)].collect().toSeq === Seq(("s1", "p1", "o1")))
    val urls = Seq((1L, "https://A.example.org/x/?utm_source=z&a=1#f"),
      (2L, "https://a.example.org/x?a=1")).toDF("doc_id", "url")
    assert(graft.Graft.canonicalizeUrls(urls)
      .select("canonical").distinct().count() === 1)
    assert(graft.Graft.deduplicateByUrl(urls)
      .select("keeper_id").as[Long].collect().toSeq === Seq(1L))
    val vecs = Seq((1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0.01f), 0),
      (3L, Seq(0f, 1f), 0)).toDF("vec_id", "embedding", "label")
    assert(graft.Graft.cosineRange(vecs, 0.99)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 2L)))
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
    assert(graft.Graft.kcore(
      (tri ++ tri.map(_.swap)).toDF("src", "dst"), 2)
      .select("node").as[String].collect().sorted.toSeq ===
      Seq("a", "b", "c"))
    val evf = Seq((1L, 10L, 1L, "signup", 1.0), (2L, 20L, 1L, "purchase", 2.0))
      .toDF("event_id", "ts_us_long", "user_id", "event_type", "value")
    assert(graft.Graft.funnel(evf, "user_id", "ts_us_long", "event_type",
      "signup", "purchase", 100L).select("converted")
      .as[Long].collect().toSeq === Seq(1L))
    assert(graft.Graft.rollingAnomaly(evf, "user_id", "ts_us_long",
      "event_id", "value", 2).count() === 2)
    assert(graft.Graft.interleaveSources(
      Seq((1L, "sA"), (2L, "sB")).toDF("doc_id", "source"))
      .select("rank").as[Long].collect().toSeq === Seq(0L, 0L))
    assert(graft.Graft.firstEventPerKey(evf)
      .select("event_id").as[Long].collect().toSet === Set(1L, 2L))
    assert(graft.Graft.cdcMaterialize(evf) // last writer per user wins
      .select("event_id").as[Long].collect().toSet === Set(2L))

    assert(graft.Graft.decodeAudio(
      llm.Multimodal.encodeWav(Seq((5L, "x")).toDF("doc_id", "text")))
      .head().n_samples === 21L)

    // persisted LSH index: build → append → compact → probe
    val root = java.nio.file.Files.createTempDirectory("gf_lsh").toString
    val corpus = (1L to 2L).map(i =>
      (i, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")).toDF("doc_id", "text")
    graft.Graft.lshIndexBuild(corpus.filter($"doc_id" === 1), root)
    assert(graft.Graft.lshIndexAppend(
      corpus.filter($"doc_id" === 2), root) === 2)
    assert(graft.Graft.lshIndexCompact(spark, root) === 1)
    // probe excludes self-pairs: doc 1's only hit is its twin, doc 2
    assert(graft.Graft.lshIndexProbe(spark, root,
      corpus.filter($"doc_id" === 1), minEst = 0.9)
      .select("corpus_id").as[Long].collect().toSeq === Seq(2L))
    rmTree(new java.io.File(root))
  }
}
