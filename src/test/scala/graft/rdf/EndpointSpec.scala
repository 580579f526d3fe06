package graft.rdf

import graft.SparkSpec

class EndpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): String = {
    val root = java.nio.file.Files.createTempDirectory("endpoint").toString
    QuadStore.init(Seq(
      ("c:1", "name", "al,i\"ce"),
      ("c:2", "name", "bob")).map { case (s, p, o) => (s, p, o, "") }
      .toDF("s", "p", "o", "g"), root)
    root
  }

  test("protocol dataset parameters define the dataset and override FROM") {
    val root = java.nio.file.Files.createTempDirectory("endpoint_ds").toString
    QuadStore.init(Seq(
      ("a", "p", "1", "g:one"), ("b", "p", "2", "g:two"),
      ("c", "p", "3", "g:one"), ("d", "p", "0", ""))
      .toDF("s", "p", "o", "g"), root)
    def csvRows(body: String): Seq[String] = body.split("\r\n").toSeq.tail
    // default-graph-uri: the listed slices BECOME the default graph
    // (RDF merge), so a plain pattern matches them and nothing else
    val (_, one) = Endpoint.query(spark, root,
      "SELECT ?s WHERE { ?s <p> ?o . } ORDER BY ?s", accept = Endpoint.Csv,
      defaultGraphUris = Seq("g:one"))
    assert(csvRows(one) === Seq("a", "c"))
    // two default slices merge
    val (_, both) = Endpoint.query(spark, root,
      "SELECT ?s WHERE { ?s <p> ?o . } ORDER BY ?s", accept = Endpoint.Csv,
      defaultGraphUris = Seq("g:one", "g:two"))
    assert(csvRows(both) === Seq("a", "b", "c"))
    // named-graph-uri scopes GRAPH ?g to exactly that set — and giving
    // ONLY named-graph-uri empties the default graph (the request
    // defines the whole dataset)
    val (_, named) = Endpoint.query(spark, root,
      """SELECT ?g ?s WHERE { GRAPH ?g { ?s <p> ?o . } } ORDER BY ?s""",
      accept = Endpoint.Csv, namedGraphUris = Seq("g:two"))
    assert(csvRows(named) === Seq("g:two,b"))
    val (_, noDefault) = Endpoint.query(spark, root,
      "SELECT ?s WHERE { ?s <p> ?o . }", accept = Endpoint.Csv,
      namedGraphUris = Seq("g:two"))
    assert(csvRows(noDefault).isEmpty)
    // §2.1.4 precedence: the request dataset OVERRIDES the query's FROM
    val (_, overridden) = Endpoint.query(spark, root,
      "SELECT ?s FROM <g:two> WHERE { ?s <p> ?o . } ORDER BY ?s",
      accept = Endpoint.Csv, defaultGraphUris = Seq("g:one"))
    assert(csvRows(overridden) === Seq("a", "c"),
      "default-graph-uri must override FROM <g:two>")
    // no parameters → the query's own clauses apply as before
    val (_, fromOnly) = Endpoint.query(spark, root,
      "SELECT ?s FROM <g:two> WHERE { ?s <p> ?o . }", accept = Endpoint.Csv)
    assert(csvRows(fromOnly) === Seq("b"))
    rmTree(new java.io.File(root))
  }

  test("update dataset parameters scope WHERE like USING; combining is loud") {
    val root = java.nio.file.Files.createTempDirectory("endpoint_us").toString
    QuadStore.init(Seq(
      ("a", "p", "1", "g:one"), ("b", "p", "2", "g:two"))
      .toDF("s", "p", "o", "g"), root)
    // the WHERE sees only g:one (its triples as the operation's default
    // graph), so only a's marker lands
    Endpoint.update(spark, root,
      """INSERT { GRAPH <g:log> { ?s <seen> "y" . } } WHERE { ?s <p> ?o . }""",
      usingGraphUris = Seq("g:one"))
    val logged = QuadStore.read(spark, root)
      .filter($"g" === "g:log").select("s").as[String].collect().toSeq
    assert(logged === Seq("a"))
    // DELETE WHERE desugars to its Modify form: the request dataset
    // scopes the match, the delete still lands on the matched graphs
    Endpoint.update(spark, root,
      """DELETE WHERE { GRAPH ?g { ?s <p> ?o . } }""",
      usingNamedGraphUris = Seq("g:two"))
    val left = QuadStore.read(spark, root)
      .filter($"p" === "p").select("s").as[String].collect().toSeq
    assert(left === Seq("a"), "only g:two's <p> row may be deleted")
    // §2.2.3: combining with in-request USING / WITH must be rejected
    val boom = intercept[IllegalArgumentException](Endpoint.update(spark,
      root,
      """INSERT { <x> <q> "1" . } USING <g:one> WHERE { ?s <p> ?o . }""",
      usingGraphUris = Seq("g:two")))
    assert(boom.getMessage.contains("2.2.3"))
    // ...and nothing landed (request-level success-or-failure)
    assert(QuadStore.read(spark, root).filter($"p" === "q").count() === 0)
    rmTree(new java.io.File(root))
  }

  test("negotiation: q-order wins, q=0 excludes, */* defaults, 406 is loud") {
    assert(Endpoint.negotiate("") === Endpoint.Json)
    assert(Endpoint.negotiate("*/*") === Endpoint.Json)
    assert(Endpoint.negotiate("text/csv, application/sparql-results+json")
      === Endpoint.Csv)
    // RFC 9110 §12.4.2: explicit q orders preferences — csv's implicit
    // q=1 outranks xml's 0.9 regardless of header order
    assert(Endpoint.negotiate(
      "application/sparql-results+xml;q=0.9, text/csv") === Endpoint.Csv)
    assert(Endpoint.negotiate(
      "text/csv;q=0.3, application/sparql-results+xml;q=0.9") === Endpoint.Xml)
    // q=0 means NOT acceptable — it must never be selected, even when
    // listed first
    assert(Endpoint.negotiate(
      "text/csv;q=0, application/sparql-results+json") === Endpoint.Json)
    val all0 = intercept[IllegalArgumentException](
      Endpoint.negotiate("text/csv;q=0"))
    assert(all0.getMessage.contains("no supported media type"))
    assert(Endpoint.negotiate("text/html, */*") === Endpoint.Json)
    val boom = intercept[IllegalArgumentException](
      Endpoint.negotiate("text/html"))
    assert(boom.getMessage.contains("no supported media type"))
  }

  test("SELECT serializes in all four W3C formats from one store") {
    val root = freshStore()
    val q = "SELECT ?s ?n WHERE { ?s <name> ?n . } ORDER BY ?s"
    val (jm, json) = Endpoint.query(spark, root, q)
    assert(jm === Endpoint.Json)
    assert(json.contains(""""vars":["s","n"]""") &&
      json.contains(""""value":"c:2""""))
    val (_, xml) = Endpoint.query(spark, root, q, accept = Endpoint.Xml)
    // must parse as XML despite the hostile literal payload
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    assert(doc.getElementsByTagName("result").getLength === 2)
    val (_, csv) = Endpoint.query(spark, root, q, accept = Endpoint.Csv)
    val lines = csv.split("\r\n").toSeq
    assert(lines.head === "s,n")
    assert(lines.exists(_ startsWith "c:1,\"al,i\"\"ce\""),
      s"RFC 4180 quoting of the hostile cell, got: $lines")
    val (_, tsv) = Endpoint.query(spark, root, q, accept = Endpoint.Tsv)
    assert(tsv.linesIterator.next() === "?s\t?n")
    assert(tsv.linesIterator.size === 3)
  }

  test("ASK uses the boolean forms; CSV/TSV reject it per spec scope") {
    val root = freshStore()
    val q = """ASK WHERE { <c:1> <name> ?n . }"""
    assert(Endpoint.query(spark, root, q)._2 ===
      """{"head":{},"boolean":true}""")
    assert(Endpoint.query(spark, root, q, accept = Endpoint.Xml)._2
      .contains("<boolean>true</boolean>"))
    assert(Endpoint.query(spark, root,
      """ASK WHERE { <c:9> <name> ?n . }""")._2.contains("false"))
    intercept[IllegalArgumentException](
      Endpoint.query(spark, root, q, accept = Endpoint.Csv))
  }

  test("CONSTRUCT serializes as N-Triples and round-trips the graph") {
    val root = freshStore()
    val q = """CONSTRUCT { ?s <label> ?n . } WHERE { ?s <name> ?n . }"""
    val (media, body) = Endpoint.query(spark, root, q)
    assert(media === Endpoint.NTriplesMedia)
    // the document must parse back to exactly the constructed graph,
    // hostile payload escaped on the way out and recovered on the way in
    val back = NTriples.parse(Seq(body.split("\n").toSeq: _*).toDF("value"))
      .select("s", "p", "o").as[(String, String, String)].collect().toSet
    assert(back === Set(("c:1", "label", "al,i\"ce"), ("c:2", "label", "bob")))
    // a results-format-only Accept is the 406 analog for graphs
    intercept[IllegalArgumentException](
      Endpoint.query(spark, root, q, accept = Endpoint.Csv))
    // but an explicit n-triples (or */*) Accept is honored
    assert(Endpoint.query(spark, root, q,
      accept = "text/html, application/n-triples")._1 ===
      Endpoint.NTriplesMedia)
  }

  test("Graph Store Protocol: PUT/GET/POST/DELETE, one version per write") {
    val root = freshStore()
    val v0 = QuadStore.currentVersion(root).get
    val g = Some("g:mine")
    val body = "<a> <p> \"pay\\\"load\" .\n<a> <q> <b> .\n"
    // PUT replaces atomically: one version, exact content
    val v1 = Endpoint.putGraph(spark, root, body, g)
    assert(v1 === v0 + 1)
    val (media, got) = Endpoint.getGraph(spark, root, g)
    assert(media === Endpoint.NTriplesMedia)
    // GET→PUT round-trip is the identity on the graph
    Endpoint.putGraph(spark, root, got, g)
    assert(Endpoint.getGraph(spark, root, g)._2.split("\n").toSet ===
      got.split("\n").toSet)
    // POST merges set-semantically; a replay appends nothing
    Endpoint.postGraph(spark, root, "<c> <p> \"x\" .\n", g)
    Endpoint.postGraph(spark, root, "<c> <p> \"x\" .\n", g)
    assert(Endpoint.getGraph(spark, root, g)._2.split("\n").length === 3)
    // a second PUT REPLACES, not merges
    Endpoint.putGraph(spark, root, "<z> <p> \"only\" .\n", g)
    assert(Endpoint.getGraph(spark, root, g)._2.trim ===
      "<z> <p> \"only\" .")
    // the default graph is addressable and isolated from named graphs
    assert(Endpoint.getGraph(spark, root)._2.split("\n").length === 2,
      "freshStore's default graph must be untouched")
    // DELETE empties the graph in one version
    val vBefore = QuadStore.currentVersion(root).get
    assert(Endpoint.deleteGraph(spark, root, g) === vBefore + 1)
    assert(Endpoint.getGraph(spark, root, g)._2 === "")
    // corrupt bodies are loud, and nothing lands
    val vNow = QuadStore.currentVersion(root).get
    intercept[IllegalArgumentException](
      Endpoint.putGraph(spark, root, "<a> <p> oops", g))
    assert(QuadStore.currentVersion(root).get === vNow)
  }

  test("the protocol loop: update commits atomically, queries see it; " +
      "pinned versions answer the past") {
    val root = freshStore()
    val v1 = QuadStore.currentVersion(root).get
    val v2 = Endpoint.update(spark, root,
      """INSERT DATA { <c:3> <name> "carol" . } ;
        |DELETE DATA { <c:2> <name> "bob" . }""".stripMargin)
    assert(v2 === v1 + 1, "a ;-request is ONE version")
    val q = "SELECT ?s WHERE { ?s <name> ?n . } ORDER BY ?s"
    assert(Endpoint.query(spark, root, q, accept = Endpoint.Csv)._2
      .split("\r\n").toSeq.tail === Seq("c:1", "c:3"))
    assert(Endpoint.queryVersion(spark, root, v1, q,
        accept = Endpoint.Csv)._2
      .split("\r\n").toSeq.tail === Seq("c:1", "c:2"))
  }
}
