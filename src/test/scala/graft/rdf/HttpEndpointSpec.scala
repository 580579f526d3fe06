package graft.rdf

import graft.SparkSpec
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8

/** The SPARQL Protocol over REAL HTTP: every request here crosses an
  * actual loopback socket through the JDK HttpClient — transport,
  * negotiation, dataset parameters, updates and the Graph Store
  * Protocol, end-to-end against a live [[QuadStore]]. */
class HttpEndpointSpec extends SparkSpec {
  import spark.implicits._

  private val client = HttpClient.newHttpClient()

  private def enc(s: String) = URLEncoder.encode(s, UTF_8)

  private def get(url: String, accept: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
    if (accept.nonEmpty) b.header("Accept", accept)
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def post(url: String, body: String, contentType: String,
      accept: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", contentType)
      .POST(HttpRequest.BodyPublishers.ofString(body))
    if (accept.nonEmpty) b.header("Accept", accept)
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def method(url: String, m: String, body: String = "")
      : HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
      .method(m, HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def withServer(f: (HttpEndpoint.Server, String) => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("http_store").toString
    QuadStore.init(Seq(
      ("c1", "seg", "B", ""), ("c1", "nat", "de", ""),
      ("c2", "seg", "M", ""), ("c2", "nat", "fr", ""),
      ("x1", "p", "one", "g:a"), ("x2", "p", "two", "g:b"))
      .toDF("s", "p", "o", "g"), root)
    val srv = HttpEndpoint.serve(spark, root)
    try f(srv, root)
    finally { srv.stop(); rmTree(new java.io.File(root)) }
  }

  test("GET /sparql: query param + Accept negotiation over a real socket") {
    withServer { (srv, _) =>
      val q = "SELECT ?s WHERE { ?s <seg> \"B\" . } ORDER BY ?s"
      val csv = get(s"${srv.url}/sparql?query=${enc(q)}", accept = "text/csv")
      assert(csv.statusCode() === 200)
      assert(csv.headers().firstValue("Content-Type").get.startsWith("text/csv"))
      assert(csv.body() === "s\r\nc1\r\n")
      // q-values steer: CSV at q=0 must never be chosen — json wins
      val nego = get(s"${srv.url}/sparql?query=${enc(q)}",
        accept = "text/csv;q=0, application/sparql-results+json;q=0.5")
      assert(nego.statusCode() === 200)
      assert(nego.headers().firstValue("Content-Type").get
        .startsWith("application/sparql-results+json"))
      assert(nego.body().contains("\"s\""))
      // nothing acceptable → client error, names the offered formats
      val bad = get(s"${srv.url}/sparql?query=${enc(q)}",
        accept = "application/pdf")
      assert(bad.statusCode() === 400 && bad.body().contains("text/csv"))
      // malformed query → 400 with the parser's message, never a 500
      val boom = get(s"${srv.url}/sparql?query=${enc("SELECT WHERE {")}")
      assert(boom.statusCode() === 400)
      // missing query param → 400
      assert(get(s"${srv.url}/sparql").statusCode() === 400)
    }
  }

  test("POST /sparql: urlencoded and direct-body forms; protocol dataset " +
      "parameters define the dataset") {
    withServer { (srv, _) =>
      val q = "SELECT ?s ?o WHERE { ?s <p> ?o . } ORDER BY ?s"
      // §2.1.2 urlencoded form
      val form = post(s"${srv.url}/sparql", s"query=${enc(q)}",
        "application/x-www-form-urlencoded", accept = "text/csv")
      assert(form.statusCode() === 200)
      // the default graph holds no <p> triples
      assert(form.body() === "s,o\r\n")
      // §2.1.3 direct body + §2.1.4 default-graph-uri on the URL: the
      // dataset is the merge of the named slices
      val direct = post(
        s"${srv.url}/sparql?default-graph-uri=${enc("g:a")}" +
          s"&default-graph-uri=${enc("g:b")}",
        q, "application/sparql-query", accept = "text/csv")
      assert(direct.statusCode() === 200)
      assert(direct.body() === "s,o\r\nx1,one\r\nx2,two\r\n")
      // named-graph-uri restricts GRAPH's range
      val named =
        "SELECT ?g ?o WHERE { GRAPH ?g { ?s <p> ?o . } } ORDER BY ?g"
      val ng = get(s"${srv.url}/sparql?query=${enc(named)}" +
        s"&named-graph-uri=${enc("g:b")}", accept = "text/csv")
      assert(ng.body() === "g,o\r\ng:b,two\r\n")
    }
  }

  test("POST /update mutates the store atomically; GSP round-trips a " +
      "graph document") {
    withServer { (srv, _) =>
      // update: urlencoded ;-request = ONE version
      val upd = post(s"${srv.url}/update",
        "update=" + enc(
          """INSERT DATA { <c3> <seg> "B" . } ;
            |DELETE DATA { <c1> <seg> "B" . }""".stripMargin),
        "application/x-www-form-urlencoded")
      assert(upd.statusCode() === 204)
      val q = "SELECT ?s WHERE { ?s <seg> \"B\" . } ORDER BY ?s"
      assert(get(s"${srv.url}/sparql?query=${enc(q)}", "text/csv").body()
        === "s\r\nc3\r\n")
      // direct-body update form
      assert(post(s"${srv.url}/update",
        """INSERT DATA { <c4> <seg> "B" . }""",
        "application/sparql-update").statusCode() === 204)
      assert(get(s"${srv.url}/sparql?query=${enc(q)}", "text/csv").body()
        === "s\r\nc3\r\nc4\r\n")
      // GSP: PUT replaces a named graph, GET serves the document back,
      // POST merges, DELETE drops — all over the wire
      val doc = "<http://e/s> <http://e/p> \"v\" .\n"
      assert(method(s"${srv.url}/graph?graph=${enc("g:new")}", "PUT", doc)
        .statusCode() === 204)
      val got = get(s"${srv.url}/graph?graph=${enc("g:new")}")
      assert(got.statusCode() === 200 && got.body() === doc)
      assert(method(s"${srv.url}/graph?graph=${enc("g:new")}", "POST",
        "<http://e/s2> <http://e/p> \"w\" .\n").statusCode() === 204)
      assert(get(s"${srv.url}/graph?graph=${enc("g:new")}")
        .body().linesIterator.size === 2)
      assert(method(s"${srv.url}/graph?graph=${enc("g:new")}", "DELETE")
        .statusCode() === 204)
      assert(get(s"${srv.url}/graph?graph=${enc("g:new")}").body() === "")
      // addressing without ?graph or ?default is a client error
      assert(get(s"${srv.url}/graph").statusCode() === 400)
    }
  }

  test("concurrent clients: parallel updates serialize via OCC, queries " +
      "interleave safely, no update is lost over the wire") {
    withServer { (srv, root) =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val v0 = QuadStore.currentVersion(root).get
      // 6 writers race disjoint INSERTs through HTTP POST /update — the
      // version slot is contended, so losing writers exercise the OCC
      // recompute+retry loop (occPublish) behind the endpoint; 6 readers
      // interleave live queries and must always see a complete snapshot
      val writers = (1 to 6).map { i =>
        Future {
          post(s"${srv.url}/update",
            "update=" + enc(s"""INSERT DATA { <w$i> <wrote> "yes" . }"""),
            "application/x-www-form-urlencoded").statusCode()
        }
      }
      val q = "SELECT ?s WHERE { ?s <seg> ?o . } ORDER BY ?s"
      val readers = (1 to 6).map { _ =>
        Future(get(s"${srv.url}/sparql?query=${enc(q)}", "text/csv"))
      }
      val wcodes = Await.result(Future.sequence(writers), 180.seconds)
      val rresps = Await.result(Future.sequence(readers), 180.seconds)
      assert(wcodes.forall(_ == 204), s"writer statuses: $wcodes")
      // every reader saw the stable seg rows (updates touched other
      // predicates), never a torn or failed snapshot
      rresps.foreach { r =>
        assert(r.statusCode() === 200)
        assert(r.body() === "s\r\nc1\r\nc2\r\n", r.body())
      }
      // no update lost: all six writes present, six versions advanced
      // (each OCC winner claims exactly one slot)
      val wrote = get(s"${srv.url}/sparql?query=" +
        enc("SELECT ?s WHERE { ?s <wrote> \"yes\" . } ORDER BY ?s"),
        "text/csv").body()
      assert(wrote === "s\r\n" + (1 to 6).map(i => s"w$i\r\n").mkString)
      assert(QuadStore.currentVersion(root).get === v0 + 6)
    }
  }

  test("SERVICE federation over live HTTP: the remote BGP executes over " +
      "the wire and joins set-at-a-time; SILENT skips dead endpoints") {
    withServer { (srv, _) =>
      val local = Seq(("c1", "nat", "de"), ("c2", "nat", "fr"),
        ("c3", "nat", "jp")).toDF("s", "p", "o")
      // the remote store (withServer fixture) binds seg for c1/c2 only
      val got = Sparql.runHttpFederated(local,
        """SELECT ?c ?nat ?seg WHERE {
          |  ?c <nat> ?nat .
          |  SERVICE <graft://remote> { ?c <seg> ?seg . }
          |} ORDER BY ?c""".stripMargin,
        urls = Map("graft://remote" -> srv.url))
      assert(got.as[(String, String, String)].collect().toSeq ===
        Seq(("c1", "de", "B"), ("c2", "fr", "M")))
      // SILENT + unregistered endpoint → the branch contributes the
      // unit solution instead of aborting
      val silent = Sparql.runHttpFederated(local,
        """SELECT ?c WHERE { ?c <nat> "de" .
          |  SERVICE SILENT <graft://nowhere> { ?c <seg> ?x . } }"""
          .stripMargin,
        urls = Map("graft://remote" -> srv.url))
      assert(silent.as[String].collect().toSeq === Seq("c1"))
      // BIND + FILTER ship INSIDE the rendered remote fragment (round-10)
      // and evaluate on the remote endpoint — the restriction crosses the
      // wire, not a wider pull filtered locally
      val pushed = Sparql.runHttpFederated(local,
        """SELECT ?c ?tag WHERE {
          |  ?c <nat> ?nat .
          |  SERVICE <graft://remote> {
          |    ?c <seg> ?seg .
          |    BIND(CONCAT(?seg, "!") AS ?tag)
          |    FILTER (?seg = "B" && STRLEN(?tag) = 2)
          |  }
          |} ORDER BY ?c""".stripMargin,
        urls = Map("graft://remote" -> srv.url))
      assert(pushed.as[(String, String)].collect().toSeq ===
        Seq(("c1", "B!")))
      // OPTIONAL ships remotely too (round-11): the left join evaluates
      // on the endpoint, its block-scoped FILTER inside the optional
      // (the spec's LeftJoin condition), and the unbound cell crosses
      // the wire as an empty CSV field → null locally
      val remoteOpt = Sparql.runHttpFederated(local,
        """SELECT ?c ?seg ?rnat WHERE {
          |  ?c <nat> ?nat .
          |  SERVICE <graft://remote> {
          |    ?c <seg> ?seg .
          |    OPTIONAL { ?c <nat> ?rnat . FILTER (?rnat != "fr") }
          |  }
          |} ORDER BY ?c""".stripMargin,
        urls = Map("graft://remote" -> srv.url))
      assert(remoteOpt.as[(String, String, Option[String])].collect()
        .toSeq === Seq(("c1", "B", Some("de")), ("c2", "M", None)))
      // non-SILENT unregistered endpoints and beyond-fragment bodies
      // (a property path inside the OPTIONAL here) stay loud
      intercept[IllegalArgumentException](Sparql.runHttpFederated(local,
        "SELECT ?c WHERE { SERVICE <graft://nowhere> { ?c <seg> ?x . } }",
        urls = Map("graft://remote" -> srv.url)))
      intercept[IllegalArgumentException](Sparql.runHttpFederated(local,
        """SELECT ?c WHERE { SERVICE <graft://remote> {
          |  ?c <seg> ?x . OPTIONAL { ?c <nat>+ ?n . } } }""".stripMargin,
        urls = Map("graft://remote" -> srv.url)))
      // a VARIABLE endpoint ranges over the registry, binding ?ep
      val varEp = Sparql.runHttpFederated(local,
        "SELECT ?ep ?c ?seg WHERE { SERVICE ?ep { ?c <seg> ?seg . } }",
        urls = Map("graft://remote" -> srv.url))
      assert(varEp.as[(String, String, String)].collect().toSet ===
        Set(("graft://remote", "c1", "B"), ("graft://remote", "c2", "M")))
      // the quads twin: a LOCAL GRAPH block joins a REMOTE SERVICE leg
      // (the remote body sees the REMOTE DEFAULT graph — c1/c2's segs)
      val localQuads = Seq(
        ("c1", "tag", "keep", "g:a"), ("c2", "tag", "keep", "g:a"),
        ("c9", "tag", "keep", "g:a"),
        ("c1", "kind", "k1", "")).toDF("s", "p", "o", "g")
      val quadsFed = Sparql.runQuadsHttpFederated(localQuads,
        """SELECT ?s ?seg WHERE {
          |  GRAPH <g:a> { ?s <tag> "keep" . }
          |  SERVICE <graft://remote> { ?s <seg> ?seg . }
          |} ORDER BY ?s""".stripMargin,
        urls = Map("graft://remote" -> srv.url))
      assert(quadsFed.as[(String, String)].collect().toSeq ===
        Seq(("c1", "B"), ("c2", "M")))
    }
  }
}
