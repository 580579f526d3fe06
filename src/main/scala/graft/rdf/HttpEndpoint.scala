package graft.rdf

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.SparkSession

/** The SPARQL 1.1 Protocol + Graph Store Protocol over REAL HTTP — the
  * transport layer [[Endpoint]] keeps out of its own scope, supplied by
  * the JDK's built-in `com.sun.net.httpserver` (zero dependencies; works
  * on loopback even in this zero-egress sandbox, and it is the same
  * server class a production sidecar would run behind a reverse proxy).
  *
  * Routes:
  *  - `GET /sparql?query=…` with repeatable `default-graph-uri` /
  *    `named-graph-uri` (Protocol §2.1.1, §2.1.4)
  *  - `POST /sparql` as `application/x-www-form-urlencoded` (`query=` +
  *    dataset params, §2.1.2) or `application/sparql-query` (the body IS
  *    the query, §2.1.3; dataset params ride the URL)
  *  - `POST /update` as urlencoded (`update=`, `using-graph-uri`,
  *    `using-named-graph-uri`, §2.2.1-2.2.3) or
  *    `application/sparql-update` — 204 on success, one atomic version
  *  - Graph Store Protocol (§5) at `/graph?graph=<iri>` or
  *    `/graph?default`: GET (N-Triples document), PUT (replace), POST
  *    (merge), DELETE (drop)
  *
  * All protocol LOGIC — operation dispatch, content negotiation with
  * q-values, dataset selection, the four W3C result formats, update
  * atomicity — lives in [[Endpoint]]; this class only moves bytes and
  * maps failures per §2.3: client-caused errors (parse failure, nothing
  * acceptable, missing parameter) → 400 with the message as the body,
  * anything else → 500. The 400-over-406 choice is deliberate: the
  * negotiate error names the offered formats, which §2.3 allows either
  * way and clients can act on.
  *
  * Scale/deployment: each request runs its Spark jobs on the session's
  * cluster — the HTTP layer shuttles bounded documents (the protocol is
  * for clients and dashboards, not bulk export; corpus-sized exports
  * stream [[SparqlResults]]' distributed serializers to storage
  * instead). Ephemeral `port = 0` makes tests and gate keys
  * conflict-free.
  */
object HttpEndpoint {

  final case class Server(http: HttpServer) {
    def port: Int = http.getAddress.getPort
    def url: String = s"http://127.0.0.1:$port"
    def stop(): Unit = http.stop(0)
  }

  /** Start serving `root` (a [[QuadStore]]) on loopback. `port = 0`
    * binds an ephemeral free port (see [[Server.url]]). */
  def serve(spark: SparkSession, root: String, port: Int = 0,
      endpoints: Map[String, org.apache.spark.sql.DataFrame] = Map.empty)
      : Server = {
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

    http.createContext("/sparql", (ex: HttpExchange) => handle(ex) {
      val params = ex.getRequestMethod match {
        case "GET" => query(ex)
        case "POST" =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          contentType(ex) match {
            case ct if ct.startsWith("application/sparql-query") =>
              // §2.1.3: the body IS the query; dataset params on the URL
              query(ex) + ("query" -> Seq(body))
            case ct if ct.startsWith("application/x-www-form-urlencoded") =>
              parseForm(body)
            case ct => throw Bad(
              s"unsupported content type for POST /sparql: '$ct'")
          }
        case m => throw Bad(s"method $m not allowed on /sparql")
      }
      val text = params.getOrElse("query",
        throw Bad("missing required parameter 'query'")).head
      val (media, body) = Endpoint.query(spark, root, text,
        accept = header(ex, "Accept"),
        endpoints = endpoints,
        defaultGraphUris = params.getOrElse("default-graph-uri", Nil),
        namedGraphUris = params.getOrElse("named-graph-uri", Nil))
      respond(ex, 200, media, body)
    })

    http.createContext("/update", (ex: HttpExchange) => handle(ex) {
      require(ex.getRequestMethod == "POST",
        "the update operation is POST-only (Protocol 2.2)")
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val params = contentType(ex) match {
        case ct if ct.startsWith("application/sparql-update") =>
          query(ex) + ("update" -> Seq(body))
        case ct if ct.startsWith("application/x-www-form-urlencoded") =>
          parseForm(body)
        case ct => throw Bad(
          s"unsupported content type for POST /update: '$ct'")
      }
      val text = params.getOrElse("update",
        throw Bad("missing required parameter 'update'")).head
      Endpoint.update(spark, root, text,
        usingGraphUris = params.getOrElse("using-graph-uri", Nil),
        usingNamedGraphUris = params.getOrElse("using-named-graph-uri", Nil))
      respond(ex, 204, "", "")
    })

    http.createContext("/graph", (ex: HttpExchange) => handle(ex) {
      val params = query(ex)
      val graph =
        if (params.contains("default")) None
        else Some(params.getOrElse("graph", throw Bad(
          "address the graph with ?graph=<iri> or ?default")).head)
      ex.getRequestMethod match {
        case "GET" =>
          val (media, body) = Endpoint.getGraph(spark, root, graph)
          respond(ex, 200, media, body)
        case "PUT" =>
          Endpoint.putGraph(spark, root,
            new String(ex.getRequestBody.readAllBytes(), UTF_8), graph)
          respond(ex, 204, "", "")
        case "POST" =>
          Endpoint.postGraph(spark, root,
            new String(ex.getRequestBody.readAllBytes(), UTF_8), graph)
          respond(ex, 204, "", "")
        case "DELETE" =>
          Endpoint.deleteGraph(spark, root, graph)
          respond(ex, 204, "", "")
        case m => throw Bad(s"method $m not allowed on /graph")
      }
    })

    http.start()
    Server(http)
  }

  /** SERVICE solver against LIVE HTTP endpoints (IRI → base URL): the
    * body renders back to SPARQL text ([[Sparql.renderService]] — the
    * pure-BGP remote fragment), POSTs to the remote `/sparql` as
    * `application/sparql-query` with `Accept: text/csv`, and the W3C
    * CSV solution document parses into a bindings frame that the
    * enclosing query joins set-at-a-time — ONE remote round-trip per
    * SERVICE block, never per-binding chatter. SILENT skips a branch on
    * an unregistered IRI, a transport failure, or a remote error; a
    * VARIABLE endpoint ranges over the registry with ?ep bound per
    * branch (the same rules as the network-free registry solver).
    *
    * Scale note: the remote answers a BOUNDED document (its own maxRows
    * gate) — federation here is for dimension-sized remote slices, the
    * protocol's use case; corpus-sized remote joins belong on shared
    * storage, not HTTP. */
  def serviceSolver(spark: SparkSession,
      urls: Map[String, String])
      : (Boolean, Term, Sparql.Block) => Option[org.apache.spark.sql.DataFrame] = {
    lazy val solve: (Boolean, Term, Sparql.Block) =>
        Option[org.apache.spark.sql.DataFrame] = {
      case (silent, V(epVar), body) =>
        require(urls.nonEmpty,
          "SERVICE with a variable endpoint needs a non-empty endpoint " +
            "registry — the variable ranges over registered IRIs")
        val branches = urls.keys.toSeq.sorted.flatMap { iri =>
          val solved =
            if (silent)
              try solve(silent, C(iri), body)
              catch { case scala.util.control.NonFatal(_) => None }
            else solve(silent, C(iri), body)
          solved.map { df =>
            import org.apache.spark.sql.functions.{col, lit}
            if (df.columns.contains(epVar)) df.filter(col(epVar) === lit(iri))
            else df.withColumn(epVar, lit(iri))
          }
        }
        if (branches.isEmpty) None
        else Some(branches.reduce(_.unionByName(_,
          allowMissingColumns = true)))
      case (silent, C(iri: String), body) =>
        urls.get(iri) match {
          case None =>
            if (silent) None
            else throw new IllegalArgumentException(
              s"SERVICE endpoint <$iri> is not registered — known: ${
                urls.keys.toSeq.sorted.mkString(", ")}")
          case Some(base) =>
            val text = Sparql.renderService(body)
            val fetch = () => {
              val resp = java.net.http.HttpClient.newHttpClient().send(
                java.net.http.HttpRequest
                  .newBuilder(java.net.URI.create(s"$base/sparql"))
                  .header("Content-Type", "application/sparql-query")
                  .header("Accept", "text/csv")
                  .POST(java.net.http.HttpRequest.BodyPublishers
                    .ofString(text))
                  .build(),
                java.net.http.HttpResponse.BodyHandlers.ofString())
              require(resp.statusCode() == 200,
                s"remote <$iri> answered HTTP ${resp.statusCode()}: ${
                  resp.body().take(500)}")
              val doc = java.nio.file.Files.createTempFile("graft_svc", ".csv")
              java.nio.file.Files.writeString(doc, resp.body())
              spark.read.option("header", true).option("lineSep", "\r\n")
                .csv(doc.toString)
            }
            if (silent)
              try Some(fetch())
              catch { case scala.util.control.NonFatal(_) => None }
            else Some(fetch())
        }
      case (_, C(other), _) =>
        throw new IllegalArgumentException(
          s"SERVICE endpoint must be an IRI or a variable, got $other")
    }
    solve
  }

  /** A client-caused failure → 400 (vs 500 for everything else). */
  private final case class Bad(msg: String) extends RuntimeException(msg)

  private def handle(ex: HttpExchange)(body: => Unit): Unit =
    try body
    catch {
      // the engine's own loud gates are client errors here: a malformed
      // query, nothing acceptable, a protocol-violating parameter combo
      case e @ (_: Bad | _: IllegalArgumentException) =>
        respond(ex, 400, "text/plain", s"${e.getMessage}\n")
      case e: Throwable =>
        respond(ex, 500, "text/plain", s"${e.getMessage}\n")
    }
    finally ex.close()

  private def respond(ex: HttpExchange, status: Int, media: String,
      body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    if (media.nonEmpty)
      ex.getResponseHeaders.set("Content-Type", s"$media; charset=utf-8")
    // 204 carries no body (sendResponseHeaders contract: length -1)
    ex.sendResponseHeaders(status, if (status == 204) -1 else bytes.length)
    if (status != 204) ex.getResponseBody.write(bytes)
  }

  private def header(ex: HttpExchange, name: String): String =
    Option(ex.getRequestHeaders.getFirst(name)).getOrElse("")

  private def contentType(ex: HttpExchange): String =
    header(ex, "Content-Type").toLowerCase

  /** URL query-string → multi-valued param map (the dataset parameters
    * REPEAT, §2.1.4). A bare key (`?default`) maps to an empty value. */
  private def query(ex: HttpExchange): Map[String, Seq[String]] =
    parseForm(Option(ex.getRequestURI.getRawQuery).getOrElse(""))

  private def parseForm(s: String): Map[String, Seq[String]] =
    s.split("&").toSeq.filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8)
        case Array(k) => URLDecoder.decode(k, UTF_8) -> ""
      }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
}
