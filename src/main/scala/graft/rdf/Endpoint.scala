package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SPARQL 1.1 Protocol surface, network-free: everything a
  * conformant HTTP endpoint needs except the socket. A server shim maps
  * `GET/POST ?query=` to [[query]] (content-negotiated serialization),
  * `POST ?update=` to [[update]] (atomic `;`-request against the
  * [[QuadStore]] delta log), and the returned (media type, body) pair to
  * the response. This build runs with zero network egress, so the
  * transport stays out of scope by design; the protocol logic —
  * operation dispatch, dataset selection, negotiation, all four W3C
  * result formats, the ASK boolean forms — is complete and spec-tested.
  *
  * Scale note: the document forms are BOUNDED driver collects (protocol
  * responses are for humans and clients, not bulk export); an endpoint
  * streaming corpus-sized results frames [[SparqlResults]]' row
  * serializers itself — every serializer is a distributed column
  * expression, so the cluster renders rows, never the driver.
  */
object Endpoint {

  val Json = "application/sparql-results+json"
  val Xml = "application/sparql-results+xml"
  val Csv = "text/csv"
  val Tsv = "text/tab-separated-values"
  /** Graph results (CONSTRUCT / DESCRIBE) serialize as RDF, not as a
    * results table — N-Triples is the offered format. */
  val NTriplesMedia = "application/n-triples"
  private val Supported = Seq(Json, Xml, Csv, Tsv)

  /** Accept entries ordered by q-value (highest first; ties keep header
    * order — sortBy is stable). RFC 9110 §12.4.2: `q=0` means "not
    * acceptable", so those entries are DROPPED before matching — an
    * Accept of `text/csv;q=0, application/sparql-results+json` must
    * never select CSV. A malformed q is tolerated as 1.0 (the header's
    * own default), matching the previous lenient behavior. */
  private def acceptable(accept: String): Seq[String] = {
    val entries = accept.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .map { e =>
        val parts = e.split(";").map(_.trim)
        val q = parts.tail.collectFirst {
          case p if p.toLowerCase.startsWith("q=") =>
            try p.drop(2).toDouble
            catch { case _: NumberFormatException => 1.0 }
        }.getOrElse(1.0)
        (parts.head, q)
      }
    entries.filter(_._2 > 0).sortBy(-_._2).map(_._1)
  }

  /** Highest-q supported media type in the Accept list. `*／*` and an
    * empty header mean the spec-recommended default, results-json.
    * Nothing acceptable → loud error, the 406 analog. */
  def negotiate(accept: String): String = {
    val wanted = acceptable(accept)
    if (wanted.isEmpty && accept.trim.isEmpty) Json
    else wanted.collectFirst {
      case "*/*" => Json
      case t if Supported.contains(t) => t
    }.getOrElse(throw new IllegalArgumentException(
      s"no supported media type in Accept '$accept' — offer one of " +
        Supported.mkString(", ")))
  }

  /** Execute a query against the store head and serialize per `accept`;
    * returns (media type, response body). ASK uses the boolean
    * results-json/xml forms (CSV/TSV are defined for SELECT only —
    * loud error, per the spec's scope); CONSTRUCT/DESCRIBE return an
    * RDF GRAPH and serialize as N-Triples.
    *
    * `defaultGraphUris` / `namedGraphUris` are the protocol's
    * `default-graph-uri` / `named-graph-uri` request parameters
    * (§2.1.4): when EITHER is supplied they define the dataset — the
    * default graph is the RDF merge of the `default-graph-uri` slices,
    * GRAPH ranges over exactly the `named-graph-uri` set — and take
    * precedence over the query's own FROM / FROM NAMED clauses. */
  def query(spark: SparkSession, root: String, text: String,
      accept: String = "",
      endpoints: Map[String, DataFrame] = Map.empty,
      maxRows: Int = 100000,
      defaultGraphUris: Seq[String] = Nil,
      namedGraphUris: Seq[String] = Nil): (String, String) =
    respond(Sparql.parse(text),
      QuadStore.query(spark, root, text, endpoints,
        protocolDataset(defaultGraphUris, namedGraphUris)), accept, maxRows)

  /** [[query]] against a PINNED store version — repeatable reads. */
  def queryVersion(spark: SparkSession, root: String, v: Int, text: String,
      accept: String = "",
      endpoints: Map[String, DataFrame] = Map.empty,
      maxRows: Int = 100000,
      defaultGraphUris: Seq[String] = Nil,
      namedGraphUris: Seq[String] = Nil): (String, String) =
    respond(Sparql.parse(text),
      QuadStore.queryVersion(spark, root, v, text, endpoints,
        protocolDataset(defaultGraphUris, namedGraphUris)), accept,
      maxRows)

  private def protocolDataset(dgs: Seq[String],
      ngs: Seq[String]): Option[(Seq[String], Seq[String])] =
    if (dgs.isEmpty && ngs.isEmpty) None else Some((dgs, ngs))

  private def respond(parsed: Sparql.Query, df: DataFrame, accept: String,
      maxRows: Int): (String, String) =
    if (parsed.construct.isDefined || parsed.describe.isDefined)
      serializeGraph(df, accept, maxRows)
    else serialize(df, negotiate(accept), maxRows, parsed.ask)

  /** The graph-result serialization: negotiate against the RDF formats
    * (N-Triples; `*／*` and empty accept it), render distributedly,
    * assemble bounded. */
  private def serializeGraph(df: DataFrame, accept: String,
      maxRows: Int): (String, String) = {
    val wanted = acceptable(accept)
    val ok = (wanted.isEmpty && accept.trim.isEmpty) ||
      wanted.exists(t => t == "*/*" || t == NTriplesMedia)
    if (!ok) throw new IllegalArgumentException(
      s"graph results serialize as RDF — no supported media type in " +
        s"Accept '$accept', offer $NTriplesMedia")
    val spark = df.sparkSession
    import spark.implicits._
    val lines = NTriples.renderTerms(df).as[String].take(maxRows + 1)
    require(lines.length <= maxRows,
      s"graph exceeds $maxRows triples — stream NTriples.renderTerms")
    (NTriplesMedia,
      if (lines.isEmpty) "" else lines.mkString("", "\n", "\n"))
  }

  /** Execute an UPDATE request (a full `;`-separated sequence, committed
    * ATOMICALLY as one store version); returns the new version.
    *
    * `usingGraphUris` / `usingNamedGraphUris` are the protocol's
    * `using-graph-uri` / `using-named-graph-uri` request parameters
    * (§2.2.3): they scope every WHERE-bearing operation's dataset
    * exactly like USING / USING NAMED clauses would (`DELETE WHERE`
    * desugars to its Modify form first, §3.1.3's shorthand rule).
    * Combining them with an operation that already carries USING,
    * USING NAMED or WITH is rejected, as the spec REQUIRES. */
  def update(spark: SparkSession, root: String, text: String,
      usingGraphUris: Seq[String] = Nil,
      usingNamedGraphUris: Seq[String] = Nil): Int =
    if (usingGraphUris.isEmpty && usingNamedGraphUris.isEmpty)
      QuadStore.update(spark, root, text)
    else {
      val ops = Update.parseAll(text).map {
        case m: Update.Modify =>
          require(m.withGraph.isEmpty && m.usingDefault.isEmpty &&
            m.usingNamed.isEmpty,
            "using-graph-uri/using-named-graph-uri must not combine " +
              "with USING / USING NAMED / WITH in the request — the " +
              "SPARQL Protocol (§2.2.3) requires rejecting it")
          m.copy(usingDefault = usingGraphUris,
            usingNamed = usingNamedGraphUris)
        case dw: Update.DeleteWhere =>
          Update.Modify(dw.patterns, Nil, dw.patterns,
            usingDefault = usingGraphUris, usingNamed = usingNamedGraphUris)
        // data/graph-management ops have no WHERE — unaffected by the
        // request dataset
        case other => other
      }
      QuadStore.updateOps(spark, root, ops)
    }

  // ---- SPARQL 1.1 Graph Store Protocol (§5), network-free -----------
  // The ?graph=<iri> / ?default resource operations: a server shim maps
  // GET/PUT/POST/DELETE here. Bodies are N-Triples. `graph = None`
  // addresses the default graph. Each write is ONE store version (PUT's
  // clear+insert composes into a single delta — no torn window), and
  // payload/graph names never round-trip through SPARQL surface syntax,
  // so hostile characters cannot break out. Node-kind note: the default
  // stores hold PLAIN LEXICAL terms (Terms' engine-wide convention), so
  // a PUT IRI object serializes back as a plain literal — the GET/PUT
  // loop is the identity on the STORED graph, and term-string-encoded
  // stores keep exact node kinds where that matters.

  /** GSP GET: the graph's triples as an N-Triples document. */
  def getGraph(spark: SparkSession, root: String,
      graph: Option[String] = None,
      maxRows: Int = 100000): (String, String) = {
    import spark.implicits._
    val g = graph.getOrElse(Quads.DefaultGraph)
    val slice = QuadStore.read(spark, root)
      .filter(org.apache.spark.sql.functions.col("g") === g)
      .select("s", "p", "o")
    val lines = NTriples.renderTerms(slice).as[String].take(maxRows + 1)
    require(lines.length <= maxRows,
      s"graph exceeds $maxRows triples — stream NTriples.renderTerms")
    (NTriplesMedia,
      if (lines.isEmpty) "" else lines.mkString("", "\n", "\n"))
  }

  /** GSP PUT: replace the graph with the parsed N-Triples body — one
    * atomic version. Corrupt body lines are a loud error, never a
    * partial ingest. */
  def putGraph(spark: SparkSession, root: String, body: String,
      graph: Option[String] = None): Int =
    QuadStore.replaceGraph(spark, root,
      graph.getOrElse(Quads.DefaultGraph), parseBody(spark, body))

  /** GSP POST: merge the body's triples into the graph (RDF merge =
    * set union; an idempotent replay appends nothing). */
  def postGraph(spark: SparkSession, root: String, body: String,
      graph: Option[String] = None): Int = {
    val g = graph.getOrElse(Quads.DefaultGraph)
    QuadStore.appendQuads(spark, root, parseBody(spark, body)
      .withColumn("g", org.apache.spark.sql.functions.lit(g)))
  }

  /** GSP DELETE: drop the graph — one atomic version. */
  def deleteGraph(spark: SparkSession, root: String,
      graph: Option[String] = None): Int =
    QuadStore.dropGraph(spark, root, graph.getOrElse(Quads.DefaultGraph))

  private def parseBody(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    val lines = body.split("\n").toSeq.toDF("value")
    val bad = NTriples.corrupt(lines).limit(1).collect()
    require(bad.isEmpty,
      s"N-Triples body has unparseable lines, first: '${
        if (bad.isEmpty) "" else bad(0).getString(0)}'")
    NTriples.parse(lines)
  }

  // ASK is decided by the PARSED query form, never by sniffing the
  // result schema — a SELECT projecting a boolean BIND is still a table
  private def serialize(df: DataFrame, media: String,
      maxRows: Int, isAsk: Boolean): (String, String) = {
    if (isAsk) {
      val b = df.collect()(0).getBoolean(0)
      media match {
        case Json => (Json, s"""{"head":{},"boolean":$b}""")
        case Xml => (Xml, """<?xml version="1.0"?>""" +
          """<sparql xmlns="http://www.w3.org/2005/sparql-results#">""" +
          s"<head/><boolean>$b</boolean></sparql>")
        case other => throw new IllegalArgumentException(
          s"ASK results have no $other form — CSV/TSV serialize SELECT " +
            "results only (sparql11-results-csv-tsv §1)")
      }
    } else media match {
      case Json => (Json, SparqlResults.jsonDocument(df, maxRows))
      case Xml => (Xml, SparqlResults.xmlDocument(df, maxRows))
      case Csv => (Csv, SparqlResults.csvDocument(df, maxRows))
      case Tsv => (Tsv, SparqlResults.tsvDocument(df, maxRows))
    }
  }
}
