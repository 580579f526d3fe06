package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.BooleanType

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

  /** First supported media type in the Accept list (list order is the
    * preference; `;q=` parameters are tolerated and ignored). `*／*` and
    * an empty header mean the spec-recommended default, results-json.
    * Nothing acceptable → loud error, the 406 analog. */
  def negotiate(accept: String): String = {
    val wanted = accept.split(",").map(_.trim.takeWhile(_ != ';').trim)
      .filter(_.nonEmpty).toSeq
    if (wanted.isEmpty) Json
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
    * RDF GRAPH and serialize as N-Triples. */
  def query(spark: SparkSession, root: String, text: String,
      accept: String = "",
      endpoints: Map[String, DataFrame] = Map.empty,
      maxRows: Int = 100000): (String, String) =
    respond(Sparql.parse(text),
      QuadStore.query(spark, root, text, endpoints), accept, maxRows)

  /** [[query]] against a PINNED store version — repeatable reads. */
  def queryVersion(spark: SparkSession, root: String, v: Int, text: String,
      accept: String = "",
      endpoints: Map[String, DataFrame] = Map.empty,
      maxRows: Int = 100000): (String, String) =
    respond(Sparql.parse(text),
      QuadStore.queryVersion(spark, root, v, text, endpoints), accept,
      maxRows)

  private def respond(parsed: Sparql.Query, df: DataFrame, accept: String,
      maxRows: Int): (String, String) =
    if (parsed.construct.isDefined || parsed.describe.isDefined)
      serializeGraph(df, accept, maxRows)
    else serialize(df, negotiate(accept), maxRows)

  /** The graph-result serialization: negotiate against the RDF formats
    * (N-Triples; `*／*` and empty accept it), render distributedly,
    * assemble bounded. */
  private def serializeGraph(df: DataFrame, accept: String,
      maxRows: Int): (String, String) = {
    val wanted = accept.split(",").map(_.trim.takeWhile(_ != ';').trim)
      .filter(_.nonEmpty).toSeq
    val ok = wanted.isEmpty ||
      wanted.exists(t => t == "*/*" || t == NTriplesMedia)
    if (!ok) throw new IllegalArgumentException(
      s"graph results serialize as RDF — no supported media type in " +
        s"Accept '$accept', offer $NTriplesMedia")
    val spark = df.sparkSession
    import spark.implicits._
    val lines = NTriples.renderTerms(df).as[String].take(maxRows + 1)
    require(lines.length <= maxRows,
      s"graph exceeds $maxRows triples — stream NTriples.renderTerms")
    (NTriplesMedia, lines.mkString("", "\n", "\n"))
  }

  /** Execute an UPDATE request (a full `;`-separated sequence, committed
    * ATOMICALLY as one store version); returns the new version. */
  def update(spark: SparkSession, root: String, text: String): Int =
    QuadStore.update(spark, root, text)

  private def isAsk(df: DataFrame): Boolean =
    df.schema.fields.length == 1 &&
      df.schema.fields(0).dataType == BooleanType

  private def serialize(df: DataFrame, media: String,
      maxRows: Int): (String, String) = {
    if (isAsk(df)) {
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
