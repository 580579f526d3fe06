package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** W3C SPARQL 1.1 Query Results serializations of a solution DataFrame —
  * the wire formats a SPARQL endpoint replacement must speak
  * (sparql11-results-csv-tsv, sparql11-results-json, and the original
  * protocol format rdf-sparql-XMLres). Every serializer
  * is a column expression over the solution frame, so results stream out
  * DISTRIBUTED — the driver never assembles the document (callers that
  * genuinely need one in-memory string use [[jsonDocument]] with its
  * explicit row bound).
  *
  * Solutions may carry TERM-STRING cells (`<iri>`, `_:b0`,
  * `"lex"@en` — [[Terms]]) or plain lexical cells; both serialize
  * correctly (a bare cell is a plain literal, exactly [[Terms]]'
  * convention).
  */
object SparqlResults {

  /** CSV (§3 of sparql11-results-csv-tsv): header row of variable
    * names, cells are the term's LEXICAL form only — IRIs bare, tags and
    * datatypes dropped. */
  def toCsvRows(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      Terms.lexical(col(c)).as(c)).toIndexedSeq: _*)

  /** Write the CSV serialization: RFC 4180 quoting (embedded quotes
    * DOUBLE — Spark's default backslash escape is not RFC 4180 and
    * standard consumers misread it), and exactly ONE header row emitted
    * as the leading data row — the writer's own `header` option stamps a
    * header into EVERY part file, which corrupts the §3 single-document
    * assembly (getmerge/cat) for any multi-partition result. */
  def writeCsv(df: DataFrame, path: String): Unit = {
    val rows = toCsvRows(df)
    val spark = df.sparkSession
    val header = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row.fromSeq(df.columns.toSeq)),
      rows.schema)
    header.unionByName(rows).write
      .option("escape", "\"").mode("overwrite").csv(path)
  }

  /** One TSV cell (§4): full term syntax — IRIs `<...>`, blanks `_:...`,
    * quoted literals re-serialized with their RAW payload ECHAR-escaped
    * (Terms' storage convention keeps payloads unescaped, so tabs or
    * inner quotes in the payload MUST be escaped at this boundary or the
    * row's column count breaks), bare lexical cells escaped and quoted
    * as plain literals; unbound stays empty. */
  private def tsvCell(c: Column): Column = {
    // the annotation after the closing quote (@lang / ^^<dt>), if any
    val lastQ = length(c) - instr(reverse(c), "\"") + 1
    val suffix = c.substr(lastQ + 1, length(c))
    when(c.isNull, lit(""))
      .when(Terms.isIri(c) || Terms.isBlank(c), c)
      .when(c.startsWith("\""),
        concat(lit("\""), call_function("nt_escape", Terms.lexical(c)),
          lit("\""), suffix))
      .otherwise(concat(lit("\""), call_function("nt_escape", c), lit("\"")))
  }

  /** TSV (§4): first row `?var<TAB>?var...`, then full-syntax terms. The
    * result is ONE string column (`line`) — TSV's cells are never
    * tab-escaped, so the row is assembled here and written as text. */
  def toTsvRows(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val header = df.columns.map("?" + _).mkString("\t")
    val spark = df.sparkSession
    import spark.implicits._
    Seq(header).toDF("line").unionByName(
      df.select(concat_ws("\t",
        df.columns.map(c => tsvCell(col(c))).toIndexedSeq: _*).as("line")))
  }

  /** One JSON RDF-term object per the results-json spec:
    * `{"type":"uri"|"literal"|"bnode","value":...}` plus `xml:lang` /
    * `datatype` when present; built with `to_json` so string escaping is
    * the JSON writer's, not ours. */
  private def termJson(c: Column): Column = {
    val lex = Terms.lexical(c)
    val lang = Terms.lang(c)
    val dt = Terms.datatype(c)
    when(Terms.isIri(c),
        to_json(struct(lit("uri").as("type"), lex.as("value"))))
      .when(Terms.isBlank(c),
        to_json(struct(lit("bnode").as("type"),
          c.substr(lit(3), length(c)).as("value"))))
      .when(lang =!= "",
        to_json(struct(lit("literal").as("type"), lex.as("value"),
          lang.as("xml:lang"))))
      .when(dt =!= Terms.XsdString && dt =!= Terms.RdfLangString,
        to_json(struct(lit("literal").as("type"), lex.as("value"),
          dt.as("datatype"))))
      .otherwise(
        to_json(struct(lit("literal").as("type"), lex.as("value"))))
  }

  /** One binding object per solution row (`{"v":{...},...}`, unbound
    * variables omitted per spec) — the distributed body of the
    * results-json document. */
  /** A column NAME as a JSON string: full escape (quote, backslash,
    * control chars) — names are driver-side constants, so this runs
    * once, not per row; `c.replace("\"", ...)` alone would emit invalid
    * JSON for names containing backslashes or control characters. */
  private def jsonKey(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case ch if ch < ' ' => sb.append(f"\\u${ch.toInt}%04x")
      case ch => sb.append(ch)
    }
    sb.append('"').toString
  }

  def toJsonBindings(df: DataFrame): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val entries = df.columns.map { c =>
      when(col(c).isNotNull,
        concat(lit(jsonKey(c) + ":"), termJson(col(c))))
    }
    df.select(concat(lit("{"),
      concat_ws(",", entries.toIndexedSeq: _*), lit("}")).as("b"))
      .as[String]
  }

  /** The complete CSV document (§3) as ONE string — RFC 4180 quoting as
    * a column expression, header first; bounded collect, same contract
    * as the other document forms (streaming endpoints use [[writeCsv]] /
    * [[toCsvRows]]). */
  def csvDocument(df: DataFrame, maxRows: Int = 100000): String = {
    val spark = df.sparkSession
    import spark.implicits._
    def quoted(c: Column): Column =
      when(c.isNull, lit(""))
        .when(c.rlike("[\",\r\n]"),
          concat(lit("\""), replace(c, lit("\""), lit("\"\"")), lit("\"")))
        .otherwise(c)
    val rows = toCsvRows(df)
    val lines = rows.select(concat_ws(",",
        rows.columns.map(c => quoted(col(c))).toIndexedSeq: _*).as("line"))
      .as[String].take(maxRows + 1)
    require(lines.length <= maxRows,
      s"result exceeds $maxRows rows — stream toCsvRows instead")
    (df.columns.mkString(",") +: lines.toSeq).mkString("", "\r\n", "\r\n")
  }

  /** The complete TSV document (§4) as ONE string — bounded collect over
    * [[toTsvRows]] (which already leads with the `?var` header row). */
  def tsvDocument(df: DataFrame, maxRows: Int = 100000): String = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = toTsvRows(df).as[String].take(maxRows + 2)
    require(lines.length <= maxRows + 1,
      s"result exceeds $maxRows rows — stream toTsvRows instead")
    lines.mkString("", "\n", "\n")
  }

  // ------------------------- results-xml (§) --------------------------

  /** XML text-content escape as a column expression (order matters: &
    * first); attributes additionally escape the quote. */
  private def xmlEscape(c: Column): Column =
    replace(replace(replace(c, lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
  private def xmlAttr(c: Column): Column =
    replace(xmlEscape(c), lit("\""), lit("&quot;"))

  /** A driver-side constant (variable name) XML-escaped once. */
  private def xmlName(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  /** One `<binding name="v">…</binding>` element, typed per the W3C
    * results-XML vocabulary: `<uri>`, `<bnode>`, `<literal>` with
    * optional `xml:lang` / `datatype`; NULL (unbound) yields null so the
    * enclosing concat_ws omits it, matching the spec's absent binding. */
  private def bindingXml(name: String, c: Column): Column = {
    val lex = xmlEscape(Terms.lexical(c))
    val lang = Terms.lang(c)
    val dt = Terms.datatype(c)
    val inner =
      when(Terms.isIri(c), concat(lit("<uri>"), lex, lit("</uri>")))
        .when(Terms.isBlank(c), concat(lit("<bnode>"),
          xmlEscape(c.substr(lit(3), length(c))), lit("</bnode>")))
        .when(lang =!= "", concat(lit("<literal xml:lang=\""),
          xmlAttr(lang), lit("\">"), lex, lit("</literal>")))
        .when(dt =!= Terms.XsdString && dt =!= Terms.RdfLangString,
          concat(lit("<literal datatype=\""), xmlAttr(dt), lit("\">"),
            lex, lit("</literal>")))
        .otherwise(concat(lit("<literal>"), lex, lit("</literal>")))
    when(c.isNotNull,
      concat(lit(s"""<binding name="${xmlName(name)}">"""),
        inner, lit("</binding>")))
  }

  /** XML results (the ORIGINAL W3C protocol format,
    * `application/sparql-results+xml`): one `<result>` ELEMENT per
    * solution row as a string column — column expressions end to end, so
    * the body streams out distributed like the CSV/TSV/JSON siblings;
    * [[xmlDocument]] is the bounded whole-document assembler. */
  def toXmlRows(df: DataFrame): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val bindings = df.columns.map(c => bindingXml(c, col(c)))
    df.select(concat(lit("<result>"),
      concat_ws("", bindings.toIndexedSeq: _*), lit("</result>")).as("r"))
      .as[String]
  }

  /** The complete results-XML document as ONE string — bounded collect,
    * same contract as [[jsonDocument]]; endpoints streaming big results
    * use [[toXmlRows]] and frame the envelope themselves. */
  def xmlDocument(df: DataFrame, maxRows: Int = 100000): String = {
    val rows = toXmlRows(df).take(maxRows + 1)
    require(rows.length <= maxRows,
      s"result exceeds $maxRows rows — stream toXmlRows instead")
    val vars = df.columns
      .map(c => s"""<variable name="${xmlName(c)}"/>""").mkString
    """<?xml version="1.0"?>""" +
      """<sparql xmlns="http://www.w3.org/2005/sparql-results#">""" +
      s"<head>$vars</head><results>" + rows.mkString + "</results></sparql>"
  }

  /** The complete results-json document as ONE string — for bounded
    * result sets only (`maxRows` guards the driver collect; endpoints
    * streaming big results use [[toJsonBindings]] and frame the head /
    * tail themselves). */
  def jsonDocument(df: DataFrame, maxRows: Int = 100000): String = {
    val rows = toJsonBindings(df).take(maxRows + 1)
    require(rows.length <= maxRows,
      s"result exceeds $maxRows rows — stream toJsonBindings instead")
    val vars = df.columns.map(jsonKey).mkString(",")
    s"""{"head":{"vars":[$vars]},"results":{"bindings":[""" +
      rows.mkString(",") + "]}}"
  }
}
