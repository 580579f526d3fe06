package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** W3C SPARQL 1.1 Query Results serializations of a solution DataFrame —
  * the wire formats a SPARQL endpoint replacement must speak
  * (sparql11-results-csv-tsv, sparql11-results-json). Every serializer
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
