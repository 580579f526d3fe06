package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus pipelines: parse, canonicalize, dedup.
  *
  * Web-crawl corpora key almost everything on the URL — recrawl dedup,
  * domain-level quality priors, per-site budgets — and the same page
  * arrives under many spellings: mixed-case hosts, explicit default
  * ports, trailing slashes, tracking parameters (`utm_*`, `gclid`,
  * `fbclid`), fragments. Canonicalization folds those spellings to one
  * key BEFORE any dedup/groupBy, so the shuffle key is the page
  * identity, not the crawl accident.
  *
  * The `documents` fixture carries no URL column, so the gate keys
  * derive a deterministic URL per document IN-PLAN (the DuckDB oracle
  * derives the identical string with the same arithmetic — both engines
  * parse and canonicalize the same inputs). The derivation deliberately
  * injects every spelling variant above — including a NON-default
  * `:8080` port (keyed on the PAIR id, so both spellings carry it) that
  * must survive canonicalization while the default `:443` folds away —
  * and gives each consecutive doc-id pair (2k, 2k+1) the same canonical
  * URL so the dedup key has real collisions at every SF.
  *
  * Scale: parsing and canonicalization are map-only codegen'd string
  * expressions (Spark's native `parse_url` plus `regexp_replace`) — no
  * shuffle, no UDF. The dedup is ONE partial-aggregated shuffle on the
  * canonical string; at 100 TB the same shape runs on
  * `xxhash64(canonical)` 8-byte keys (see [[Dedup]]'s hashed span keys
  * for the pattern) — the string form is kept here because the oracle
  * compares the human-readable key.
  */
object UrlOps {

  /** Spark-dialect synthetic URL expression over `doc_id` (the oracle
    * mirror is [[duckUrlExpr]] — keep the two in lockstep). */
  val sparkUrlExpr: String =
    """concat('https://',
      |  CASE WHEN doc_id % 2 = 0
      |       THEN upper(concat('h', cast((doc_id div 2) % 7 as string), '.example.org'))
      |       ELSE concat('h', cast((doc_id div 2) % 7 as string), '.example.org') END,
      |  CASE WHEN (doc_id div 2) % 7 = 3 THEN ':8080'
      |       WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END,
      |  '/docs/', cast((doc_id div 2) % 11 as string),
      |  '/page-', cast(doc_id div 2 as string),
      |  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
      |  '?utm_source=feed&ref=r', cast((doc_id div 2) % 3 as string),
      |  '&gclid=g', cast(doc_id as string),
      |  '#sec-', cast(doc_id as string))""".stripMargin

  /** DuckDB-dialect mirror of [[sparkUrlExpr]]. Operators sit at line
    * ENDS: this string is re-embedded in a second `.stripMargin` template
    * ([[duckCanonicalCte]]), which would eat a leading `||` as margin. */
  val duckUrlExpr: String =
    """'https://' ||
      |  CASE WHEN doc_id % 2 = 0
      |       THEN upper('h' || ((doc_id // 2) % 7) || '.example.org')
      |       ELSE 'h' || ((doc_id // 2) % 7) || '.example.org' END ||
      |  CASE WHEN (doc_id // 2) % 7 = 3 THEN ':8080'
      |       WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END ||
      |  '/docs/' || ((doc_id // 2) % 11) ||
      |  '/page-' || (doc_id // 2) ||
      |  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
      |  '?utm_source=feed&ref=r' || ((doc_id // 2) % 3) ||
      |  '&gclid=g' || doc_id ||
      |  '#sec-' || doc_id""".stripMargin

  /** Attach the synthetic `url` column. */
  def withUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(sparkUrlExpr).as("url"))

  /** Query-string canonicalization: drop tracking parameters, then any
    * separators they leave behind. One global regexp pass suffices —
    * each match consumes its own leading `&` (or start), so survivors
    * keep exactly one separator between them. */
  private def stripTracking(query: Column): Column =
    expr_trim(regexp_replace(query,
      "(^|&)(utm_[a-z]+|fbclid|gclid)=[^&]*", ""))

  private def expr_trim(c: Column): Column =
    // trim stray leading/trailing '&' left at the string ends
    regexp_replace(regexp_replace(c, "^&+", ""), "&+$", "")

  /** Parse `url` into host (lowercased, port-free), registrable-domain
    * approximation (last two labels), path, query, and path depth.
    * Spark's native `parse_url` (codegen'd, null-safe) does the
    * splitting; the oracle does the same with anchored regexes. */
  def parsed(u: DataFrame): DataFrame =
    u.withColumn("scheme", lower(parse_url(col("url"), lit("PROTOCOL"))))
      .withColumn("host", lower(parse_url(col("url"), lit("HOST"))))
      .withColumn("domain", regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
      // parse_url yields NULL for an absent component; a bare URL must
      // canonicalize to its root form, not null-propagate through concat
      // parse_url HOST excludes the port, so extract it separately from
      // the authority (no-userinfo URLs: host has no ':' of its own) —
      // a NON-default port spells a different origin and must survive
      // canonicalization
      .withColumn("port", regexp_extract(col("url"),
        "^[A-Za-z]+://[^/:?#]*:([0-9]+)", 1))
      .withColumn("path", coalesce(parse_url(col("url"), lit("PATH")), lit("")))
      .withColumn("query", coalesce(parse_url(col("url"), lit("QUERY")), lit("")))
      .withColumn("path_depth",
        size(filter(split(col("path"), "/"), x => x =!= "")).cast("long"))

  /** Canonical form: scheme PRESERVED but lowercased (http and https
    * spell different fetches — folding them would conflate distinct
    * pages), lowercase host, the scheme's DEFAULT port dropped but a
    * non-default port preserved (`:8080` is a different origin than the
    * bare host — conflating them would merge distinct sites), fragment
    * dropped, ALL trailing slashes stripped (root stays `/` — stripping
    * just one would break idempotence on multi-slash spellings),
    * tracking parameters removed, an emptied query dropping its `?`. */
  def canonicalized(u: DataFrame): DataFrame = {
    val cpath = regexp_replace(col("path"), "/+$", "")
    val cq = stripTracking(col("query"))
    val defPort = when(col("scheme") === "http", "80")
      .when(col("scheme") === "https", "443")
      .when(col("scheme") === "ftp", "21")
      .otherwise("")
    val portPart = when(col("port") === "" || col("port") === defPort,
      lit("")).otherwise(concat(lit(":"), col("port")))
    parsed(u).withColumn("canonical",
      concat(col("scheme"), lit("://"), col("host"), portPart,
        when(cpath === "", lit("/")).otherwise(cpath),
        when(cq === "", lit("")).otherwise(concat(lit("?"), cq))))
  }

  /** Canonical-URL dedup: one partial-aggregated shuffle on the
    * canonical key; the keeper is the deterministic minimum doc_id. */
  def dedupByCanonical(c: DataFrame): DataFrame =
    c.groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper_id"))

  /** Oracle-side (DuckDB) CTE chain ending in relation `c` with columns
    * (doc_id, url, host, domain, path, path_depth, canonical). */
  val duckCanonicalCte: String =
    s"""u AS (SELECT doc_id, $duckUrlExpr AS url FROM documents),
       |p AS (
       |  SELECT doc_id, url,
       |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
       |    lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)) AS host,
       |    regexp_extract(url, '^[A-Za-z]+://[^/:?#]*:([0-9]+)', 1) AS port,
       |    regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       |    regexp_extract(url, '\\?([^#]*)', 1) AS query
       |  FROM u),
       |c AS (
       |  SELECT doc_id, url, host,
       |    regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
       |    path,
       |    CAST(len(list_filter(string_split(path, '/'), x -> x <> ''))
       |      AS BIGINT) AS path_depth,
       |    scheme || '://' || host ||
       |      CASE WHEN port <> '' AND NOT (scheme = 'https' AND port = '443')
       |                AND NOT (scheme = 'http' AND port = '80')
       |                AND NOT (scheme = 'ftp' AND port = '21')
       |           THEN ':' || port ELSE '' END ||
       |      CASE WHEN regexp_replace(path, '/+$$', '') = '' THEN '/'
       |           ELSE regexp_replace(path, '/+$$', '') END ||
       |      CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canonical
       |  FROM (SELECT *, trim(regexp_replace(query,
       |          '(^|&)(utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'), '&') AS cq
       |        FROM p))""".stripMargin
}
