package graft.functions

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scalar function families, one composite query per family. All built-in
  * `org.apache.spark.sql.functions` — codegen'd, no UDFs, so every query
  * stays inside a single WholeStageCodegen span over the scan.
  *
  * Cross-engine parity traps handled here (Spark vs DuckDB oracle):
  * libm functions (ln/pow/sqrt) can differ in the last ulp → rounded to 6;
  * `ceil`/`floor` return BIGINT in Spark but DOUBLE in DuckDB → cast;
  * `dayofweek` numbering differs → use ISO weekday; timestamps are emitted
  * as epoch millis, never as rendered strings.
  */
object FunctionOps extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_fn_string" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("up"),
        lower(col("p_type")).as("low"),
        substring(col("p_name"), 1, 8).as("sub"),
        length(col("p_name")).as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cc"),
        col("p_name").like("%gre%").as("has_gre"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        trim(lit("  pad  ")).as("trimmed"))
        .orderBy(col("p_partkey"))
    }),

    "q_fn_date" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        unix_millis(date_trunc("month", col("o_orderdate"))).as("month_start_ms"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        weekday(col("o_orderdate")).as("wd"))
        .orderBy(col("o_orderkey"))
    }),

    "q_fn_math" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        // tie-safe: native round() disagrees across engines at repr ties
        graft.Det.roundSafe(col("p_retailprice"), 1).as("r1"),
        // native round IS safe on dyadic values (eighths): exact binary tie
        round((col("p_size") / 8.0), 2).as("r8"),
        abs(col("p_retailprice") - 1000.0).as("ab"),
        round(log(col("p_retailprice")), 6).as("lnv"),
        round(pow(col("p_size").cast("double"), 1.5), 6).as("powv"),
        round(sqrt(col("p_retailprice")), 6).as("sq"),
        ceil(col("p_retailprice")).as("ce"),
        floor(col("p_retailprice")).as("fl"),
        pmod(col("p_partkey"), lit(7L)).as("pm"))
        .orderBy(col("p_partkey"))
    }),

    "q_fn_array" -> ((s, d) => {
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("sz"),
        graft.Det.roundSafe(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        graft.Det.roundSafe(expr("aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE))"), 4).as("vsum"),
        graft.Det.roundSafe(expr("aggregate(slice(embedding, 1, 8), 0D, (a, x) -> a + CAST(x AS DOUBLE))"), 4).as("head_sum"),
        graft.Det.roundSafe(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * 2.0), 0D, (a, x) -> a + x)"), 4).as("dsum2"),
        graft.Det.roundSafe(array_max(col("embedding")).cast("double"), 4).as("vmax"))
        .orderBy(col("vec_id"))
    }),

    "q_fn_json" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        length(col("props")).as("props_len"))
        .orderBy(col("event_id"))
    }),

    "q_fn_hash" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"),
        levenshtein(col("c_name"), lit("Customer#000000000")).as("edit_dist"),
        base64(col("c_name").cast("binary")).as("b64"))
        .orderBy(col("c_custkey"))
    }),

    "q_fn_case_null" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        when(col("c_acctbal") < 0.0, "neg")
          .when(col("c_acctbal") < 5000.0, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg2"),
        when(col("c_nationkey") % 2 === 0, lit(null))
          .otherwise(col("c_nationkey")).cast("long").as("odd_nation"),
        isnull(nullif(col("c_mktsegment"), lit("BUILDING"))).as("is_building"))
        .orderBy(col("c_custkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT p_partkey, upper(p_brand) AS up, lower(p_type) AS low,
        |  substring(p_name, 1, 8) AS sub, CAST(length(p_name) AS INT) AS len,
        |  concat_ws('|', p_brand, p_type) AS cc,
        |  (p_name LIKE '%gre%') AS has_gre,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  replace(p_type, ' ', '_') AS type_us,
        |  trim('  pad  ') AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3m,
        |  CAST(isodow(o_orderdate) - 1 AS INT) AS wd
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fn_math" ->
      s"""SELECT p_partkey,
        |  ${graft.Det.roundSafeSql("p_retailprice", 1)} AS r1,
        |  round(p_size / 8.0, 2) AS r8,
        |  abs(p_retailprice - 1000.0) AS ab,
        |  round(ln(p_retailprice), 6) AS lnv,
        |  round(pow(CAST(p_size AS DOUBLE), 1.5), 6) AS powv,
        |  round(sqrt(p_retailprice), 6) AS sq,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  p_partkey % 7 AS pm
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_fn_array" ->
      s"""SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS sz,
        |  ${graft.Det.roundSafeSql("CAST(embedding[1] AS DOUBLE)", 4)} AS e1,
        |  ${graft.Det.roundSafeSql("list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')", 4)} AS vsum,
        |  ${graft.Det.roundSafeSql("list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum')", 4)} AS head_sum,
        |  ${graft.Det.roundSafeSql("list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0), 'sum')", 4)} AS dsum2,
        |  ${graft.Det.roundSafeSql("CAST(list_aggregate(embedding, 'max') AS DOUBLE)", 4)} AS vmax
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(length(props) AS INT) AS props_len
        |FROM events ORDER BY event_id""".stripMargin,

    "q_fn_hash" ->
      """SELECT c_custkey,
        |  md5(c_name) AS h_md5,
        |  sha256(c_name) AS h_sha256,
        |  CAST(levenshtein(c_name, 'Customer#000000000') AS INT) AS edit_dist,
        |  to_base64(encode(c_name)) AS b64
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_fn_case_null" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0.0 THEN 'neg'
        |       WHEN c_acctbal < 5000.0 THEN 'mid' ELSE 'high' END AS band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
        |  CAST(CASE WHEN c_nationkey % 2 = 0 THEN NULL ELSE c_nationkey END AS BIGINT) AS odd_nation,
        |  (nullif(c_mktsegment, 'BUILDING') IS NULL) AS is_building
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
