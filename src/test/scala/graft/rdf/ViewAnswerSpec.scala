package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ViewAnswerSpec extends SparkSpec {
  import spark.implicits._

  private def t3(rows: (String, String, String)*): DataFrame =
    rows.toDF("s", "p", "o")

  private def rowSet(df: DataFrame): Set[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
  }

  private val triples = t3(
    ("c1", "name", "alice"), ("c1", "seg", "B"), ("c1", "nation", "n1"),
    ("c2", "name", "bob"), ("c2", "seg", "B"), ("c2", "nation", "n2"),
    ("c3", "name", "carol"), ("c3", "seg", "A"), ("c3", "nation", "n1"),
    ("n1", "region", "r1"), ("n2", "region", "r2"))

  private val segView = Seq(
    TP(V("c"), C("name"), V("n")), TP(V("c"), C("seg"), C("B")))

  test("embed finds a consistent homomorphism or nothing") {
    val q = Seq(
      TP(V("cust"), C("name"), V("cname")),
      TP(V("cust"), C("seg"), C("B")),
      TP(V("cust"), C("nation"), V("nat")))
    val Some((h, covered)) = ViewAnswer.embed(segView, q)
    assert(h === Map("c" -> V("cust"), "n" -> V("cname")))
    assert(covered === Set(0, 1))
    // constant mismatch: no embedding
    assert(ViewAnswer.embed(
      Seq(TP(V("c"), C("seg"), C("A")),
        TP(V("c"), C("name"), V("n"))), q.take(2)).isEmpty)
    // a view constant never matches a query VARIABLE position
    assert(ViewAnswer.embed(
      Seq(TP(V("c"), C("seg"), C("B"))),
      Seq(TP(V("cust"), C("seg"), V("s")))).isEmpty)
    // ...but a view VARIABLE matches a query constant (specialization)
    val Some((h2, _)) = ViewAnswer.embed(
      Seq(TP(V("c"), C("seg"), V("sv"))),
      Seq(TP(V("cust"), C("seg"), C("A"))))
    assert(h2 === Map("c" -> V("cust"), "sv" -> C("A")))
  }

  test("answer = view for an exact cover — the triples are never read") {
    // an empty triples frame proves the rewrite reads ONLY the view
    val view = Bgp.solve(triples, segView)
    val got = ViewAnswer.answer(triples.limit(0),
      Seq(TP(V("cust"), C("name"), V("cname")),
        TP(V("cust"), C("seg"), C("B"))),
      Seq(segView -> view))
    assert(rowSet(got) === Set(Seq("alice", "c1"), Seq("bob", "c2")))
  }

  test("partial cover joins the residual from the triples") {
    val view = Bgp.solve(triples, segView)
    val q = Seq(
      TP(V("cust"), C("name"), V("cname")),
      TP(V("cust"), C("seg"), C("B")),
      TP(V("cust"), C("nation"), V("nat")),
      TP(V("nat"), C("region"), V("reg")))
    val got = ViewAnswer.answer(triples, q, Seq(segView -> view))
    assert(rowSet(got) === rowSet(Bgp.solve(triples, q)))
    assert(rowSet(got) === Set(
      Seq("alice", "c1", "n1", "r1"), Seq("bob", "c2", "n2", "r2")))
  }

  test("view-variable specialization filters the view") {
    // view stores ALL (cust, seg) pairs; the query asks seg = "A"
    val pats = Seq(TP(V("c"), C("seg"), V("s")))
    val view = Bgp.solve(triples, pats)
    val got = ViewAnswer.answer(triples.limit(0),
      Seq(TP(V("cust"), C("seg"), C("A"))), Seq(pats -> view))
    assert(rowSet(got) === Set(Seq("c3")))
    // merged view variables: query repeats one var in both positions
    val self = t3(("x", "p", "x"), ("x", "p", "y"))
    val pv = Seq(TP(V("a"), C("p"), V("b")))
    val got2 = ViewAnswer.answer(self.limit(0),
      Seq(TP(V("v"), C("p"), V("v"))), Seq(pv -> Bgp.solve(self, pv)))
    assert(rowSet(got2) === Set(Seq("x")))
  }

  test("greedy multi-view cover; non-embedding views skipped") {
    val nameView = Seq(TP(V("x"), C("name"), V("nm")))
    val natView = Seq(TP(V("x"), C("nation"), V("nt")))
    val other = Seq(TP(V("x"), C("absent"), V("y")))
    val q = Seq(
      TP(V("cust"), C("name"), V("cname")),
      TP(V("cust"), C("nation"), V("nat")))
    val got = ViewAnswer.answer(triples.limit(0), q, Seq(
      other -> Bgp.solve(triples, natView).limit(0), // must be skipped
      nameView -> Bgp.solve(triples, nameView),
      natView -> Bgp.solve(triples, natView)))
    assert(rowSet(got) === rowSet(Bgp.solve(triples, q)))
    // nothing embeds → plain solve fallback
    val fall = ViewAnswer.answer(triples, q,
      Seq(other -> Bgp.solve(triples, nameView).limit(0)))
    assert(rowSet(fall) === rowSet(Bgp.solve(triples, q)))
  }

  test("answerStored serves synced views and rejects stale ones loudly") {
    val store = java.nio.file.Files
      .createTempDirectory("va_store").toString
    val view = java.nio.file.Files.createTempDirectory("va_view").toString
    QuadStore.init(triples.withColumn("g", lit("")), store)
    ViewStore.create(spark, store, view, segView)
    val q = Seq(
      TP(V("cust"), C("name"), V("cname")),
      TP(V("cust"), C("seg"), C("B")),
      TP(V("cust"), C("nation"), V("nat")))
    val got = ViewAnswer.answerStored(spark, store, Seq(view), q)
    assert(rowSet(got) === Set(
      Seq("alice", "c1", "n1"), Seq("bob", "c2", "n2")))
    // churn without sync → loud staleness rejection, never a stale answer
    QuadStore.update(spark, store,
      """INSERT DATA { <c4> <name> "dan" . <c4> <seg> "B" . }""")
    val e = intercept[IllegalArgumentException](
      ViewAnswer.answerStored(spark, store, Seq(view), q))
    assert(e.getMessage.contains("stale"))
    ViewStore.sync(spark, store, view)
    val after = ViewAnswer.answerStored(spark, store, Seq(view), q)
    // c4 has no nation → residual join drops it; the VIEW still has it
    assert(rowSet(after) === Set(
      Seq("alice", "c1", "n1"), Seq("bob", "c2", "n2")))
    assert(rowSet(ViewAnswer.answerStored(spark, store, Seq(view),
      segView.map { case TP(s, p, o) => TP(s, p, o) })).size === 3)
  }

  test("answerSparql: text front door, projection, loud fragment gate") {
    val store = java.nio.file.Files
      .createTempDirectory("vat_store").toString
    val view = java.nio.file.Files.createTempDirectory("vat_view").toString
    QuadStore.init(triples.withColumn("g", lit("")), store)
    ViewStore.createFromSparql(spark, store, view,
      """SELECT * WHERE { ?c <name> ?n . ?c <seg> "B" }""")
    val got = ViewAnswer.answerSparql(spark, store, Seq(view),
      """SELECT ?cname ?nat WHERE {
        |  ?cust <name> ?cname . ?cust <seg> "B" .
        |  ?cust <nation> ?nat }""".stripMargin)
    assert(got.columns.toSeq === Seq("cname", "nat"))
    assert(rowSet(got) === Set(Seq("alice", "n1"), Seq("bob", "n2")))
    // richer shapes are rejected loudly, not silently mis-answered
    intercept[IllegalArgumentException](ViewAnswer.answerSparql(
      spark, store, Seq(view),
      """SELECT ?c WHERE { ?c <name> ?n . FILTER (STRLEN(?n) > 2) }"""))
    intercept[IllegalArgumentException](ViewAnswer.answerSparql(
      spark, store, Seq(view),
      "SELECT (COUNT(*) AS ?n) WHERE { ?c <name> ?nm }"))
  }

  test("ViewCatalog: discovery filters to usable views, never breaks") {
    val store = java.nio.file.Files
      .createTempDirectory("vc_store").toString
    val cat = java.nio.file.Files.createTempDirectory("vc_cat").toString
    val good = java.nio.file.Files.createTempDirectory("vc_good").toString
    val lag = java.nio.file.Files.createTempDirectory("vc_lag").toString
    val other = java.nio.file.Files
      .createTempDirectory("vc_other").toString
    QuadStore.init(triples.withColumn("g", lit("")), store)
    ViewStore.create(spark, store, good, segView)
    ViewStore.create(spark, store, lag,
      Seq(TP(V("c"), C("nation"), V("nt"))))
    ViewStore.create(spark, store, other,
      Seq(TP(V("c"), C("name"), V("n"))), graph = "g:zzz")
    ViewCatalog.register(cat, good)
    ViewCatalog.register(cat, good) // idempotent
    ViewCatalog.register(cat, lag)
    ViewCatalog.register(cat, other)
    intercept[Exception]( // a typo'd root is rejected at registration
      ViewCatalog.register(cat, "/tmp/does-not-exist-zzz"))
    assert(ViewCatalog.roots(cat) === Seq(good, lag, other))
    // churn; sync only `good` — `lag` falls behind, `other` is
    // cross-graph: both filtered OUT, the query still answers
    QuadStore.update(spark, store,
      """INSERT DATA { <c4> <name> "dan" . <c4> <seg> "B" . }""")
    ViewStore.sync(spark, store, good)
    assert(ViewCatalog.usable(spark, store, cat) === Seq(good))
    val got = ViewCatalog.answer(spark, store, cat,
      """SELECT ?cname ?nat WHERE {
        |  ?cust <name> ?cname . ?cust <seg> "B" .
        |  ?cust <nation> ?nat }""".stripMargin)
    assert(rowSet(got) === Set(Seq("alice", "n1"), Seq("bob", "n2")))
    // no usable view at all → plain-solve fallback, same answer
    ViewCatalog.deregister(cat, good)
    assert(ViewCatalog.usable(spark, store, cat) === Nil)
    assert(rowSet(ViewCatalog.answer(spark, store, cat,
      """SELECT ?cname ?nat WHERE {
        |  ?cust <name> ?cname . ?cust <seg> "B" .
        |  ?cust <nation> ?nat }""".stripMargin)) === rowSet(got))
  }

  test("ViewCatalog.answerAgg routes grouped queries to a matching " +
      "summary; everything else falls back to the plain solve") {
    val store = java.nio.file.Files
      .createTempDirectory("vca_store").toString
    val cat = java.nio.file.Files.createTempDirectory("vca_cat").toString
    val v1 = java.nio.file.Files.createTempDirectory("vca_v1").toString
    val a1 = java.nio.file.Files.createTempDirectory("vca_a1").toString
    val v2 = java.nio.file.Files.createTempDirectory("vca_v2").toString
    val a2 = java.nio.file.Files.createTempDirectory("vca_a2").toString
    QuadStore.init(t3(
      ("c1", "nat", "de"), ("c1", "bal", "10"), ("c1", "seg", "B"),
      ("c2", "nat", "de"), ("c2", "bal", "5"), ("c2", "seg", "A"),
      ("c3", "nat", "fr"), ("c3", "bal", "7"), ("c3", "seg", "B"))
      .withColumn("g", lit("")), store)
    ViewStore.createAggFromSparql(spark, store, v1, a1,
      """SELECT ?nat (COUNT(*) AS ?cnt) (SUM(?bal) AS ?total) WHERE {
        |  ?c <nat> ?nat . ?c <bal> ?bal . } GROUP BY ?nat""".stripMargin)
    ViewStore.createAggFromSparql(spark, store, v2, a2,
      """SELECT ?seg (COUNT(*) AS ?n) WHERE {
        |  ?c <seg> ?seg . } GROUP BY ?seg""".stripMargin)
    ViewCatalog.registerAgg(cat, v1, a1)
    ViewCatalog.registerAgg(cat, v1, a1) // idempotent
    ViewCatalog.registerAgg(cat, v2, a2)
    intercept[Exception]( // not a summary → rejected at registration
      ViewCatalog.registerAgg(cat, v1, v2))
    assert(ViewCatalog.aggPairs(cat) === Seq((v1, a1), (v2, a2)))
    // a renamed nat-grouped query routes PAST the seg summary to (v1,a1)
    val q =
      """SELECT ?country (COUNT(*) AS ?members) (SUM(?b) AS ?sum) WHERE {
        |  ?cust <nat> ?country . ?cust <bal> ?b . } GROUP BY ?country"""
        .stripMargin
    val expect = Set(Seq("de", 2L, 15L), Seq("fr", 1L, 7L))
    assert(rowSet(ViewCatalog.answerAgg(spark, store, cat, q)) === expect)
    // the seg query routes to the second pair
    assert(rowSet(ViewCatalog.answerAgg(spark, store, cat,
      """SELECT ?s (COUNT(*) AS ?k) WHERE { ?c <seg> ?s . }
        |GROUP BY ?s""".stripMargin)) ===
      Set(Seq(1L, "A"), Seq(2L, "B")))
    // a grouped query NO summary serves falls back to the plain solve
    assert(rowSet(ViewCatalog.answerAgg(spark, store, cat,
      """SELECT ?nat (COUNT(*) AS ?n) (SUM(?bal) AS ?t) WHERE {
        |  ?c <nat> ?nat . ?c <bal> ?bal . ?c <seg> "B" . }
        |GROUP BY ?nat""".stripMargin)) ===
      Set(Seq(1L, "de", 10L), Seq(1L, "fr", 7L)))
    // outside the maintainable fragment (HAVING) → plain solve too
    assert(rowSet(ViewCatalog.answerAgg(spark, store, cat,
      """SELECT ?nat (COUNT(*) AS ?n) WHERE { ?c <nat> ?nat . }
        |GROUP BY ?nat HAVING (COUNT(*) > 1)""".stripMargin)) ===
      Set(Seq(2L, "de")))
    // staleness SKIPS the summary (strictness trips inside the try) and
    // the fallback still answers fresh; after syncs it routes again
    QuadStore.update(spark, store,
      """INSERT DATA { <c4> <nat> "fr" . <c4> <bal> "3" }""")
    val fresh = Set(Seq("de", 2L, 15L), Seq("fr", 2L, 10L))
    assert(rowSet(ViewCatalog.answerAgg(spark, store, cat, q)) === fresh)
    ViewStore.sync(spark, store, v1)
    ViewStore.syncAgg(spark, v1, a1)
    assert(rowSet(ViewCatalog.answerAgg(spark, store, cat, q)) === fresh)
    ViewCatalog.deregisterAgg(cat, v1, a1)
    assert(ViewCatalog.aggPairs(cat) === Seq((v2, a2)))
    assert(rowSet(ViewCatalog.answerAgg(spark, store, cat, q)) === fresh)
  }

  test("answerAgg's two routes agree on MIN/MAX values AND types — " +
      "summary-served and fallback answers are indistinguishable") {
    val store = java.nio.file.Files
      .createTempDirectory("vcx_store").toString
    val cat = java.nio.file.Files.createTempDirectory("vcx_cat").toString
    val view = java.nio.file.Files.createTempDirectory("vcx_view").toString
    val agg = java.nio.file.Files.createTempDirectory("vcx_agg").toString
    // numeric strings of DIFFERING lengths: lexicographic min/max over
    // {"9", "24", "100"} would answer ("100", "9") — the numeric
    // contract both routes must share answers (9, 100)
    QuadStore.init(t3(
      ("c1", "nat", "de"), ("c1", "bal", "9"),
      ("c2", "nat", "de"), ("c2", "bal", "24"),
      ("c3", "nat", "de"), ("c3", "bal", "100"),
      ("c4", "nat", "fr"), ("c4", "bal", "7"))
      .withColumn("g", lit("")), store)
    ViewStore.createAggFromSparql(spark, store, view, agg,
      """SELECT ?nat (COUNT(*) AS ?cnt) (MIN(?bal) AS ?lo)
        |  (MAX(?bal) AS ?hi) (AVG(?bal) AS ?mean) WHERE {
        |  ?c <nat> ?nat . ?c <bal> ?bal . } GROUP BY ?nat""".stripMargin)
    ViewCatalog.registerAgg(cat, view, agg)
    val q =
      """SELECT ?country (COUNT(*) AS ?n) (MIN(?b) AS ?lo)
        |  (MAX(?b) AS ?hi) (AVG(?b) AS ?mean) WHERE {
        |  ?cust <nat> ?country . ?cust <bal> ?b . } GROUP BY ?country"""
        .stripMargin
    val served = ViewCatalog.answerAgg(spark, store, cat, q)
    // the summary really served it (plan reads the summary chain only)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains(new java.io.File(agg).getName), plan)
    ViewCatalog.deregisterAgg(cat, view, agg)
    val fallback = ViewCatalog.answerAgg(spark, store, cat, q)
    assert(!fallback.queryExecution.executedPlan.toString
      .contains(new java.io.File(agg).getName))
    // identical VALUES, identical column names and TYPES (numeric long
    // extremums, one double AVG) — routing changes latency, never the
    // answer (nullability may differ: sum-served counts are nullable)
    assert(served.dtypes.toSeq === fallback.dtypes.toSeq)
    assert(rowSet(served) === rowSet(fallback))
    assert(rowSet(served) === Set(
      Seq("de", 100L, 9L, 133.0 / 3.0, 3L),  // hi, lo, mean, n (by name)
      Seq("fr", 7L, 7L, 7.0, 1L)))
  }

  test("answerAggSparql serves dashboards from the persisted summary") {
    val store = java.nio.file.Files
      .createTempDirectory("vaa_store").toString
    val view = java.nio.file.Files.createTempDirectory("vaa_view").toString
    val agg = java.nio.file.Files.createTempDirectory("vaa_agg").toString
    QuadStore.init(t3(
      ("c1", "nat", "de"), ("c1", "bal", "10"),
      ("c2", "nat", "de"), ("c2", "bal", "5"),
      ("c3", "nat", "fr"), ("c3", "bal", "7"))
      .withColumn("g", lit("")), store)
    ViewStore.createAggFromSparql(spark, store, view, agg,
      """SELECT ?nat (COUNT(*) AS ?cnt) (SUM(?bal) AS ?total) WHERE {
        |  ?c <nat> ?nat . ?c <bal> ?bal . } GROUP BY ?nat""".stripMargin)
    // the query renames every variable — answered via the embedding
    val q =
      """SELECT ?country (COUNT(*) AS ?members) (SUM(?b) AS ?sum) WHERE {
        |  ?cust <nat> ?country . ?cust <bal> ?b . } GROUP BY ?country"""
        .stripMargin
    val got = ViewAnswer.answerAggSparql(spark, store, view, agg, q)
    assert(got.columns.toSeq === Seq("country", "members", "sum"))
    assert(rowSet(got) === Set(Seq("de", 2L, 15L), Seq("fr", 1L, 7L)))
    // churn without syncs → stale, loud; after syncs → fresh answer
    QuadStore.update(spark, store,
      """INSERT DATA { <c4> <nat> "fr" . <c4> <bal> "3" }""")
    val e = intercept[IllegalArgumentException](
      ViewAnswer.answerAggSparql(spark, store, view, agg, q))
    assert(e.getMessage.contains("stale"))
    ViewStore.sync(spark, store, view)
    intercept[IllegalArgumentException]( // summary itself still behind
      ViewAnswer.answerAggSparql(spark, store, view, agg, q))
    ViewStore.syncAgg(spark, view, agg)
    assert(rowSet(ViewAnswer.answerAggSparql(spark, store, view, agg, q))
      === Set(Seq("de", 2L, 15L), Seq("fr", 2L, 10L)))
    // a query with an EXTRA pattern must not be served from the summary
    intercept[IllegalArgumentException](ViewAnswer.answerAggSparql(
      spark, store, view, agg,
      """SELECT ?country (COUNT(*) AS ?members) WHERE {
        |  ?cust <nat> ?country . ?cust <bal> ?b . ?cust <vip> ?y . }
        |GROUP BY ?country""".stripMargin))
    // a SUM the summary does not store is loud
    intercept[IllegalArgumentException](ViewAnswer.answerAggSparql(
      spark, store, view, agg,
      """SELECT ?country (COUNT(*) AS ?n) (SUM(?country) AS ?x) WHERE {
        |  ?cust <nat> ?country . ?cust <bal> ?b . } GROUP BY ?country"""
        .stripMargin))
    // plan shape: the dashboard read scans ONLY the summary chain —
    // the plan names locations under the aggRoot and never the store
    // or the binding view
    val plan = ViewAnswer.answerAggSparql(spark, store, view, agg, q)
      .queryExecution.executedPlan.toString
    assert(plan.contains(new java.io.File(agg).getName),
      s"no summary scan in:\n$plan")
    assert(!plan.contains(new java.io.File(store).getName) &&
      !plan.contains(new java.io.File(view).getName),
      s"summary answering must read the summary alone:\n$plan")
  }
}
