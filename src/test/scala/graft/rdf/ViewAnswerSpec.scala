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
}
