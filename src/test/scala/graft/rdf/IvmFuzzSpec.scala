package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized-churn equivalence: every maintainable view algebra
  * (conjunctive, union supports, optional pads, transitive closure)
  * advanced through SEEDED random add/delete rounds must land exactly
  * on the recompute over the churned state — the deterministic
  * fixture cases in BgpViewSpec/PathIvmSpec pin the RULES' hard
  * corners; this pins the composition under arbitrary interleavings
  * (the BpeSpec randomized-corpus precedent). */
class IvmFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private val subjects = (0 until 8).map(i => s"s$i")
  private val preds = Seq("p", "q", "r")
  private def universe: Seq[(String, String, String)] =
    for (s <- subjects; p <- preds; o <- subjects if s != o)
      yield (s, p, o)

  private def df(rows: Set[(String, String, String)]): DataFrame =
    if (rows.isEmpty)
      Seq.empty[(String, String, String)].toDF("s", "p", "o")
    else rows.toSeq.sorted.toDF("s", "p", "o")

  private def rowSet(d: DataFrame): Set[Seq[Any]] = {
    val cols = d.columns.sorted.toSeq
    d.select(cols.map(col): _*).collect().map(_.toSeq).toSet
  }

  test("random churn rounds: all four algebras maintain ≡ recompute") {
    val conj = Seq(TP(V("x"), C("p"), V("y")), TP(V("y"), C("q"), V("z")))
    val branches = Seq(Seq(TP(V("x"), C("p"), V("y"))),
      Seq(TP(V("x"), C("r"), V("y"))))
    val (optL, optR) =
      (Seq(TP(V("x"), C("p"), V("y"))), Seq(TP(V("x"), C("q"), V("z"))))

    var state: Set[(String, String, String)] =
      rnd.shuffle(universe).take(40).toSet
    var conjView = BgpView.compute(df(state), conj)
    var unionCounts = BgpView.computeUnionCounts(df(state), branches)
    var optView = BgpView.computeOptional(df(state), optL, optR)
    val pEdges = (s: Set[(String, String, String)]) =>
      s.collect { case (a, "p", b) => (a, b) }
    var closure = Paths.transitiveClosure(
      df(state).filter($"p" === "p")
        .select($"s".as("src"), $"o".as("dst")))

    for (round <- 1 to 5) {
      val adds = rnd.shuffle((universe.toSet -- state).toSeq).take(6).toSet
      val dels = rnd.shuffle(state.toSeq).take(6).toSet
      val next = state -- dels ++ adds
      val (oldDf, addDf, delDf) = (df(state), df(adds), df(dels))

      conjView = BgpView.maintain(conjView, oldDf, addDf, delDf, conj)
      assert(rowSet(conjView) ===
        rowSet(BgpView.compute(df(next), conj)), s"conjunctive r$round")

      unionCounts = BgpView.maintainUnionCounts(unionCounts, oldDf,
        addDf, delDf, branches)
      assert(rowSet(unionCounts) ===
        rowSet(BgpView.computeUnionCounts(df(next), branches)),
        s"union supports r$round")

      optView = BgpView.maintainOptional(optView, oldDf, addDf, delDf,
        optL, optR)
      assert(rowSet(optView) ===
        rowSet(BgpView.computeOptional(df(next), optL, optR)),
        s"optional r$round")

      // closure churn: single-pred edges, so edge deltas ARE the
      // triple deltas restricted to p
      val eAdds = pEdges(adds).toSeq
      val eDels = pEdges(dels).toSeq
      val e = (rows: Seq[(String, String)]) =>
        if (rows.isEmpty) Seq.empty[(String, String)].toDF("src", "dst")
        else rows.toDF("src", "dst")
      closure = Paths.maintainClosure(closure,
        e(pEdges(state).toSeq), e(eAdds), e(eDels))
      assert(rowSet(closure) === rowSet(Paths.transitiveClosure(
        e(pEdges(next).toSeq))), s"closure r$round")

      state = next
    }
  }
}
