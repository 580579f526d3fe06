package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class PathIvmSpec extends SparkSpec {
  import spark.implicits._

  private def e(rows: (String, String)*): DataFrame =
    rows.toDF("src", "dst")

  private def pairs(df: DataFrame): Set[(String, String)] =
    df.select("src", "dst").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  /** maintainClosure must land exactly on the recompute over the churned
    * edge set; returns the new edge set for chained rounds. */
  private def check(old: DataFrame, adds: DataFrame,
      dels: DataFrame): DataFrame = {
    val closure = Paths.transitiveClosure(old)
    val maintained = Paths.maintainClosure(closure, old, adds, dels)
    val newEdges = old.exceptAll(dels).unionByName(adds)
    assert(pairs(maintained) === pairs(Paths.transitiveClosure(newEdges)),
      "maintained closure diverged from recompute")
    newEdges
  }

  private val none = Seq.empty[(String, String)].toDF("src", "dst")

  test("deletion severs exactly the unreachable region") {
    // a→b→c→d: cutting b→c kills (a,c),(a,d),(b,c),(b,d) and keeps the rest
    val old = e(("a", "b"), ("b", "c"), ("c", "d"))
    val newE = check(old, none, e(("b", "c")))
    assert(pairs(Paths.transitiveClosure(newE)) ===
      Set(("a", "b"), ("c", "d")))
  }

  test("DRed re-derives pairs with an alternate surviving path") {
    // diamond: a→b→d and a→c→d; cutting a→b must KEEP (a,d) via c —
    // the case where over-deletion alone would over-shoot
    val old = e(("a", "b"), ("b", "d"), ("a", "c"), ("c", "d"))
    val newE = check(old, none, e(("a", "b")))
    assert(pairs(Paths.transitiveClosure(newE)) ===
      Set(("a", "c"), ("c", "d"), ("a", "d"), ("b", "d")))
  }

  test("re-derivation chains through recovered pairs, not just kept ones") {
    // x→a→b→c→y plus bypass x→a' →b (a' path): cutting a→b suspends
    // (x,b),(x,c),(x,y),(a,b).. ; x recovers b via a'—and then c, y only
    // THROUGH the recovered (x,b) chain — exercising the semi-naive
    // frontier rounds of the re-derivation, not just round 0
    val old = e(("x", "a"), ("a", "b"), ("b", "c"), ("c", "y"),
      ("x", "a2"), ("a2", "b"))
    check(old, none, e(("a", "b")))
  }

  test("insertion extends through multiple added edges in one batch") {
    // two disjoint chains a→b and c→d; adding b→c AND d→e in ONE batch:
    // (a,e) needs BOTH added edges on its path (two frontier rounds)
    val old = e(("a", "b"), ("c", "d"))
    val newE = check(old, e(("b", "c"), ("d", "e")), none)
    assert(pairs(Paths.transitiveClosure(newE)).contains(("a", "e")))
  }

  test("mixed batch: rewiring a chain in one maintenance round") {
    // a→b→c rewired to a→d→c: delete b→c, add b→d (keeps a→b alive), d→c
    val old = e(("a", "b"), ("b", "c"))
    check(old, e(("b", "d"), ("d", "c")), e(("b", "c")))
  }

  test("deleting an edge whose endpoints stay connected directly") {
    // parallel edge shape: a→b and a→c→b; cutting a→b keeps (a,b)
    check(e(("a", "b"), ("a", "c"), ("c", "b")), none, e(("a", "b")))
  }

  test("cycles: deletion breaking a loop, insertion closing one") {
    val ring = e(("a", "b"), ("b", "c"), ("c", "a"))
    // break the ring
    val broken = check(ring, none, e(("c", "a")))
    assert(pairs(Paths.transitiveClosure(broken)) ===
      Set(("a", "b"), ("b", "c"), ("a", "c")))
    // close it again through a new node
    check(broken, e(("c", "d"), ("d", "a")), none)
  }

  test("randomized churn agrees with recompute") {
    val rnd = new scala.util.Random(1347)
    val nodes = (0 until 14).map(i => s"n$i")
    def edge() = (nodes(rnd.nextInt(nodes.size)),
      nodes(rnd.nextInt(nodes.size)))
    var edges = Seq.fill(24)(edge()).distinct.filter(p => p._1 != p._2)
    var cur = e(edges: _*)
    for (_ <- 1 to 3) {
      val dels = rnd.shuffle(edges).take(4)
      // the changes-feed contract: adds disjoint from the old state,
      // dels drawn from it
      val adds = Seq.fill(10)(edge()).distinct
        .filter(p => p._1 != p._2).filterNot(edges.contains).take(4)
      val maintained = Paths.maintainClosure(
        Paths.transitiveClosure(cur), cur, e(adds: _*), e(dels: _*))
      edges = (edges.diff(dels) ++ adds).distinct
      cur = e(edges: _*)
      assert(pairs(maintained) === pairs(Paths.transitiveClosure(cur)),
        s"random churn diverged (edges now ${edges.size})")
    }
  }
}
