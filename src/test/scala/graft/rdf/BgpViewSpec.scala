package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BgpViewSpec extends SparkSpec {
  import spark.implicits._

  private def t3(rows: (String, String, String)*): DataFrame =
    rows.toDF("s", "p", "o")

  private def rowSet(df: DataFrame): Set[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
  }

  /** maintain must land exactly on compute over the new state. */
  private def check(old: DataFrame, adds: DataFrame, dels: DataFrame,
      patterns: Seq[TP]): DataFrame = {
    val view = BgpView.compute(old, patterns)
    val maintained = BgpView.maintain(view, old, adds, dels, patterns)
    val newState = old.exceptAll(dels.select("s", "p", "o"))
      .unionByName(adds.select("s", "p", "o"))
    assert(rowSet(maintained) === rowSet(BgpView.compute(newState, patterns)),
      "maintained view diverged from recompute")
    newState
  }

  private val empty3 = Seq.empty[(String, String, String)].toDF("s", "p", "o")

  private val star = Seq(
    TP(V("c"), C("name"), V("n")),
    TP(V("c"), C("seg"), C("B")),
    TP(V("c"), C("nat"), V("nt")))

  test("star view: mixed add/del batches maintain to the recompute") {
    val old = t3(
      ("c1", "name", "alice"), ("c1", "seg", "B"), ("c1", "nat", "de"),
      ("c2", "name", "bob"), ("c2", "seg", "A"), ("c2", "nat", "fr"),
      ("c3", "name", "carol"), ("c3", "nat", "us"))
    // c2's seg flips A→B (del+add), c3 gains the missing seg, c1 loses nat
    val adds = t3(("c2", "seg", "B"), ("c3", "seg", "B"))
    val dels = t3(("c2", "seg", "A"), ("c1", "nat", "de"))
    val s1 = check(old, adds, dels, star)
    assert(rowSet(BgpView.compute(s1, star)) ===
      Set(Seq("c2", "bob", "fr"), Seq("c3", "carol", "us")))
    // second round on the maintained state: a full new star arrives,
    // an existing one is dismantled
    val adds2 = t3(("c4", "name", "dan"), ("c4", "seg", "B"),
      ("c4", "nat", "jp"))
    val dels2 = t3(("c3", "name", "carol"))
    val s2 = check(s1, adds2, dels2, star)
    assert(rowSet(BgpView.compute(s2, star)) ===
      Set(Seq("c2", "bob", "fr"), Seq("c4", "dan", "jp")))
  }

  test("chain view: cross-term combinations count exactly once") {
    val chain = Seq(TP(V("a"), C("p1"), V("b")), TP(V("b"), C("p2"), V("z")))
    // both legs of a NEW binding arrive in the same batch (+1, not +2)
    check(t3(("k", "p1", "l")), t3(("x", "p1", "y"), ("y", "p2", "z")),
      empty3, chain)
    // both legs of an EXISTING binding leave in the same batch (−1, not −2)
    check(t3(("x", "p1", "y"), ("y", "p2", "z")), empty3,
      t3(("x", "p1", "y"), ("y", "p2", "z")), chain)
    // a shared middle node fans out: one del on the left kills two bindings
    val old = t3(("x", "p1", "y"), ("y", "p2", "u"), ("y", "p2", "v"),
      ("w", "p1", "y"))
    check(old, t3(("y", "p2", "t")), t3(("x", "p1", "y")), chain)
  }

  test("delta nets to nothing on no-op feeds and self-canceling churn") {
    val old = t3(("c1", "name", "alice"), ("c1", "seg", "B"),
      ("c1", "nat", "de"))
    val (a0, d0) = BgpView.delta(old, empty3, empty3, star)
    assert(a0.count() === 0 && d0.count() === 0)
    // delete a non-view triple: the view delta is empty
    val (a1, d1) = BgpView.delta(
      old.unionByName(t3(("c9", "other", "x"))),
      empty3, t3(("c9", "other", "x")), star)
    assert(a1.count() === 0 && d1.count() === 0)
  }

  test("maintained from a QuadStore.changes feed") {
    val root = java.nio.file.Files.createTempDirectory("bgpivm").toString
    val g = "g:x"
    val q4 = Seq(
      ("c1", "name", "alice", g), ("c1", "seg", "B", g),
      ("c2", "name", "bob", g)).toDF("s", "p", "o", "g")
    QuadStore.init(q4, root)
    val patterns = Seq(TP(V("c"), C("name"), V("n")),
      TP(V("c"), C("seg"), C("B")))
    val tOf = (df: DataFrame) => df.filter(col("g") === g).select("s", "p", "o")
    val v1 = QuadStore.currentVersion(root).get
    val old = tOf(QuadStore.readVersion(spark, root, v1))
    var view = BgpView.compute(old, patterns)
    QuadStore.update(spark, root,
      s"""INSERT DATA { GRAPH <$g> { <c2> <seg> "B" . } } ;
         |DELETE DATA { GRAPH <$g> { <c1> <seg> "B" . } }""".stripMargin)
    val v2 = QuadStore.currentVersion(root).get
    val (adds, dels) = QuadStore.changes(spark, root, v1, v2)
    view = BgpView.maintain(view, old, tOf(adds), tOf(dels), patterns)
    assert(rowSet(view) === rowSet(BgpView.compute(
      tOf(QuadStore.readVersion(spark, root, v2)), patterns)))
    assert(rowSet(view) === Set(Seq("c2", "bob")))
    rmTree(new java.io.File(root))
  }

  test("projected aggregate views ride IncrementalAgg on the view delta") {
    // the full-binding view is a set; a projection that would introduce
    // multiplicities (members per nation) is maintained as counts fed by
    // BgpView.delta — the documented composition
    val star = Seq(TP(V("c"), C("seg"), C("B")), TP(V("c"), C("nat"), V("nt")))
    val old = t3(("c1", "seg", "B"), ("c1", "nat", "de"),
      ("c2", "seg", "B"), ("c2", "nat", "de"), ("c3", "seg", "B"),
      ("c3", "nat", "fr"))
    val adds = t3(("c4", "seg", "B"), ("c4", "nat", "de"))
    val dels = t3(("c3", "seg", "B"))
    val counts0 = graft.operators.IncrementalAgg.recompute(
      BgpView.compute(old, star), Seq("nt"),
      Map("n" -> lit(1L)))
    val (va, vd) = BgpView.delta(old, adds, dels, star)
    val maintained = graft.operators.IncrementalAgg.maintainCounts(
      counts0, va, vd, Seq("nt"))
    val newState = old.exceptAll(dels).unionByName(adds)
    assert(rowSet(maintained) === rowSet(
      graft.operators.IncrementalAgg.recompute(
        BgpView.compute(newState, star), Seq("nt"),
        Map("n" -> lit(1L)))))
    assert(rowSet(maintained) === Set(Seq(3L, "de")),
      "fr nets to zero members and must leave the summary")
  }

  test("the delta rule is id-space agnostic: encoded views maintain too") {
    // the reference's execution model runs over 8-byte ids; BgpView is
    // schema-agnostic over (s,p,o), so the SAME maintenance code drives
    // an id-space view — decode at emission matches the string view
    val patterns = Seq(TP(V("c"), C("name"), V("n")),
      TP(V("c"), C("seg"), C("B")))
    val old = t3(("c1", "name", "alice"), ("c1", "seg", "B"),
      ("c2", "name", "bob"))
    val adds = t3(("c2", "seg", "B"))
    val dels = t3(("c1", "seg", "B"))
    // one dictionary covering old ∪ adds (deletes never add terms)
    val dict = Dictionary.build(spark, old.unionByName(adds))
    def enc(df: org.apache.spark.sql.DataFrame) =
      EncodedBgp.asTriples(Dictionary.encode(df, dict))
    val (idPats, ok) = EncodedBgp.encodePatterns(dict, patterns)
    assert(ok)
    val idView = BgpView.maintain(
      BgpView.compute(enc(old), idPats),
      enc(old), enc(adds), enc(dels), idPats)
    val decoded = EncodedBgp.decode(idView, dict, Seq("c", "n"))
    val strView = BgpView.maintain(
      BgpView.compute(old, patterns), old, adds, dels, patterns)
    assert(rowSet(decoded) === rowSet(strView))
    assert(rowSet(decoded) === Set(Seq("c2", "bob")))
  }

  test("quad views: a shared graph variable tracks every graph at once") {
    def q4(rows: (String, String, String, String)*): DataFrame =
      rows.toDF("s", "p", "o", "g")
    // the star must complete WITHIN one graph (shared ?g), so the same
    // subject's legs split across graphs never bind
    val pats = Seq((TP(V("c"), C("name"), V("n")), V("g")),
      (TP(V("c"), C("seg"), C("B")), V("g")))
    val old = q4(
      ("c1", "name", "alice", "gA"), ("c1", "seg", "B", "gA"),
      ("c2", "name", "bob", "gA"), ("c2", "seg", "B", "gB"))
    assert(rowSet(BgpView.computeQuads(old, pats)) ===
      Set(Seq("c1", "gA", "alice")))
    // c2's star completes in gB; c1's collapses when gA's seg leaves
    val adds = q4(("c2", "name", "bob", "gB"))
    val dels = q4(("c1", "seg", "B", "gA"))
    val view = BgpView.maintainQuads(BgpView.computeQuads(old, pats),
      old, adds, dels, pats)
    val newState = old.exceptAll(dels).unionByName(adds)
    assert(rowSet(view) === rowSet(BgpView.computeQuads(newState, pats)))
    assert(rowSet(view) === Set(Seq("c2", "gB", "bob")))
    // constant-graph patterns pin a leg to one graph inside the same view
    val mixed = Seq((TP(V("c"), C("name"), V("n")), V("g")),
      (TP(V("c"), C("flag"), C("y")), C("gMeta")))
    val old2 = q4(("c1", "name", "alice", "gA"), ("c1", "flag", "y", "gMeta"),
      ("c2", "name", "bob", "gB"))
    val (va, vd) = BgpView.deltaQuads(old2, q4(("c2", "flag", "y", "gMeta")),
      q4(("c1", "flag", "y", "gMeta")), mixed)
    assert(rowSet(va) === Set(Seq("c2", "gB", "bob")))
    assert(rowSet(vd) === Set(Seq("c1", "gA", "alice")))
  }

  test("repeated variable inside one pattern maintains correctly") {
    val self = Seq(TP(V("x"), C("knows"), V("x")))
    check(t3(("a", "knows", "a"), ("a", "knows", "b")),
      t3(("b", "knows", "b")), t3(("a", "knows", "a")), self)
  }

  // ---- UNION views ----------------------------------------------------

  private val unionBranches = Seq(
    Seq(TP(V("c"), C("seg"), C("B"))),
    Seq(TP(V("c"), C("seg"), C("A")), TP(V("c"), C("vip"), C("y"))))

  private def checkUnion(old: DataFrame, adds: DataFrame, dels: DataFrame,
      branches: Seq[Seq[TP]]): DataFrame = {
    val counts = BgpView.computeUnionCounts(old, branches)
    val maintained =
      BgpView.maintainUnionCounts(counts, old, adds, dels, branches)
    val newState = old.exceptAll(dels.select("s", "p", "o"))
      .unionByName(adds.select("s", "p", "o"))
    assert(rowSet(maintained) ===
      rowSet(BgpView.computeUnionCounts(newState, branches)),
      "maintained union support counts diverged from recompute")
    newState
  }

  test("union view: support counts carry a binding across branch exits") {
    // c1 is in BOTH branches; dropping it from one must KEEP the binding
    // (the case where naive set-delta union over-deletes)
    val old = t3(
      ("c1", "seg", "B"), ("c1", "vip", "y"),
      ("c2", "seg", "A"), ("c2", "vip", "y"),
      ("c3", "seg", "B"))
    val mid = checkUnion(old,
      adds = t3(("c1", "seg", "A")), dels = t3(("c1", "seg", "B")),
      unionBranches)
    // c1 flipped B→A: support stays 1 (via branch 2), membership holds
    assert(rowSet(BgpView.computeUnion(mid, unionBranches)) ===
      Set(Seq("c1"), Seq("c2"), Seq("c3")))
    // now cut c1's vip — the LAST deriving branch — and add a two-branch
    // member in one batch
    val end = checkUnion(mid,
      adds = t3(("c4", "seg", "B"), ("c4", "seg", "A"), ("c4", "vip", "y")),
      dels = t3(("c1", "vip", "y")), unionBranches)
    assert(rowSet(BgpView.computeUnion(end, unionBranches)) ===
      Set(Seq("c2"), Seq("c3"), Seq("c4")))
  }

  test("union view rejects misaligned branch variable sets") {
    intercept[IllegalArgumentException] {
      BgpView.computeUnionCounts(empty3, Seq(
        Seq(TP(V("a"), C("p"), V("b"))), Seq(TP(V("a"), C("q"), V("c")))))
    }
  }

  // ---- OPTIONAL views -------------------------------------------------

  private val optLeft = Seq(TP(V("c"), C("name"), V("n")))
  private val optRight = Seq(TP(V("c"), C("ord"), V("o2")),
    TP(V("o2"), C("st"), C("P")))

  private def checkOptional(old: DataFrame, adds: DataFrame,
      dels: DataFrame): DataFrame = {
    val view = BgpView.computeOptional(old, optLeft, optRight)
    val maintained =
      BgpView.maintainOptional(view, old, adds, dels, optLeft, optRight)
    val newState = old.exceptAll(dels.select("s", "p", "o"))
      .unionByName(adds.select("s", "p", "o"))
    assert(rowSet(maintained) ===
      rowSet(BgpView.computeOptional(newState, optLeft, optRight)),
      "maintained OPTIONAL view diverged from recompute")
    newState
  }

  test("optional view: matched/padded transitions maintain exactly") {
    val old = t3(
      ("c1", "name", "alice"), ("c1", "ord", "o1"), ("o1", "st", "P"),
      ("c2", "name", "bob"), // padded: no order
      ("c3", "name", "carol"), ("c3", "ord", "o3"), ("o3", "st", "P"))
    // c2 gains its first match (pad → matched), c1 loses its only match
    // (matched → pad), and a new matchless c4 arrives (new pad)
    val mid = checkOptional(old,
      adds = t3(("c2", "ord", "o2"), ("o2", "st", "P"),
        ("c4", "name", "dan")),
      dels = t3(("o1", "st", "P")))
    assert(rowSet(BgpView.computeOptional(mid, optLeft, optRight)) === Set(
      Seq("c1", "alice", null), Seq("c2", "bob", "o2"),
      Seq("c3", "carol", "o3"), Seq("c4", "dan", null)))
    // second round on the maintained state: c3 gains a SECOND match (no
    // pad involved), padded c1 leaves A entirely, c2 loses one of the
    // triples backing its match
    val end = checkOptional(mid,
      adds = t3(("c3", "ord", "o3b"), ("o3b", "st", "P")),
      dels = t3(("c1", "name", "alice"), ("c2", "ord", "o2")))
    assert(rowSet(BgpView.computeOptional(end, optLeft, optRight)) === Set(
      Seq("c2", "bob", null), Seq("c3", "carol", "o3"),
      Seq("c3", "carol", "o3b"), Seq("c4", "dan", null)))
  }

  test("optional view rejects a disconnected optional body") {
    intercept[IllegalArgumentException] {
      BgpView.computeOptional(empty3,
        Seq(TP(V("a"), C("p"), V("b"))), Seq(TP(V("x"), C("q"), V("y"))))
    }
  }
}
