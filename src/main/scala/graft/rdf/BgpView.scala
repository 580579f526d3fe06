package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized BGP view under a net
  * (adds, dels) triple change feed — the multi-pattern extension of the
  * counting-IVM already serving RDFS entailment
  * ([[Rdfs.maintainCounts]]) and additive aggregates
  * ([[graft.operators.IncrementalAgg]]), and the natural consumer of
  * [[QuadStore.changes]].
  *
  * The delta-join rule (classic view-maintenance telescoping, e.g.
  * Gupta–Mumick's counting algorithm): for V = A₁ ⋈ … ⋈ A_k,
  *
  *   ΔV = Σᵢ  A₁' ⋈ … ⋈ Aᵢ₋₁' ⋈ ΔAᵢ ⋈ Aᵢ₊₁ ⋈ … ⋈ A_k
  *
  * where Aⱼ' is the post-change state and ΔAᵢ carries a ±1 sign. Each
  * pattern leg Aᵢ = π(σ(T)) is linear in T, so ΔAᵢ = π(σ(ΔT)) — the
  * pattern applied to the (tiny) change feed. Summing signs per full
  * binding nets the change exactly: because the triple store is a SET
  * (adds are presence-screened, dels are membership-screened —
  * [[QuadStore.changes]] guarantees a net feed) and a FULL binding
  * determines every deriving triple, the view over all BGP variables is
  * itself a set and every net sign is ±1. Projections that would
  * introduce multiplicities ride on [[graft.operators.IncrementalAgg]]
  * over this full-binding view.
  *
  * Scale shape: each of the k delta terms starts from the Δ-sized leg
  * and folds the k−1 base legs connectivity-first with the accumulator
  * broadcast — the 100 TB base is scanned (pattern-filtered, with
  * predicate pushdown) but NEVER shuffled, and nothing in the plan is
  * proportional to |V| or |T| on the shuffle axis. The base
  * materialization is never recomputed; work is O(k² base scans +
  * k·|Δ|·fanout).
  *
  * Contract (the [[QuadStore.changes]] guarantee, trusted not
  * re-screened): `adds` disjoint from the old state, `dels` ⊆ it.
  */
object BgpView {

  private val SGN = "__sgn"

  /** The from-scratch view `maintain` must agree with: all BGP variables
    * of the patterns, one row per full binding. */
  def compute(triples: DataFrame, patterns: Seq[TP]): DataFrame =
    Bgp.solve(triples, patterns)

  /** [[compute]] over QUAD patterns — each pattern carries a graph term
    * (a constant names one graph; a variable ranges over graphs and
    * binds as a view column, so one maintained view can track EVERY
    * graph). Named-graph SPARQL semantics (a variable graph excludes the
    * default graph) are the caller's filter; this is the raw quad BGP. */
  def computeQuads(quads: DataFrame,
      patterns: Seq[(TP, Term)]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    patterns.map { case (tp, g) =>
      Bgp.onePattern(quads, quadBound(tp, g))
    }.reduce { (a, b) =>
      val shared = a.columns.intersect(b.columns).toSeq
      if (shared.isEmpty) a.join(b, lit(true), "inner")
      else a.join(b, shared, "inner")
    }
  }

  /** View-level net change under the triple-level net change:
    * `(viewAdds, viewDels)` — disjoint full-binding frames. */
  def delta(oldTriples: DataFrame, adds: DataFrame, dels: DataFrame,
      patterns: Seq[TP]): (DataFrame, DataFrame) =
    deltaBound(oldTriples, adds, dels, Seq("s", "p", "o"),
      patterns.map(tp => tripleBound(tp)))

  /** [[delta]] over QUAD patterns and a quad change feed. */
  def deltaQuads(oldQuads: DataFrame, adds: DataFrame, dels: DataFrame,
      patterns: Seq[(TP, Term)]): (DataFrame, DataFrame) =
    deltaBound(oldQuads, adds, dels, Seq("s", "p", "o", "g"),
      patterns.map { case (tp, g) => quadBound(tp, g) })

  /** Apply the view-level delta to the materialization: the incremental
    * step whose result is spec-pinned to [[compute]] over the new state. */
  def maintain(view: DataFrame, oldTriples: DataFrame, adds: DataFrame,
      dels: DataFrame, patterns: Seq[TP]): DataFrame =
    applyDelta(view, delta(oldTriples, adds, dels, patterns))

  /** [[maintain]] over QUAD patterns. */
  def maintainQuads(view: DataFrame, oldQuads: DataFrame, adds: DataFrame,
      dels: DataFrame, patterns: Seq[(TP, Term)]): DataFrame =
    applyDelta(view, deltaQuads(oldQuads, adds, dels, patterns))

  private def applyDelta(view: DataFrame,
      d: (DataFrame, DataFrame)): DataFrame = {
    val (va, vd) = d
    val keys = view.columns.toSeq
    view.join(vd.select(keys.map(col): _*).hint("broadcast"),
        keys, "left_anti")
      .unionByName(va.select(keys.map(col): _*))
  }

  // ---- UNION views: the counting algorithm's support counts -----------

  /** Shared variable set of a union view's branches — every branch must
    * bind exactly the same variables, or the union is not column-aligned. */
  private def unionVars(branches: Seq[Seq[TP]]): Seq[String] = {
    require(branches.nonEmpty, "empty union")
    val per = branches.map(b =>
      b.flatMap(tp => Seq(tp.s, tp.p, tp.o)).collect { case V(n) => n }.toSet)
    require(per.forall(_ == per.head) && per.head.nonEmpty,
      s"union branches must bind the same non-empty variable set, got ${
        per.map(_.toSeq.sorted.mkString("{", ",", "}")).mkString(" vs ")}")
    per.head.toSeq.sorted
  }

  /** V = B₁ ∪ … ∪ B_m, the SET union of conjunctive views over one
    * triples frame. */
  def computeUnion(triples: DataFrame, branches: Seq[Seq[TP]]): DataFrame =
    computeUnionCounts(triples, branches).drop(SupportCol)

  /** Column holding a union view's support count. */
  val SupportCol = "__support"

  /** The maintainable artifact behind [[computeUnion]]: set union does
    * NOT distribute over set deltas (a binding leaving one branch may
    * persist through another), so the counting algorithm's SUPPORT COUNT
    * — n(b) = number of branches deriving b, each branch a set by the
    * full-binding argument — is what gets maintained. Support is
    * additive: the branch-level ±1 deltas sum to the exact Δn with NO
    * cross-branch membership probe, and membership is n > 0. */
  def computeUnionCounts(triples: DataFrame,
      branches: Seq[Seq[TP]]): DataFrame = {
    val vs = unionVars(branches)
    branches.map(b => Bgp.solve(triples, b)
        .select(vs.map(col): _*).withColumn(SupportCol, lit(1L)))
      .reduce(_.unionByName(_))
      .groupBy(vs.map(col): _*).agg(sum(SupportCol).as(SupportCol))
  }

  /** Per-binding NET support change under the triple-level net change —
    * one frame, zero-netting bindings dropped. Each branch contributes
    * its conjunctive [[delta]]; the shapes stay Δ-sized throughout. */
  def deltaUnionCounts(oldTriples: DataFrame, adds: DataFrame,
      dels: DataFrame, branches: Seq[Seq[TP]]): DataFrame = {
    val vs = unionVars(branches)
    branches.map { b =>
      val (ba, bd) = delta(oldTriples, adds, dels, b)
      ba.select(vs.map(col): _*).withColumn(SupportCol, lit(1L))
        .unionByName(
          bd.select(vs.map(col): _*).withColumn(SupportCol, lit(-1L)))
    }.reduce(_.unionByName(_))
      .groupBy(vs.map(col): _*).agg(sum(SupportCol).as(SupportCol))
      .filter(col(SupportCol) =!= 0L)
  }

  /** Apply a [[deltaUnionCounts]] change to the support-count view: the
    * untouched (vast) majority passes through a broadcast anti-join;
    * only the Δ-sized touched slice is re-summed. Supports never go
    * negative under a sound net feed; bindings netting to zero leave. */
  def maintainUnionCounts(viewCounts: DataFrame, oldTriples: DataFrame,
      adds: DataFrame, dels: DataFrame,
      branches: Seq[Seq[TP]]): DataFrame = {
    val vs = unionVars(branches)
    val d = deltaUnionCounts(oldTriples, adds, dels, branches)
    val keys = d.select(vs.map(col): _*).hint("broadcast")
    val untouched = viewCounts.join(keys, vs, "left_anti")
    val touched = viewCounts.join(keys, vs, "left_semi")
      .unionByName(d)
      .groupBy(vs.map(col): _*).agg(sum(SupportCol).as(SupportCol))
      .filter(col(SupportCol) > 0L)
    untouched.unionByName(touched)
  }

  // ---- OPTIONAL views: matched rows + match-count padded transitions --

  /** V = A ⟕ B (SPARQL OPTIONAL over two conjunctive bodies sharing at
    * least one variable): the matched rows are the conjunctive view over
    * `left ++ right`, and each A-binding with NO match keeps one row
    * with the B-only columns null. */
  def computeOptional(triples: DataFrame, left: Seq[TP],
      right: Seq[TP]): DataFrame = {
    optionalVars(left, right): Unit // validate the shape loudly up front
    Bgp.optional(Bgp.solve(triples, left), triples, right)
  }

  /** View-level net change for an OPTIONAL view. The matched rows are a
    * conjunctive view, so their delta is [[delta]] over `left ++ right`.
    * The padded rows are NOT monotone in either body — a binding's pad
    * appears exactly while `a ∈ A ∧ matches(a) = 0` — so their delta is
    * a TRANSITION rule over the affected A-bindings (π_A of the matched
    * delta plus A's own delta, a Δ-sized set): probe each candidate's
    * A-membership and match-existence in the old and new states, and
    * emit pads whose condition flipped. Each probe folds the base
    * pattern legs FROM the broadcast candidate set — the same
    * never-shuffle-the-base shape as the telescoping terms. */
  def deltaOptional(oldTriples: DataFrame, adds: DataFrame,
      dels: DataFrame, left: Seq[TP],
      right: Seq[TP]): (DataFrame, DataFrame) = {
    val (lv, _) = optionalVars(left, right)
    // each of the four deltas is consumed TWICE — by `affected` below
    // and by the returned segment frames — and their plans are the
    // broadcast-heavy part; materialized once, the second consumer reads
    // blocks instead of re-running the telescoping joins
    val (mAdds0, mDels0) = delta(oldTriples, adds, dels, left ++ right)
    val (aAdds0, aDels0) = delta(oldTriples, adds, dels, left)
    val mAdds = graft.Materialize(mAdds0)
    val mDels = graft.Materialize(mDels0)
    val aAdds = graft.Materialize(aAdds0)
    val aDels = graft.Materialize(aDels0)
    val keys = Seq("s", "p", "o")
    val newTriples = oldTriples
      .join(dels.select(keys.map(col): _*).hint("broadcast"), keys,
        "left_anti")
      .unionByName(adds.select(keys.map(col): _*))
    val lcols = lv.map(col)
    val affected = graft.Materialize(
      Seq(mAdds, mDels, aAdds, aDels)
        .map(_.select(lcols: _*)).reduce(_.unionByName(_)).distinct())
    val inAOld = probe(affected, lv, left, oldTriples)
    val inANew = probe(affected, lv, left, newTriples)
    val matchOld = probe(affected, lv, right, oldTriples)
    val matchNew = probe(affected, lv, right, newTriples)
    val padOld = inAOld.join(matchOld, lv, "left_anti")
    val padNew = inANew.join(matchNew, lv, "left_anti")
    // B-only columns of a pad are null, typed from the matched delta
    val bOnly = mAdds.columns.filterNot(lv.contains).toSeq
    val pad = (df: DataFrame) => df.select(lcols ++ bOnly.map(c =>
      lit(null).cast(mAdds.schema(c).dataType).as(c)): _*)
    (mAdds.unionByName(pad(padNew.join(padOld, lv, "left_anti"))),
      mDels.unionByName(pad(padOld.join(padNew, lv, "left_anti"))))
  }

  /** Apply [[deltaOptional]] to the materialization. Padded rows carry
    * nulls, so the retract join must be NULL-SAFE — a plain equi-join
    * would never match a pad and the retraction would silently no-op. */
  def maintainOptional(view: DataFrame, oldTriples: DataFrame,
      adds: DataFrame, dels: DataFrame, left: Seq[TP],
      right: Seq[TP]): DataFrame = {
    val (va, vd) = deltaOptional(oldTriples, adds, dels, left, right)
    val keys = view.columns.toSeq
    val del = vd.select(keys.map(col): _*).hint("broadcast").as("__d")
    val cond = keys.map(k => view(k) <=> col(s"__d.$k")).reduce(_ && _)
    view.join(del, cond, "left_anti")
      .unionByName(va.select(keys.map(col): _*))
  }

  private def optionalVars(left: Seq[TP],
      right: Seq[TP]): (Seq[String], Seq[String]) = {
    require(left.nonEmpty && right.nonEmpty, "empty OPTIONAL body")
    val lv = left.flatMap(tp => Seq(tp.s, tp.p, tp.o))
      .collect { case V(n) => n }.distinct.sorted
    val rv = right.flatMap(tp => Seq(tp.s, tp.p, tp.o))
      .collect { case V(n) => n }.toSet
    val shared = lv.filter(rv.contains)
    require(lv.nonEmpty && shared.nonEmpty,
      "an OPTIONAL view needs required variables and at least one " +
        "shared with the optional body (a disconnected OPTIONAL is a " +
        "cartesian pad — compose it downstream)")
    (lv, shared)
  }

  /** Distinct `seedVars` rows of `seed` that extend to a full match of
    * `patterns` over `t`: the membership/match-existence probe. The seed
    * is Δ-sized and broadcast at every fold step; the base is scanned
    * (predicate-pushed), never shuffled. */
  private def probe(seed: DataFrame, seedVars: Seq[String],
      patterns: Seq[TP], t: DataFrame): DataFrame = {
    val legs = patterns.map { tp =>
      val bound = tripleBound(tp)
      (vars(bound), Bgp.onePattern(t, bound))
    }
    foldLegs(seed, seedVars.toSet, legs)
      .select(seedVars.map(col): _*).distinct()
  }

  /** Greedy connectivity-first fold of pattern legs onto an accumulator,
    * broadcast at every step — the shared engine of the telescoping
    * [[term]]s and the OPTIONAL [[probe]]s. */
  private def foldLegs(acc0: DataFrame, accVars0: Set[String],
      legs: Seq[(Set[String], DataFrame)]): DataFrame = {
    var acc = acc0
    var accVars = accVars0
    val remaining = scala.collection.mutable.ArrayBuffer(legs: _*)
    while (remaining.nonEmpty) {
      val next = remaining.find { case (vs, _) => (vs & accVars).nonEmpty }
        .getOrElse(remaining.head)
      remaining -= next
      val (vs, leg) = next
      val shared = (vs & accVars).toSeq.sorted
      acc =
        if (shared.isEmpty) acc.hint("broadcast").join(leg, lit(true), "inner")
        else acc.hint("broadcast").join(leg, shared, "inner")
      accVars ++= vs
    }
    acc
  }

  private def tripleBound(tp: TP): Seq[(String, Term)] =
    Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o)
  private def quadBound(tp: TP, g: Term): Seq[(String, Term)] =
    tripleBound(tp) :+ ("g" -> g)

  /** The telescoping sum over any binding shape (triples or quads). */
  private def deltaBound(oldT: DataFrame, adds: DataFrame, dels: DataFrame,
      keys: Seq[String],
      patterns: Seq[Seq[(String, Term)]]): (DataFrame, DataFrame) = {
    require(patterns.nonEmpty, "empty BGP")
    require(patterns.exists(vars(_).nonEmpty),
      "a BGP view needs at least one variable")
    val newT = oldT
      .join(dels.select(keys.map(col): _*).hint("broadcast"), keys,
        "left_anti")
      .unionByName(adds.select(keys.map(col): _*))
    val dT = adds.select(keys.map(col): _*).withColumn(SGN, lit(1L))
      .unionByName(dels.select(keys.map(col): _*).withColumn(SGN, lit(-1L)))
    val terms = patterns.indices.map(i => term(i, patterns, newT, oldT, dT))
    val viewCols = terms.head.columns.filterNot(_ == SGN).toSeq
    val net = terms.reduce(_.unionByName(_))
      .groupBy(viewCols.map(col): _*).agg(sum(SGN).as(SGN))
      .filter(col(SGN) =!= 0L)
    (net.filter(col(SGN) > 0).drop(SGN),
      net.filter(col(SGN) < 0).drop(SGN))
  }

  /** One telescoping term: legs before `i` see the new state, leg `i` is
    * the signed delta, legs after see the old state. The fold starts at
    * the delta leg and greedily extends to variable-connected legs (the
    * same cross-join avoidance as [[Bgp.solveReordered]]); the
    * accumulator stays Δ-sized and is broadcast at every step. */
  private def term(i: Int, patterns: Seq[Seq[(String, Term)]],
      newT: DataFrame, oldT: DataFrame, dT: DataFrame): DataFrame =
    foldLegs(onePatternSigned(dT, patterns(i)), vars(patterns(i)),
      patterns.zipWithIndex.collect { case (bound, j) if j != i =>
        (vars(bound), Bgp.onePattern(if (j < i) newT else oldT, bound))
      })

  /** [[Bgp.onePattern]] with the sign column carried through. */
  private def onePatternSigned(dT: DataFrame,
      bound: Seq[(String, Term)]): DataFrame = {
    val filters = bound.collect { case (c, C(v)) => col(c) === lit(v) }
    val filtered = filters.foldLeft(dT)(_.filter(_))
    val varCols = bound.collect { case (c, V(n)) => (c, n) }
    val dup = varCols.groupBy(_._2).values.filter(_.size > 1)
      .flatMap(g => g.tail.map(t => col(g.head._1) === col(t._1)))
    val eq = dup.foldLeft(filtered)(_.filter(_))
    val proj = varCols.groupBy(_._2)
      .map { case (n, g) => col(g.head._1).as(n) }.toSeq :+ col(SGN)
    eq.select(proj: _*)
  }

  private def vars(bound: Seq[(String, Term)]): Set[String] =
    bound.collect { case (_, V(n)) => n }.toSet
}
