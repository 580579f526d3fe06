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
      newT: DataFrame, oldT: DataFrame, dT: DataFrame): DataFrame = {
    var acc = onePatternSigned(dT, patterns(i))
    var accVars = vars(patterns(i))
    val remaining = scala.collection.mutable.ArrayBuffer(
      patterns.zipWithIndex.collect { case (bound, j) if j != i =>
        (vars(bound), Bgp.onePattern(if (j < i) newT else oldT, bound))
      }: _*)
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
