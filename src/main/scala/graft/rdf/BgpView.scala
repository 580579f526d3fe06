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

  /** View-level net change under the triple-level net change:
    * `(viewAdds, viewDels)` — disjoint full-binding frames. */
  def delta(oldTriples: DataFrame, adds: DataFrame, dels: DataFrame,
      patterns: Seq[TP]): (DataFrame, DataFrame) = {
    require(patterns.nonEmpty, "empty BGP")
    require(patterns.exists(vars(_).nonEmpty),
      "a BGP view needs at least one variable")
    val spo = Seq("s", "p", "o")
    val newTriples = oldTriples
      .join(dels.select(spo.map(col): _*).hint("broadcast"), spo, "left_anti")
      .unionByName(adds.select(spo.map(col): _*))
    val dT = adds.select(spo.map(col): _*).withColumn(SGN, lit(1L))
      .unionByName(dels.select(spo.map(col): _*).withColumn(SGN, lit(-1L)))
    val terms = patterns.indices.map(i =>
      term(i, patterns, newTriples, oldTriples, dT))
    val viewCols = terms.head.columns.filterNot(_ == SGN).toSeq
    val net = terms.reduce(_.unionByName(_))
      .groupBy(viewCols.map(col): _*).agg(sum(SGN).as(SGN))
      .filter(col(SGN) =!= 0L)
    (net.filter(col(SGN) > 0).drop(SGN),
      net.filter(col(SGN) < 0).drop(SGN))
  }

  /** Apply the view-level delta to the materialization: the incremental
    * step whose result is spec-pinned to [[compute]] over the new state. */
  def maintain(view: DataFrame, oldTriples: DataFrame, adds: DataFrame,
      dels: DataFrame, patterns: Seq[TP]): DataFrame = {
    val (va, vd) = delta(oldTriples, adds, dels, patterns)
    val keys = view.columns.toSeq
    view.join(vd.select(keys.map(col): _*).hint("broadcast"),
        keys, "left_anti")
      .unionByName(va.select(keys.map(col): _*))
  }

  /** One telescoping term: legs before `i` see the new state, leg `i` is
    * the signed delta, legs after see the old state. The fold starts at
    * the delta leg and greedily extends to variable-connected legs (the
    * same cross-join avoidance as [[Bgp.solveReordered]]); the
    * accumulator stays Δ-sized and is broadcast at every step. */
  private def term(i: Int, patterns: Seq[TP], newT: DataFrame,
      oldT: DataFrame, dT: DataFrame): DataFrame = {
    var acc = onePatternSigned(dT, patterns(i))
    var accVars = vars(patterns(i))
    val remaining = scala.collection.mutable.ArrayBuffer(
      patterns.zipWithIndex.collect { case (tp, j) if j != i =>
        (vars(tp), Bgp.onePattern(if (j < i) newT else oldT,
          Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o)))
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
  private def onePatternSigned(dT: DataFrame, tp: TP): DataFrame = {
    val bound = Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o)
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

  private def vars(tp: TP): Set[String] =
    Seq(tp.s, tp.p, tp.o).collect { case V(n) => n }.toSet
}
