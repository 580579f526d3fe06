package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Automatic subject-star collapse as a Catalyst rule — the plan-level
  * form of [[graft.rdf.Bgp.solveStarCollapsed]] (SURVEY §4 M5): a k-way
  * self-join of one (s, p, o) relation on a shared subject, each arm a
  * constant-predicate σ/π, rewrites into ONE conditional aggregation
  *
  * {{{
  *   Join(Join(π(σ[p=a]T), π(σ[p=b]T)), π(σ[p=c]T))   // k-1 shuffles
  *     ⇒ σ[non-null] Aggregate(s, max(case p=a→o), …) σ[p∈(a,b,c)] T
  * }}}
  *
  * — one shuffle per star regardless of width, for ANY caller building
  * triple-pattern self-joins with the DataFrame API, not just users of
  * the explicit solver.
  *
  * Injected as an ANALYZER rule ([[GraftExtensions]]): at analysis time
  * the arms still have the exact σ/π shape the API built (the optimizer
  * would already have pushed the predicate filters through the triples
  * union and dissolved the pattern). Because the DataFrame API analyzes
  * incrementally — each `.join` call analyzes its own plan — the rule
  * also recognizes its OWN output (a collapsed star) as a join side and
  * absorbs further arms into the same aggregate, so a left-deep k-way
  * star still collapses to one aggregation.
  *
  * SOUNDNESS GATE: collapse assumes predicates are single-valued per
  * subject (d-sparq's property-table assumption — a multi-valued
  * predicate needs the join path's cross product). That is a DATA
  * property no rule can check statically, so the rule only fires when
  * the session conf `graft.star.collapse` is `true` — the same opt-in
  * contract as `collapseStars = true` on the explicit APIs, enforced at
  * plan level. Arms with repeated object variables, object = subject, or
  * extra filter conjuncts are left to the join path (the explicit
  * solver's eligibility rule).
  */
object StarCollapse extends Rule[LogicalPlan] with PredicateHelper {

  /** Session conf key gating the rewrite (default off = rule inert). */
  val Flag = "graft.star.collapse"

  /** A star in pieces: the shared base relation, every exprId the subject
    * is exposed under, the var-object arms (predicate → output alias) and
    * the const-object arms (predicate → required object). */
  private final case class Parts(base: LogicalPlan, subj: Seq[Alias],
      objArms: Seq[(Literal, Alias)], constArms: Seq[(Literal, Literal)])

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(Flag, "false") != "true") plan
    else plan.transformDown {
      case j: Join if j.resolved => collapse(j).getOrElse(j)
    }

  private def stripFilters(p: LogicalPlan): (LogicalPlan, Seq[Expression]) =
    p match {
      case Filter(c, child) =>
        val (b, cs) = stripFilters(child)
        (b, cs ++ splitConjunctivePredicates(c))
      case other => (other, Nil)
    }

  private def spo(base: LogicalPlan): Option[(Attribute, Attribute, Attribute)] =
    base.output match {
      case Seq(s, p, o) if s.name == "s" && p.name == "p" && o.name == "o" =>
        Some((s, p, o))
      case _ => None
    }

  /** Match one σ/π triple-pattern arm over an (s, p, o) relation. */
  private def asArm(p: LogicalPlan): Option[(Parts, Seq[Attribute])] =
    p match {
      case Project(projList, body) =>
        val (base, conds) = stripFilters(body)
        val (sA, pA, oA) = spo(base).getOrElse(return None)
        def eqLit(target: Attribute): PartialFunction[Expression, Literal] = {
          case EqualTo(a: Attribute, l: Literal) if a.semanticEquals(target) => l
          case EqualTo(l: Literal, a: Attribute) if a.semanticEquals(target) => l
        }
        val pred = conds.collectFirst(eqLit(pA)).getOrElse(return None)
        val constO = conds.collectFirst(eqLit(oA))
        // every conjunct must be accounted for — anything else (regex, dup
        // variable equality) keeps the arm on the join path
        if (conds.size != 1 + constO.size) return None
        val sOut = projList.collectFirst {
          case al @ Alias(a: Attribute, _) if a.semanticEquals(sA) => al
        }.getOrElse(return None)
        val oOut = projList.collectFirst {
          case al @ Alias(a: Attribute, _) if a.semanticEquals(oA) => al
        }
        if (projList.size != 1 + oOut.size) return None
        val parts = constO match {
          case Some(c) if oOut.isEmpty =>
            Parts(base, Seq(sOut), Nil, Seq(pred -> c))
          case None if oOut.isDefined =>
            Parts(base, Seq(sOut), Seq(pred -> oOut.get), Nil)
          case _ => return None // binds AND constrains o: not a BGP arm
        }
        Some((parts, projList.map(_.toAttribute)))
      case _ => None
    }

  private val HiddenPrefix = "__starc"

  /** Decompose a plan this rule itself emitted — a collapsed star — so a
    * later join can absorb more arms into the same aggregate. */
  private def asCollapsed(p: LogicalPlan): Option[(Parts, Seq[Attribute])] =
    p match {
      case Project(vis, body) if vis.forall(_.isInstanceOf[Attribute]) =>
        val (inner, conds) = body match {
          case Filter(c, a) => (a, splitConjunctivePredicates(c))
          case a => (a, Nil)
        }
        val agg = inner match {
          case a: Aggregate => a
          case _ => return None
        }
        val (scanBase, scanConds) = stripFilters(agg.child)
        val (sA, pA, oA) = spo(scanBase).getOrElse(return None)
        scanConds match {
          case Seq(In(a: Attribute, _)) if a.semanticEquals(pA) =>
          case _ => return None
        }
        if (agg.groupingExpressions != Seq(sA)) return None
        val subj = scala.collection.mutable.ArrayBuffer.empty[Alias]
        val objArms = scala.collection.mutable.ArrayBuffer.empty[(Literal, Alias)]
        val hidden = scala.collection.mutable.ArrayBuffer.empty[(Attribute, Literal)]
        agg.aggregateExpressions.foreach {
          case al @ Alias(a: Attribute, _) if a.semanticEquals(sA) =>
            subj += al
          case al @ Alias(AggregateExpression(
              Max(CaseWhen(Seq((EqualTo(pa: Attribute, l: Literal), oa: Attribute)), None)),
              Complete, false, _, _), _)
              if pa.semanticEquals(pA) && oa.semanticEquals(oA) =>
            if (al.name.startsWith(HiddenPrefix)) hidden += al.toAttribute -> l
            else objArms += l -> al
          case _ => return None
        }
        // filter conds: IsNotNull on obj aliases (reconstructed at emission)
        // plus one pinned equality per hidden const-object arm
        val constArms = scala.collection.mutable.ArrayBuffer.empty[(Literal, Literal)]
        conds.foreach {
          case IsNotNull(a: Attribute)
              if objArms.exists(_._2.exprId == a.exprId) =>
          case EqualTo(a: Attribute, c: Literal) =>
            hidden.find(_._1.exprId == a.exprId) match {
              case Some((_, pred)) => constArms += pred -> c
              case None => return None
            }
          case _ => return None
        }
        if (constArms.size != hidden.size) return None
        Some((Parts(scanBase, subj.toSeq, objArms.toSeq, constArms.toSeq),
          vis.map(_.asInstanceOf[Attribute])))
      case _ => None
    }

  /** Collect a contiguous same-subject join subtree: parts, the subtree's
    * visible output (in order), and its candidate subject attributes. */
  private def collect(p: LogicalPlan)
      : Option[(Parts, Seq[Attribute], Seq[Attribute])] = {
    p match {
      case Join(l, r, Inner, Some(EqualTo(x: Attribute, y: Attribute)), hint)
          if hint == JoinHint.NONE =>
        return for {
          (lp, lout, ls) <- collect(l)
          (rp, rout, rs) <- collect(r)
          if ls.exists(_.semanticEquals(x)) && rs.exists(_.semanticEquals(y)) &&
            x.name == y.name && lp.base.sameResult(rp.base)
        } yield (Parts(lp.base, lp.subj ++ rp.subj, lp.objArms ++ rp.objArms,
          lp.constArms ++ rp.constArms), lout ++ rout, ls ++ rs)
      case _ =>
    }
    asArm(p).orElse(asCollapsed(p)) match {
      case Some((parts, vis)) =>
        return Some((parts, vis, parts.subj.map(_.toAttribute)
          .filter(a => vis.exists(_.semanticEquals(a)))))
      case None =>
    }
    p match {
      // using-join dedup projects (attributes only) pass through
      case Project(plist, child) if plist.forall(_.isInstanceOf[Attribute]) =>
        collect(child).flatMap { case (parts, _, subjs) =>
          val attrs = plist.map(_.asInstanceOf[Attribute])
          val visSubjs = subjs.filter(s => attrs.exists(_.semanticEquals(s)))
          if (visSubjs.isEmpty) None // subject pruned — not star-joinable
          else Some((parts, attrs, visSubjs))
        }
      case _ => None
    }
  }

  private def collapse(j: Join): Option[LogicalPlan] = {
    val (parts, visible, _) = collect(j).getOrElse(return None)
    val armCount = parts.objArms.size + parts.constArms.size
    if (armCount < 2) return None
    // eligibility mirrors solveStarCollapsed: object names distinct and
    // never equal to the subject name (those need join-path equality)
    val oNames = parts.objArms.map(_._2.name)
    val sNames = parts.subj.map(_.name).distinct
    if (sNames.size != 1) return None
    if (oNames.distinct.size != oNames.size || oNames.contains(sNames.head))
      return None
    val (sA, pA, oA) = spo(parts.base).getOrElse(return None)
    val preds = (parts.objArms.map(_._1) ++ parts.constArms.map(_._1))
    val scan = Filter(In(pA, preds.distinct), parts.base)
    def maxWhen(pred: Literal): Expression =
      AggregateExpression(
        Max(CaseWhen(Seq((EqualTo(pA, pred), oA)), None)), Complete,
        isDistinct = false)
    val subjAliases = parts.subj.distinctBy(_.exprId)
      .map(al => Alias(sA, al.name)(exprId = al.exprId))
    val objAliases = parts.objArms.map { case (pred, al) =>
      Alias(maxWhen(pred), al.name)(exprId = al.exprId)
    }
    val hidden = parts.constArms.zipWithIndex.map { case ((pred, _), i) =>
      Alias(maxWhen(pred), s"$HiddenPrefix$i")()
    }
    val agg = Aggregate(Seq(sA), subjAliases ++ objAliases ++ hidden, scan)
    // a subject missing one of the star's predicates must not match; a
    // constant-object arm additionally pins the aggregated value
    val conds: Seq[Expression] =
      objAliases.map(a => IsNotNull(a.toAttribute)) ++
        parts.constArms.zip(hidden).map { case ((_, c), h) =>
          EqualTo(h.toAttribute, c)
        }
    val filtered = if (conds.isEmpty) agg else Filter(conds.reduce(And), agg)
    Some(Project(visible, filtered))
  }
}

/** Spark extensions entry point:
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions`). Installs [[StarCollapse]] as an analyzer rule; it
  * is inert until `graft.star.collapse=true`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectResolutionRule(_ => StarCollapse)
}
