package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, Complete, Count}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

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
  * SOUNDNESS (and why the rule can default ON, round-10): unlike the
  * explicit [[graft.rdf.Bgp.solveStarCollapsed]] — whose `max(case)`
  * form assumes single-valued predicates and is therefore opt-in — this
  * rewrite is EXACT for any data. Each var-object arm aggregates
  * `collect_list(case p=pred → o)` (nulls skipped, so the list holds
  * exactly the arm's objects) and a Generate/explode above the
  * aggregation unrolls the per-subject cross product of the lists — the
  * join path's multi-valued semantics, while an empty list (subject
  * missing the predicate) drops the subject, the inner-join semantics.
  * Const-object arms aggregate a MULTIPLICITY count (`count(p=pred ∧
  * o=c)`) that an `explode(array_repeat(…))` above the aggregation
  * replays, so a duplicate-bearing base relation keeps the join path's
  * bag cardinality (a bare EXISTS ≥ 1 would collapse duplicates; a
  * max-of-o compare would drop a multi-valued subject whose required
  * object isn't the extremum). On single-valued data every list is
  * length ≤ 1 and the plan degenerates to the property-table shape.
  * `graft.star.collapse=false` opts back onto the join path, and a hub
  * guard (see [[FanoutCap]]) leaves high-fan-out corpora there
  * automatically. Arms with repeated object variables, object =
  * subject, or extra filter conjuncts are left to the join path (the
  * explicit solver's eligibility rule).
  */
object StarCollapse extends Rule[LogicalPlan] with PredicateHelper {

  /** Session conf key gating the rewrite (default ON — `false` opts a
    * multi-valued corpus back onto the join path). */
  val Flag = "graft.star.collapse"

  /** A star in pieces: the shared base relation, every exprId the subject
    * is exposed under, the var-object arms (predicate → output alias) and
    * the const-object arms (predicate → required object). */
  private final case class Parts(base: LogicalPlan, subj: Seq[Alias],
      objArms: Seq[(Literal, Alias)], constArms: Seq[(Literal, Literal)])

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(Flag, "true") == "false") plan
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

  private val ExistsPrefix = "__starc"
  private val ListPrefix = "__starl"

  /** Average per-subject fan-out above which the rule leaves the star on
    * the join path (hub guard). */
  val FanoutCap = "graft.star.collapse.maxFanout"

  /** User-declared expected fan-out for stats-less relations — compared
    * against [[FanoutCap]] when no catalog column stats exist. */
  val FanoutHint = "graft.star.collapse.fanout"

  /** Decompose a plan this rule itself emitted — a collapsed star — so a
    * later join can absorb more arms into the same aggregate. Emitted
    * shape: `Project(vis, Generate*(Explode(list), Filter?(Aggregate(s,
    * subj ++ collect_lists ++ exists_counts, σ[p∈preds] base))))`. */
  private def asCollapsed(p: LogicalPlan): Option[(Parts, Seq[Attribute])] =
    p match {
      case Project(vis, body) if vis.forall(_.isInstanceOf[Attribute]) =>
        // peel the per-arm explodes — list explodes (list attr exprId →
        // visible obj attr) and const-arm multiplicity explodes
        // (array_repeat over the hidden count attr)
        var cur = body
        val gens = scala.collection.mutable.Map.empty[ExprId, Attribute]
        val multGens = scala.collection.mutable.Set.empty[ExprId]
        var peeling = true
        while (peeling) cur match {
          case Generate(Explode(la: Attribute), _, false, _, Seq(out), child) =>
            gens += la.exprId -> out; cur = child
          case Generate(Explode(ArrayRepeat(Literal(1, _),
              Cast(a: Attribute, IntegerType, _, _))), _, false, _, Seq(_),
              child) =>
            multGens += a.exprId; cur = child
          case _ => peeling = false
        }
        val agg = cur match {
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
        // exists-count attr exprId → (const pred, const obj)
        val constPins =
          scala.collection.mutable.Map.empty[ExprId, (Literal, Literal)]
        agg.aggregateExpressions.foreach {
          case al @ Alias(a: Attribute, _) if a.semanticEquals(sA) =>
            subj += al
          case al @ Alias(AggregateExpression(
              CollectList(CaseWhen(Seq((EqualTo(pa: Attribute, l: Literal), oa: Attribute)), None), _, _),
              Complete, false, _, _), _)
              if pa.semanticEquals(pA) && oa.semanticEquals(oA) &&
                al.name.startsWith(ListPrefix) =>
            // the arm's downstream identity is the explode's output attr;
            // rebuild the alias collapse() re-emits from
            val out = gens.getOrElse(al.exprId, return None)
            objArms += l -> Alias(oA, out.name)(exprId = out.exprId)
          case al @ Alias(AggregateExpression(
              Count(Seq(CaseWhen(Seq((And(EqualTo(pa: Attribute, l: Literal),
                EqualTo(oa: Attribute, c: Literal)), _)), None))),
              Complete, false, _, _), _)
              if pa.semanticEquals(pA) && oa.semanticEquals(oA) &&
                al.name.startsWith(ExistsPrefix) =>
            constPins += al.toAttribute.exprId -> (l -> c)
          case _ => return None
        }
        // every hidden count must be consumed by exactly one multiplicity
        // explode, and every multiplicity explode must point at a count
        if (!multGens.forall(constPins.contains) ||
            !constPins.keySet.forall(multGens.contains)) return None
        val constArms = constPins.values.toSeq
        if (gens.size != objArms.size) return None
        Some((Parts(scanBase, subj.toSeq, objArms.toSeq, constArms),
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
    // HUB GUARD (round 11): collect_list buffers one subject's objects in
    // a single aggregation row — a celebrity hub (10^6 objects under one
    // predicate) would materialize a 10^6-element array where the join
    // path streams and spills. Where catalog column stats are present
    // (CBO + ANALYZE … FOR COLUMNS), estimate the average per-subject
    // fan-out as rowCount / ndv(s) and fall back to the join path above
    // the cap; with no stats, a user-declared `graft.star.collapse
    // .fanout` hint is compared against the same cap. Stats carry no
    // per-group maximum, so the guard is an average-fan-out heuristic —
    // `graft.star.collapse=false` remains the hard opt-out.
    val cap = BigInt(conf.getConfString(FanoutCap, "1000").toLong)
    val statFanout: Option[BigInt] = {
      val st = parts.base.stats
      for {
        rc <- st.rowCount
        cs <- st.attributeStats.get(sA)
        nd <- cs.distinctCount if nd > 0
      } yield rc / nd
    }
    val declared = conf.getConfString(FanoutHint, "")
    val fanout = statFanout.orElse(
      if (declared.nonEmpty) Some(BigInt(declared.toLong)) else None)
    if (fanout.exists(_ > cap)) return None
    val preds = (parts.objArms.map(_._1) ++ parts.constArms.map(_._1))
    val scan = Filter(In(pA, preds.distinct), parts.base)
    val subjAliases = parts.subj.distinctBy(_.exprId)
      .map(al => Alias(sA, al.name)(exprId = al.exprId))
    // var-object arms: collect_list(case p=pred → o). Nulls (other
    // predicates' rows) are skipped, so the list holds exactly the arm's
    // objects; the explode below unrolls the per-subject cross product
    // (multi-valued ⇒ join semantics) and drops empty lists (missing
    // predicate ⇒ inner-join semantics). Exact for any data — what lets
    // this rule default on where the explicit max(case) solver is opt-in.
    val listAliases = parts.objArms.zipWithIndex.map { case ((pred, _), i) =>
      Alias(AggregateExpression(
        CollectList(CaseWhen(Seq((EqualTo(pA, pred), oA)), None)),
        Complete, isDistinct = false), s"$ListPrefix$i")()
    }
    // const-object arms: MULTIPLICITY — count(p=pred ∧ o=c), then an
    // explode(array_repeat(1, count)) above the aggregation replicates
    // each subject row count times. A bare EXISTS (count ≥ 1 filter)
    // would emit one row where a duplicate-bearing base relation's join
    // path emits count rows — this form is bag-exact for ANY base,
    // duplicates included, and count = 0 drops the row (empty array ⇒
    // inner-join semantics). A max-of-o compare would additionally drop
    // a multi-valued subject whose required object isn't the extremum.
    val hidden = parts.constArms.zipWithIndex.map { case ((pred, c), i) =>
      Alias(AggregateExpression(
        Count(Seq(CaseWhen(Seq(
          (And(EqualTo(pA, pred), EqualTo(oA, c)), Literal(1))), None))),
        Complete, isDistinct = false), s"$ExistsPrefix$i")()
    }
    val agg = Aggregate(Seq(sA), subjAliases ++ listAliases ++ hidden, scan)
    val multiplied = hidden.zipWithIndex
      .foldLeft(agg: LogicalPlan) { case (child, (cnt, i)) =>
        Generate(Explode(ArrayRepeat(Literal(1),
            Cast(cnt.toAttribute, IntegerType))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput =
            Seq(AttributeReference(s"${ExistsPrefix}x$i", IntegerType)()),
          child)
      }
    val exploded = parts.objArms.zip(listAliases)
      .foldLeft(multiplied) { case (child, ((_, al), la)) =>
        Generate(Explode(la.toAttribute), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(al.toAttribute), child)
      }
    Some(Project(visible, exploded))
  }
}

/** Spark extensions entry point:
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions`). Installs [[StarCollapse]] as an analyzer rule; it
  * fires by default with a runtime single-valued guard;
  * `graft.star.collapse=false` opts out. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectResolutionRule(_ => StarCollapse)
}
