package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL Basic-Graph-Pattern algebra as a Scala DSL over the triples
  * table. (SPARQL *text* parsing is out of scope, as in the reference,
  * which delegates it to Jena ARQ — SURVEY.md §3.3; our DSL is the same
  * post-parse algebra.)
  *
  * A pattern is three terms, each a variable `V` or constant `C`:
  * {{{
  *   Bgp.solve(triples, Seq(
  *     TP(V("cust"), C("mktsegment"), C("BUILDING")),
  *     TP(V("cust"), C("name"), V("cname"))))        // → DataFrame(cust, cname)
  * }}}
  *
  * Execution model, deliberately Spark-first (vs the reference's per-shard
  * MongoDB lookups + pipelined MPI joins, SURVEY.md §2 R5/R6):
  *
  *  - each pattern is a σ/π over the triples scan — constants become
  *    pushdown-able filters (a predicate constant plays the role of the
  *    reference's per-predicate Mongo index);
  *  - patterns sharing variables become natural equi-joins on the shared
  *    variable columns. D-SPARQ's two signature query shapes — the
  *    subject-star (patterns sharing a subject) and the chain/pipeline
  *    (star's object feeding the next star's subject) — are both just this
  *    equi-join, planned by Catalyst: star joins land on the same join key
  *    `s` (one shuffle, or zero when the triples store is bucketed by s);
  *    chains become hash joins whose order CBO/AQE picks from runtime
  *    stats, which subsumes the reference's predicate-selectivity
  *    reordering heuristic (SURVEY.md §4).
  *  - OPTIONAL is a left-outer join on shared variables ([[optional]]);
  *    SPARQL bag semantics match SQL bag semantics on this fragment.
  */
sealed trait Term
final case class V(name: String) extends Term
/** A constant: an RDF term string in the string-triples plan, or a Long
  * dictionary id when the pattern has been translated to id space
  * ([[EncodedBgp.encodePatterns]]). Kept monomorphic per plan — the solver
  * never mixes string and id constants against the same triples frame. */
final case class C(value: Any) extends Term
final case class TP(s: Term, p: Term, o: Term)

object Bgp {

  def solve(triples: DataFrame, patterns: Seq[TP]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    patterns.map(one(triples, _)).reduce(join)
  }

  /** Star-collapsed execution — d-sparq's signature technique (a subject
    * star answered as ONE lookup on the subject-grouped document) expressed
    * Spark-first: all patterns of a star whose predicates are constants
    * collapse into a single `groupBy(s)` conditional aggregation = one
    * shuffle per star regardless of star width, instead of width-1
    * self-joins. Patterns not eligible (variable predicate, single-pattern
    * star) fall back to [[solve]]'s join path, and stars still join to each
    * other on shared variables (chains).
    *
    * PRECONDITION: predicates used in collapsed stars are single-valued
    * per subject (exactly d-sparq's property-table assumption). With a
    * multi-valued predicate the star must produce the cross product of
    * bindings, which a one-row-per-subject aggregate cannot — use [[solve]].
    */
  def solveStarCollapsed(triples: DataFrame, patterns: Seq[TP]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    val (collapsible, rest) = patterns.partition {
      case TP(V(_), C(_), _) => true
      case _ => false
    }
    val stars = collapsible.groupBy { case TP(V(s), _, _) => s }
    // eligible: ≥2 patterns, and object var names distinct and ≠ subject
    // (duplicate/self vars need the join path's equality semantics)
    val (wide, narrow) = stars.partition { case (sVar, tps) =>
      val oVars = tps.collect { case TP(_, _, V(n)) => n }
      tps.size >= 2 && oVars.distinct.size == oVars.size && !oVars.contains(sVar)
    }
    val starDfs = wide.map { case (sVar, tps) =>
      val preds = tps.map { case TP(_, C(p), _) => p }
      val aggs = tps.zipWithIndex.map { case (TP(_, C(p), o), i) =>
        max(when(col("p") === p, col("o"))).as(o match {
          case V(n) => n
          case C(_) => s"__c$i"
        })
      }
      val constFilters = tps.zipWithIndex.collect {
        case (TP(_, C(_), C(v)), i) => col(s"__c$i") === v
      }
      val grouped = triples
        .filter(col("p").isin(preds: _*))
        .groupBy(col("s").as(sVar))
        .agg(aggs.head, aggs.tail: _*)
        // a subject missing one of the star's predicates has a null agg —
        // it must not match the BGP
        .filter(tps.zipWithIndex.map { case (TP(_, _, o), i) =>
          o match { case V(n) => col(n).isNotNull; case C(_) => col(s"__c$i").isNotNull }
        }.reduce(_ && _))
      constFilters.foldLeft(grouped)(_.filter(_))
        .drop(tps.indices.map(i => s"__c$i"): _*)
    }.toSeq
    val pieces = starDfs ++ (narrow.flatMap(_._2).toSeq ++ rest).map(one(triples, _))
    pieces.reduce(join)
  }

  /** requiredResult OPTIONAL { patterns }: left-outer join on shared vars. */
  def optional(required: DataFrame, triples: DataFrame, patterns: Seq[TP]): DataFrame =
    optionalSolved(required, solve(triples, patterns))

  /** OPTIONAL against an already-solved block (e.g. one solved over the
    * encoded store and decoded). */
  def optionalSolved(required: DataFrame, block: DataFrame): DataFrame =
    joinWith(required, block, "left_outer")

  /** Inner join of two solution frames on their shared variables (cross
    * product when disjoint — SPARQL join semantics). */
  def joinSolved(a: DataFrame, b: DataFrame): DataFrame = joinWith(a, b, "inner")

  /** SPARQL MINUS against an already-solved block: drop solutions that
    * agree with some right-side solution on the shared variables — an
    * anti-join. Per SPARQL semantics, a MINUS block sharing NO variable
    * removes nothing (every solution is trivially incompatible).
    *
    * Fragment note: shared variables are assumed BOUND on the left (SQL's
    * null≠null keeps an OPTIONAL-padded row that strict SPARQL
    * compatibility — which ignores unbound vars — would remove; don't
    * MINUS on an optionally-bound variable).
    */
  def minusSolved(required: DataFrame, block: DataFrame): DataFrame = {
    val shared = required.columns.intersect(block.columns).toSeq
    if (shared.isEmpty) required
    else required.join(block.select(shared.map(col): _*), shared, "left_anti")
  }

  /** FILTER EXISTS: keep solutions compatible with some block solution — a
    * semi-join on the shared variables. Unlike MINUS, a variable-disjoint
    * block is NOT a no-op: any block solution is compatible with every row
    * (SPARQL's substitution semantics), so existence of one block row keeps
    * everything and emptiness drops everything — exactly a semi-join on a
    * true condition. */
  def existsSolved(required: DataFrame, block: DataFrame): DataFrame =
    semiAnti(required, block, "left_semi")

  /** FILTER NOT EXISTS: drop solutions compatible with some block solution
    * — the anti-join dual of [[existsSolved]]. Coincides with MINUS when
    * variables are shared and bound; differs on disjoint blocks (NOT
    * EXISTS empties the result if the block has any solution, MINUS keeps
    * it). */
  def notExistsSolved(required: DataFrame, block: DataFrame): DataFrame =
    semiAnti(required, block, "left_anti")

  private def semiAnti(required: DataFrame, block: DataFrame,
      how: String): DataFrame = joinWith(required, block, how)

  private def join(a: DataFrame, b: DataFrame): DataFrame = joinWith(a, b, "inner")

  private def joinWith(a: DataFrame, b: DataFrame, how: String): DataFrame = {
    val shared = a.columns.intersect(b.columns).toSeq
    // variable-disjoint sides must still honor the join type: a left-outer
    // against an EMPTY disjoint optional block keeps every left row (a
    // crossJoin would drop them all)
    if (shared.isEmpty) a.join(b, lit(true), how) else a.join(b, shared, how)
  }

  /** One triple pattern → σ(constants) + π(variables) over the scan. */
  private def one(triples: DataFrame, tp: TP): DataFrame =
    onePattern(triples, Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o))

  /** Generalized pattern solver over any (column, term) bindings — the
    * quad solver reuses it with a fourth `g` component. */

  /** Solve a BGP DIRECTLY over a property table — one row per subject,
    * one column per predicate (d-sparq's subject-grouped document layout,
    * [P] §1.1; built by [[propertyTable]]). A star is then a pure
    * filter + projection on the table — ZERO joins and zero shuffles per
    * star, the exact analog of the reference's one-document Mongo lookup;
    * stars still join each other on shared variables. A predicate the
    * table lacks contributes an all-null synthetic column, so the
    * present-predicate filter makes the star empty rather than erroring —
    * matching triple semantics. Same single-valued precondition as
    * [[solveStarCollapsed]].
    */
  def solveOverPropertyTable(pt: DataFrame, patterns: Seq[TP]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    def pred(tp: TP): String = tp.p match {
      case C(v: String) => v
      case _ => throw new IllegalArgumentException(
        "property-table solving needs constant predicates")
    }
    val bySubj = patterns.zipWithIndex.groupBy(_._1.s).toSeq
      .sortBy(_._2.head._2)
    val starDfs = bySubj.map { case (subj, numbered) =>
      val tps = numbered.map(_._1)
      val preds = tps.map(pred)
      val missing = preds.distinct.filterNot(pt.columns.contains)
      val base = missing.foldLeft(pt)((df, m) =>
        df.withColumn(m, lit(null).cast("string")))
      var df = preds.distinct.map(p => col(p).isNotNull)
        .foldLeft(base)(_.filter(_))
      val sBind: Seq[(String, String)] = subj match {
        case C(v) => df = df.filter(col("s") === lit(v)); Nil
        case V(n) => Seq("s" -> n)
      }
      val oBinds = tps.flatMap { tp =>
        tp.o match {
          case C(v) => df = df.filter(col(pred(tp)) === lit(v)); None
          case V(n) => Some(pred(tp) -> n)
        }
      }
      val binds = sBind ++ oBinds
      // one variable bound from several columns → equality, keep first
      binds.groupBy(_._2).values.filter(_.size > 1).foreach(g =>
        g.tail.foreach(t => df = df.filter(col(g.head._1) === col(t._1))))
      // first-appearance binding order, matching [[solve]]'s column order
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
      binds.foreach { case (c, n) => if (!seen.contains(n)) seen(n) = c }
      df.select(seen.toSeq.map { case (n, c) => col(c).as(n) }: _*)
    }
    starDfs.reduce(joinSolved)
  }

  /** The property table itself: one row per subject carrying the given
    * single-valued predicates as columns (max-aggregated for
    * determinism — equal to the value under the precondition). */
  def propertyTable(triples: DataFrame, preds: Seq[String]): DataFrame =
    triples.filter(col("p").isin(preds: _*))
      .groupBy(col("s"))
      .pivot("p", preds)
      .agg(max(col("o")))

  /** Per-predicate triple counts — the reference's selectivity statistics
    * collection ([P] R7), driver-held because #predicates is schema-sized. */
  def predicateCounts(triples: DataFrame): Map[String, Long] = {
    import triples.sparkSession.implicits._
    triples.groupBy("p").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
  }

  /** [[solve]] with the reference's explicit selectivity reorder (R7):
    * the fold starts from the most selective pattern (constant-object
    * patterns count as a fraction of their predicate's triples, unknown
    * predicates as 0 — they match nothing) and then GREEDILY extends with
    * the most selective pattern CONNECTED to the already-bound variables.
    * Connectivity-awareness is the part a plain selectivity sort gets
    * fatally wrong: sorting alone can put two variable-disjoint patterns
    * adjacent, and a disjoint fold step is a cross join — O(n·m) rows
    * that later joins then filter back down (measured 114 s vs 0.9 s on
    * the sf0.1 chain). A genuinely disconnected BGP still falls back to
    * the cross join it denotes. Result-equal to [[solve]] under any input
    * order (joins commute; only the tree shape changes).
    */
  def solveReordered(triples: DataFrame, patterns: Seq[TP],
      stats: Map[String, Long]): DataFrame = {
    def est(tp: TP): (Long, String) = {
      val base = tp.p match {
        case C(v: String) => stats.getOrElse(v, 0L)
        case _ => stats.values.sum
      }
      val scaled = (tp.s, tp.o) match {
        case (C(_), _) | (_, C(_)) => base / 100 // a constant endpoint prunes hard
        case _ => base
      }
      (scaled, tp.toString) // total order: ties break on the pattern text
    }
    def vars(tp: TP): Set[String] =
      Seq(tp.s, tp.p, tp.o).collect { case V(n) => n }.toSet
    val remaining = scala.collection.mutable.ArrayBuffer(patterns: _*)
    val ordered = Seq.newBuilder[TP]
    var bound = Set.empty[String]
    while (remaining.nonEmpty) {
      val connected = remaining
        .filter(tp => bound.isEmpty || (vars(tp) & bound).nonEmpty)
      val pool = if (connected.nonEmpty) connected else remaining
      val next = pool.minBy(est)
      ordered += next
      remaining -= next
      bound ++= vars(next)
    }
    solve(triples, ordered.result())
  }

  private[rdf] def onePattern(triples: DataFrame,
      bound: Seq[(String, Term)]): DataFrame = {
    val filters: Seq[Column] = bound.collect { case (c, C(v)) => col(c) === lit(v) }
    val filtered = filters.foldLeft(triples)(_.filter(_))
    // repeated variable within one pattern (e.g. ?x p ?x) → equality filter
    val varCols = bound.collect { case (c, V(n)) => (c, n) }
    val dupFilters = varCols.groupBy(_._2).values.filter(_.size > 1)
      .flatMap(g => g.tail.map(t => col(g.head._1) === col(t._1)))
    val eqFiltered = dupFilters.foldLeft(filtered)(_.filter(_))
    val proj = varCols.groupBy(_._2).map { case (n, g) => col(g.head._1).as(n) }.toSeq
    eqFiltered.select(proj: _*)
  }
}
