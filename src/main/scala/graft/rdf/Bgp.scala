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
final case class C(value: String) extends Term
final case class TP(s: Term, p: Term, o: Term)

object Bgp {

  def solve(triples: DataFrame, patterns: Seq[TP]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    patterns.map(one(triples, _)).reduce(join)
  }

  /** requiredResult OPTIONAL { patterns }: left-outer join on shared vars. */
  def optional(required: DataFrame, triples: DataFrame, patterns: Seq[TP]): DataFrame =
    joinWith(required, solve(triples, patterns), "left_outer")

  private def join(a: DataFrame, b: DataFrame): DataFrame = joinWith(a, b, "inner")

  private def joinWith(a: DataFrame, b: DataFrame, how: String): DataFrame = {
    val shared = a.columns.intersect(b.columns).toSeq
    if (shared.isEmpty) a.crossJoin(b) else a.join(b, shared, how)
  }

  /** One triple pattern → σ(constants) + π(variables) over the scan. */
  private def one(triples: DataFrame, tp: TP): DataFrame = {
    val bound: Seq[(String, Term)] = Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o)
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
