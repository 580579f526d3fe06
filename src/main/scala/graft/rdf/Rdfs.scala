package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RDFS forward-chaining materialization (the ρdf entailment core:
  * rdfs2/3/5/7/9/11) — the inference layer a d-sparq-class SPARQL engine
  * pairs with its BGP solver so queries see entailed triples without
  * per-query reasoning.
  *
  * Scale design (the WebPIE insight, Urbani et al., ISWC 2009, public):
  * the SCHEMA (subClassOf/subPropertyOf/domain/range) is KB-sized while
  * instances are TB-sized, so all schema reasoning — the transitive
  * closures of subClassOf and subPropertyOf (rdfs5/11) — happens in plain
  * Scala on the driver, and the instance pass is ONE scan: each triple is
  * expanded map-side against broadcast literal maps (rdfs7 superproperty
  * emission, rdfs2/9 domain types through the class closure, rdfs3/9 range
  * types), then a single distinct. No joins touch the instance data, no
  * iteration over it either — entailment depth lives entirely in the
  * precomputed schema closures. At 100 TB this is scan + explode +
  * one shuffle (the distinct), the minimum possible.
  */
object Rdfs {

  /** An RDFS schema: strict subclass/subproperty edges + property
    * signatures. Class/property names are plain term strings. */
  final case class Schema(
      subClassOf: Seq[(String, String)],
      subPropertyOf: Seq[(String, String)],
      domain: Seq[(String, String)],
      range: Seq[(String, String)])

  /** The ontology for the EAV TPC-H graph ([[Triples.build]]): a place /
    * agent / activity upper model over customers, nations, regions and
    * orders. Instance data carries NO rdf:type triples — every type below
    * is inferred from property usage (rdfs2/3), which is the hard case.
    */
  val tpchSchema: Schema = Schema(
    subClassOf = Seq(
      "Customer" -> "Agent", "Agent" -> "Resource",
      "Nation" -> "Place", "Region" -> "Place", "Place" -> "Resource",
      "Order" -> "Activity", "Activity" -> "Resource"),
    subPropertyOf = Seq(
      "nation" -> "locatedIn", "region" -> "locatedIn",
      "locatedIn" -> "relatedTo", "custkey" -> "involves",
      "involves" -> "relatedTo"),
    domain = Seq(
      "custkey" -> "Order", "orderstatus" -> "Order",
      "nation" -> "Customer", "mktsegment" -> "Customer",
      "region" -> "Nation"),
    range = Seq(
      "custkey" -> "Customer", "nation" -> "Nation", "region" -> "Region"))

  /** Reflexive-transitive closure of a tiny edge list (driver-side; the
    * schema is KB-sized by contract). Deterministic order-independent
    * result (a Map to a sorted Seq). */
  private def closure(edges: Seq[(String, String)]): Map[String, Seq[String]] = {
    val direct = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    def reach(from: String, seen: Set[String]): Set[String] = {
      val next = direct.getOrElse(from, Set.empty) -- seen
      next.foldLeft(seen ++ next)((acc, n) => reach(n, acc))
    }
    val nodes = edges.flatMap(t => Seq(t._1, t._2)).distinct
    nodes.map(n => n -> (reach(n, Set.empty) + n).toSeq.sorted).toMap
  }

  /** All entailed triples over `triples(s, p, o)` under `schema`: the
    * input plus rdfs7 (superproperty), rdfs2 (domain), rdfs3 (range)
    * emissions, each already lifted through the rdfs5/11 closures, as one
    * map-side expansion + distinct. `type` is the plain term `"type"`.
    */
  def entail(triples: DataFrame, schema: Schema): DataFrame =
    derivations(triples, schema).distinct()

  /** Every DERIVATION of every entailed triple — the pre-distinct
    * expansion, one row per (input triple, rule emission). Grouping this
    * by (s, p, o) with a count gives the SUPPORT of each entailed triple:
    * how many input triples derive it. Because the RDFS instance pass is
    * map-side (each output derives from exactly ONE input row), support
    * counts make the materialization incrementally maintainable under
    * adds AND deletes via counting (the classic non-recursive-IVM
    * result): see [[supportCounts]] / [[maintainCounts]].
    */
  /** The folded per-predicate emission tables behind [[derivations]]:
    * (supers, domains, ranges), each `p -> emitted values`. EVERYTHING
    * a triple emits is a pure function of its predicate's three entries
    * here — which is what makes SCHEMA churn maintainable by a
    * predicate-pruned rescan ([[maintainSchema]]). */
  def foldedMaps(schema: Schema): (Map[String, Seq[String]],
      Map[String, Seq[String]], Map[String, Seq[String]]) = {
    val propsUp = closure(schema.subPropertyOf) // p -> p + all superprops
    val classUp = closure(schema.subClassOf)    // C -> C + all superclasses

    // property signatures lifted through BOTH closures: a triple (s p o)
    // entails domain/range types for p and every superproperty of p
    // (rdfs7 then rdfs2/3), and each such class lifts through subClassOf
    // (rdfs9) — all folded into one p -> classes map per side.
    def liftedSig(sig: Seq[(String, String)]): Map[String, Seq[String]] = {
      val byProp = sig.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
      val allProps = (propsUp.keySet ++ byProp.keySet).toSeq
      allProps.map { p =>
        val cs = propsUp.getOrElse(p, Seq(p))
          .flatMap(q => byProp.getOrElse(q, Nil))
          .flatMap(c => classUp.getOrElse(c, Seq(c)))
          .distinct.sorted
        p -> cs
      }.filter(_._2.nonEmpty).toMap
    }
    (propsUp.map { case (p, up) => p -> (up :+ p).distinct.sorted },
      liftedSig(schema.domain), liftedSig(schema.range))
  }

  def derivations(triples: DataFrame, schema: Schema): DataFrame = {
    val (supersMap, domainOf, rangeOf) = foldedMaps(schema)

    // literal lookup maps — broadcast to every task inside the plan, no
    // join against instance data
    def lookup(m: Map[String, Seq[String]]): Column = {
      if (m.isEmpty) typedLit(Map.empty[String, Seq[String]])
      else map(m.toSeq.flatMap { case (k, vs) =>
        Seq(lit(k), array(vs.map(lit): _*))
      }: _*)
    }
    val supers = lookup(supersMap)
    val doms = lookup(domainOf)
    val rans = lookup(rangeOf)

    val t = triples.select(col("s"), col("p"), col("o"))
    // rdfs7: (s p o) ⊢ (s q o) for every superproperty q (incl. p itself)
    val viaProps = t.select(col("s"),
        explode(coalesce(element_at(supers, col("p")), array(col("p")))).as("p"),
        col("o"))
    // rdfs2 (+5/7/9/11 pre-folded): subject types from the lifted domains
    val subjTypes = t.select(col("s"), lit("type").as("p"),
        explode(coalesce(element_at(doms, col("p")), array().cast("array<string>"))).as("o"))
    // rdfs3 (+…): object types from the lifted ranges
    val objTypes = t.select(col("o").as("s"), lit("type").as("p"),
        explode(coalesce(element_at(rans, col("p")), array().cast("array<string>"))).as("o"))

    viaProps.unionByName(subjTypes).unionByName(objTypes)
  }

  /** The materialized entailment WITH per-triple support: (s, p, o, n)
    * where n = number of deriving input triples. `select(s,p,o)` IS
    * [[entail]]'s result (n ≥ 1 by construction). */
  def supportCounts(triples: DataFrame, schema: Schema): DataFrame =
    derivations(triples, schema)
      .groupBy(col("s"), col("p"), col("o"))
      .agg(count(lit(1)).as("n"))

  /** Incrementally maintain a [[supportCounts]] materialization under a
    * net (adds, dels) change to the INPUT triples (e.g. a
    * [[QuadStore.changes]] feed): only the delta is expanded and
    * shuffled — the base materialization is never recomputed — and
    * support hitting zero retracts the entailed triple exactly (no
    * over-deletion, the counting-IVM guarantee for map-side rules). */
  def maintainCounts(counts: DataFrame, adds: DataFrame, dels: DataFrame,
      schema: Schema): DataFrame =
    graft.operators.IncrementalAgg.maintain(counts,
      derivations(adds, schema), derivations(dels, schema),
      Seq("s", "p", "o"), Map("n" -> lit(1L)))

  /** Predicates whose EMISSION BEHAVIOR differs between two schemas —
    * the only triples a schema change can affect. A predicate absent
    * from the folded maps emits itself (supers) and no types, so
    * defaults are compared, not just map entries. */
  def changedPreds(oldSchema: Schema, newSchema: Schema): Set[String] = {
    val (os, od, or) = foldedMaps(oldSchema)
    val (ns, nd, nr) = foldedMaps(newSchema)
    val preds = os.keySet ++ ns.keySet ++ od.keySet ++ nd.keySet ++
      or.keySet ++ nr.keySet
    preds.filter { p =>
      os.getOrElse(p, Seq(p)) != ns.getOrElse(p, Seq(p)) ||
        od.getOrElse(p, Nil) != nd.getOrElse(p, Nil) ||
        or.getOrElse(p, Nil) != nr.getOrElse(p, Nil)
    }
  }

  /** Incrementally maintain a [[supportCounts]] materialization under a
    * SCHEMA change (ontology evolution — the recursive case, since
    * subClassOf/subPropertyOf edits move the closures). Because every
    * emission is a pure per-predicate function ([[foldedMaps]]), the
    * affected input slice is exactly `p ∈ changedPreds` — a PUSHDOWN
    * FILTER scan of the input, not a recompute of the materialization;
    * at 100 TB an ontology edit touching two predicates rescans two
    * predicates' partitions. Emissions the change does not move cancel
    * inside the count sum (+1 from the new-schema expansion, −1 from
    * the old — the same derivation), so the net is exact. */
  def maintainSchema(counts: DataFrame, triples: DataFrame,
      oldSchema: Schema, newSchema: Schema): DataFrame = {
    val changed = changedPreds(oldSchema, newSchema)
    if (changed.isEmpty) return counts
    val affected = triples.select(col("s"), col("p"), col("o"))
      .filter(col("p").isin(changed.toSeq: _*))
    graft.operators.IncrementalAgg.maintain(counts,
      derivations(affected, newSchema), derivations(affected, oldSchema),
      Seq("s", "p", "o"), Map("n" -> lit(1L)))
  }

  /** DuckDB oracle: the same entailment as first-principles recursive SQL
    * over a VALUES-encoded schema — closures via recursive CTEs (no
    * driver-side precomputation), rules as joins — so the Spark path's
    * folded schema maps are checked against an independent derivation.
    * `triples` must name a CTE with (s, p, o).
    */
  def entailDuckSql(schema: Schema): String = {
    def values(rows: Seq[(String, String)]): String =
      rows.map { case (a, b) => s"('$a', '$b')" }.mkString(", ")
    s"""sub_c(c, d) AS (VALUES ${values(schema.subClassOf)}),
       |sub_p(p, q) AS (VALUES ${values(schema.subPropertyOf)}),
       |dom(p, c) AS (VALUES ${values(schema.domain)}),
       |ran(p, c) AS (VALUES ${values(schema.range)}),
       |-- rdfs11: reflexive-transitive subClassOf closure (schema-only)
       |cc AS (
       |  SELECT c, c AS d FROM (SELECT c FROM sub_c UNION SELECT d FROM sub_c) b
       |  UNION
       |  SELECT s.c, x.d FROM sub_c s JOIN cc x ON s.d = x.c
       |),
       |-- rdfs5: reflexive-transitive subPropertyOf closure
       |pc AS (
       |  SELECT p, p AS q FROM (SELECT p FROM sub_p UNION SELECT q FROM sub_p
       |                         UNION SELECT DISTINCT p FROM triples) b
       |  UNION
       |  SELECT s.p, x.q FROM sub_p s JOIN pc x ON s.q = x.p
       |),
       |-- rdfs7: every triple through the property closure
       |t7 AS (SELECT t.s, pc.q AS p, t.o FROM triples t JOIN pc ON t.p = pc.p),
       |-- rdfs2 + rdfs9: domain types through the class closure
       |t2 AS (SELECT DISTINCT t.s, 'type' AS p, cc.d AS o
       |       FROM t7 t JOIN dom ON t.p = dom.p JOIN cc ON dom.c = cc.c),
       |-- rdfs3 + rdfs9: range types through the class closure
       |t3 AS (SELECT DISTINCT t.o AS s, 'type' AS p, cc.d AS o
       |       FROM t7 t JOIN ran ON t.p = ran.p JOIN cc ON ran.c = cc.c),
       |entailed AS (
       |  SELECT s, p, o FROM t7
       |  UNION SELECT s, p, o FROM t2
       |  UNION SELECT s, p, o FROM t3
       |)""".stripMargin
  }
}
