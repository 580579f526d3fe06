package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OWL-Horst-style property semantics beyond the ρdf core ([[Rdfs]]):
  * owl:sameAs identity cliques, owl:TransitiveProperty,
  * owl:inverseOf and owl:SymmetricProperty — the fragment of OWL that
  * stays rule-shaped and therefore scales like the RDFS pass (ter
  * Horst, JWS 2005, public; WebPIE treats the same fragment).
  *
  * Scale shapes, per rule family:
  *  - sameAs: equivalence classes by min-label propagation
  *    ([[graft.llm.Dedup.connectedComponents]] — O(clique diameter)
  *    rounds, eager-materialized), then ONE rewrite join per position.
  *    Canonicalization-by-representative is the production choice
  *    (emitting all n² same-as-expanded triples of an n-clique is the
  *    classic OWL blow-up; picking the MINIMUM member is deterministic
  *    and join-free to verify).
  *  - TransitiveProperty: per-predicate closure via the semi-naive
  *    [[Paths.transitiveClosure]] (log-diameter rounds).
  *  - inverseOf / SymmetricProperty: map-side emissions, one scan.
  */
object Owl {

  /** Rewrite every subject/object to its owl:sameAs equivalence-class
    * representative (the class MINIMUM — deterministic), consuming the
    * sameAs triples; non-aliased terms pass through. One distinct at
    * the end: distinct aliased triples can collapse onto one canonical
    * triple. */
  def sameAsCanonical(triples: DataFrame,
      sameAsPred: String = "sameAs"): DataFrame = {
    val pairs = triples.filter(col("p") === sameAsPred)
      .select(col("s").as("doc_a"), col("o").as("doc_b"))
    val reps = graft.llm.Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("node"), col("label").as("rep"))
    val data = triples.filter(col("p") =!= sameAsPred)
      .select("s", "p", "o")
    data
      .join(reps.select(col("node").as("s"), col("rep").as("__rs")),
        Seq("s"), "left")
      .join(reps.select(col("node").as("o"), col("rep").as("__ro")),
        Seq("o"), "left")
      .select(coalesce(col("__rs"), col("s")).as("s"), col("p"),
        coalesce(col("__ro"), col("o")).as("o"))
      .distinct()
  }

  /** Close every predicate in `transitive` over itself (owl rule rdfp4)
    * and mirror every declared inverse/symmetric emission (rdfp8/rdfp3)
    * — inverses and symmetry first, so a transitive predicate is closed
    * over its full (declared + mirrored) edge set. Returns the input
    * plus the entailed triples, one distinct. */
  def entail(triples: DataFrame, transitive: Seq[String] = Nil,
      inverses: Seq[(String, String)] = Nil,
      symmetric: Seq[String] = Nil): DataFrame = {
    val t = triples.select("s", "p", "o")
    val mirrored = inverses.flatMap { case (p0, q0) => Seq(
        t.filter(col("p") === p0).select(col("o").as("s"),
          lit(q0).as("p"), col("s").as("o")),
        t.filter(col("p") === q0).select(col("o").as("s"),
          lit(p0).as("p"), col("s").as("o")))
      } ++ symmetric.map(p0 =>
        t.filter(col("p") === p0).select(col("o").as("s"), col("p"),
          col("s").as("o")))
    val base = (t +: mirrored).reduce(_.unionByName(_))
    val closed = transitive.map { p0 =>
      Paths.transitiveClosure(base.filter(col("p") === p0)
          .select(col("s").as("src"), col("o").as("dst")))
        .select(col("src").as("s"), lit(p0).as("p"), col("dst").as("o"))
    }
    (base +: closed).reduce(_.unionByName(_)).distinct()
  }
}
