package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class OwlSpec extends SparkSpec {
  import spark.implicits._

  private def t3(rows: (String, String, String)*): DataFrame =
    rows.toDF("s", "p", "o")

  private def rows(df: DataFrame): Set[(String, String, String)] =
    df.select("s", "p", "o").as[(String, String, String)].collect().toSet

  test("sameAs canonicalization: chains, min rep, collapsing duplicates") {
    val in = t3(
      // a 3-member CHAIN (z→y→a): propagation must walk two hops
      ("y", "sameAs", "a"), ("z", "sameAs", "y"),
      ("a", "name", "alice"), ("y", "seg", "B"), ("z", "nat", "de"),
      // two aliases carrying the SAME fact — must collapse to ONE row
      ("a", "seg", "B"),
      // an unaliased node passes through untouched
      ("w", "name", "walter"))
    val got = rows(Owl.sameAsCanonical(in))
    assert(got === Set(
      ("a", "name", "alice"), ("a", "seg", "B"), ("a", "nat", "de"),
      ("w", "name", "walter")))
    // objects rewrite too
    val obj = rows(Owl.sameAsCanonical(t3(
      ("b", "sameAs", "a"), ("x", "knows", "b"))))
    assert(obj === Set(("x", "knows", "a")))
  }

  test("entail: transitive depth-3 chain, inverse both ways, symmetric") {
    val in = t3(
      ("a", "part", "b"), ("b", "part", "c"), ("c", "part", "d"),
      ("o1", "custkey", "c1"), ("c2", "hasOrder", "o2"),
      ("m", "linkedTo", "n"))
    val got = rows(Owl.entail(in, transitive = Seq("part"),
      inverses = Seq("custkey" -> "hasOrder"),
      symmetric = Seq("linkedTo")))
    assert(got === Set(
      ("a", "part", "b"), ("b", "part", "c"), ("c", "part", "d"),
      ("a", "part", "c"), ("b", "part", "d"), ("a", "part", "d"),
      ("o1", "custkey", "c1"), ("c1", "hasOrder", "o1"),
      ("c2", "hasOrder", "o2"), ("o2", "custkey", "c2"),
      ("m", "linkedTo", "n"), ("n", "linkedTo", "m")))
    // a transitive predicate closes over its MIRRORED edges: declaring
    // the same predicate symmetric and transitive yields the undirected
    // reachability relation
    val und = rows(Owl.entail(t3(("a", "adj", "b"), ("c", "adj", "b")),
      transitive = Seq("adj"), symmetric = Seq("adj")))
    assert(und === Set(
      ("a", "adj", "b"), ("b", "adj", "a"), ("c", "adj", "b"),
      ("b", "adj", "c"), ("a", "adj", "c"), ("c", "adj", "a"),
      ("a", "adj", "a"), ("b", "adj", "b"), ("c", "adj", "c")))
  }

  test("entailClass: the sameAs FEEDBACK loop — an inverse-functional " +
      "merge lands two values on one subject, the functional rule then " +
      "derives a second merge that re-canonicalizes DERIVED triples") {
    val in = t3(
      ("c1", "name", "alice"), ("c1", "nation", "n1"),
      // a duplicate record: same inverse-functional name, the segment
      // fact stated under the EQUIVALENT property, nation under an alias
      ("d1", "name", "alice"), ("d1", "seg", "B"), ("d1", "nation", "z1"),
      ("n1", "region", "r1"))
    val cs = Owl.ClassSchema(
      equivalentClass = Seq("BC" -> "CC"),
      equivalentProperty = Seq("seg" -> "mseg"),
      functional = Seq("nation"),
      inverseFunctional = Seq("name"),
      hasValue = Seq(("BC", "mseg", "B"), ("NR1", "region", "r1")),
      someValuesFrom = Seq(("CNR1", "nation", "NR1")))
    val got = rows(Owl.entailClass(in, cs))
    // d1 merged onto c1 (name IFP); the merge put {n1, z1} on c1's
    // functional nation, deriving sameAs(z1, n1) — which rewrites the
    // DERIVED (c1 nation z1) away; the segment fact flowed through the
    // property equivalence into hasValue membership, lifted through the
    // class clique; the nation typed via hasValue fed someValuesFrom
    assert(got === Set(
      ("c1", "name", "alice"),
      ("c1", "nation", "n1"),                       // z1 gone: 2nd merge
      ("c1", "seg", "B"), ("c1", "mseg", "B"),      // property clique
      ("c1", "type", "BC"), ("c1", "type", "CC"),   // hasValue + class clique
      ("c1", "type", "CNR1"),                       // someValuesFrom
      ("n1", "region", "r1"), ("n1", "type", "NR1")))
    // a bare membership materializes its hasValue witness (rdfp14b)
    val wit = rows(Owl.entailClass(t3(("x", "type", "BC")), cs))
    assert(wit === Set(("x", "type", "BC"), ("x", "type", "CC"),
      ("x", "mseg", "B"), ("x", "seg", "B")))
    // non-convergence inside maxRounds fails loudly, never silently
    // truncates: round 0 grows the set (hasValue membership + clique
    // lift), so the confirming fixpoint pass needs round 1 — cap below
    // that and it throws
    val deep = Owl.ClassSchema(
      equivalentClass = Seq("K1" -> "K2"),
      hasValue = Seq(("K1", "has", "v")))
    val e = intercept[IllegalArgumentException](
      Owl.entailClass(t3(("s", "has", "v")), deep, maxRounds = 1))
    assert(e.getMessage.contains("did not converge"))
  }
}
