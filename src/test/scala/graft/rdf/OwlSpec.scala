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
}
