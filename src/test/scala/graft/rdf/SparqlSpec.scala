package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SparqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val triples = Triples.build(spark, sf0001).cache()

  test("SPARQL star query text ≡ DSL result") {
    val viaText = Sparql.run(triples,
      """SELECT ?cust ?cname ?nat WHERE {
        |  ?cust <name> ?cname .
        |  ?cust <mktsegment> "BUILDING" .
        |  ?cust <nation> ?nat .
        |}""".stripMargin)
    val viaDsl = Bgp.solve(triples, Seq(
      TP(V("cust"), C("name"), V("cname")),
      TP(V("cust"), C("mktsegment"), C("BUILDING")),
      TP(V("cust"), C("nation"), V("nat"))))
    assert(viaText.count() > 0)
    assert(viaText.exceptAll(viaDsl).count() === 0)
    assert(viaDsl.exceptAll(viaText).count() === 0)
  }

  test("OPTIONAL keeps unmatched left rows with nulls") {
    val got = Sparql.run(triples,
      """SELECT ?cust ?seg ?ord WHERE {
        |  ?cust <mktsegment> ?seg .
        |  OPTIONAL { ?ord <custkey> ?cust . ?ord <orderstatus> "P" . }
        |}""".stripMargin)
    assert(got.filter(col("ord").isNull).count() > 0)
    assert(got.filter(col("ord").isNotNull).count() > 0)
  }

  test("FILTER equality, inequality and regex") {
    val eq = Sparql.run(triples,
      """SELECT ?c ?s WHERE { ?c <mktsegment> ?s . FILTER (?s = "BUILDING") }""")
    assert(eq.select("s").distinct().as[String].collect().toSeq === Seq("BUILDING"))
    val ne = Sparql.run(triples,
      """SELECT ?c ?s WHERE { ?c <mktsegment> ?s . FILTER (?s != "BUILDING") }""")
    assert(ne.filter($"s" === "BUILDING").count() === 0 && ne.count() > 0)
    val re = Sparql.run(triples,
      """SELECT ?c ?n WHERE { ?c <name> ?n . FILTER regex(?n, "^Customer#00000001") }""")
    assert(re.count() === 10) // Customer#000000010..19
    assert(re.filter(!$"n".startsWith("Customer#00000001")).count() === 0)
  }

  test("PREFIX expansion and SELECT *") {
    val t = Seq(("s1", "http://ex/p", "o1"), ("s2", "http://ex/p", "o2"))
      .toDF("s", "p", "o")
    val got = Sparql.run(t,
      """PREFIX ex: <http://ex/>
        |SELECT * WHERE { ?s ex:p ?o . }""".stripMargin)
    assert(got.columns.toSet === Set("s", "o"))
    assert(got.count() === 2)
  }

  test("variable-disjoint empty OPTIONAL block keeps all required rows") {
    val got = Sparql.run(triples,
      """SELECT ?r ?n WHERE {
        |  ?r <name> ?n .
        |  OPTIONAL { ?x <no_such_predicate> ?y . }
        |}""".stripMargin)
    val required = Sparql.run(triples, "SELECT ?r ?n WHERE { ?r <name> ?n . }")
    assert(got.count() === required.count())
    assert(got.count() > 0)
  }

  test("multi-valued predicates return every binding through the default path") {
    import spark.implicits._
    val t = Seq(("s1", "p", "a"), ("s1", "p", "b"), ("s1", "q", "z"))
      .toDF("s", "p", "o")
    val got = Sparql.run(t, "SELECT ?x WHERE { ?s <p> ?x . ?s <q> ?y . }")
      .as[String].collect().toSet
    assert(got === Set("a", "b")) // star-collapse would lose one binding
  }

  test("out-of-fragment constructs are rejected, not mis-run") {
    intercept[IllegalArgumentException](
      Sparql.parse("SELECT ?x WHERE { }"))
    intercept[IllegalArgumentException](
      Sparql.parse("""SELECT ?x WHERE { ?x zz:p ?y . }"""))
    intercept[IllegalArgumentException](
      Sparql.parse("""SELECT WHERE { ?x <p> ?y . }"""))
  }
}
