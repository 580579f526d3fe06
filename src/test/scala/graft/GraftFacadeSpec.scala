package graft

class GraftFacadeSpec extends SparkSpec {
  import spark.implicits._

  test("façade round trip: triples → typed → sparql → dictionary") {
    val t = Graft.triples(spark, sf0001)
    val typed = Graft.typedTriples(t)
    assert(typed.filter(_.p == "name").count() > 0)
    val rs = Graft.sparql(t,
      """SELECT ?c ?n WHERE { ?c <name> ?n . ?c <mktsegment> "BUILDING" . }""")
    assert(rs.columns.toSet === Set("c", "n") && rs.count() > 0)
    val dict = Graft.dictionary(spark, t)
    val back = Graft.decode(Graft.encode(t, dict), dict)
    assert(back.count() === t.count())
  }

  test("façade quads path: N-Quads file → sparqlQuads GRAPH query") {
    val dir = java.nio.file.Files.createTempDirectory("graft-facade-nq")
    java.nio.file.Files.writeString(dir.resolve("data.nq"),
      """<http://ex/s1> <http://ex/p> <http://ex/o1> <http://ex/g1> .
        |<http://ex/s2> <http://ex/p> <http://ex/o2> .
        |""".stripMargin)
    val quads = Graft.quadsFromNQuads(spark, dir.toString)
    val named = Graft.sparqlQuads(quads,
      "SELECT ?g ?o WHERE { GRAPH ?g { ?s <http://ex/p> ?o . } }")
    assert(named.as[(String, String)].collect().toSet ===
      Set("http://ex/g1" -> "http://ex/o1"))
  }
}
