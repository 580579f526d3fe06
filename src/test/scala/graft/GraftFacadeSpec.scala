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
}
