package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TripleStoreSpec extends SparkSpec {


  test("bucketed-by-subject store makes star self-joins shuffle-free") {
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // directory persists — clean both before writing
    spark.sql("DROP TABLE IF EXISTS t_bucketed")
    rmTree(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "t_bucketed"))
    val triples = Triples.build(spark, sf0001)
    TripleStore.saveBucketed(triples, "t_bucketed", buckets = 4)
    val t = TripleStore.load(spark, "t_bucketed")

    val star = t.filter(col("p") === "name").select(col("s"), col("o").as("cname"))
      .join(t.filter(col("p") === "mktsegment").select(col("s"), col("o").as("seg")), "s")
    val plan = star.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"star join over the bucketed store must not shuffle:\n$plan")

    // same answer as the unbucketed plan
    val unbucketed = Bgp.solve(triples, Seq(
      TP(V("s"), C("name"), V("cname")),
      TP(V("s"), C("mktsegment"), V("seg"))))
    assert(star.count() === unbucketed.count())
    assert(star.exceptAll(unbucketed.select("s", "cname", "seg")).count() === 0)
  }

  test("bucketed encoded store: id-space stars join shuffle-free over longs") {
    spark.sql("DROP TABLE IF EXISTS t_enc_bucketed")
    rmTree(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "t_enc_bucketed"))
    val triples = Triples.build(spark, sf0001)
    val dict = Dictionary.build(spark, triples)
    TripleStore.saveBucketed(Dictionary.encode(triples, dict),
      "t_enc_bucketed", buckets = 4, subjectCol = "sid")
    val enc = TripleStore.load(spark, "t_enc_bucketed")

    val pats = Seq(
      TP(V("c"), C("name"), V("n")), TP(V("c"), C("mktsegment"), V("seg")))
    val (idPats, ok) = EncodedBgp.encodePatterns(dict, pats)
    assert(ok)
    val solved = Bgp.solve(EncodedBgp.asTriples(enc), idPats)
    // both reference techniques composed: subject co-location makes the
    // star join exchange-free AND every join key is an 8-byte long
    val plan = solved.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"id-star join over the bucketed encoded store must not shuffle:\n$plan")
    assert(solved.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType))

    val viaString = Bgp.solve(triples, pats)
    val decoded = EncodedBgp.decode(solved, dict, solved.columns)
      .select(viaString.columns.map(col): _*)
    assert(decoded.count() === viaString.count())
    assert(decoded.exceptAll(viaString).count() === 0)
  }

  test("the PERSISTED encoded store is bucketed: its stars run exchange-free") {
    // encodedFor is the path q_bgp_encoded/q_sparql_encoded actually take —
    // the on-disk layout itself must make subject stars shuffle-free, not
    // just an ad-hoc saveBucketed call
    val (dict, enc) = TripleStore.encodedFor(spark, sf0001)
    val pats = Seq(
      TP(V("c"), C("mktsegment"), V("seg")), TP(V("c"), C("name"), V("cname")))
    val (idPats, ok) = EncodedBgp.encodePatterns(dict, pats)
    assert(ok)
    val joined = Bgp.solve(EncodedBgp.asTriples(enc), idPats)
    val joinPlan = joined.queryExecution.executedPlan.toString
    assert(!joinPlan.contains("Exchange hashpartitioning"),
      s"id-star self-join over the persisted store must not shuffle:\n$joinPlan")
    val collapsed = Bgp.solveStarCollapsed(EncodedBgp.asTriples(enc), idPats)
    val aggPlan = collapsed.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"collapsed star over the persisted store must not shuffle:\n$aggPlan")
    // and the layout change is invisible to results
    val viaString = Bgp.solve(Triples.build(spark, sf0001), pats)
    val decoded = EncodedBgp.decode(joined, dict, joined.columns)
      .select(viaString.columns.map(col): _*)
    assert(decoded.count() === viaString.count() && decoded.count() > 0)
    assert(decoded.exceptAll(viaString).count() === 0)
  }

  test("vertically-partitioned store partition-prunes constant-predicate patterns") {
    val dir = new java.io.File("target/vp-triples")
    rmTree(dir)
    val triples = Triples.build(spark, sf0001)
    TripleStore.saveVerticalPartitioned(triples, dir.getPath)
    val vp = TripleStore.loadVertical(spark, dir.getPath)

    val one = vp.filter(col("p") === "mktsegment")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("mktsegment"),
      s"expected partition pruning on p:\n$scan")
    // pruned scan answers the pattern identically
    assert(one.count() ===
      triples.filter(col("p") === "mktsegment").count())
    // full BGP over the VP store matches the in-memory triples
    val a = Bgp.solveStarCollapsed(vp.select("s", "p", "o"), Seq(
      TP(V("c"), C("name"), V("n")), TP(V("c"), C("nation"), V("nat"))))
    val b = Bgp.solveStarCollapsed(triples, Seq(
      TP(V("c"), C("name"), V("n")), TP(V("c"), C("nation"), V("nat"))))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }
}
