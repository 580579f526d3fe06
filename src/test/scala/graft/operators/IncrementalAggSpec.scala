package graft.operators

import graft.SparkSpec
import graft.rdf.{QuadStore, Quads}
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("maintain ≡ recompute under adds and deletes") {
    val base = Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "v")
    val measures = Map("n" -> lit(1L), "sv" -> col("v"))
    val cur = IncrementalAgg.recompute(base, Seq("k"), measures)
    val adds = Seq(("b", 7L), ("c", 1L)).toDF("k", "v")
    val dels = Seq(("a", 1L), ("a", 2L)).toDF("k", "v")
    val maintained = IncrementalAgg.maintain(cur, adds, dels, Seq("k"), measures)
    val truth = IncrementalAgg.recompute(
      base.exceptAll(dels).unionByName(adds), Seq("k"), measures)
    assert(maintained.exceptAll(truth).count() === 0)
    assert(truth.exceptAll(maintained).count() === 0)
    // group `a` netted to zero rows and left the summary entirely
    assert(maintained.filter($"k" === "a").count() === 0)
  }

  test("contract guards: count measure required, fractional rejected") {
    val base = Seq(("a", 1L)).toDF("k", "v")
    val cur = IncrementalAgg.recompute(base, Seq("k"), Map("n" -> lit(1L)))
    // no count measure → loud error (a sum can net to zero over live rows)
    val noCount = intercept[IllegalArgumentException](
      IncrementalAgg.maintain(cur.withColumnRenamed("n", "sv"),
        base, base.limit(0), Seq("k"), Map("sv" -> col("v"))))
    assert(noCount.getMessage.contains("row-count measure"))
    // fractional measure → loud error instead of silent truncation
    val frac = Seq(("a", 0.5)).toDF("k", "v")
    val truncated = intercept[IllegalArgumentException](
      IncrementalAgg.recompute(frac, Seq("k"),
        Map("n" -> lit(1L), "sv" -> col("v"))))
    assert(truncated.getMessage.contains("integer"))
  }

  test("a QuadStore changes() feed maintains predicate counts") {
    val root = java.nio.file.Files.createTempDirectory("incragg").toString
    QuadStore.init(Quads.build(spark, sf0001), root)
    val v1 = QuadStore.readVersion(spark, root, 1)
    val measures = Map[String, org.apache.spark.sql.Column]("n" -> lit(1L))
    var summary = graft.Materialize(
      IncrementalAgg.recompute(v1, Seq("p"), measures))
    QuadStore.update(spark, root,
      """INSERT DATA { <x:1> <newpred> "a" . <x:2> <newpred> "b" . }""")
    QuadStore.update(spark, root,
      """DELETE { GRAPH <g:orders> { ?o <orderpriority> ?pr . } }
        |WHERE { GRAPH <g:orders> { ?o <orderpriority> ?pr . } }"""
        .stripMargin)
    val (adds, dels) = QuadStore.changes(spark, root, 1, 3)
    summary = IncrementalAgg.maintain(summary, adds, dels, Seq("p"), measures)
    val truth = IncrementalAgg.recompute(
      QuadStore.readVersion(spark, root, 3), Seq("p"), measures)
    assert(summary.exceptAll(truth).count() === 0)
    assert(truth.exceptAll(summary).count() === 0)
    // the vanished predicate is gone, the new one counted
    assert(summary.filter($"p" === "orderpriority").count() === 0)
    assert(summary.filter($"p" === "newpred").as[(String, Long)]
      .collect().toSeq === Seq(("newpred", 2L)))
  }
}
