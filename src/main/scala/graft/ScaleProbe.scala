package graft

import graft.rdf.{Bgp, C, TP, TripleStore, Triples, V}
import org.apache.spark.sql.SparkSession

/** One-off scale experiment (not part of the driver contract): times the
  * three physical strategies for the same subject-star BGP over the
  * triples graph — join path, star-collapsed aggregation, and the
  * subject-bucketed store — with broadcast disabled so the plans have the
  * shape they'd have when the triples table dwarfs executor memory.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus,
      Map("spark.sql.autoBroadcastJoinThreshold" -> "-1"))
    spark.sparkContext.setLogLevel("ERROR")

    val pats = Seq(
      TP(V("cust"), C("name"), V("cname")),
      TP(V("cust"), C("mktsegment"), V("seg")),
      TP(V("cust"), C("nation"), V("nat")))

    // Materialize the EAV unpivot once: every strategy below reads
    // parquet, so the deltas isolate the execution strategy (join vs
    // collapse) and the storage layout (plain vs subject-bucketed), not
    // the cost of rebuilding the triples.
    val plainPath = "target/probe-triples"
    Triples.build(spark, sfDir).write.mode("overwrite").parquet(plainPath)
    val triples = spark.read.parquet(plainPath)
    println(s"triples: ${triples.count()}")

    def timeInto(m: scala.collection.mutable.Map[String, Long])(
        label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      m(label) = n
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val counts = scala.collection.mutable.Map.empty[String, Long]
    val time = timeInto(counts) _

    time("star via self-joins") { Bgp.solve(triples, pats).count() }
    time("star via collapse") { Bgp.solveStarCollapsed(triples, pats).count() }

    // DROP TABLE is a no-op in a fresh JVM's in-memory catalog, but the
    // warehouse directory persists across runs — remove both
    spark.sql("DROP TABLE IF EXISTS probe_bucketed")
    graft.sources.AtomicStore.deleteRecursively(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "probe_bucketed"))
    TripleStore.saveBucketed(triples, "probe_bucketed", buckets = cpus.toInt)
    val bucketed = TripleStore.load(spark, "probe_bucketed")
    time("star via self-joins+bucket") { Bgp.solve(bucketed, pats).count() }
    time("star via collapse+bucket") { Bgp.solveStarCollapsed(bucketed, pats).count() }

    require(counts.values.toSet.size == 1,
      s"strategies disagree — benchmark invalid: $counts")

    // The dictionary-encoding lever on a CHAIN (two stars joined through a
    // variable): identical plans, joins over strings vs over 8-byte ids.
    // Encode/decode time is excluded — both are load/emission-time in the
    // reference's lifecycle (SURVEY.md §3.3).
    val chain = Seq(
      TP(V("ord"), C("custkey"), V("cust")),
      TP(V("ord"), C("orderpriority"), C("1-URGENT")),
      TP(V("cust"), C("mktsegment"), V("seg")),
      TP(V("cust"), C("name"), V("cname")))
    val (dict, encAll) = TripleStore.encodedFor(spark, sfDir)
    val (idPats, ok) = rdf.EncodedBgp.encodePatterns(dict, chain)
    require(ok, "probe chain constants missing from dictionary")
    val chainCounts = scala.collection.mutable.Map.empty[String, Long]
    val timeChain = timeInto(chainCounts) _
    timeChain("chain over strings") { Bgp.solve(triples, chain).count() }
    timeChain("chain over ids") {
      Bgp.solve(rdf.EncodedBgp.asTriples(encAll), idPats).count()
    }
    require(chainCounts.values.toSet.size == 1,
      s"encoded chain disagrees — benchmark invalid: $chainCounts")
    spark.stop()
  }
}
