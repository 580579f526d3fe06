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

    val counts = scala.collection.mutable.Map.empty[String, Long]
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      counts(label) = n
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    time("star via self-joins") { Bgp.solve(triples, pats).count() }
    time("star via collapse") { Bgp.solveStarCollapsed(triples, pats).count() }

    // DROP TABLE is a no-op in a fresh JVM's in-memory catalog, but the
    // warehouse directory persists across runs — remove both
    spark.sql("DROP TABLE IF EXISTS probe_bucketed")
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(): Unit
    }
    rmTree(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "probe_bucketed"))
    TripleStore.saveBucketed(triples, "probe_bucketed", buckets = cpus.toInt)
    val bucketed = TripleStore.load(spark, "probe_bucketed")
    time("star via self-joins+bucket") { Bgp.solve(bucketed, pats).count() }
    time("star via collapse+bucket") { Bgp.solveStarCollapsed(bucketed, pats).count() }

    require(counts.values.toSet.size == 1,
      s"strategies disagree — benchmark invalid: $counts")
    spark.stop()
  }
}
