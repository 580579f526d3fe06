package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes the NEXT scale decade for [[ScaleCurve]] (sf0.1 → sf1) by
  * unioning key-shifted copies of the largest driver-generated dataset —
  * the 0.01→0.1 decade alone cannot expose superlinearity that only
  * bites past the small-SF noise floor (VERDICT r9 item #9).
  *
  * Shifts preserve referential integrity (orders.o_custkey moves with
  * customer.c_custkey, lineitem moves with all three parents) and the
  * fixed dimensions (region, nation) stay fixed, exactly like TPC-H
  * scaling. Non-relational corpora avoid DEGENERATE growth: document
  * text gains a per-copy suffix (10× exact duplicates would turn dedup
  * keys into one giant cluster — a different workload, not a bigger
  * one) and embeddings perturb one coordinate per copy for the same
  * reason. This is a DIAGNOSTIC dataset for slope measurement only —
  * correctness oracles always run against the driver's own data.
  *
  * Usage: runMain graft.ScaleData [srcDir] [outDir] [copies]
  * Defaults: /root/testdata/sf0.1 → /tmp/graft_sf1 × 10. Idempotent
  * (AtomicStore-published; an existing complete dataset is kept).
  */
object ScaleData {

  /** Key offsets per copy — far above any real key at sf0.1. */
  private val K = 1_000_000_000L

  def generate(spark: SparkSession, src: String, out: String,
      copies: Int): String =
    graft.sources.AtomicStore.materialize(out) { tmp =>
      def scaled(name: String, shift: DataFrame => Int => DataFrame): Unit = {
        val base = spark.read.parquet(s"$src/$name.parquet")
        (0 until copies).map(i => shift(base)(i))
          .reduce(_.unionByName(_))
          .write.parquet(s"$tmp/$name.parquet")
      }
      def bump(c: String, i: Int)(df: DataFrame): DataFrame =
        df.withColumn(c, col(c) + lit(i * K))
      // fixed dimensions: copied once, never scaled (TPC-H's rule)
      Seq("region", "nation").foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.parquet(s"$tmp/$t.parquet")
      }
      scaled("customer", df => i => bump("c_custkey", i)(df))
      scaled("supplier", df => i => bump("s_suppkey", i)(df))
      scaled("part", df => i => bump("p_partkey", i)(df))
      scaled("orders", df => i =>
        bump("o_orderkey", i)(bump("o_custkey", i)(df)))
      scaled("lineitem", df => i =>
        bump("l_orderkey", i)(bump("l_partkey", i)(bump("l_suppkey", i)(df))))
      scaled("events", df => i =>
        bump("event_id", i)(bump("user_id", i)(df)))
      // copies must be DISSIMILAR to their originals, not just distinct:
      // a per-copy suffix alone would make every doc ~Jaccard-1.0 to its
      // 9 copies, and the true near-dup pair count — the OUTPUT of the
      // dedup keys — would grow quadratically with copies, reading as a
      // superlinear cost law that is really a workload change. Tagging
      // EVERY word decorrelates the copies' shingle spaces entirely while
      // replicating the within-copy duplicate-cluster structure — pair
      // counts scale linearly, "10× more data of the same character".
      scaled("documents", df => i =>
        bump("doc_id", i)(df)
          .withColumn("text",
            if (i == 0) col("text")
            else expr(s"array_join(transform(split(text, ' '), " +
              s"w -> concat(w, '~$i')), ' ')"))
          .withColumn("n_chars", length(col("text")).cast("long")))
      scaled("embeddings", df => i =>
        bump("vec_id", i)(df)
          .withColumn("embedding",
            if (i == 0) col("embedding")
            else expr(s"transform(embedding, (x, j) -> " +
              s"IF(j = 0, x + float(${i * 1e-4}), x))")))
    }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val path = generate(spark, src, out, copies)
    println(s"[scaledata] $copies x $src -> $path")
    spark.stop()
  }
}
