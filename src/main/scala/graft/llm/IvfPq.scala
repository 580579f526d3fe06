package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF+PQ — the composition of the two ANN indexes, and the architecture
  * production vector stores standardize on: the IVF coarse quantizer
  * ([[IvfIndex]]) prunes the scan to `nProbe` of `k` posting lists, and
  * within those lists the PQ code table ([[PqIndex]]) is scanned in the
  * compressed domain (ADC lookups, no float arrays). At 10^9 vectors,
  * k=4096 / nProbe=64 / 16-byte codes means reading ~1.6% of a table
  * that is itself ~16× narrower than the embeddings — a ~1000× scan
  * reduction over brute force, paid for at ingest.
  *
  * This is the IVF+PQ-"flat-codes" variant: codes quantize the RAW
  * vectors with the global PQ codebooks rather than per-list residuals
  * (classic IVFADC). Residual encoding buys accuracy at the same code
  * size but needs per-list lookup tables (k·M·K entries per query);
  * recall here is recovered the same way as everywhere else in this
  * module — an exact rerank of the top ADC candidates — so the
  * simpler encoding changes candidate quality only, never reported
  * similarities. [[IvfPqSpec]] measures the recall.
  *
  * Storage: the code table persists PARTITIONED BY `list_id`, so a
  * search's `nProbe` lists prune to `nProbe` directories at scan time —
  * the same layout contract as [[IvfIndex]], carrying codes instead of
  * vectors.
  */
object IvfPq {

  case class Model(centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], codes: DataFrame)

  /** Fit both quantizers and produce the list-tagged code table. Both fits
    * are ingest-time work; deterministic for fixed seed and input. */
  def build(vectors: DataFrame, k: Int, seed: Long = 42L): Model = {
    val ivf = IvfIndex.build(vectors, k, seed)
    val pq = PqIndex.build(vectors, seed)
    Model(ivf.centroids, pq.codebooks,
      pq.codes.join(ivf.assigned.select("vec_id", "list_id"), "vec_id"))
  }

  def save(m: Model, path: String): Unit = {
    val spark = m.codes.sparkSession
    import spark.implicits._
    m.codes.write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/codes")
    m.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    m.codebooks.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (c, kk) => (sub, kk, c.toSeq) }
    }.toSeq.toDF("sub", "centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  def load(spark: SparkSession, path: String): Model = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val books = Array.fill(PqIndex.M)(Array.ofDim[Array[Double]](PqIndex.K))
    spark.read.parquet(s"$path/codebooks").collect().foreach { r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    Model(centroids, books, spark.read.parquet(s"$path/codes"))
  }

  private val prebuilt = scala.collection.concurrent.TrieMap.empty[String, Model]

  /** The prebuilt persisted index over `<sfDir>/embeddings.parquet` —
    * built and atomically published once, served from the `list_id`-
    * partitioned on-disk layout so partition pruning is real. */
  def forEmbeddings(spark: SparkSession, sfDir: String, k: Int = 16): Model =
    prebuilt.getOrElseUpdate(s"$sfDir#$k", {
      val base = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_" +
        graft.sources.AtomicStore.key(sfDir, k.toString,
          PqIndex.M.toString, PqIndex.K.toString)
      val path = graft.sources.AtomicStore.materialize(base)(tmp =>
        save(build(graft.sources.Tables.embeddings(spark, sfDir), k), tmp))
      load(spark, path)
    })

  /** Search: rank the `k` coarse centroids against the probe driver-side,
    * ADC-scan ONLY the `nProbe` nearest lists' codes (partition-pruned),
    * exact-rerank the top candidates. */
  def search(m: Model, vectors: DataFrame, probeId: Long, k: Int,
      nProbe: Int, rerank: Int = 50): DataFrame = {
    val probe = PqIndex.probeVector(vectors, probeId)
    val ranked = m.centroids.zipWithIndex.map { case (c, i) =>
      var dot = 0.0; var na = 0.0; var i2 = 0
      val n = math.min(c.length, probe.length)
      while (i2 < n) { dot += c(i2) * probe(i2); na += c(i2) * c(i2); i2 += 1 }
      (i, dot / math.sqrt(na))
    }.sortBy(-_._2).take(nProbe).map(_._1)
    val cands = m.codes
      .filter(col("list_id").isin(ranked.toSeq: _*) && col("vec_id") =!= probeId)
      .withColumn("adc", PqIndex.adcCosine(m.codebooks, probe))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(rerank)
      .select("vec_id")
    PqIndex.rerankExact(cands, vectors, probeId, k)
  }
}
