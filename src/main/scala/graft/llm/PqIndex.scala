package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) ANN: the compressed-domain scale path next to
  * LSH ([[EmbeddingOps]]) and IVF ([[IvfIndex]]).
  *
  * Train: split each `Dim`-dim vector into `M` contiguous subvectors and
  * fit an independent `K`-centroid k-means per subspace (MLlib, fixed
  * seed). Encode: each vector becomes `M` small ints (nearest centroid per
  * subspace) — 64 floats (256 B) shrink to 8 codes (≈8 B), so a 100 TB
  * embedding corpus scans as ≈3 TB of codes.
  *
  * Search (ADC — asymmetric distance computation): the query stays exact;
  * per subspace, its dot product against all K centroids is precomputed
  * driver-side (`M×K` entries, broadcast as a literal array), and each
  * stored vector's approximate dot product is then `M` table lookups over
  * its codes — no float arrays are read, the scan touches only the narrow
  * codes table. Approximate cosine divides by the codes-reconstructed norm
  * (a second `M×K` lookup table of centroid self-dots). The ADC top
  * `rerank` candidates re-join the full embeddings BY ID for an exact
  * cosine rerank, so approximation affects recall only, never the
  * reported similarity values.
  *
  * Recall/latency trade-off is (M, K, rerank); [[PqSpec]] measures recall
  * against the brute-force top-k.
  */
object PqIndex {

  val Dim = 64
  val M = 16         // subspaces
  val SubDim: Int = Dim / M
  val K = 16         // centroids per subspace (256 at production scale)

  /** codebooks(m)(k) = centroid k of subspace m (SubDim doubles);
    * codes = (vec_id, label, code array<int> of length M). */
  case class Model(codebooks: Array[Array[Array[Double]]], codes: DataFrame)

  /** Fit the per-subspace quantizers and encode every vector.
    * Deterministic for a fixed seed and input. One k-means per subspace is
    * ingest-time work (like [[IvfIndex.build]]'s single fit); encoding is
    * M narrow transforms over subvector slices. */
  def build(vectors: DataFrame, seed: Long = 42L): Model = {
    val books = Array.ofDim[Array[Array[Double]]](M)
    var coded = vectors
    (0 until M).foreach { m =>
      val sub = coded.withColumn("__sub",
        array_to_vector(slice(col("embedding"), m * SubDim + 1, SubDim)
          .cast("array<double>")))
      val km = new KMeans().setK(K).setSeed(seed + m)
        .setFeaturesCol("__sub").setPredictionCol(s"__c$m")
      val model = km.fit(sub)
      books(m) = model.clusterCenters.map(_.toArray)
      coded = model.transform(sub).drop("__sub")
    }
    val codes = coded.withColumn("code",
        array((0 until M).map(m => col(s"__c$m")): _*))
      .select(col("vec_id"), col("label"), col("code"))
    Model(books, codes)
  }

  /** Persist codes + codebooks; atomic publication via the caller's
    * AtomicStore.materialize (same lifecycle as [[IvfIndex.save]]). */
  def save(m: Model, path: String): Unit = {
    val spark = m.codes.sparkSession
    import spark.implicits._
    m.codes.write.mode("overwrite").parquet(s"$path/codes")
    m.codebooks.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (c, k) => (sub, k, c.toSeq) }
    }.toSeq.toDF("sub", "centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  def load(spark: SparkSession, path: String): Model = {
    val books = Array.fill(M)(Array.ofDim[Array[Double]](K))
    spark.read.parquet(s"$path/codebooks").collect().foreach { r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    Model(books, spark.read.parquet(s"$path/codes"))
  }

  // one prebuilt index per embeddings dir per JVM; the on-disk copy
  // survives the JVM so repeated sessions skip the k-means fits
  private val prebuilt = scala.collection.concurrent.TrieMap.empty[String, Model]

  /** The prebuilt PQ index over `<sfDir>/embeddings.parquet` (built and
    * atomically published once; searches never re-fit or re-encode). */
  def forEmbeddings(spark: SparkSession, sfDir: String): Model =
    prebuilt.getOrElseUpdate(sfDir, {
      val base = s"${sys.props("java.io.tmpdir")}/graft_pq_" +
        graft.sources.AtomicStore.key(sfDir, M.toString, K.toString)
      val path = graft.sources.AtomicStore.materialize(base)(tmp =>
        save(build(graft.sources.Tables.embeddings(spark, sfDir)), tmp))
      load(spark, path)
    })

  /** The approximate-cosine ADC scoring column over a `code` array column:
    * per-subspace lookup tables computed once driver-side (`M×K` entries,
    * inlined as literal arrays) — dtab = dot(query_sub, centroid), ntab =
    * |centroid|² — then
    * approx_cos = Σ_m dtab[m][code_m] / (|q| · sqrt(Σ_m ntab[m][code_m])):
    * pure codegen'd lookups, no vector arithmetic in the scan. */
  private[llm] def adcCosine(codebooks: Array[Array[Array[Double]]],
      probe: Array[Double]): org.apache.spark.sql.Column = {
    val dtab = Array.tabulate(M, K) { (m, kk) =>
      val c = codebooks(m)(kk)
      var d = 0.0; var i = 0
      while (i < SubDim) { d += probe(m * SubDim + i) * c(i); i += 1 }
      d
    }
    val ntab = Array.tabulate(M, K) { (m, kk) =>
      val c = codebooks(m)(kk)
      var n = 0.0; var i = 0
      while (i < SubDim) { n += c(i) * c(i); i += 1 }
      n
    }
    val qNorm = math.sqrt(probe.map(x => x * x).sum)
    def flat(t: Array[Array[Double]]): String =
      t.flatten.mkString("array(", ", ", ")")
    def lut(tab: String): String =
      s"aggregate(transform(sequence(0, ${M - 1}), " +
        s"j -> element_at($tab, j * $K + element_at(code, j + 1) + 1)), " +
        "0D, (a, x) -> a + x)"
    expr(lut(flat(dtab))) / (lit(qNorm) * sqrt(expr(lut(flat(ntab)))))
  }

  private[llm] def probeVector(vectors: DataFrame, probeId: Long): Array[Double] =
    vectors.filter(col("vec_id") === probeId)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray

  /** Exact-cosine rerank of an ADC candidate id set: broadcast the (small)
    * candidate frame into the vectors table, never the reverse. */
  private[llm] def rerankExact(cands: DataFrame, vectors: DataFrame,
      probeId: Long, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val probeEmb = vectors.filter(col("vec_id") === probeId)
      .select(col("embedding").as("pe"))
    broadcast(cands).join(vectors, "vec_id")
      .crossJoin(broadcast(probeEmb))
      .withColumn("sim",
        graft.Det.roundSafe(EmbeddingOps.cosine("embedding", "pe"), 6))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("sim"))
  }

  /** ADC search: scan ONLY the codes table for approximate scores, take
    * the top `rerank` candidates (TakeOrderedAndProject over narrow rows),
    * then exact-cosine rerank just those against the full vectors. */
  def search(model: Model, vectors: DataFrame, probeId: Long, k: Int,
      rerank: Int = 50): DataFrame = {
    val probe = probeVector(vectors, probeId)
    val cands = model.codes.filter(col("vec_id") =!= probeId)
      .withColumn("adc", adcCosine(model.codebooks, probe))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(rerank)
      .select("vec_id")
    rerankExact(cands, vectors, probeId, k)
  }
}
