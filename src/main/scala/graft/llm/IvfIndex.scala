package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: k-means coarse quantizer + per-centroid
  * posting lists — the other standard scale path for similarity search
  * next to LSH ([[EmbeddingOps]]).
  *
  * Train: cluster the vectors (MLlib KMeans, fixed seed); assign each
  * vector to its nearest centroid. Search: score the query against the K
  * centroids (driver-side, K is small), take the `nProbe` nearest lists,
  * and rank ONLY those lists' vectors by exact cosine. At 10^9 vectors and
  * K=4096/nProbe=64 this scans ~1.6% of the table; the assignment column
  * also makes the posting lists a natural partitioning key for storage.
  *
  * Recall/latency trade-off is (K, nProbe); [[IvfSpec]] measures recall
  * against the brute-force top-k.
  */
object IvfIndex {

  case class Model(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Persist the index: posting lists as parquet PARTITIONED BY `list_id`
    * (so a search's `nProbe` lists prune to `nProbe` directories at scan
    * time) plus the small centroid table. Build once at ingest, search
    * many times — the lifecycle the reference's load/query split implies.
    */
  def save(m: Model, path: String): Unit = {
    val spark = m.assigned.sparkSession
    import spark.implicits._
    m.assigned.write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/assigned")
    m.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    Model(centroids, spark.read.parquet(s"$path/assigned"))
  }

  // one prebuilt index per (embeddings dir, k) per JVM; the on-disk copy
  // survives the JVM so repeated sessions skip the k-means fit entirely
  private val prebuilt = scala.collection.concurrent.TrieMap.empty[String, Model]

  /** The prebuilt index over `<sfDir>/embeddings.parquet`: load it from the
    * deterministic index location, building + saving it first only if it
    * has never been materialized. Queries must come through here so the
    * k-means fit stays a setup cost, never a per-query one.
    */
  def forEmbeddings(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      k: Int = 16): Model =
    prebuilt.getOrElseUpdate(s"$sfDir#$k", {
      // path carries every build input: the dataset dir and k (the seed is
      // fixed), keyed collision-resistantly (SHA-256, not 32-bit hashCode).
      // AtomicStore publishes the two parquet writes with one rename, so a
      // crash mid-save can never wedge a half-written index.
      val base = s"${sys.props("java.io.tmpdir")}/graft_ivf_" +
        s"${graft.sources.AtomicStore.key(sfDir)}_$k"
      val path = graft.sources.AtomicStore.materialize(base)(tmp =>
        save(build(graft.sources.Tables.embeddings(spark, sfDir), k), tmp))
      // serve reads from the partitioned on-disk layout, not the in-memory
      // lineage, so list_id pruning is real
      load(spark, path)
    })

  /** Train the quantizer and assign every vector to a list (adds
    * `list_id`). Deterministic for a fixed seed and input. */
  def build(vectors: DataFrame, k: Int, seed: Long = 42L): Model = {
    val withVec = vectors.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val km = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("list_id")
    val model = km.fit(withVec)
    val assigned = model.transform(withVec).drop("features")
    Model(model.clusterCenters.map(_.toArray), assigned)
  }

  /** Exact-cosine top-k over the `nProbe` nearest posting lists. */
  def search(m: Model, probeId: Long, k: Int, nProbe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(m.assigned.sparkSession)
    val probeRow = m.assigned.filter(col("vec_id") === probeId)
      .select("embedding").head()
    val probeVec = probeRow.getSeq[Float](0).map(_.toDouble).toArray
    val ranked = m.centroids.zipWithIndex
      .map { case (c, i) => (i, cosineScalar(c, probeVec)) }
      .sortBy(-_._2).take(nProbe).map(_._1)
    val probeEmb = m.assigned.filter(col("vec_id") === probeId)
      .select(col("embedding").as("pe"))
    m.assigned
      .filter(col("list_id").isin(ranked.toSeq: _*) && col("vec_id") =!= probeId)
      .crossJoin(broadcast(probeEmb))
      .withColumn("sim", graft.Det.roundSafe(EmbeddingOps.cosine("embedding", "pe"), 6))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("sim"))
  }

  private def cosineScalar(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
