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
    * `list_id`). Deterministic for a fixed seed and input. The fit is
    * MLlib's; the ASSIGNMENT is the canonical [[assignWith]] expression,
    * so a vector appended later ([[append]]) gets bit-identically the
    * same list as it would in a one-shot build at the same centroids. */
  def build(vectors: DataFrame, k: Int, seed: Long = 42L): Model = {
    val centers = fitCentroids(vectors, k, seed)
    Model(centers, assignWith(centers, vectors))
  }

  /** Canonicalize a FIT input: content-deterministic partitioning and
    * in-partition order, so the seeded k-means yields the SAME model
    * for the same vector SET regardless of upstream lineage or
    * partitioning — what makes a refit on an undrifted corpus a no-op
    * and a refit on a drifted corpus identical to a fresh build. One
    * shuffle of the training input, paid at ingest/refit cadence only
    * (at 100 TB the fit input is a sample anyway). */
  private[llm] def canonicalFit(df: DataFrame): DataFrame =
    df.repartition(8, col("vec_id")).sortWithinPartitions("vec_id")

  private def fitCentroids(vectors: DataFrame, k: Int,
      seed: Long): Array[Array[Double]] = {
    val withVec = canonicalFit(vectors).withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val km = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("__ignored")
    km.fit(withVec).clusterCenters.map(_.toArray)
  }

  /** The canonical list assigner: nearest centroid by squared Euclidean
    * distance, FIRST minimum on a tie — one deterministic codegen'd
    * expression (exact double arithmetic in a fixed order), shared by
    * build and append so "same centroids ⇒ same list" holds exactly.
    * Centroids inline as a literal (k·dim doubles — fine at gate scale;
    * at production k=4096 the same argmin runs against a broadcast
    * centroid table). */
  private[llm] def assignExpr(centroids: Array[Array[Double]]):
      org.apache.spark.sql.Column = {
    val k = centroids.length
    val dim = centroids(0).length
    val flat = centroids.flatten.mkString("array(", ", ", ")")
    val dist = (i: String) =>
      s"aggregate(sequence(0, ${dim - 1}), 0D, (a, j) -> a + " +
        s"pow(element_at(__e, j + 1) - " +
        s"element_at($flat, $i * $dim + j + 1), 2))"
    val dists = s"transform(sequence(0, ${k - 1}), i -> ${dist("i")})"
    expr(s"cast(array_position($dists, array_min($dists)) - 1 as int)")
  }

  /** Assign each vector to its nearest EXISTING centroid (no re-fit). */
  def assignWith(centroids: Array[Array[Double]],
      vectors: DataFrame): DataFrame =
    vectors
      .withColumn("__e", col("embedding").cast("array<double>"))
      .withColumn("list_id", assignExpr(centroids))
      .drop("__e")

  // ---- appendable persisted lifecycle (the LshIndex contract) --------

  import graft.sources.{AtomicStore, SegmentedStore}

  private def writeModel(centroids: Array[Array[Double]], root: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    AtomicStore.materialize(s"$root/model") { tmp =>
      centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("centroid_id", "centroid")
        .coalesce(1).write.parquet(tmp)
    }: Unit
  }

  /** The CURRENT model directory: the highest `modelNNNNN` at or below
    * the highest live base when a [[refit]] has produced one, else the
    * era-0 `model`. Keying refitted models to their base number is what
    * makes refit crash-consistent: a model published ABOVE every live
    * base (its re-encoded base not yet out) is invisible, so resolution
    * always lands on the model the live entries were encoded with —
    * including after later compactions renumber the base upward. */
  private[llm] def modelPath(root: String): String = {
    val maxBase = SegmentedStore.bases(root).maxOption.getOrElse(-1)
    AtomicStore.list(root).flatMap(f => f.getPath.getName match {
      case RefitModelRe(n) if n.toInt <= maxBase &&
        AtomicStore.isComplete(f.getPath.toString) => Some(n.toInt)
      case _ => None
    }).maxOption
      .map(n => f"$root%s/model$n%05d")
      .getOrElse(s"$root/model")
  }
  private val RefitModelRe = "model(\\d{5,})".r

  /** The persisted model — the IMMUTABLE part of an appendable index:
    * append assigns against these centroids, never re-fits (a [[refit]]
    * publishes a NEW model+base pair; it never mutates this one). */
  def centroidsOf(spark: org.apache.spark.sql.SparkSession,
      root: String): Array[Array[Double]] =
    spark.read.parquet(modelPath(root))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)

  private def writeSegment(centroids: Array[Array[Double]],
      vectors: DataFrame, dest: String, sign: Int = 1): Unit =
    AtomicStore.materialize(dest) { tmp =>
      SegmentedStore.writePartitioned(
        assignWith(centroids, vectors).withColumn("sign", lit(sign)),
        tmp, "list_id")
      if (sign < 0) SegmentedStore.flagSigned(tmp)
    }: Unit

  /** Bootstrap an APPENDABLE index: fit the quantizer on the initial
    * corpus, persist it as the immutable model, and write the corpus as
    * segment 1. Idempotent per root. */
  def create(vectors: DataFrame, root: String, k: Int,
      seed: Long = 42L): Unit = {
    val spark = vectors.sparkSession
    if (!AtomicStore.isComplete(s"$root/model"))
      writeModel(fitCentroids(vectors, k, seed), root, spark)
    writeSegment(centroidsOf(spark, root), vectors,
      SegmentedStore.segPath(root, 1))
  }

  /** Index an ARRIVING batch as the next segment: assign to the
    * EXISTING centroids (no k-means re-fit, no touch of prior
    * segments) — the continuous-ingest path a rebuild-only index
    * lacks. Returns the segment number. */
  def append(vectors: DataFrame, root: String): Int = {
    val spark = vectors.sparkSession
    val n = SegmentedStore.nextN(root)
    writeSegment(centroidsOf(spark, root), vectors,
      SegmentedStore.segPath(root, n))
    n
  }

  /** Retract vectors as a SIGNED (−1) segment — the takedown/recrawl
    * path a create/append-only index lacks. The batch must carry the
    * vectors AS INDEXED (same vec_id, same embedding: the assignment
    * expression re-derives the identical `list_id`, so the −1 row
    * cancels the earlier +1 exactly at the read fold). Returns the
    * segment number. */
  def remove(vectors: DataFrame, root: String): Int = {
    val spark = vectors.sparkSession
    val n = SegmentedStore.nextN(root)
    writeSegment(centroidsOf(spark, root), vectors,
      SegmentedStore.segPath(root, n), sign = -1)
    n
  }

  /** Live fold depth of the appendable index (0 = not created). */
  def segmentCount(root: String): Int = SegmentedStore.liveCount(root)

  /** The appendable index as a searchable [[Model]]: model centroids +
    * the live entries (each `list_id`-partitioned, so probes prune
    * inside every entry) — a plain union until some live entry carries
    * tombstones, then the sign net-fold (whose `list_id` grouping key
    * keeps probe pruning pushable below the aggregate). */
  def readIndex(spark: org.apache.spark.sql.SparkSession,
      root: String): Model = {
    val live = SegmentedStore.liveEntries(root)
    require(live.nonEmpty, s"no IVF index under $root — create() first")
    Model(centroidsOf(spark, root),
      SegmentedStore.readFolded(spark, live).drop("sign"))
  }

  /** Fold the live entries into ONE base (probe-identical: the same
    * net-fold every read applies, re-partitioned by `list_id` — removed
    * vectors leave the artifact here), then drop the superseded
    * entries. */
  def compact(spark: org.apache.spark.sql.SparkSession,
      root: String): Int =
    SegmentedStore.compactWith(root) { (live, tmp) =>
      SegmentedStore.writePartitioned(
        SegmentedStore.readFolded(spark, live), tmp, "list_id")
    }

  /** Compact when the fold depth exceeds `maxSegments` — the retention
    * policy an ingest loop calls after each [[append]]. */
  def compactIfDeep(spark: org.apache.spark.sql.SparkSession,
      root: String, maxSegments: Int = 8): Unit =
    if (segmentCount(root) > maxSegments) compact(spark, root): Unit

  /** MODEL REFRESH under distribution drift: re-train the coarse
    * quantizer on the CURRENT live vectors (tombstoned vectors are
    * already net-folded out — removals survive the refit) and publish a
    * re-encoded base at the new model. The drift-recovery path
    * [[create]]/[[append]] lack: a corpus whose embedding distribution
    * moved keeps its recall without a from-scratch rebuild.
    *
    * Publish discipline: compact to one base at the OLD model, fit, then
    * write `model{n+1}` BEFORE `base{n+1}` — [[centroidsOf]] resolves
    * the model matched to the highest LIVE base, so every crash window
    * serves a consistent (model, encoding) pair; the final cleanup
    * drops the superseded base and stale refit models. Deterministic:
    * an UNdrifted corpus re-fits to the identical centroids (fixed
    * seed, same input), so search is probe-identical across a
    * no-op refit. */
  def refit(spark: org.apache.spark.sql.SparkSession, root: String,
      seed: Long = 42L): Unit = {
    compact(spark, root): Unit
    val old = SegmentedStore.liveEntries(root)
    require(old.nonEmpty, s"no IVF index under $root — create() first")
    val k = centroidsOf(spark, root).length
    val vectors = SegmentedStore.readFolded(spark, old)
      .drop("sign").drop("list_id")
    val centers = fitCentroids(vectors, k, seed)
    val n = SegmentedStore.nextN(root)
    AtomicStore.materialize(f"$root%s/model$n%05d") { tmp =>
      import spark.implicits._
      centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("centroid_id", "centroid")
        .coalesce(1).write.parquet(tmp)
    }: Unit
    AtomicStore.materialize(SegmentedStore.basePath(root, n)) { tmp =>
      SegmentedStore.writePartitioned(
        assignWith(centers, vectors).withColumn("sign", lit(1)),
        tmp, "list_id")
    }: Unit
    // cleanup: superseded bases/segments and stale refit models below n
    SegmentedStore.bases(root).filter(_ < n).foreach { b =>
      AtomicStore.delete(SegmentedStore.basePath(root, b))
      AtomicStore.delete(f"$root%s/model$b%05d")
    }
    SegmentedStore.segments(root).filter(_ < n).foreach(s =>
      AtomicStore.delete(SegmentedStore.segPath(root, s)))
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
