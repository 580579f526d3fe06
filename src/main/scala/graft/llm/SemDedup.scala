package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
  * arXiv:2303.09540): k-means-cluster the embedding space, then call two
  * items duplicates when their cosine similarity inside a cluster clears
  * a threshold — removing semantically redundant training data that
  * exact/minhash dedup (which see tokens, not meaning) can never catch.
  *
  * Scale shape: the quadratic pair search is confined to each k-means
  * cluster — the same coarse quantizer as the IVF ANN index, and the
  * SAME PREBUILT MODEL ([[IvfIndex.forEmbeddings]]), so the k-means fit
  * is ingest-time work shared with vector search, never a per-query cost.
  * With k sized so clusters average n/k ≪ √n, the per-cluster self-join
  * is tractable at any corpus size and shuffles once on `list_id`; a
  * pathological mega-cluster shows up as one skewed partition — raise k
  * (the paper uses k ≈ n/200) or let AQE split it.
  *
  * Keep rule (deterministic, join-expressible): within a duplicate pair
  * the member FARTHER from its centroid survives — the paper's
  * "keep low centroid-similarity" choice, which preserves the cluster's
  * outer shell where the information is. A row is removed iff SOME
  * same-cluster near-duplicate dominates it (higher centroid distance,
  * vec_id as the total tie-break), so the decision is one aggregated
  * self-join — no iterative connected components on the hot path.
  */
object SemDedup {

  /** Same-cluster pairs with cosine ≥ `eps`: (list_id, vec_a, vec_b, sim),
    * vec_a < vec_b. The self-join key is the cluster id, so candidate
    * generation is linear in Σ cluster² — the SemDeDup bound — not n². */
  def semanticDupPairs(assigned: DataFrame, eps: Double): DataFrame = {
    graft.functions.GraftFunctions.register(assigned.sparkSession)
    val a = assigned.select(col("list_id"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"))
    val b = assigned.select(col("list_id"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    a.join(b, Seq("list_id"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", graft.Det.roundSafe(
        EmbeddingOps.cosine("ea", "eb"), 6))
      .filter(col("sim") >= eps)
      .select("list_id", "vec_a", "vec_b", "sim")
  }

  /** The surviving rows of `assigned` (vec_id, label, embedding, list_id)
    * after semantic dedup at threshold `eps`, given the cluster centroids
    * (k rows — broadcast). */
  def removeSemanticDuplicates(assigned: DataFrame,
      centroids: DataFrame, eps: Double): DataFrame = {
    graft.functions.GraftFunctions.register(assigned.sparkSession)
    // centroid similarity: one broadcast join (k rows) + codegen cosine
    // (cosine_sim is monomorphic over array<float> — cast the double
    // centroids once, a k-row cost)
    val withC = assigned
      .join(broadcast(centroids
        .withColumn("centroid", col("centroid").cast("array<float>"))),
        Seq("list_id"))
      .withColumn("ccos", graft.Det.roundSafe(
        EmbeddingOps.cosine("embedding", "centroid"), 6))
    val lhs = withC.select(col("list_id"), col("vec_id"),
      col("embedding").as("ea"), col("ccos"))
    val rhs = withC.select(col("list_id"), col("vec_id").as("other_id"),
      col("embedding").as("eb"), col("ccos").as("other_ccos"))
    // a row loses iff a same-cluster near-duplicate sits FARTHER from the
    // centroid (the survivor), with vec_id breaking exact ties totally
    val losers = lhs.join(rhs, Seq("list_id"))
      .filter(col("vec_id") =!= col("other_id"))
      .filter(graft.Det.roundSafe(EmbeddingOps.cosine("ea", "eb"), 6) >= eps)
      .filter(col("other_ccos") < col("ccos") ||
        (col("other_ccos") === col("ccos") && col("other_id") < col("vec_id")))
      .select(col("vec_id")).distinct()
    assigned.join(losers, Seq("vec_id"), "left_anti")
  }

  /** Survivor set for the embeddings table of `sfDir`, clustered by the
    * SHARED persisted IVF model (k lists, fixed seed). */
  def forEmbeddings(spark: SparkSession, sfDir: String, k: Int = 16,
      eps: Double = 0.6): DataFrame = {
    val m = IvfIndex.forEmbeddings(spark, sfDir, k)
    import spark.implicits._
    val cents = m.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("list_id", "centroid")
    removeSemanticDuplicates(m.assigned, cents, eps)
  }
}
