package graft.llm

import graft.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus: inverted-index term
  * statistics, TF-IDF weighting, and BM25 ranking — the data-selection
  * primitives a training-data pipeline uses to pull topical slices out of
  * a web-scale corpus ("find the docs most about X" without embeddings).
  *
  * Scale shape: everything is one explode + hash aggregates. A query only
  * ever touches postings for ITS terms — the `isin` filter sits below the
  * aggregation, so at 100 TB the shuffle carries a per-query sliver of
  * the corpus, not the corpus. Corpus-wide constants (N, avgdl) ride along
  * as a broadcast single-row frame — no driver-side `.collect()` feeding a
  * literal back into the plan.
  *
  * Determinism (oracle hash-parity): the per-(doc,term) weight is pure
  * IEEE double arithmetic both engines evaluate bit-identically; the
  * per-document sum uses [[Det.dsum]] (exact decimal accumulation, any
  * partition order) and the final score is [[Det.roundSafe]]d.
  */
object Retrieval {

  /** Postings with term frequencies: one row per (doc, term). */
  def postings(docs: DataFrame): DataFrame =
    tokenized(docs).groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))

  /** Document lengths in whitespace tokens. */
  def docLengths(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(TextOps.tokens).cast("long").as("dl"))

  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextOps.tokens).as("tok"))

  /** BM25 (Okapi, Lucene's positive-idf variant) top-k documents for a
    * bag-of-words query:
    *
    *   idf(t)    = ln((N - df + 0.5) / (df + 0.5) + 1)
    *   score(d)  = Σ_t idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * The postings aggregate runs over rows pre-filtered to the query's
    * terms; df/idf live in a ≤|query|-row broadcast. Scores are rounded
    * ([[Det.roundSafe]], 6 dp) and ties break on `doc_id` — a total
    * order, so top-k is reproducible under any partitioning.
    */
  def bm25TopK(docs: DataFrame, query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.distinct
    val lens = docLengths(docs)
    val consts = lens.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val post = tokenized(docs).filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfs = post.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = post.join(broadcast(dfs), "tok")
      .join(lens, "doc_id")
      .crossJoin(broadcast(consts))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("w", col("idf") * col("tf") /
        (col("tf") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    w.groupBy("doc_id").agg(Det.dsum(col("w"), 6).as("score"))
      .withColumn("score", Det.roundSafe(col("score"), 6))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Hybrid retrieval: the BM25 lexical ranking fused with a
    * query-by-example vector ranking via Reciprocal Rank Fusion (Cormack,
    * Clarke & Büttcher, SIGIR 2009): rrf(d) = Σ_source 1/(kRrf + rank),
    * a source missing the document contributing 0 — the standard fusion
    * in production RAG stacks because it needs no score calibration
    * between incomparable scales (BM25 logits vs cosine).
    *
    * Scale shape: each source ranks only its own top-`pool` candidates
    * (BM25 postings pre-filtered to the query's terms; cosine a broadcast
    * probe + TakeOrderedAndProject), so the rank windows and the fusion
    * join run over two ≤pool-row frames — driver-free, and the windows'
    * single-partition sort is bounded by `pool`, not the corpus. */
  def hybridRrf(docs: DataFrame, vectors: DataFrame, query: Seq[String],
      probeId: Long, k: Int, kRrf: Int = 60, pool: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, query, pool)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val vec = EmbeddingOps.cosineTopK(vectors, probeId, pool)
      .withColumn("vec_rank", row_number()
        .over(Window.orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", Det.roundSafe(
        coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("vec_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** TF-IDF document vectors restricted to a vocabulary: one row per
    * (doc, term) with weight tf · ln(N/df) — the classic smooth-free
    * form, exact-rational until the final ln. */
  def tfidf(docs: DataFrame, vocabulary: Seq[String]): DataFrame = {
    val terms = vocabulary.distinct
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val post = tokenized(docs).filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfs = post.groupBy("tok").agg(count(lit(1)).as("df"))
    post.join(broadcast(dfs), "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", Det.roundSafe(
        col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .select("doc_id", "tok", "tf", "df", "tfidf")
  }
}
