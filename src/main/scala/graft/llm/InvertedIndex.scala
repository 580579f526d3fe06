package graft.llm

import graft.Det
import graft.sources.{AtomicStore, SegmentedStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED, INCREMENTALLY MAINTAINED inverted index — the retrieval
  * stats [[Retrieval]] recomputes from raw text on every call, built once
  * at ingest and advanced from a document change feed instead.
  *
  * Why: at 100 TB, `Retrieval.bm25TopK` re-tokenizing the corpus per
  * query is the anti-pattern — correct, but the whole text column scans
  * and explodes for stats that only change when documents change. Here
  * the artifact is persisted once and every query reads (a) the narrow
  * doc-length table and (b) ONLY its own terms' postings partitions.
  *
  * The additive trick (the [[graft.operators.IncrementalAgg]] rule as a
  * persisted artifact): tf, df, dl, N, Σdl are all SUMS when rows carry a
  * ±1 `sign` — an added doc contributes its postings at +1, a removed doc
  * the SAME rows at −1, and every statistic is a sign-weighted sum:
  *
  *   tf(d,t) = Σ sign·tf      df(t) = Σ sign      (over (d,t) rows)
  *   dl(d)   = Σ sign·dl      N     = Σ sign      avgdl = Σ sign·dl / N
  *
  * so maintenance is pure segment APPEND ([[SegmentedStore]]'s immutable
  * lifecycle, shared with the LSH/IVF/PQ indexes) and a query folds live
  * segments with one tiny aggregation over its pruned sliver.
  *
  * Layout per segment: `postings` (doc_id, tok, tf, sign) PARTITIONED BY
  * `bkt` = xxhash64(tok) mod [[Buckets]] — a query's `isin` over its
  * terms' buckets prunes at scan time, the "read only the query terms'
  * partitions" contract (raw-token partitioning would mint one directory
  * per distinct term; bucketing keeps the directory count fixed) — plus
  * `doclens` (doc_id, dl, sign), narrow and unpartitioned.
  *
  * BM25 over the index is BITWISE the recompute's scores: identical
  * tokenization, identical idf/weight arithmetic, [[Det.dsum]]'d sums —
  * `q_text_bm25_indexed` lands on `q_text_bm25`'s DuckDB oracle.
  */
object InvertedIndex {

  /** Token-hash partition count: every segment scan prunes to the query
    * terms' buckets. 64 keeps directories bounded; at production corpus
    * sizes raise it with the data (it is a layout constant per index). */
  val Buckets = 64

  private def bkt = pmod(xxhash64(col("tok")), lit(Buckets))

  private def segmentOf(docs: DataFrame, sign: Int): (DataFrame, DataFrame) = {
    val post = docs
      .select(col("doc_id"), explode(TextOps.tokens).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .withColumn("sign", lit(sign))
      .withColumn("bkt", bkt)
    val lens = docs
      .select(col("doc_id"), size(TextOps.tokens).cast("long").as("dl"))
      .withColumn("sign", lit(sign))
    (post, lens)
  }

  // empty-batch-safe partitioned write (empty batch, all-retracted
  // compaction) — see SegmentedStore.writePartitioned
  private def writePostings(post: DataFrame, dest: String): Unit =
    SegmentedStore.writePartitioned(post, dest, "bkt")

  private def writeSegment(docs: DataFrame, sign: Int,
      dest: String): Unit =
    AtomicStore.materialize(dest) { tmp =>
      val (post, lens) = segmentOf(docs, sign)
      writePostings(post, s"$tmp/postings")
      lens.write.parquet(s"$tmp/doclens")
    }: Unit

  /** Build the index over the initial corpus as segment 1. Idempotent
    * per root. */
  def create(docs: DataFrame, root: String): Unit =
    writeSegment(docs, 1, SegmentedStore.segPath(root, 1))

  /** Index ARRIVING documents as the next (+1) segment — existing
    * segments never re-tokenize. */
  def add(docs: DataFrame, root: String): Int = {
    val n = SegmentedStore.nextN(root)
    writeSegment(docs, 1, SegmentedStore.segPath(root, n))
    n
  }

  /** Retract documents as a (−1) segment: the change feed carries the
    * removed docs' text, so their postings re-derive here and cancel the
    * earlier +1 rows exactly — every stat is additive in the sign. */
  def remove(docs: DataFrame, root: String): Int = {
    val n = SegmentedStore.nextN(root)
    writeSegment(docs, -1, SegmentedStore.segPath(root, n))
    n
  }

  /** Live fold depth (0 = not created). */
  def segmentCount(root: String): Int = SegmentedStore.liveCount(root)

  private def readAll(spark: SparkSession, root: String,
      name: String): DataFrame = {
    val live = SegmentedStore.liveEntries(root)
    require(live.nonEmpty, s"no inverted index under $root — create() first")
    live.map(p => spark.read.parquet(s"$p/$name")).reduce(_.unionByName(_))
  }

  /** Fold live entries into ONE base of net rows (zero-net rows drop, so
    * fully-retracted docs leave the artifact), then drop the superseded
    * entries — probe-identical before and after. */
  def compact(spark: SparkSession, root: String): Int =
    SegmentedStore.compactWith(root) { (live, tmp) =>
      val post = live.map(p => spark.read.parquet(s"$p/postings"))
        .reduce(_.unionByName(_))
        .groupBy("bkt", "doc_id", "tok")
        .agg(sum(col("sign") * col("tf")).as("tf"))
        // `> 0`, matching the READ paths' filters — a negative-net row
        // (a remove with no matching add: garbage input) is invisible to
        // every query pre-compaction and must not resurrect with a
        // negative tf/dl rewritten at sign=1 post-compaction
        .filter(col("tf") > 0L)
        .withColumn("sign", lit(1))
      writePostings(post, s"$tmp/postings")
      val lens = live.map(p => spark.read.parquet(s"$p/doclens"))
        .reduce(_.unionByName(_))
        .groupBy("doc_id")
        .agg(sum(col("sign") * col("dl")).as("dl"),
          sum("sign").as("__n"))
        .filter(col("__n") > 0L)
        .select(col("doc_id"), col("dl"), lit(1).as("sign"))
      lens.write.parquet(s"$tmp/doclens")
    }

  def compactIfDeep(spark: SparkSession, root: String,
      maxSegments: Int = 8): Unit =
    if (segmentCount(root) > maxSegments) compact(spark, root): Unit

  /** BM25 top-k over the PERSISTED index — [[Retrieval.bm25TopK]]'s
    * exact arithmetic (bitwise-equal scores on the same corpus state),
    * reading only (a) the narrow doc-length artifact and (b) the query
    * terms' postings BUCKETS (partition-pruned `bkt isin` below the
    * fold). The corpus text is never touched. */
  def bm25TopK(spark: SparkSession, root: String, query: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.distinct
    val buckets = terms
      .map(t => Math.floorMod(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType, 42L), Buckets.toLong))
      .distinct
    val lensRaw = readAll(spark, root, "doclens")
    val lens = lensRaw.groupBy("doc_id")
      .agg(sum(col("sign") * col("dl")).as("dl"), sum("sign").as("__n"))
      .filter(col("__n") > 0).select("doc_id", "dl")
    // an index whose every doc was retracted has N = 0: no postings
    // survive so no score is computed, but the avgdl division must not
    // trip ANSI divide-by-zero on the way
    val consts = lensRaw.agg(sum("sign").as("n_docs"),
      coalesce(sum(col("sign") * col("dl")).cast("double") /
        nullif(sum("sign"), lit(0L)).cast("double"), lit(0.0)).as("avgdl"))
    val post = readAll(spark, root, "postings")
      .filter(col("bkt").isin(buckets: _*) && col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(sum(col("sign") * col("tf")).as("tf"))
      .filter(col("tf") > 0)
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

  /** TF-IDF vectors over the persisted index — [[Retrieval.tfidf]]'s
    * arithmetic on the maintained stats, same pruned read shape. */
  def tfidf(spark: SparkSession, root: String,
      vocabulary: Seq[String]): DataFrame = {
    val terms = vocabulary.distinct
    val nDocs = readAll(spark, root, "doclens")
      .agg(sum("sign").as("n_docs"))
    val post = readAll(spark, root, "postings")
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(sum(col("sign") * col("tf")).as("tf"))
      .filter(col("tf") > 0)
    val dfs = post.groupBy("tok").agg(count(lit(1)).as("df"))
    post.join(broadcast(dfs), "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", Det.roundSafe(
        col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .select("doc_id", "tok", "tf", "df", "tfidf")
  }
}
