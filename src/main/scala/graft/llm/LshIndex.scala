package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED, APPENDABLE MinHash-LSH index — the near-dup complement
  * of the Bloom-filter exact-dedup ingest path
  * ([[Dedup.incrementalExactBloom]])
  * and the text-side analog of the persisted ANN index
  * ([[EmbeddingOps.indexForEmbeddings]]): signatures and banded buckets
  * are computed ONCE per corpus segment and written as immutable
  * AtomicStore snapshots, so an arriving batch checks itself against a
  * 100 TB corpus by probing buckets — never recomputing the corpus's
  * signatures, never self-joining it.
  *
  * Layout under `root`: `seg00001`, `seg00002`, … — one immutable
  * segment per [[build]]/[[append]], each holding `bands` (band, bh,
  * doc_id) and `sigs` (doc_id, sig[64]) parquet. Readers union the
  * complete segments; a crashed write leaves an unmarked directory that
  * readers never see and a retry completes idempotently (the AtomicStore
  * contract shared by every persisted artifact in this engine).
  *
  * Probing estimates Jaccard as the fraction of agreeing minhash
  * components (the unbiased MinHash estimator, ±1/√64 ≈ 0.125 std at
  * the decision boundary) — candidates come only from banded-bucket
  * collisions, so the probe cost is bucket-bound, not corpus-bound.
  * Exact verification over shingles stays available downstream for the
  * pairs that matter ([[Dedup.withJaccard]]); the estimator is what
  * makes the index self-contained (shingle storage is corpus-sized,
  * signatures are 512 bytes/doc). Approximate ⇒ no DuckDB oracle;
  * LshIndexSpec pins recall against the brute-force pass and the
  * estimator's accuracy.
  */
object LshIndex {

  private val SegRe = "seg(\\d{5,})".r

  private def segPath(root: String, n: Int) = f"$root%s/seg$n%05d"

  private def segments(root: String): Seq[Int] =
    graft.sources.AtomicStore.list(root).flatMap { f =>
      f.getPath.getName match {
        case SegRe(n)
          if graft.sources.AtomicStore.isComplete(f.getPath.toString) =>
            Some(n.toInt)
        case _ => None
      }
    }.sorted

  private def writeSegment(docs: DataFrame, dest: String): Unit =
    graft.sources.AtomicStore.materialize(dest) { tmp =>
      val sigs = Dedup.signatures(Dedup.shingles(docs)).persist()
      val banded = sigs.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${Dedup.Bands - 1}), " +
          s"b -> xxhash64(b, slice(sig, b * ${Dedup.Rows} + 1, " +
          s"${Dedup.Rows})))")).as(Seq("band", "bh")))
      banded.write.parquet(s"$tmp/bands")
      sigs.write.parquet(s"$tmp/sigs")
      sigs.unpersist(): Unit
    }

  /** Index a corpus from scratch as segment 1. Idempotent per root. */
  def build(docs: DataFrame, root: String): Unit =
    writeSegment(docs, segPath(root, 1))

  /** Live segment count (0 = no index yet). */
  def segmentCount(root: String): Int = segments(root).size

  /** Index an ARRIVING batch as the next segment — the corpus's existing
    * segments are untouched (their signatures never recompute). The
    * batch should already be registered under corpus-unique doc_ids. */
  def append(docs: DataFrame, root: String): Int = {
    val n = segments(root).maxOption.getOrElse(0) + 1
    writeSegment(docs, segPath(root, n))
    n
  }

  private def readAll(spark: SparkSession, root: String,
      name: String): DataFrame = {
    val segs = segments(root)
    require(segs.nonEmpty, s"no LSH index under $root — build() first")
    segs.map(n => spark.read.parquet(s"${segPath(root, n)}/$name"))
      .reduce(_.unionByName(_))
  }

  /** Estimated-Jaccard agreement of two signature columns: the fraction
    * of agreeing minhash components. */
  private def estJaccard(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> IF(x = y, 1, 0)), " +
      s"0, (acc, v) -> acc + v)").cast("double") / Dedup.NumHashes

  /** Near-duplicates of `queryDocs` within the INDEXED corpus: one row
    * per (query doc, corpus doc) candidate pair at estimated Jaccard ≥
    * `minEst`. Candidates come from banded-bucket collisions against
    * the persisted bands (an equi-join — the query side is batch-sized
    * and broadcasts); estimation joins the stored signatures, 512
    * bytes/doc. Self-hits (same doc_id) are excluded, so probing the
    * corpus with itself finds its internal near-dup pairs. */
  def probe(spark: SparkSession, root: String, queryDocs: DataFrame,
      minEst: Double): DataFrame = {
    val qSigs = Dedup.signatures(Dedup.shingles(queryDocs)).persist()
    val qBands = qSigs.select(col("doc_id").as("q_id"), posexplode(expr(
      s"transform(sequence(0, ${Dedup.Bands - 1}), " +
        s"b -> xxhash64(b, slice(sig, b * ${Dedup.Rows} + 1, " +
        s"${Dedup.Rows})))")).as(Seq("band", "bh")))
    val cands = readAll(spark, root, "bands")
      .join(broadcast(qBands), Seq("band", "bh"))
      .filter(col("doc_id") =!= col("q_id"))
      .select(col("q_id"), col("doc_id")).distinct()
    val out = cands
      .join(readAll(spark, root, "sigs"), "doc_id")
      .withColumnRenamed("sig", "c_sig")
      .join(qSigs.select(col("doc_id").as("q_id"), col("sig").as("q_sig")),
        "q_id")
      .withColumn("est_jaccard",
        graft.Det.roundSafe(estJaccard("q_sig", "c_sig"), 4))
      .filter(col("est_jaccard") >= minEst)
      .select(col("q_id"), col("doc_id").as("corpus_id"), col("est_jaccard"))
      .transform(graft.Materialize.apply)
    qSigs.unpersist()
    out
  }
}
