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
  * doc_id) and `sigs` (doc_id, sig[64]) parquet — plus at most one live
  * `baseNNNNN`, the fold [[compact]] publishes. Readers take the highest
  * complete base and every segment numbered ABOVE it; a crashed write
  * leaves an unmarked directory that readers never see and a retry
  * completes idempotently (the AtomicStore contract shared by every
  * persisted artifact in this engine).
  *
  * Without compaction each ingest batch adds one segment to every
  * probe's union forever — the same unbounded-plan-growth defect
  * [[graft.rdf.EncodedMirror.compact]] solves for the mirror, with the
  * same publish-then-drop discipline: the folded base lands (readers
  * immediately prefer it, the covered segments become dead weight), the
  * superseded entries are deleted after, so a crash between the two
  * leaves a larger-but-consistent index. A batch appended concurrently
  * with a compaction numbers above the fold ([[append]] counts bases)
  * and survives it untouched.
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
  private val BaseRe = "base(\\d{5,})".r

  private def segPath(root: String, n: Int) = f"$root%s/seg$n%05d"
  private def basePath(root: String, n: Int) = f"$root%s/base$n%05d"

  private def complete(root: String, re: scala.util.matching.Regex) =
    graft.sources.AtomicStore.list(root).flatMap { f =>
      f.getPath.getName match {
        case re(n)
          if graft.sources.AtomicStore.isComplete(f.getPath.toString) =>
            Some(n.toInt)
        case _ => None
      }
    }.sorted

  private def segments(root: String): Seq[Int] = complete(root, SegRe)
  private def bases(root: String): Seq[Int] = complete(root, BaseRe)

  /** The entries a reader folds RIGHT NOW: the highest complete base (if
    * any) plus the segments numbered above it — superseded entries a
    * crashed compaction left behind are invisible. */
  private def liveEntries(root: String): Seq[String] = {
    val b = bases(root).maxOption
    b.map(basePath(root, _)).toSeq ++
      segments(root).filter(n => b.forall(n > _)).map(segPath(root, _))
  }

  private def writeSegment(docs: DataFrame, dest: String,
      sign: Int = 1): Unit =
    graft.sources.AtomicStore.materialize(dest) { tmp =>
      val sigs = Dedup.signatures(Dedup.shingles(docs)).persist()
      val banded = sigs.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${Dedup.Bands - 1}), " +
          s"b -> xxhash64(b, slice(sig, b * ${Dedup.Rows} + 1, " +
          s"${Dedup.Rows})))")).as(Seq("band", "bh")))
      banded.withColumn("sign", lit(sign)).write.parquet(s"$tmp/bands")
      sigs.withColumn("sign", lit(sign)).write.parquet(s"$tmp/sigs")
      if (sign < 0) graft.sources.SegmentedStore.flagSigned(tmp)
      sigs.unpersist(): Unit
    }

  /** Index a corpus from scratch as segment 1. Idempotent per root. */
  def build(docs: DataFrame, root: String): Unit =
    writeSegment(docs, segPath(root, 1))

  /** Live entry count — a compacted base counts as 1 (0 = no index
    * yet). This is the depth of every probe's union fold. */
  def segmentCount(root: String): Int = liveEntries(root).size

  /** Index an ARRIVING batch as the next segment — the corpus's existing
    * segments are untouched (their signatures never recompute). The
    * batch should already be registered under corpus-unique doc_ids.
    * Numbering counts BASES too: after a compaction folded seg 1..k into
    * base k, the next batch must land at k+1 (a reused low number would
    * sit below the base and be invisible to readers). */
  def append(docs: DataFrame, root: String): Int = {
    val n = (segments(root) ++ bases(root)).maxOption.getOrElse(0) + 1
    writeSegment(docs, segPath(root, n))
    n
  }

  /** Retract documents as a SIGNED (−1) segment: the removal batch
    * carries the docs' TEXT (the same change-feed contract as
    * [[InvertedIndex.remove]]); their signatures and banded buckets
    * re-derive here and cancel the earlier +1 rows at the read fold, so
    * a retracted doc stops seeding candidates without touching any
    * existing segment. */
  def remove(docs: DataFrame, root: String): Int = {
    val n = (segments(root) ++ bases(root)).maxOption.getOrElse(0) + 1
    writeSegment(docs, segPath(root, n), sign = -1)
    n
  }

  private def readAll(spark: SparkSession, root: String,
      name: String): DataFrame = {
    val live = liveEntries(root)
    require(live.nonEmpty, s"no LSH index under $root — build() first")
    graft.sources.SegmentedStore.readFolded(spark, live, name).drop("sign")
  }

  /** The doc_ids currently indexed (live net fold — a removed doc is
    * absent, so it can re-enter) — the streaming ingest sink's
    * presence screen ([[graft.streaming.StreamOps.lshIndexSink]]). */
  def indexedIds(spark: SparkSession, root: String): DataFrame =
    readAll(spark, root, "sigs").select("doc_id").distinct()

  /** Fold every live entry into ONE new base, then drop the superseded
    * entries — the index's vacuum, [[graft.rdf.EncodedMirror.compact]]'s
    * publish-then-drop discipline. Probe results are identical before
    * and after (the fold is a plain union of immutable rows; LshIndexSpec
    * pins it). Returns the live entry count after (1, or 0-cost no-op
    * when already single-entry). */
  def compact(spark: SparkSession, root: String): Int = {
    val live = liveEntries(root)
    require(live.nonEmpty, s"no LSH index under $root — build() first")
    if (live.size <= 1) return live.size
    val top = (segments(root) ++ bases(root)).max
    graft.sources.AtomicStore.materialize(basePath(root, top)) { tmp =>
      // the read fold's net rows — removed docs leave the artifact here
      graft.sources.SegmentedStore.readFolded(spark, live, "bands")
        .write.parquet(s"$tmp/bands")
      graft.sources.SegmentedStore.readFolded(spark, live, "sigs")
        .write.parquet(s"$tmp/sigs")
    }
    // the new base is published — everything at or below its number is
    // dead weight to readers; delete segments ≤ top and older bases.
    // A segment appended AFTER the fold started numbers > top and stays.
    segments(root).filter(_ <= top).foreach(n =>
      graft.sources.AtomicStore.delete(segPath(root, n)))
    bases(root).filter(_ < top).foreach(n =>
      graft.sources.AtomicStore.delete(basePath(root, n)))
    liveEntries(root).size
  }

  /** Compact when the fold depth exceeds `maxSegments` — the retention
    * policy an ingest loop calls after each [[append]], keeping probe
    * plans bounded across thousands of batches. */
  def compactIfDeep(spark: SparkSession, root: String,
      maxSegments: Int = 8): Unit =
    if (segmentCount(root) > maxSegments) compact(spark, root): Unit

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
