package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding TRAINING (Sennrich, Haddow & Birch,
  * ACL 2016 — the subword algorithm behind GPT-2/RoBERTa-class
  * tokenizers): iteratively merge the corpus's most frequent adjacent
  * symbol pair.
  *
  * Scale shape: training runs on the WORD-FREQUENCY table, not running
  * text — the corpus is touched ONCE (one distinct-words count
  * aggregation); every merge round after that is a pair-count
  * aggregation over the vocabulary-sized symbol table plus a driver-side
  * collect of at most `batchTopK` rows. At 100 TB the corpus scan
  * dominates and the rounds are each O(|vocab|) — the standard trick
  * that makes BPE trainable at web scale. State per round is eagerly
  * materialized ([[graft.Materialize]]) so the plan stays constant-depth
  * across hundreds of merges.
  *
  * Rounds commit a BATCH of merges, not one: from the top candidates in
  * total order, take the maximal prefix of mutually symbol-disjoint
  * pairs whose counts strictly exceed the first conflicting candidate's
  * count. That bound is what makes batching EXACTLY sequence-equivalent
  * to one-merge-at-a-time training: disjoint pairs cannot change each
  * other's counts, and every pair a merge can create or boost — (x, l+r)
  * from a preceding x, (l+r, y) from a following y — is count-bounded by
  * an existing pair that SHARES a symbol with the batch (old (x,l) resp.
  * (r,y)), hence by the first conflict's count. Equal counts are not
  * safe: a derived pair can tie a candidate's count and outrank it
  * lexicographically (e.g. "a b y"/"ac d": merging (a,b) derives (ab,y),
  * and "ab" < "ac"), so the strict `>` is load-bearing and spec-pinned.
  * Neither are string COLLISIONS: when a merge's concatenation equals a
  * symbol that already exists (common at char level — 'l'+'ow' and
  * 'lo'+'w' both yield 'low'), created and pre-existing counts pool and
  * the bar no longer bounds them, so such candidates end the batch too
  * (see [[selectBatch]]; BpeSpec's ambiguous-concat corpora pin it).
  * A 50k-merge production vocabulary goes from 50k sequential Spark jobs
  * to ~50k/|batch| — order-of-magnitude fewer driver round-trips.
  *
  * Determinism: candidates order by (count desc, left, right) — a total
  * order — so the merge sequence is a pure function of the corpus.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String)
  /** Public only because Spark's codegen'd encoders require it. */
  final case class WordSyms(syms: Seq[String], cnt: Long)

  /** Learn `numMerges` merges from the corpus's `text` column.
    * `batchTopK` bounds the per-round candidate collect (rows on the
    * driver, never corpus data); 1 degenerates to the classic
    * one-merge-per-round loop. Any value yields the SAME sequence. */
  def train(docs: DataFrame, numMerges: Int,
      batchTopK: Int = 256): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(batchTopK >= 1, s"batchTopK must be >= 1, got $batchTopK")
    // ONE corpus pass: word frequencies; then words become symbol seqs
    var words: Dataset[WordSyms] = graft.Materialize(
      docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("w"), col("cnt"))
        .as[(String, Long)]
        .map { case (w, c) => WordSyms(w.map(_.toString), c) }
        .toDF()).as[WordSyms]
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      // pair counts over the vocabulary table; candidates are a bounded
      // collect in the global total order
      val cands = words.flatMap(ws =>
          ws.syms.zip(ws.syms.drop(1)).map(p => (p._1, p._2, ws.cnt)))
        .toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(batchTopK).collect()
        .map(r0 => (r0.getString(0), r0.getString(1), r0.getLong(2)))
      if (cands.isEmpty) exhausted = true
      else {
        val batch = selectBatch(cands, batchTopK,
          numMerges - merges.length,
          merges.iterator.map(m => m.left + m.right).toSet)
        batch.foreach { case (l, rr, _) =>
          merges += Merge(merges.length, l, rr)
        }
        val pairs = batch.map(b => (b._1, b._2))
        val next = graft.Materialize(words.map { ws =>
          WordSyms(pairs.foldLeft(ws.syms) {
            case (s, (l, rr)) => mergePair(s, l, rr)
          }, ws.cnt)
        }.toDF())
        graft.Materialize.release(words.toDF())
        words = next.as[WordSyms]
      }
    }
    graft.Materialize.release(words.toDF())
    merges.toSeq
  }

  /** The sequence-safe batch: the maximal prefix of mutually
    * symbol-disjoint candidates whose counts strictly exceed the
    * conflict bar — the first conflicting candidate's count, or (when
    * no conflict surfaced but the collect hit its limit) the last
    * collected count, which bounds everything below the horizon. When
    * even the top pair sits at the bar, it alone is still safe: the
    * global argmax is the sequential pick by definition.
    *
    * The bar bound holds only while every symbol a batch member CREATES
    * is a brand-new string: then any pair gaining count mid-batch
    * involves that new symbol, and its count equals occurrences created
    * by the merge, each of which destroyed a pre-existing pair sharing
    * one of the merge's operands — a non-accepted pair, hence ≤ bar.
    * String COLLISIONS break that (e.g. 'l'+'ow' creating 'low' when
    * 'low' already exists as a symbol from a prior merge: counts POOL,
    * and a pre-existing-count pair like ('low', x) can overtake an
    * accepted candidate mid-batch), so a candidate also conflicts when
    * its concatenation equals any symbol already in play — a prior
    * merge's concat (`knownSymbols`), a symbol this batch creates, or
    * an accepted operand — or when one of its operands is a symbol this
    * batch creates. */
  private[llm] def selectBatch(cands: Array[(String, String, Long)],
      batchTopK: Int, maxTake: Int,
      knownSymbols: Set[String] = Set.empty): Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val created = scala.collection.mutable.Set.empty[String]
    val accepted = List.newBuilder[(String, String, Long)]
    var bar = if (cands.length == batchTopK) cands.last._3 else -1L
    var conflicted = false
    val it = cands.iterator
    while (it.hasNext && !conflicted) {
      val c @ (l, r, _) = it.next()
      val cat = l + r
      if (used.contains(l) || used.contains(r) ||
          created.contains(l) || created.contains(r) ||
          knownSymbols.contains(cat) || created.contains(cat) ||
          used.contains(cat)) {
        conflicted = true; bar = math.max(bar, c._3)
      } else { accepted += c; used += l; used += r; created += cat }
    }
    val safe = accepted.result().takeWhile(_._3 > bar).take(maxTake)
    if (safe.isEmpty) cands.take(1).toSeq else safe
  }

  /** Replace every adjacent (l, r) with the merged symbol, left to right
    * (the reference algorithm's greedy scan). */
  private[llm] def mergePair(syms: Seq[String], l: String,
      r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Tokenize `text` into learned subwords: per word, apply the merges in
    * rank order (the inference rule matching the training scan). Map-only
    * over the corpus; the merge table broadcasts via the closure. */
  def tokenize(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty).flatMap { w =>
          ordered.foldLeft(w.map(_.toString): Seq[String]) {
            case (syms, (l, r)) => mergePair(syms, l, r)
          }
        }
        (id, toks)
      }
      .toDF("doc_id", "subword_tokens")
  }

  /** The learned merge table as a DataFrame (rank, left, right) — the
    * artifact a tokenizer ships. */
  def mergeTable(docs: DataFrame, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, numMerges).map(m => (m.rank, m.left, m.right))
      .toDF("rank", "left", "right")
  }

  /** Persist the learned merges as an AtomicStore-published parquet
    * directory — the ship-and-version step of the tokenizer lifecycle
    * (crash-safe, rebuild-or-serve, same protocol as every other
    * persisted artifact). Idempotent for a given path. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    graft.sources.AtomicStore.materialize(path) { tmp =>
      merges.map(m => (m.rank, m.left, m.right))
        .toDF("rank", "left", "right").coalesce(1).write.parquet(tmp)
    }: Unit
  }

  /** Load a persisted merge table in rank order — a vocabulary-sized
    * (bounded) collect, the tokenizer's startup step. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] = {
    require(graft.sources.AtomicStore.isComplete(path),
      s"no complete merge table under $path — saveMerges first")
    import spark.implicits._
    spark.read.parquet(path).select("rank", "left", "right")
      .as[(Int, String, String)].collect().sortBy(_._1)
      .map { case (r, l, rr) => Merge(r, l, rr) }.toSeq
  }
}
