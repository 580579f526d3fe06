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
  * argmax of exactly one row. At 100 TB the corpus scan dominates and the
  * rounds are each O(|vocab|) — the standard trick that makes BPE
  * trainable at web scale. State per round is eagerly materialized
  * ([[graft.Materialize]]) so the plan stays constant-depth across
  * hundreds of merges.
  *
  * Determinism: the argmax tie-breaks on (count desc, left, right) — a
  * total order — so the merge sequence is a pure function of the corpus.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String)
  /** Public only because Spark's codegen'd encoders require it. */
  final case class WordSyms(syms: Seq[String], cnt: Long)

  /** Learn `numMerges` merges from the corpus's `text` column. */
  def train(docs: DataFrame, numMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
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
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      // pair counts over the vocabulary table; argmax is ONE collected row
      val top = words.flatMap(ws =>
          ws.syms.zip(ws.syms.drop(1)).map(p => (p._1, p._2, ws.cnt)))
        .toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(r, l, rr)
        val next = graft.Materialize(
          words.map(ws => WordSyms(mergePair(ws.syms, l, rr), ws.cnt)).toDF())
        graft.Materialize.release(words.toDF())
        words = next.as[WordSyms]
        r += 1
      }
    }
    graft.Materialize.release(words.toDF())
    merges.toSeq
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
}
