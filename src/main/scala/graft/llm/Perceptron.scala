package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A LEARNED text-quality classifier the correctness gate can actually
  * oracle: the integer BATCH perceptron (Rosenblatt 1958; the batch
  * variant sums all misclassified examples per round).
  *
  * Most learned filters (logistic regression, fastText) train on doubles
  * whose partial sums differ in ulps across combine orders — fine for
  * accuracy, impossible for a bitwise cross-engine oracle. The batch
  * perceptron has neither problem: features are integer token counts
  * over a FIXED vocabulary, the per-round update `w += Σ_misclassified
  * y·x` is an integer sum (commutative, order-free), and the round
  * count is fixed — so training is bit-reproducible on any cluster and
  * the whole loop can be replayed in SQL by unrolling rounds.
  *
  * Scale shape: each round is ONE scan of the sparse feature relation —
  * margins by a broadcast of the (vocab-sized) weight vector, the
  * misclassified set folded back to a vocab-sized gradient. The driver
  * collects only the gradient (|vocab|+1 longs per round — the BPE
  * batch-collect discipline); documents never leave the executors.
  * Rounds are jobs, not plan growth: the weight vector is a literal in
  * each round's plan.
  */
object Perceptron {

  /** Sparse integer features: one row per (doc, present vocab word) with
    * the word's count; feature "__bias" is 1 for every doc. */
  def features(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(TextOps.tokens).as("tok"))
      .filter(col("tok").isin(vocab: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("x"))
      .select(col("doc_id"), col("tok").as("feature"), col("x"))
    docs.select(col("doc_id"), lit("__bias").as("feature"), lit(1L).as("x"))
      .unionByName(toks)
  }

  /** `rounds` of batch-perceptron training over `docs` with ±1 labels
    * from `label` (a Column over the doc row). Returns the final
    * weights as (feature, weight) — |vocab|+1 rows, integer-exact. */
  def train(docs: DataFrame, vocab: Seq[String], label: Column,
      rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(vocab.nonEmpty && rounds >= 1, "need a vocabulary and rounds")
    val feats = graft.Materialize( // scanned once per round
      features(docs, vocab).join(
        docs.select(col("doc_id"), label.cast("long").as("y")), "doc_id"))
    val names = "__bias" +: vocab
    var w = names.map(_ -> 0L).toMap
    var round = 0
    var converged = false
    while (round < rounds && !converged) {
      // margin via a LITERAL weight map — no join, pure codegen map work
      val wCol = names.map(n =>
        when(col("feature") === n, lit(w(n))).otherwise(lit(0L)))
        .reduce(_ + _)
      val delta = feats
        .withColumn("wx", col("x") * wCol)
        .groupBy("doc_id").agg(sum("wx").as("margin"),
          first("y").as("y"))
        .filter(col("y") * col("margin") <= 0L)
        .select(col("doc_id"), col("y"))
        .join(feats.select(col("doc_id"), col("feature"), col("x")),
          "doc_id")
        .groupBy("feature").agg(sum(col("y") * col("x")).as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // converged: no misclassified docs → later rounds are no-op cluster
      // jobs (margin scan + collect each), so stop launching them
      if (delta.isEmpty) converged = true
      else w = names.map(n => n -> (w(n) + delta.getOrElse(n, 0L))).toMap
      round += 1
    }
    graft.Materialize.release(feats)
    names.map(n => (n, w(n))).toDF("feature", "weight")
  }

  /** Score docs with a trained (feature, weight) frame: the integer
    * margin Σ w·x (+bias); `keep = margin > 0`. Weights are vocab-sized
    * → broadcast; one scan of the corpus. */
  def score(docs: DataFrame, weights: DataFrame): DataFrame = {
    val f = features(docs, weights.select("feature")
      .collect().map(_.getString(0)).toSeq.filterNot(_ == "__bias"))
    f.join(broadcast(weights), "feature")
      .groupBy("doc_id").agg(sum(col("x") * col("weight")).as("margin"))
      .withColumn("keep", (col("margin") > 0L).cast("long"))
  }
}
