package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("good", "bad")
  private def label = when(
    array_contains(split(col("text"), " "), "good"), 1L).otherwise(-1L)

  test("one hand-checked round: the update is the misclassified sum") {
    val docs = Seq(
      (1L, "good stuff"), (2L, "bad stuff"))
      .toDF("doc_id", "text")
    // w=0 → every margin 0 → BOTH docs misclassified (y·m ≤ 0).
    // Δw(__bias) = (+1)·1 + (−1)·1 = 0; Δw(good) = +1; Δw(bad) = −1
    val w1 = Perceptron.train(docs, vocab, label, rounds = 1)
      .as[(String, Long)].collect().toMap
    assert(w1 === Map("__bias" -> 0L, "good" -> 1L, "bad" -> -1L))
  }

  test("separable corpus: training converges and score() predicts " +
      "perfectly, repeated counts included") {
    val docs = Seq(
      (1L, "good good news today"), (2L, "mostly good news"),
      (3L, "bad bad day"), (4L, "a bad outcome"),
      (5L, "good despite one bad part"), (6L, "plain neutral text bad"))
      .toDF("doc_id", "text")
    val w = Perceptron.train(docs, vocab, label, rounds = 20)
    val scored = Perceptron.score(docs, w)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L,
      5L -> 1L, 6L -> 0L)
    assert(scored === want)
    // determinism: retraining lands on the identical weight vector
    val w2 = Perceptron.train(docs, vocab, label, rounds = 20)
    assert(w.orderBy("feature").as[(String, Long)].collect().toSeq ===
      w2.orderBy("feature").as[(String, Long)].collect().toSeq)
  }
}
