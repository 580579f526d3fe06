package graft.llm

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Naive single-node reference BPE with the same tie-break — the
    * distributed trainer must reproduce its merge sequence exactly. */
  private def naiveTrain(texts: Seq[String], n: Int): Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] = texts.flatMap(_.split(" "))
      .filter(_.nonEmpty).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, c) => (w.map(_.toString): Seq[String], c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (out.length < n && go) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p =>
          pairs(p) = pairs.getOrElse(p, 0L) + c)
      }
      if (pairs.isEmpty) go = false
      else {
        val best = pairs.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out += best
        vocab = vocab.toSeq.map { case (syms, c) =>
          Bpe.mergePair(syms, best._1, best._2) -> c
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out.toSeq
  }

  test("distributed training reproduces the reference merge sequence") {
    val texts = Seq(
      "low low low lower lower lowest",
      "new newer newest new new",
      "low lowest newer")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, numMerges = 12).map(m => (m.left, m.right))
    val want = naiveTrain(texts, 12)
    assert(got === want)
    // 'l'+'o' then 'lo'+'w' are the classic first merges of this corpus
    assert(got.take(2) === Seq(("l", "o"), ("lo", "w")))
  }

  test("training stops when no pair remains; tokenize rebuilds the words") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 10)
    assert(merges.length === 1, "a 2-symbol vocab admits exactly one merge")
    val corpus = Seq((1L, "low lowest newer"), (2L, "new lower"))
      .toDF("doc_id", "text")
    val learned = Bpe.train(corpus, numMerges = 8)
    val toks = Bpe.tokenize(corpus, learned)
      .as[(Long, Seq[String])].collect().toMap
    // subword concatenation is lossless per document's words
    assert(toks(1L).mkString === "lowlowestnewer")
    assert(toks(2L).mkString === "newlower")
    // learned subwords actually compress: fewer tokens than characters
    assert(toks(1L).length < "lowlowestnewer".length)
  }

  test("the corpus merge table is deterministic across runs") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val a = Bpe.mergeTable(docs, 10).collect().toSeq
    val b = Bpe.mergeTable(docs, 10).collect().toSeq
    assert(a === b && a.length === 10)
  }
}
