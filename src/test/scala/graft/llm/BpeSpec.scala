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

  test("batched rounds reproduce the sequence on a conflict-free corpus") {
    // pairwise-disjoint symbols, distinct counts, no derivable pairs:
    // one round commits all three merges, and the sequence still matches
    val texts = Seq(Seq.fill(9)("ab").mkString(" "),
      Seq.fill(8)("cd").mkString(" "), Seq.fill(7)("ef").mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, numMerges = 3).map(m => (m.left, m.right))
    assert(got === naiveTrain(texts, 3))
    assert(got === Seq(("a", "b"), ("c", "d"), ("e", "f")))
  }

  test("a tied conflict stops the batch — derived pairs can outrank") {
    // (a,b):5 and (b,y):5 conflict; (c,d):5 is disjoint but TIES the
    // conflict bar, and merging (a,b) derives (ab,y):5 with "ab" < "c" —
    // sequential picks (ab,y) before (c,d), so batching (c,d) would be
    // wrong. The strict > in selectBatch is what this pins.
    val texts = Seq(Seq.fill(5)("aby").mkString(" "),
      Seq.fill(5)("cd").mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, numMerges = 4).map(m => (m.left, m.right))
    val want = naiveTrain(texts, 4)
    assert(got === want)
    assert(want.take(2) === Seq(("a", "b"), ("ab", "y")),
      "sequential must interleave the derived pair ahead of (c,d)")
  }

  test("selectBatch: strict bar, horizon bar, and the forced-top case") {
    // first conflict at count 10 bars the tied disjoint candidate
    val tied = Array(("a", "b", 10L), ("b", "y", 10L), ("c", "d", 10L))
    assert(Bpe.selectBatch(tied, 16, 99) === Seq(("a", "b", 10L)))
    // strictly above the conflict bar → batched together
    val above = Array(("a", "b", 20L), ("c", "d", 15L), ("b", "y", 10L))
    assert(Bpe.selectBatch(above, 16, 99) ===
      Seq(("a", "b", 20L), ("c", "d", 15L)))
    // no conflict but the collect hit its limit: the horizon is the bar
    val full = Array(("a", "b", 20L), ("c", "d", 15L), ("e", "f", 15L))
    assert(Bpe.selectBatch(full, 3, 99) === Seq(("a", "b", 20L)),
      "pairs below the horizon may tie 15, so only count 20 is safe")
    assert(Bpe.selectBatch(full, 16, 99) === full.toSeq,
      "the same list as the COMPLETE table batches everything")
    // maxTake caps the batch at the remaining merge budget
    assert(Bpe.selectBatch(full, 16, 2) === full.take(2).toSeq)
  }

  test("ambiguous-concat corpus: collision with a prior merge's symbol") {
    // round 1 merges ('l','o') then ('lo','w') → symbol 'low' exists.
    // later, words "zlow..." reach a state where pair ('l','ow') could
    // batch with a pre-existing-count pair ('low', x): applying the
    // former boosts the latter, so the batch must break there. The
    // distributed trainer must match the naive sequential reference
    // EXACTLY on this corpus, at every batchTopK.
    val texts = Seq(
      Seq.fill(30)("low").mkString(" "),   // drives l+o, lo+w → 'low'
      Seq.fill(12)("lowx").mkString(" "),  // ('low','x') pre-existing pool
      Seq.fill(11)("zow").mkString(" "),   // drives o+w → 'ow' elsewhere
      Seq.fill(10)("qlowx").mkString(" ")) // more 'low'-adjacent mass
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val want = naiveTrain(texts, 10)
    for (k <- Seq(1, 4, 256)) {
      val got = Bpe.train(docs, numMerges = 10, batchTopK = k)
        .map(m => (m.left, m.right))
      assert(got === want, s"batchTopK=$k diverged from sequential")
    }
  }

  test("randomized tiny-alphabet corpora: batchTopK never changes the sequence") {
    // alphabet {a,b} makes concat collisions frequent ('a'+'ab' vs
    // 'aa'+'b' → 'aab', …) — the corner the collision guard exists for.
    // Deterministic seed; each corpus checked against the naive
    // sequential reference at batchTopK 1 and 256.
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val texts = Seq.fill(6) {
        Seq.fill(24)(
          Seq.fill(1 + rnd.nextInt(5))(if (rnd.nextBoolean()) "a" else "b")
            .mkString).mkString(" ")
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val want = naiveTrain(texts, 12)
      val one = Bpe.train(docs, 12, batchTopK = 1).map(m => (m.left, m.right))
      val many = Bpe.train(docs, 12, batchTopK = 256)
        .map(m => (m.left, m.right))
      assert(one === want, s"trial $trial: batchTopK=1 diverged")
      assert(many === want, s"trial $trial: batchTopK=256 diverged")
    }
  }

  test("batchTopK=1 degenerates to the classic loop, same sequence") {
    val texts = Seq("low low low lower lowest", "new newer newest new")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val one = Bpe.train(docs, numMerges = 8, batchTopK = 1)
    val many = Bpe.train(docs, numMerges = 8, batchTopK = 256)
    assert(one === many)
    assert(one.map(m => (m.left, m.right)) === naiveTrain(texts, 8))
  }

  test("merges persist through the AtomicStore and tokenize identically") {
    val docs = Seq((1L, "low lower lowest low low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 6)
    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/m"
    Bpe.saveMerges(spark, merges, path)
    assert(Bpe.loadMerges(spark, path) === merges)
    val corpus = Seq((1L, "lowest lower")).toDF("doc_id", "text")
    assert(Bpe.tokenize(corpus, Bpe.loadMerges(spark, path)).collect().toSeq
      === Bpe.tokenize(corpus, merges).collect().toSeq)
    // an incomplete / absent store is loud
    intercept[IllegalArgumentException](Bpe.loadMerges(spark, path + "_no"))
  }

  test("the corpus merge table is deterministic across runs") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val a = Bpe.mergeTable(docs, 10).collect().toSeq
    val b = Bpe.mergeTable(docs, 10).collect().toSeq
    assert(a === b && a.length === 10)
  }
}
