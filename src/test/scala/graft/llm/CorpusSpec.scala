package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate flags exactly the docs sharing a shingle with the benchmark") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),          // benchmark (id % 2 == 0 here)
      (1L, "alpha beta gamma epsilon"),        // shares shingle "alpha beta gamma"
      (3L, "zeta eta theta iota kappa"),       // clean
      (5L, "one two alpha beta gamma")         // shares via its tail shingle
    ).toDF("doc_id", "text")
    val got = Corpus.decontaminate(docs,
        isBench = pmod($"doc_id", lit(2)) === 0,
        grams = TextOps.wordShingles(3))
      .orderBy($"doc_id")
      .as[(Long, Long, Boolean)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 3L, 5L))
    assert(got.map(_._3).toSeq === Seq(true, false, true))
    assert(got(0)._2 >= 1 && got(2)._2 >= 1)
    // benchmark docs themselves are never emitted as candidates
    assert(!got.map(_._1).contains(0L))
    // the benchmark gram set joins by broadcast: the corpus side is never
    // shuffled by gram content
    val plan = Corpus.decontaminate(docs, pmod($"doc_id", lit(2)) === 0,
      TextOps.wordShingles(3)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"benchmark grams must broadcast:\n$plan")
  }

  test("incremental dedup drops digests seen in the snapshot, then dedups the batch") {
    val seen = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq((10L, "alpha"),            // already ingested → dropped
      (11L, "gamma"), (12L, "gamma"),          // in-batch dup → one survivor
      (13L, "delta")).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(batch, seen)
      .orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((11L, 2L), (13L, 1L)))
  }

  test("stratified sample is deterministic and respects per-stratum rates") {
    val docs = (0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", s"doc $i")).toDF("doc_id", "lang", "text")
    val rates = Map("en" -> 300)
    val a = Corpus.sampleStratified(docs, $"lang", rates, defaultPerMille = 100)
      .select($"doc_id").as[Long].collect().toSet
    val b = Corpus.sampleStratified(docs.repartition(7), $"lang", rates, defaultPerMille = 100)
      .select($"doc_id").as[Long].collect().toSet
    assert(a === b, "sample must not depend on partitioning")
    val en = a.count(_ % 2 == 0).toDouble / 2000
    val de = a.count(_ % 2 == 1).toDouble / 2000
    // multiplicative-hash buckets are uniform-ish, not exact; wide bands
    assert(en > 0.25 && en < 0.35, s"en rate $en")
    assert(de > 0.07 && de < 0.13, s"de rate $de")
  }

  test("rare-token stats count df<minDf occurrences exactly") {
    val docs = Seq(
      (1L, "common common weird"),   // 'common' df=3, 'weird' df=1
      (2L, "common other"),          // 'other' df=2
      (3L, "common other")).toDF("doc_id", "text")
    val got = Corpus.rareTokenStats(docs, minDf = 2)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tok", $"n_rare").as[(Long, Long, Long)]
      .collect().toSeq
    // doc 1: 3 tokens, 'weird' (df=1) occurs once → 1 rare occurrence
    assert(got === Seq((1L, 3L, 1L), (2L, 2L, 0L), (3L, 2L, 0L)))
  }

  test("quality gate fuses all rules into one scan with no shuffle") {
    val diverse = "careful measurement reveals that distributed engines reward " +
      "plans which avoid needless movement because network transfer remains " +
      "the slowest resource available under heavy analytical workloads today"
    val docs = Seq(
      (1L, "en", diverse),
      (2L, "en", "short"),                 // fails minTokens
      (3L, "en", ("spam " * 40).trim),     // fails dup_word_frac
      (4L, "zh", diverse)                  // fails the language rule
    ).toDF("doc_id", "lang", "text")
    val gated = Corpus.qualityGate(docs, minQuality = 0.5,
      maxDupWordFrac = 0.6, minTokens = 10, langs = Seq("en", "de"))
    assert(gated.select($"doc_id").as[Long].collect().toSeq === Seq(1L))
    // the gate is a map-only pipeline: no exchange anywhere in the plan
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quality gate must not shuffle:\n$plan")
  }

  test("source filtering drops whole low-quality strata via a broadcast semi join") {
    val rich = "careful analysis rewards distributed plans avoiding movement " +
      "since network transfer stays slow under heavy analytical load"
    val docs = (0L until 40L).map { i =>
      val src = if (i % 2 == 0) "good" else "bad"
      val text = if (src == "good") rich else "the a of and to in the a of"
      (i, src, text)
    }.toDF("doc_id", "source", "text")
    val kept = Corpus.filterBySourceQuality(docs, $"source", 0.5)
    assert(kept.select($"source").distinct().as[String].collect().toSeq === Seq("good"))
    assert(kept.count() === 20, "the whole good source survives intact")
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"the stratum list must broadcast:\n$plan")
  }

  test("rebalanceToMin equalizes strata via broadcast rates, deterministically") {
    val docs = (0L until 3000L).map(i =>
      (i, if (i % 10 == 0) "rare" else "common", s"doc $i"))
      .toDF("doc_id", "lang", "text")
    val out = Corpus.rebalanceToMin(docs, $"lang")
    val counts = out.groupBy($"lang").count().as[(String, Long)].collect().toMap
    // rare keeps everything (rate 1000‰); common downsamples toward 300
    assert(counts("rare") === 300)
    assert(counts("common") > 150 && counts("common") < 450,
      s"common kept ${counts("common")}")
    val again = Corpus.rebalanceToMin(docs.repartition(13), $"lang")
      .select($"doc_id").as[Long].collect().toSet
    assert(again === out.select($"doc_id").as[Long].collect().toSet)
    // the rate table joins by broadcast — the corpus is never sort-merged
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"rates must broadcast:\n$plan")
  }

  test("text chunking covers every char with the declared overlap") {
    val docs = Seq((1L, "a" * 250), (2L, "b" * 10), (3L, "c" * 100))
      .toDF("doc_id", "text")
    val chunks = Corpus.chunkText(docs, size = 100, overlap = 20)
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    val byDoc = chunks.groupBy(_._1)
    // 250 chars, stride 80: ceil(230/80) = 3 chunks at 0, 80, 160 —
    // coverage-complete (a 4th would sit inside the 3rd entirely)
    assert(byDoc(1L).map(_._3.length).toSeq === Seq(100, 100, 90))
    // short doc: one whole chunk
    assert(byDoc(2L).map(_._3).toSeq === Seq("b" * 10))
    // exactly size chars: one chunk, no empty tail
    assert(byDoc(3L).map(_._3).toSeq === Seq("c" * 100))
    // consecutive chunks overlap by exactly `overlap` chars
    byDoc(1L).sliding(2).foreach {
      case Array((_, _, prev), (_, _, next)) =>
        assert(prev.length < 100 || prev.takeRight(20) === next.take(
          math.min(20, next.length)))
      case _ =>
    }
    // reconstruction: stride-prefixes concatenate back to the original
    val rebuilt = byDoc(1L).zipWithIndex.map { case ((_, _, c), i) =>
      if (i == byDoc(1L).length - 1) c else c.take(80)
    }.mkString
    assert(rebuilt === "a" * 250)
    // chunking is map-only: no exchange in the plan
    val plan = Corpus.chunkText(docs, 100, 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("token-budget sampling fills each stratum in doc_id order, then stops") {
    val docs = (0L until 20L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", ("w " * 10).trim))
      .toDF("doc_id", "lang", "text")   // 10 tokens per doc
    val kept = Corpus.sampleTokenBudget(docs, $"lang",
        org.apache.spark.sql.functions.size(split($"text", " ")), 35L)
      .select($"doc_id").as[Long].collect().toSet
    // budget 35 → exactly the first 3 docs of each lang (30 ≤ 35 < 40)
    assert(kept === Set(0L, 2L, 4L, 1L, 3L, 5L))
    // deterministic under repartitioning
    val again = Corpus.sampleTokenBudget(docs.repartition(7), $"lang",
        org.apache.spark.sql.functions.size(split($"text", " ")), 35L)
      .select($"doc_id").as[Long].collect().toSet
    assert(again === kept)
  }

  test("packing offsets are contiguous within a shard and chunks bound the span") {
    val docs = (0L until 100L).map(i => (i, ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val packed = Corpus.packSequences(docs, size(split($"text", " ")), ctx = 10, shards = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._1))
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var expect = 0L
      rows.foreach { case (_, _, nTok, startOff, first, last) =>
        assert(startOff === expect, "offsets must concatenate without gaps")
        assert(first === startOff / 10)
        assert(last === (startOff + nTok - 1) / 10)
        assert(first <= last)
        expect += nTok
      }
    }
    // every doc appears exactly once across shards
    assert(packed.map(_._1).toSet.size === 100)
  }

  test("shuffleIntoShards: a permutation, deterministic, order-breaking") {
    val docs = (0L until 200L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
    val a = Corpus.shuffleIntoShards(docs, shards = 16)
      .as[(Long, Long, Long)].collect()
    // every doc exactly once; positions within a shard are 0..n-1 dense
    assert(a.map(_._1).toSet.size === 200)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
    }
    // deterministic across re-evaluation and repartitioning
    val b = Corpus.shuffleIntoShards(docs.repartition(7), shards = 16)
      .as[(Long, Long, Long)].collect()
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
    // the shard-0 read order is NOT doc_id order (it actually shuffles)
    val shard0 = a.filter(_._2 == 0L).sortBy(_._3).map(_._1).toSeq
    assert(shard0 !== shard0.sorted)
  }

  test("upsample: integer epochs exact, fractional epochs hash-chosen, zero drops") {
    val docs = (0L until 300L).map { id =>
      val src = if (id < 100) "a" else if (id < 200) "b" else "c"
      (id, src, s"doc $id")
    }.toDF("doc_id", "source", "text")
    val got = Corpus.upsample(docs, $"source",
        weightsPerMille = Map("a" -> 2500, "b" -> 0), defaultPerMille = 1000)
      .select($"doc_id", $"source", $"n_epochs", $"epoch")
      .as[(Long, String, Long, Long)].collect()
    // weight 0 ⇒ stratum fully dropped
    assert(!got.exists(_._2 == "b"))
    // default 1000‰ ⇒ exactly one copy each
    val c = got.filter(_._2 == "c")
    assert(c.length === 100 && c.forall(r => r._3 == 1L && r._4 == 0L))
    // 2500‰ ⇒ every doc 2 or 3 copies; totals match the per-doc bucket rule
    val byDoc = got.filter(_._2 == "a").groupBy(_._1)
    assert(byDoc.forall { case (_, rows) =>
      val n = rows.head._3
      (n == 2L || n == 3L) && rows.map(_._4).sorted.toSeq == (0L until n).toSeq
    })
    // the fractional half really is a fraction (not all-2 or all-3)
    val ns = byDoc.values.map(_.head._3).toSeq
    assert(ns.contains(2L) && ns.contains(3L))
    // deterministic under repartitioning (pure function of ids)
    val again = Corpus.upsample(docs.repartition(7), $"source",
        Map("a" -> 2500, "b" -> 0), 1000)
      .select($"doc_id", $"source", $"n_epochs", $"epoch")
      .as[(Long, String, Long, Long)].collect()
    assert(got.sortBy(r => (r._1, r._4)).toSeq ===
      again.sortBy(r => (r._1, r._4)).toSeq)
  }
}
