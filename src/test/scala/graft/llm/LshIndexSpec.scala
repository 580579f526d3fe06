package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and " +
    "runs far away into the green hills tonight under a pale moon"
  private def variant(i: Int): String = base.replace("green", s"shade$i")

  test("probe finds the corpus near-dups of a new batch; estimator tracks " +
      "true jaccard") {
    val root = java.nio.file.Files.createTempDirectory("lsh_idx").toString
    val corpus = ((1 to 6).map(i => (i.toLong, variant(i))) ++ Seq(
      (7L, "completely different words about columnar storage engines " +
        "and vectorized execution pipelines for analytics at scale")))
      .toDF("doc_id", "text")
    LshIndex.build(corpus, root)
    // the arriving batch: one near-dup of the variant family, one novel
    val batch = Seq(
      (100L, base),
      (101L, "novel content sharing no shingles with anything indexed " +
        "prose entirely fresh tokens throughout this sentence"))
      .toDF("doc_id", "text")
    val hits = LshIndex.probe(spark, root, batch, minEst = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every variant is a near-dup of doc 100; the novel doc hits nothing
    assert(hits.map(_._1).toSet === Set(100L))
    assert(hits.map(_._2).toSet === (1L to 6L).toSet,
      s"expected all 6 variants, got ${hits.toSeq}")
    // estimator vs brute-force jaccard, within the 64-hash tolerance
    val exact = Dedup.withJaccard(
      hits.map { case (q, c, _) => (q, c) }.toSeq.toDF("doc_a", "doc_b"),
      Dedup.shingles(corpus.unionByName(batch)))
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    hits.foreach { case (q, c, est) =>
      val j = exact((q, c))
      assert(math.abs(est - j) <= 0.25,
        f"estimate $est%.2f vs exact $j%.2f for ($q, $c)")
    }
    rmTree(new java.io.File(root))
  }

  test("append indexes only the new segment; probes span all segments") {
    val root = java.nio.file.Files.createTempDirectory("lsh_app").toString
    LshIndex.build(Seq((1L, variant(1))).toDF("doc_id", "text"), root)
    val n = LshIndex.append(Seq((2L, variant(2))).toDF("doc_id", "text"), root)
    assert(n === 2)
    // the probe sees BOTH segments' docs
    val hits = LshIndex.probe(spark, root,
        Seq((50L, base)).toDF("doc_id", "text"), minEst = 0.5)
      .select("corpus_id").as[Long].collect().toSet
    assert(hits === Set(1L, 2L))
    // a replayed append of the same segment number is a no-op (the
    // AtomicStore idempotence contract): appending after a simulated
    // crash completes without duplicating
    val n2 = LshIndex.append(Seq((3L, variant(3))).toDF("doc_id", "text"), root)
    assert(n2 === 3)
    assert(LshIndex.probe(spark, root,
        Seq((51L, base)).toDF("doc_id", "text"), minEst = 0.5)
      .count() === 3)
    // self-probe: the corpus's internal near-dup pairs, no self-hits
    val selfHits = LshIndex.probe(spark, root,
        Seq((1L, variant(1)), (2L, variant(2)), (3L, variant(3)))
          .toDF("doc_id", "text"), minEst = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(selfHits.forall { case (q, c, _) => q != c })
    assert(selfHits.length === 6, s"3 docs, all pairwise near-dups: $selfHits")
    rmTree(new java.io.File(root))
  }

  test("compact folds segments into one base; probes are identical " +
      "before and after, and ingest continues above the base") {
    val root = java.nio.file.Files.createTempDirectory("lsh_cmp").toString
    LshIndex.build(Seq((1L, variant(1))).toDF("doc_id", "text"), root)
    (2 to 5).foreach(i => LshIndex.append(
      Seq((i.toLong, variant(i))).toDF("doc_id", "text"), root): Unit)
    assert(LshIndex.segmentCount(root) === 5)
    val probe = Seq((50L, base)).toDF("doc_id", "text")
    def hits() = LshIndex.probe(spark, root, probe, minEst = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val before = hits()
    assert(before.map(_._2) === (1L to 5L).toSet)
    // under the policy threshold → no-op; above it → one base
    LshIndex.compactIfDeep(spark, root, maxSegments = 8)
    assert(LshIndex.segmentCount(root) === 5)
    LshIndex.compactIfDeep(spark, root, maxSegments = 2)
    assert(LshIndex.segmentCount(root) === 1)
    assert(hits() === before, "compaction must not change probe results")
    // appends number ABOVE the base (a reused low number would be
    // invisible to readers) and a second compaction folds base + segs
    val n = LshIndex.append(
      Seq((6L, variant(6))).toDF("doc_id", "text"), root)
    assert(n === 6)
    assert(LshIndex.segmentCount(root) === 2)
    assert(hits().map(_._2) === (1L to 6L).toSet)
    assert(LshIndex.compact(spark, root) === 1)
    assert(hits().map(_._2) === (1L to 6L).toSet)
    // compacting a single-entry index is a free no-op
    assert(LshIndex.compact(spark, root) === 1)
    rmTree(new java.io.File(root))
  }

  test("remove retracts docs as signed tombstones: probes match a " +
      "rebuild without them, through compaction") {
    val root = java.nio.file.Files.createTempDirectory("lsh_rm").toString
    val corpus = (1 to 5).map(i => (i.toLong, variant(i)))
    LshIndex.build(corpus.toDF("doc_id", "text"), root)
    // the removal batch carries the docs' TEXT (change-feed contract):
    // signatures re-derive and cancel the indexed +1 rows exactly
    LshIndex.remove(
      corpus.filter(c => c._1 == 2L || c._1 == 4L).toDF("doc_id", "text"),
      root): Unit
    val probe = Seq((50L, base)).toDF("doc_id", "text")
    def hits() = LshIndex.probe(spark, root, probe, minEst = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val after = hits()
    assert(after.map(_._2) === Set(1L, 3L, 5L),
      s"retracted docs must stop seeding candidates: $after")
    // identical to an index that never saw docs 2 and 4
    val root2 = java.nio.file.Files.createTempDirectory("lsh_rm2").toString
    LshIndex.build(
      corpus.filterNot(c => c._1 == 2L || c._1 == 4L).toDF("doc_id", "text"),
      root2)
    assert(LshIndex.probe(spark, root2, probe, minEst = 0.5)
      .as[(Long, Long, Double)].collect().toSet === after)
    // compaction folds the signs away (no-tombstone fast path restored)
    // and probes identically
    assert(LshIndex.compact(spark, root) === 1)
    assert(!graft.sources.SegmentedStore.anySigned(Seq(
      graft.sources.AtomicStore.list(root).map(_.getPath.toString)
        .find(_.contains("base")).get)))
    assert(hits() === after)
    rmTree(new java.io.File(root))
    rmTree(new java.io.File(root2))
  }
}
