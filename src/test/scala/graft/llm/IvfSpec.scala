package graft.llm

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF search recall vs brute force on the corpus") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = IvfIndex.build(vecs, k = 8)
    val exact = EmbeddingOps.cosineTopK(vecs, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    // probing ALL lists must equal brute force exactly
    val all = IvfIndex.search(m, 0L, 10, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(all === exact)
    // probing half the lists keeps decent recall
    val half = IvfIndex.search(m, 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(half).size.toDouble / exact.size
    assert(recall >= 0.5, s"nProbe=4 recall $recall")
  }

  test("saved index round-trips and search prunes to the probed lists") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = IvfIndex.build(vecs, k = 8)
    val path = new java.io.File(sys.props("java.io.tmpdir"), "ivf_rt_test")
    rmTree(path)
    IvfIndex.save(m, path.toString)
    val loaded = IvfIndex.load(spark, path.toString)
    assert(loaded.centroids.map(_.toSeq).toSeq === m.centroids.map(_.toSeq).toSeq)
    assert(loaded.assigned.count() === m.assigned.count())
    // identical search results through the persisted index
    val before = IvfIndex.search(m, 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val after = IvfIndex.search(loaded, 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(after === before)
    // the probe reads only the probed posting lists: list_id is a
    // partition column, so the isin filter prunes at scan time
    val scan = IvfIndex.search(loaded, 0L, 10, nProbe = 2).queryExecution
      .executedPlan.toString()
    assert(scan.contains("PartitionFilters") && scan.contains("list_id"),
      s"expected list_id partition pruning in:\n$scan")
  }

  test("assignment is a complete partitioning of the vectors") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = IvfIndex.build(vecs, k = 8)
    assert(m.assigned.count() === vecs.count())
    assert(m.assigned.select("list_id").distinct().count() <= 8)
  }

  test("append lifecycle: create + 2 appends ≡ one-shot encode at the " +
    "fixed model, through compaction") {
    import org.apache.spark.sql.functions._
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val root = new java.io.File(sys.props("java.io.tmpdir"), "ivf_app_test")
    rmTree(root)
    // model fits on the FIRST HALF only; later batches assign, never re-fit
    IvfIndex.create(vecs.filter(pmod(col("vec_id"), lit(4)) < 2),
      root.toString, k = 8)
    IvfIndex.append(vecs.filter(pmod(col("vec_id"), lit(4)) === 2),
      root.toString): Unit
    IvfIndex.append(vecs.filter(pmod(col("vec_id"), lit(4)) === 3),
      root.toString): Unit
    // an EMPTY ingest micro-batch must not wedge the store (a zero-row
    // partitionBy write would leave a schema-less segment)
    IvfIndex.append(vecs.filter(lit(false)), root.toString): Unit
    // retract an eighth of the corpus as a signed tombstone segment
    IvfIndex.remove(vecs.filter(pmod(col("vec_id"), lit(8)) === 7),
      root.toString): Unit
    assert(IvfIndex.segmentCount(root.toString) === 5)
    val survivors = vecs.filter(pmod(col("vec_id"), lit(8)) =!= 7)
    val idx = IvfIndex.readIndex(spark, root.toString)
    // ROW-level identity: the maintained index's assignments equal a
    // one-shot assignment of the SURVIVING corpus at the same centroids
    val oneShot = IvfIndex.assignWith(idx.centroids, survivors)
      .select("vec_id", "list_id")
    assert(idx.assigned.select("vec_id", "list_id")
      .exceptAll(oneShot).isEmpty)
    assert(oneShot.exceptAll(
      idx.assigned.select("vec_id", "list_id")).isEmpty)
    // PROBE identity vs the one-shot index at the same model
    val expected = IvfIndex.search(
      IvfIndex.Model(idx.centroids,
        IvfIndex.assignWith(idx.centroids, survivors)),
      0L, 10, nProbe = 4).select("vec_id").as[Long].collect().toSeq
    val got = IvfIndex.search(idx, 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === expected)
    // a removed vector can never surface, however deep the probe
    val deep = IvfIndex.search(idx, 0L, 1000, nProbe = 8)
      .select("vec_id").as[Long].collect()
    assert(deep.forall(_ % 8 != 7))
    // compaction folds the signs away to one entry, probes identically,
    // and restores the plain-union (no-tombstone) read fast path
    assert(IvfIndex.compact(spark, root.toString) === 1)
    assert(!graft.sources.SegmentedStore.anySigned(
      graft.sources.SegmentedStore.liveEntries(root.toString)))
    val afterCompact = IvfIndex.search(
      IvfIndex.readIndex(spark, root.toString), 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(afterCompact === expected)
  }

  test("refit: an undrifted refit is probe-identical; a drifted refit " +
      "recovers recall to the fresh-build model, tombstones preserved") {
    import org.apache.spark.sql.functions._
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val half = vecs.filter(pmod(col("vec_id"), lit(2)) === 0)
    val root = new java.io.File(sys.props("java.io.tmpdir"), "ivf_refit_test")
    rmTree(root)
    IvfIndex.create(half, root.toString, k = 8)
    val before = IvfIndex.search(
      IvfIndex.readIndex(spark, root.toString), 2L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    // UNDRIFTED refit: same live content ⇒ same (canonicalized, seeded)
    // fit ⇒ identical centroids ⇒ probe-identical search
    IvfIndex.refit(spark, root.toString)
    val after = IvfIndex.search(
      IvfIndex.readIndex(spark, root.toString), 2L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(after === before)
    // remove a slice, then refit again — the refit re-trains on the
    // survivors only and must not resurrect the removed vectors
    IvfIndex.remove(half.filter(pmod(col("vec_id"), lit(8)) === 0),
      root.toString): Unit
    IvfIndex.refit(spark, root.toString)
    assert(IvfIndex.search(IvfIndex.readIndex(spark, root.toString),
      2L, 1000, nProbe = 8).select("vec_id").as[Long].collect()
      .forall(_ % 8 != 0), "refit resurrected a removed vector")
    // DRIFT: a second population the original centroids never saw
    // (reversed embeddings, disjoint ids) arrives by append
    val drifted = vecs.filter(pmod(col("vec_id"), lit(2)) === 1)
      .withColumn("embedding", reverse(col("embedding")))
      .withColumn("vec_id", col("vec_id") + 1000000L)
    IvfIndex.append(drifted, root.toString): Unit
    val live = half.filter(pmod(col("vec_id"), lit(8)) =!= 0)
      .unionByName(drifted)
    val probeId = drifted.select("vec_id").as[Long].head()
    val exact = EmbeddingOps.cosineTopK(live, probeId, 10)
      .select("vec_id").as[Long].collect().toSet
    def recallAt(m: IvfIndex.Model): Double =
      exact.intersect(IvfIndex.search(m, probeId, 10, nProbe = 4)
        .select("vec_id").as[Long].collect().toSet).size.toDouble / exact.size
    val preRecall = recallAt(IvfIndex.readIndex(spark, root.toString))
    // refit re-trains on the CURRENT live corpus and re-encodes
    IvfIndex.refit(spark, root.toString)
    val postIdx = IvfIndex.readIndex(spark, root.toString)
    val postRecall = recallAt(postIdx)
    // fresh build on the same live corpus: the bar refit must meet
    val fresh = IvfIndex.build(live, k = 8)
    assert(postRecall >= recallAt(fresh) - 1e-9,
      s"post-refit recall $postRecall < fresh-build ${recallAt(fresh)}")
    assert(postRecall >= preRecall - 1e-9,
      s"refit reduced recall: $preRecall -> $postRecall")
    // strongest form: the refitted model IS the fresh-build model
    assert(postIdx.centroids.map(_.toSeq).toSeq ===
      fresh.centroids.map(_.toSeq).toSeq)
    // appends after the refit encode at the NEW model
    IvfIndex.append(drifted.limit(0), root.toString): Unit
    assert(IvfIndex.search(IvfIndex.readIndex(spark, root.toString),
      probeId, 10, nProbe = 4).select("vec_id").as[Long].collect().toSet
      === IvfIndex.search(fresh, probeId, 10, nProbe = 4)
        .select("vec_id").as[Long].collect().toSet)
  }
}
