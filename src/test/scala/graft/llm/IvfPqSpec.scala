package graft.llm

import graft.SparkSpec

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("IVF+PQ recall: all lists + full rerank ≡ brute force; pruned stays decent") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = IvfPq.build(vecs, k = 8)
    val exact = EmbeddingOps.cosineTopK(vecs, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    // probing every list with a corpus-wide rerank pool ranks every vector
    // exactly — must equal brute force
    val full = IvfPq.search(m, vecs, 0L, 10, nProbe = 8,
        rerank = vecs.count().toInt)
      .select("vec_id").as[Long].collect().toSet
    assert(full === exact)
    // pruned + compressed: half the lists, bounded rerank
    val approx = IvfPq.search(m, vecs, 0L, 10, nProbe = 4, rerank = 50)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"nProbe=4/rerank=50 recall $recall")
    // the pruned candidate set can never beat the same rerank over all
    // lists (it scans a subset) — sanity on the composition
    val allLists = IvfPq.search(m, vecs, 0L, 10, nProbe = 8, rerank = 50)
      .select("vec_id").as[Long].collect().toSet
    val recallAll = exact.intersect(allLists).size.toDouble / exact.size
    assert(recallAll >= recall)
  }

  test("persisted index round-trips and search prunes to the probed lists") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = IvfPq.build(vecs, k = 8)
    val path = new java.io.File(sys.props("java.io.tmpdir"), "ivfpq_rt_test")
    rmTree(path)
    IvfPq.save(m, path.toString)
    val loaded = IvfPq.load(spark, path.toString)
    assert(loaded.centroids.map(_.toSeq).toSeq === m.centroids.map(_.toSeq).toSeq)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      m.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    assert(loaded.codes.count() === m.codes.count())
    val before = IvfPq.search(m, vecs, 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val after = IvfPq.search(loaded, vecs, 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(after === before)
    // list_id is a partition column of the persisted codes: the isin
    // filter prunes at scan time, and the scan reads codes — not vectors
    val plan = IvfPq.search(loaded, vecs, 0L, 10, nProbe = 2).queryExecution
      .executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"expected list_id partition pruning in:\n$plan")
  }

  test("append lifecycle: create + 2 appends ≡ one-shot at the fixed " +
    "model, through compaction, with partition pruning intact") {
    import org.apache.spark.sql.functions._
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val root = new java.io.File(sys.props("java.io.tmpdir"), "ivfpq_app_test")
    rmTree(root)
    IvfPq.create(vecs.filter(pmod(col("vec_id"), lit(4)) < 2),
      root.toString, k = 8)
    IvfPq.append(vecs.filter(pmod(col("vec_id"), lit(4)) === 2),
      root.toString): Unit
    IvfPq.append(vecs.filter(pmod(col("vec_id"), lit(4)) === 3),
      root.toString): Unit
    // empty micro-batch must not wedge the store; removal retracts an
    // eighth as a signed tombstone segment
    IvfPq.append(vecs.filter(lit(false)), root.toString): Unit
    IvfPq.remove(vecs.filter(pmod(col("vec_id"), lit(8)) === 7),
      root.toString): Unit
    assert(IvfPq.segmentCount(root.toString) === 5)
    val survivors = vecs.filter(pmod(col("vec_id"), lit(8)) =!= 7)
    val idx = IvfPq.readIndex(spark, root.toString)
    // one-shot list-tagged codes of the SURVIVORS at the SAME model
    val oneShot = PqIndex.encodeWith(idx.codebooks, survivors)
      .join(IvfIndex.assignWith(idx.centroids, survivors)
        .select("vec_id", "list_id"), "vec_id")
    assert(idx.codes.exceptAll(oneShot).isEmpty)
    assert(oneShot.exceptAll(idx.codes).isEmpty)
    val expected = IvfPq.search(
      IvfPq.Model(idx.centroids, idx.codebooks, oneShot),
      vecs, 0L, 10, nProbe = 4).select("vec_id").as[Long].collect().toSeq
    assert(IvfPq.search(idx, vecs, 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq === expected)
    assert(IvfPq.compact(spark, root.toString) === 1)
    val compacted = IvfPq.readIndex(spark, root.toString)
    assert(IvfPq.search(compacted, vecs, 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq === expected)
    // pruning survives append + compaction (base is list_id-partitioned)
    val plan = IvfPq.search(compacted, vecs, 0L, 10, nProbe = 2)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"expected list_id partition pruning in:\n$plan")
  }

  test("refit: the composed index re-trains both quantizers on its own " +
      "live vectors and lands on the fresh-build model") {
    import org.apache.spark.sql.functions._
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val half = vecs.filter(pmod(col("vec_id"), lit(2)) === 0)
    val root = new java.io.File(sys.props("java.io.tmpdir"), "ivfpq_refit_test")
    rmTree(root)
    IvfPq.create(half, root.toString, k = 8)
    val before = IvfPq.search(IvfPq.readIndex(spark, root.toString),
      half, 2L, 10, nProbe = 4).select("vec_id").as[Long].collect().toSeq
    // UNDRIFTED refit is probe-identical (no external table needed —
    // the IVF sub-store carries the live vectors)
    IvfPq.refit(spark, root.toString)
    assert(IvfPq.search(IvfPq.readIndex(spark, root.toString),
      half, 2L, 10, nProbe = 4).select("vec_id").as[Long].collect()
      .toSeq === before)
    // DRIFT arrives through the append path (which now keeps the
    // component stores in lockstep — refit reads live vectors from
    // the IVF sub-store's own segments)
    val drifted = vecs.filter(pmod(col("vec_id"), lit(2)) === 1)
      .withColumn("embedding", reverse(col("embedding")))
      .withColumn("vec_id", col("vec_id") + 1000000L)
    IvfPq.append(drifted, root.toString): Unit
    val live = half.unionByName(drifted)
    IvfPq.refit(spark, root.toString)
    val idx = IvfPq.readIndex(spark, root.toString)
    val fresh = IvfPq.build(live, k = 8)
    assert(idx.centroids.map(_.toSeq).toSeq ===
      fresh.centroids.map(_.toSeq).toSeq)
    assert(idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      fresh.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val probeId = drifted.select("vec_id").as[Long].head()
    assert(IvfPq.search(idx, live, probeId, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq ===
      IvfPq.search(fresh, live, probeId, 10, nProbe = 4)
        .select("vec_id").as[Long].collect().toSeq)
  }
}
