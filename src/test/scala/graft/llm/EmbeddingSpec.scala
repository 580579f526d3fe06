package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float], Int)*) =
    rows.toSeq.toDF("vec_id", "embedding", "label")

  private val rnd = new scala.util.Random(7)
  private def rand64() = Seq.fill(64)(rnd.nextFloat() * 2 - 1)

  test("cosineTopK ranks an identical vector first") {
    val v0 = rand64()
    val jiggled = v0.map(x => x + 0.01f)
    val rows = (2L to 40L).map(i => (i, rand64(), 0)) :+ (0L, v0, 0) :+ (1L, jiggled, 1)
    val top = EmbeddingOps.cosineTopK(vecs(rows: _*), 0L, 5)
      .select("vec_id").as[Long].collect()
    assert(top.head === 1L)
  }

  test("ANN topk recall vs brute force on clustered data") {
    // 10 clusters of 8 near-identical vectors: neighbors are in-cluster.
    val rows = for (c <- 0 until 10; i <- 0 until 8) yield {
      val centre = new scala.util.Random(c).nextInt() // per-cluster seed
      val crnd = new scala.util.Random(c + 100)
      val base = Seq.fill(64)(crnd.nextFloat() * 2 - 1)
      val jit = new scala.util.Random(c * 100 + i)
      ((c * 8 + i).toLong, base.map(x => x + jit.nextFloat() * 0.05f), c)
    }
    val df = vecs(rows: _*)
    val exact = EmbeddingOps.cosineTopK(df, 0L, 5).select("vec_id").as[Long].collect().toSet
    val ann = EmbeddingOps.annTopK(df, 0L, 5).select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"ANN recall too low: $recall (exact=$exact ann=$ann)")
  }

  test("persisted LSH index search matches the inline path and prunes partitions") {
    val sfDir = sf0001
    val vectors = graft.sources.Tables.embeddings(spark, sfDir)
    val inline = EmbeddingOps.annTopK(vectors, 0L, 10)
      .select("vec_id").as[Long].collect().toSeq
    val persisted = EmbeddingOps.annTopKPersisted(spark, sfDir, 0L, 10)
    val got = persisted.select("vec_id").as[Long].collect().toSeq
    // identical hyperplanes → identical buckets → identical candidates
    assert(got === inline)
    // the candidate scan reads the PREBUILT index with (tbl, bkt)
    // partition pruning; the corpus hyperplane pass (zip_with folds over
    // every embedding) must NOT appear in the per-query plan — only the
    // final exact-cosine ranking over candidates does
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "index scan not partition-pruned")
    assert(!plan.contains("zip_with"),
      "per-query plan recomputes corpus hyperplane dot products")
  }

  test("cosineRange is the exact pair superset of the LSH radius path") {
    val v = rand64()
    val dup = v.map(x => x + 0.005f)
    val rows = (2L to 60L).map(i => (i, rand64(), 0)) :+ (0L, v, 0) :+ (1L, dup, 0)
    val df = vecs(rows: _*)
    val exact = EmbeddingOps.cosineRange(df, 0.95)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = EmbeddingOps.cosineNearDupPairs(df, 0.95)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((0L, 1L)), s"planted pair missing from exact: $exact")
    assert(lsh.subsetOf(exact),
      s"LSH must never report a pair the exact search rejects: ${lsh -- exact}")
  }

  test("cosineNearDupPairs finds planted high-cosine pair via LSH buckets") {
    val v = rand64()
    val dup = v.map(x => x + 0.005f)
    val rows = (2L to 60L).map(i => (i, rand64(), 0)) :+ (0L, v, 0) :+ (1L, dup, 0)
    val pairs = EmbeddingOps.cosineNearDupPairs(vecs(rows: _*), 0.95)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }
}
