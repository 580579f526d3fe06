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

  test("assignment is a complete partitioning of the vectors") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = IvfIndex.build(vecs, k = 8)
    assert(m.assigned.count() === vecs.count())
    assert(m.assigned.select("list_id").distinct().count() <= 8)
  }
}
