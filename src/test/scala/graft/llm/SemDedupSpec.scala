package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 0.4

  private def fixture() = {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val m = IvfIndex.build(vecs, k = 8)
    val cents = m.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("list_id", "centroid")
    (m, cents)
  }

  test("pairs are exactly the same-cluster brute-force pairs over eps") {
    val (m, _) = fixture()
    val pairs = SemDedup.semanticDupPairs(m.assigned, eps)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // brute force: all pairs, keep same-cluster ones over the threshold
    val rows = m.assigned
      .select(col("vec_id"), col("list_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Int, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0 else dot / (na * nb)
    }
    val brute = (for {
      (ida, la, ea) <- rows; (idb, lb, eb) <- rows
      if ida < idb && la == lb &&
        BigDecimal(cos(ea, eb)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble >= eps
    } yield (ida, idb)).toSet
    assert(pairs === brute)
    assert(pairs.nonEmpty, "threshold produced no pairs — test is vacuous")
  }

  test("keep rule: removed rows are dominated, survivors are not") {
    val (m, cents) = fixture()
    val survivors = SemDedup.removeSemanticDuplicates(m.assigned, cents, eps)
    val kept = survivors.select("vec_id").as[Long].collect().toSet
    val all = m.assigned.select("vec_id").as[Long].collect().toSet
    val removed = all -- kept
    assert(removed.nonEmpty, "eps produced no removals — test is vacuous")
    // centroid similarity per row, same rounding as the engine
    val withC = m.assigned
      .join(broadcast(cents
        .withColumn("centroid", col("centroid").cast("array<float>"))),
        Seq("list_id"))
      .withColumn("ccos", graft.Det.roundSafe(
        EmbeddingOps.cosine("embedding", "centroid"), 6))
      .select(col("vec_id"), col("ccos"))
      .as[(Long, Double)].collect().toMap
    val dupOf = SemDedup.semanticDupPairs(m.assigned, eps)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def dominated(x: Long): Boolean =
      dupOf.getOrElse(x, Set.empty).exists(y =>
        withC(y) < withC(x) || (withC(y) == withC(x) && y < x))
    removed.foreach(x => assert(dominated(x),
      s"removed $x has no dominating near-duplicate"))
    kept.foreach(x => assert(!dominated(x),
      s"survivor $x is dominated and should have been removed"))
  }

  test("determinism and the persisted-model path") {
    val a = SemDedup.forEmbeddings(spark, sf0001, k = 16, eps = eps)
      .select("vec_id").as[Long].collect().toSeq.sorted
    val b = SemDedup.forEmbeddings(spark, sf0001, k = 16, eps = eps)
      .select("vec_id").as[Long].collect().toSeq.sorted
    assert(a === b)
    assert(a.nonEmpty)
  }
}
