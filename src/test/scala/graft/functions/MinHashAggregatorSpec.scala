package graft.functions

import graft.SparkSpec

class MinHashAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("sketch union estimates jaccard of keyed shingle sets") {
    val agg = new MinHashAggregator(128)
    val rnd = new scala.util.Random(3)
    val shared = (0 until 80).map(i => s"sh$i")
    val onlyA = (0 until 20).map(i => s"a$i")
    val onlyB = (0 until 20).map(i => s"b$i")
    // true jaccard = 80 / 120 ≈ 0.667
    val rows = shared.flatMap(s => Seq(("a", s), ("b", s))) ++
      onlyA.map(("a", _)) ++ onlyB.map(("b", _))
    val sigs = rnd.shuffle(rows).toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("sig"))
      .collect().toMap
    val est = MinHashAggregator.estimateJaccard(sigs("a"), sigs("b"))
    assert(math.abs(est - 80.0 / 120.0) < 0.15, s"estimate $est")
  }

  test("merge is order-insensitive (partial aggregation safe)") {
    val agg = new MinHashAggregator(32)
    val xs = Seq("p", "q", "r", "s")
    val one = xs.foldLeft(agg.zero)(agg.reduce)
    val split = agg.merge(
      xs.take(2).foldLeft(agg.zero)(agg.reduce),
      xs.drop(2).foldLeft(agg.zero)(agg.reduce))
    assert(one.toSeq === split.toSeq)
  }
}
