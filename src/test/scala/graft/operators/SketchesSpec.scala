package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 5000L)
    .map(i => (s"g${i % 4}", i % 1777L))
    .toDF("g", "v")

  test("per-stratum estimates are within HLL error of exact distincts") {
    val sk = Sketches.hllSketches(corpus, $"g", $"v")
    val est = Sketches.hllEstimates(sk)
      .as[(String, Long)].collect().toMap
    val exact = corpus.groupBy($"g").agg(countDistinct($"v").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      // lgK=12 ⇒ rse ≈ 1.04/√4096 ≈ 1.6%; allow 5 sigma
      assert(math.abs(est(g) - n) <= math.max(3, 0.08 * n),
        s"stratum $g: est ${est(g)} vs exact $n")
    }
    val exactAll = corpus.agg(countDistinct($"v")).as[Long].head()
    assert(math.abs(est("__all") - exactAll) <= math.max(3, 0.08 * exactAll))
  }

  test("union of per-stratum sketches ≡ one whole-corpus sketch") {
    // HLL registers fold by max (associative+commutative), so merging the
    // parts must reach the whole's estimate exactly — the property that
    // makes a persisted sketch table answer arbitrary rollups
    val parts = Sketches.hllUnionEstimate(
      Sketches.hllSketches(corpus, $"g", $"v")).as[Long].head()
    val whole = Sketches.hllUnionEstimate(
      Sketches.hllSketches(corpus, lit("x"), $"v")).as[Long].head()
    assert(parts === whole)
    // and the estimate is deterministic under repartitioning
    val re = Sketches.hllUnionEstimate(
      Sketches.hllSketches(corpus.repartition(13), $"g", $"v"))
      .as[Long].head()
    assert(re === parts)
  }

  test("maintained store stays within sketch error of a rebuild") {
    val base = corpus.filter($"v" < 900L)
    val batch = corpus.filter($"v" >= 900L)
      .union(Seq(("gNEW", 42L)).toDF("g", "v")) // a brand-new stratum too
    val maintained = Sketches.maintain(
        Sketches.hllSketches(base, $"g", $"v"), batch, $"g", $"v")
    val a = Sketches.hllEstimates(maintained)
      .as[(String, Long)].collect().toMap
    // same error bound as a direct sketch — the union adds no error
    // beyond the (possible) sparse→dense promotion
    val exact = corpus.union(Seq(("gNEW", 42L)).toDF("g", "v"))
      .groupBy($"g").agg(countDistinct($"v").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(a(g) - n) <= math.max(3, 0.08 * n),
        s"stratum $g: maintained ${a(g)} vs exact $n")
    }
    val rows = maintained.select($"stratum", $"n_rows")
      .as[(String, Long)].collect().toMap
    assert(rows("gNEW") === 1L)
    assert(rows.values.sum === corpus.count() + 1)
  }

  test("set sketches estimate pairwise distinct intersections") {
    // A = 0..999, B = 500..1499 → |A∩B| = 500, J = 1/3, |A∪B| = 1500
    val df = ((0L until 1000L).map(("A", _)) ++
      (500L until 1500L).map(("B", _))).toDF("g", "v")
    val sk = Sketches.setSketches(df, $"g", $"v")
    val est = Sketches.intersectionEstimate(sk, "A", "B")
      .as[(Double, Long, Long)].head()
    assert(math.abs(est._1 - 1.0 / 3) < 0.1, s"jaccard ${est._1}")
    assert(math.abs(est._2 - 1500L) <= 120, s"union ${est._2}")
    assert(math.abs(est._3 - 500L) <= 180, s"intersection ${est._3}")
    // disjoint strata estimate ~zero intersection
    val dj = ((0L until 500L).map(("A", _)) ++
      (5000L until 5500L).map(("B", _))).toDF("g", "v")
    val none = Sketches.intersectionEstimate(
      Sketches.setSketches(dj, $"g", $"v"), "A", "B")
      .as[(Double, Long, Long)].head()
    assert(none._3 <= 40, s"disjoint estimated ${none._3}")
    // deterministic under repartitioning (min/max folds commute)
    val re = Sketches.intersectionEstimate(
      Sketches.setSketches(df.repartition(13), $"g", $"v"), "A", "B")
      .as[(Double, Long, Long)].head()
    assert(re === est)
  }

  test("maintainSet folds an insert batch into the pair table") {
    val base = ((0L until 800L).map(("A", _)) ++
      (500L until 1200L).map(("B", _))).toDF("g", "v")
    val batch = ((800L until 1000L).map(("A", _)) ++
      (1200L until 1500L).map(("B", _))).toDF("g", "v")
    val maintained = Sketches.maintainSet(
      Sketches.setSketches(base, $"g", $"v"), batch, $"g", $"v")
    // MinHash element-wise min is exactly the rebuild's fold, so the
    // Jaccard estimate matches a from-scratch build bit-for-bit
    val rebuilt = Sketches.setSketches(base.union(batch), $"g", $"v")
    val em = Sketches.intersectionEstimate(maintained, "A", "B")
      .as[(Double, Long, Long)].head()
    val er = Sketches.intersectionEstimate(rebuilt, "A", "B")
      .as[(Double, Long, Long)].head()
    assert(em._1 === er._1, "maintained MinHash must equal the rebuild's")
    // truth: A=0..999, B=500..1499 → ∩=500, ∪=1500
    assert(math.abs(em._3 - 500L) <= 180, s"intersection ${em._3}")
    // absent strata fail loudly, not empty
    val e = intercept[IllegalArgumentException](
      Sketches.intersectionEstimate(rebuilt, "nope", "B"))
    assert(e.getMessage.contains("nope"))
  }

  test("sketch table is strata-sized and the union reads only sketches") {
    val sk = Sketches.hllSketches(corpus, $"g", $"v")
    assert(sk.count() === 4)
    // the union aggregates the 4-row sketch table; no join back to corpus
    val plan = Sketches.hllUnionEstimate(sk)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"union must not rescan the corpus:\n$plan")
  }
}
