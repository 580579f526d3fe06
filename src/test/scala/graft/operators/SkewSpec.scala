package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // planted hot key: 80% of the skewed side lands on key 7
  private lazy val skewed = spark.range(0, 5000)
    .select(when($"id" % 5 =!= 0, 7L).otherwise($"id" % 100).as("k"),
      $"id".as("payload"))
  private lazy val dim = spark.range(0, 100)
    .select($"id".as("k"), concat(lit("v"), $"id").as("attr"))

  test("salted inner join ≡ plain inner join on a hot-key corpus") {
    val plain = skewed.join(dim, "k")
    val got = SkewJoin.salted(skewed, dim, "k", salt = 8)
    assert(got.columns.toSeq === plain.columns.toSeq) // no salt leak
    assert(got.count() === plain.count())
    assert(got.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(got).count() === 0)
  }

  test("salted left-outer join keeps unmatched left rows exactly once") {
    val dimMissingHot = dim.filter($"k" =!= 7) // the hot key has NO match
    val plain = skewed.join(dimMissingHot, Seq("k"), "left_outer")
    val got = SkewJoin.salted(skewed, dimMissingHot, "k", salt = 8, "left_outer")
    assert(got.count() === plain.count())
    assert(got.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(got).count() === 0)
    // every hot-key row survives with a null attr, not dropped, not duplicated
    assert(got.filter($"k" === 7 && $"attr".isNull).count() ===
      skewed.filter($"k" === 7).count())
  }

  test("salting spreads the hot key across the shuffle") {
    // group the SALTED join keys the way the shuffle would (same
    // content-hash mapping as the operator): the hot key's rows — payloads
    // vary — must land in `salt` distinct (k, salt) groups, not one
    val salt = 8
    val saltedKeys = skewed
      .withColumn("__salt", pmod(xxhash64(skewed.columns.map(col): _*), lit(salt.toLong)))
      .filter($"k" === 7).select("__salt").distinct().count()
    assert(saltedKeys === salt.toLong,
      s"expected the hot key spread over $salt sub-keys, got $saltedKeys")
  }

  test("AQE splits the skewed sort-merge partition at runtime") {
    // the adaptive half of the skew story: same hot-key shape, no salting —
    // OptimizeSkewedJoin must mark and split the oversized partition
    val keys = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.keys.map(k => k -> spark.conf.getOption(k)).toSeq
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fatLeft = spark.range(0, 200000)
        .select(when($"id" % 10 =!= 0, 7L).otherwise($"id" % 1000).as("k"),
          lpad($"id".cast("string"), 48, "x").as("pay"))
      val right = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("v"))
      val j = fatLeft.hint("merge").join(right.hint("merge"), "k")
      // run THIS dataset's own QueryExecution (count() would plan a
      // different query and leave this one's adaptive plan unfinalized)
      assert(j.collect().length === 200000) // every left row matches once
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join skewed:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("unsupported join types are rejected loudly") {
    intercept[IllegalArgumentException](
      SkewJoin.salted(skewed, dim, "k", 8, "full_outer"))
    intercept[IllegalArgumentException](
      SkewJoin.salted(skewed, dim, "k", 0))
    // a pre-existing __salt column would be silently clobbered — rejected
    intercept[IllegalArgumentException](
      SkewJoin.salted(skewed.withColumn("__salt", lit(1)), dim, "k", 8))
  }
}
