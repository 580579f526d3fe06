package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join ≡ plain inner join on skewed data") {
    // 90% of big-side rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty"))
      .toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = SaltedJoin.inner(big, small, "k", factor = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salt spreads the hot key across partitions") {
    val big = Seq.fill(1000)((7L, 1)).toDF("k", "payload")
    val small = Seq((7L, "hot")).toDF("k", "name")
    val parts = SaltedJoin.inner(big, small, "k", factor = 4)
      .groupBy(spark_partition_id()).count().count()
    assert(parts >= 2, "hot key should land in multiple partitions")
  }
}
