package graft.functions

import graft.SparkSpec
import graft.llm.EmbeddingOps
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(11)
    (0 until 200).map(i => (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
  }

  test("native codegen kernel is bit-identical to the HOF formulation") {
    GraftFunctions.register(spark)
    val pairs = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
      .select(EmbeddingOps.cosine("a.v", "b.v").as("native"),
        EmbeddingOps.cosineHof("a.v", "b.v").as("hof"))
    assert(pairs.filter($"native" =!= $"hof").count() === 0)
    assert(pairs.count() === 199 * 200 / 2)
  }

  test("interpreted eval agrees with codegen") {
    GraftFunctions.register(spark)
    // power-of-two vectors have exact norms → exactly 1.0 / 0.0
    val a = Seq((Seq(2f, 0f, 0f), Seq(2f, 0f, 0f)), (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)))
      .toDF("x", "y")
    val got = a.select(expr("cosine_sim(x, y)")).as[Double].collect().toSeq
    assert(got === Seq(1.0, 0.0))
  }

  test("dimension mismatch throws instead of silently truncating") {
    GraftFunctions.register(spark)
    val bad = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("x", "y")
    val e = intercept[Exception](bad.select(expr("cosine_sim(x, y)")).collect())
    assert(e.getMessage.contains("dimension mismatch")
      || Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("a null element yields NULL (propagates like the HOF), not 0.0") {
    GraftFunctions.register(spark)
    val withNull = Seq((Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 2f, 3f)))
      .toDF("x", "y")
    val native = withNull.select(expr("cosine_sim(x, y)").as("c")).collect()
    assert(native.head.isNullAt(0), "codegen path must return NULL")
    // HOF formulation on the same input also nulls out — semantics agree
    val hof = withNull.select(EmbeddingOps.cosineHof("x", "y").as("c")).collect()
    assert(hof.head.isNullAt(0), "HOF reference must return NULL")
  }

  test("type check rejects non-float arrays") {
    GraftFunctions.register(spark)
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("x", "y")
    val e = intercept[Exception](bad.select(expr("cosine_sim(x, y)")).collect())
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }
}
