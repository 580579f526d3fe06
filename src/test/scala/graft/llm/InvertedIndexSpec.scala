package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted inverted index's contract: maintained stats ≡ rebuilt
  * stats after add+delete churn, queries read only their terms' buckets,
  * and compaction is probe-invariant. */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val query = Seq("hash", "join", "vector", "spark")

  private def freshRoot(tag: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), s"invidx_$tag")
    rmTree(f)
    f.toString
  }

  test("maintained ≡ rebuilt after add + delete churn (bitwise BM25 and " +
    "TF-IDF), through compaction") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val root = freshRoot("churn")
    val junk = docs.filter($"doc_id" < 16)
      .select(($"doc_id" + 5000000L).as("doc_id"),
        concat(lit("junk spark hash "), $"text").as("text"))
    InvertedIndex.create(docs.filter(pmod($"doc_id", lit(3)) < 2), root)
    InvertedIndex.add(docs.filter(pmod($"doc_id", lit(3)) === 2), root): Unit
    InvertedIndex.add(junk, root): Unit
    InvertedIndex.remove(junk, root): Unit
    assert(InvertedIndex.segmentCount(root) === 4)
    // the net state is exactly `docs`: the maintained BM25 must equal the
    // recompute BITWISE (same arithmetic, same rounding, same tie-break)
    val expected = Retrieval.bm25TopK(docs, query, 20)
      .as[(Long, Double)].collect().toSeq
    assert(InvertedIndex.bm25TopK(spark, root, query, 20)
      .as[(Long, Double)].collect().toSeq === expected)
    val expTfidf = Retrieval.tfidf(docs, query)
      .orderBy("doc_id", "tok").collect().toSeq
    assert(InvertedIndex.tfidf(spark, root, query)
      .orderBy("doc_id", "tok").collect().toSeq === expTfidf)
    // compaction folds churn to net rows: fully-retracted docs leave the
    // artifact, scores unchanged
    assert(InvertedIndex.compact(spark, root) === 1)
    assert(InvertedIndex.bm25TopK(spark, root, query, 20)
      .as[(Long, Double)].collect().toSeq === expected)
    val postDocs = spark.read
      .parquet(s"${graft.sources.SegmentedStore.liveEntries(root).head}/postings")
      .filter($"doc_id" >= 5000000L)
    assert(postDocs.isEmpty, "retracted docs must vacate the compacted base")
  }

  test("a query scans only its terms' postings buckets (partition-pruned)") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val root = freshRoot("prune")
    InvertedIndex.create(docs, root)
    val plan = InvertedIndex.bm25TopK(spark, root, query, 10)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("bkt"),
      s"expected bkt partition pruning in:\n$plan")
    // driver-side bucket arithmetic must agree with the engine's
    // xxhash64: a probe for each query term lands in a pruned-in bucket
    val engineBuckets = docs.sparkSession
      .sql(s"SELECT ${query.map(t => s"pmod(xxhash64('$t'), " +
        s"${InvertedIndex.Buckets})").mkString(", ")}")
      .head().toSeq.map(_.asInstanceOf[Long]).toSet
    val hits = InvertedIndex.bm25TopK(spark, root, query, 10).count()
    assert(hits > 0, "query terms exist in the fixture; pruning must not " +
      s"drop them (engine buckets: $engineBuckets)")
  }

  test("retracting every document empties the index") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .filter($"doc_id" < 20)
    val root = freshRoot("empty")
    InvertedIndex.create(docs, root)
    InvertedIndex.remove(docs, root): Unit
    assert(InvertedIndex.bm25TopK(spark, root, query, 10).isEmpty)
    InvertedIndex.compact(spark, root): Unit
    assert(InvertedIndex.bm25TopK(spark, root, query, 10).isEmpty)
  }
}
