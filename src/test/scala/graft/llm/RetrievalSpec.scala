package graft.llm

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private val corpus = Seq(
    (1L, "cat dog cat"),
    (2L, "dog fish"),
    (3L, "bird bird bird cat")).toDF("doc_id", "text")

  test("bm25TopK matches a hand-rolled scorer on a tiny corpus") {
    val query = Seq("cat", "fish")
    val got = Retrieval.bm25TopK(corpus, query, k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))

    // naive reference: same formula, no Spark
    val toks = Map(1L -> Seq("cat", "dog", "cat"), 2L -> Seq("dog", "fish"),
      3L -> Seq("bird", "bird", "bird", "cat"))
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    def df(t: String) = toks.values.count(_.contains(t)).toDouble
    def score(d: Long) = round6(query.map { t =>
      val tf = toks(d).count(_ == t).toDouble
      if (tf == 0) 0.0
      else {
        val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        idf * tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * toks(d).size / avgdl))
      }
    }.sum)
    val expect = toks.keys.toSeq.map(d => d -> score(d))
      .sortBy { case (d, s) => (-s, d) }
    assert(got.map(_._1).toSeq === expect.map(_._1))
    got.zip(expect).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-9, s"got $g expected $e")
    }
    // doc 2 is the only fish holder; rare term dominates common `cat`
    assert(got.head._1 === 2L)
  }

  test("tfidf: exact weights, restricted to the vocabulary") {
    val rows = Retrieval.tfidf(corpus, Seq("cat", "fish"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(t => (t._1, t._2))
    // cat: df=2 (docs 1,3); fish: df=1 (doc 2); N=3
    val catW = (tf: Long) => round6(tf * math.log(3.0 / 2.0))
    val fishW = (tf: Long) => round6(tf * math.log(3.0 / 1.0))
    assert(rows === Seq(
      (1L, "cat", 2L, 2L, catW(2)),
      (2L, "fish", 1L, 1L, fishW(1)),
      (3L, "cat", 1L, 2L, catW(1))))
  }

  test("corpus run: scores descend, k bounds, query-term containment") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val top = Retrieval.bm25TopK(docs,
      Seq("hash", "join", "vector", "spark"), k = 10).collect()
    assert(top.length === 10)
    val scores = top.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every scored doc actually contains a query term
    val ids = top.map(_.getLong(0)).toSeq
    val hit = docs.filter(col("doc_id").isin(ids: _*))
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(hit.forall { case (_, t) =>
      Seq("hash", "join", "vector", "spark").exists(t.split(" ").contains)
    })
    // the term-df broadcast is tiny and the plan broadcasts it
    val plan = Retrieval.bm25TopK(docs, Seq("hash"), k = 5)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("hybrid RRF fuses lexical and vector ranks; both sources beat one") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val query = Seq("hash", "join", "vector", "spark")
    val fused = Retrieval.hybridRrf(docs, vecs, query, probeId = 0L, k = 20)
    val rows = fused.collect()
    assert(rows.length === 20)
    // rrf recomputes from the emitted ranks exactly
    rows.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
      val vec = Option(r.getAs[java.lang.Long]("vec_rank")).map(_.toLong)
      val expect = round6(lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vec.map(x => 1.0 / (60 + x)).getOrElse(0.0))
      assert(r.getAs[Double]("rrf") === expect)
    }
    // descending rrf with doc_id tiebreak
    val rrfs = rows.map(r => (r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(rrfs.sortBy { case (s, id) => (-s, id) }.toSeq === rrfs.toSeq)
    // a doc present in BOTH pools outranks (higher rrf than) any doc whose
    // best case is a single top rank, per the RRF bound 2/(60+pool)>1/61
    val both = rows.filter(r => !r.isNullAt(r.fieldIndex("lex_rank")) &&
      !r.isNullAt(r.fieldIndex("vec_rank")))
    if (both.nonEmpty) assert(both.head.getAs[Double]("rrf") > 0.0)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
