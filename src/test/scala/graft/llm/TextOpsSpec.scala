package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gopherRules: each rule trips on its own pathology") {
    val good = (Seq("the", "of", "and", "that") ++
      (1 to 60).map(i => s"word$i")).mkString(" ")
    val docs = Seq(
      (1L, good),                                   // passes everything
      (2L, "the of too short"),                     // word count < 50
      (3L, (Seq("the", "of") ++ (1 to 60).map(_ => "a")).mkString(" ")),
                                                    // mean word length < 3
      (4L, (Seq("the", "of") ++ (1 to 60).map(i => s"w$i###")).mkString(" ")),
                                                    // symbol ratio ≥ 0.1
      (5L, (Seq("the", "of") ++ (1 to 60).map(_ => "12345")).mkString(" ")),
                                                    // alpha fraction ≤ 0.8
      (6L, (1 to 60).map(i => s"word$i").mkString(" ")),
                                                    // < 2 stop-word kinds
      (7L, (1 to 60).map(i => s"- the of bullet$i line").mkString("\n")),
                                                    // ≥ 90% bullet lines
      (8L, (1 to 60).map(i => s"the of line$i trails ...").mkString("\n")))
                                                    // ≥ 30% ellipsis lines
      .toDF("doc_id", "text")
    val got = TextOps.gopherRules(docs)
      .select("doc_id", "gopher_pass").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> 0L))
    // the measurements behind the verdicts are exposed for re-thresholding
    val m = TextOps.gopherRules(docs).filter($"doc_id" === 7L)
      .select("bullet_frac").as[Double].head()
    assert(m === 1.0)
  }

  test("termFrequencies counts tokens across the corpus") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextOps.termFrequencies(docs).as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("bigramLmScore: hand-computed integer micro-probabilities") {
    val docs = Seq(
      (1L, "a b a b"), // bigram instances (a,b) (b,a) (a,b)
      (2L, "a b c"),   // (a,b) (b,c)
      (3L, "x"))       // no bigrams — absent from the output
      .toDF("doc_id", "text")
    // corpus: c2(a,b)=3 c2(b,a)=1 c2(b,c)=1; c1(a)=3 c1(b)=2
    // micro(a,b) = 1e6*3 div 3 = 1000000; micro(b,a) = micro(b,c) = 500000
    val got = TextOps.bigramLmScore(docs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((3L, (1000000L + 500000L + 1000000L) / 3)), // 833333
      2L -> ((2L, 750000L))))
  }

  test("refLmFilter: reference-only counts, penalized unigram backoff, " +
      "zero for out-of-reference words") {
    val ref = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    // reference: c2(a,b)=2 c2(b,a)=1 c2(b,c)=1; c1(a)=2 c1(b)=2
    // unigrams: a=2 b=2 c=1; T=5
    val docs = Seq(
      (1L, "a b"),   // known bigram: 1e6*2 div 2 = 1000000
      (2L, "c a"),   // unseen bigram (c,a): backoff 1e5*2 div 5 = 40000
      (3L, "a z"),   // unseen bigram, z out-of-reference: 0
      (4L, "b c b a")) // (b,c)=5e5, (c,b) backoff b: 40000, (b,a)=5e5
      .toDF("doc_id", "text")
    val got = TextOps.refLmFilter(docs, ref, keepAboveMicro = 100000L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 1000000L, 1L),
      (2L, 1L, 40000L, 0L),
      (3L, 1L, 0L, 0L),
      (4L, 3L, (500000L + 40000L + 500000L) / 3, 1L))) // 346666
  }

  test("refLmFilter fails LOUDLY on an empty reference slice instead of " +
      "silently nulling every backoff score") {
    val docs = Seq((1L, "c a")).toDF("doc_id", "text") // backoff path
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[Exception](
      TextOps.refLmFilter(docs, empty, keepAboveMicro = 0L).collect())
    assert(e.getMessage.contains("empty reference"),
      s"wanted the empty-reference error, got: ${e.getMessage}")
  }

  test("letterEntropy matches closed-form values and stays map-only") {
    val docs = Seq(
      (1L, "aabb"),         // two letters, uniform → exactly 1 bit
      (2L, "AbCd"),         // case-folded uniform over 4 → exactly 2 bits
      (3L, "zzzzzz"),       // single letter → 0 bits
      (4L, "123 !?"),       // no letters at all → defined as 0
      (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val got = TextOps.letterEntropy(docs)
      .select("doc_id", "n_letters", "entropy_bits")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((4L, 1.0)))
    assert(got(2L) === ((4L, 2.0)))
    assert(got(3L) === ((6L, 0.0)))
    assert(got(4L) === ((0L, 0.0)))
    // pangram: 26 letters, 'o' ×4, 'e','u','h','r','t' ×2, rest ×1 over 35
    val (n5, h5) = got(5L)
    val counts = "thequickbrownfoxjumpsoverthelazydog"
      .groupBy(identity).values.map(_.length.toDouble).toSeq
    val n = counts.sum
    val expected = counts.map(c => -c / n * math.log(c / n) / math.log(2)).sum
    assert(n5 === 35L)
    assert(math.abs(h5 - expected) < 1e-6, s"pangram entropy $h5 vs $expected")
    // the whole thing is a projection: no Exchange anywhere in the plan
    val plan = TextOps.letterEntropy(docs).queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"letterEntropy must not shuffle:\n$plan")
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

  test("scrubPii redacts emails, SSNs, phones and IPv4s, leaving prose alone") {
    val docs = Seq(
      (1L, "write to jane.doe+spam@corp.example.co.uk or bob@ex.io today"),
      (2L, "ssn 123-45-6789 phone 555-867-5309 also 555.867.5309"),
      (3L, "server at 10.0.255.7 logged it"),
      (4L, "plain text with numbers 12345 and a date 2024-01-02 kept"))
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id", TextOps.scrubPii($"text").as("t"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "write to <EMAIL> or <EMAIL> today")
    assert(got(2L) === "ssn <SSN> phone <PHONE> also <PHONE>")
    assert(got(3L) === "server at <IP> logged it")
    // no false positives: bare numbers and dates survive
    assert(got(4L) === "plain text with numbers 12345 and a date 2024-01-02 kept")
  }

  test("repetition stats: duplicate word and bigram fractions") {
    val docs = Seq(
      (1L, "a b c d"),          // all distinct: 0, 0
      (2L, "a a a a"),          // 1 distinct word of 4; 1 distinct bigram of 3
      (3L, "x y x y x"),        // 2 of 5 words; bigrams: x y, y x → 2 of 4
      (4L, "solo"))             // single word: bigram frac guarded to 0
      .toDF("doc_id", "text")
    val got = TextOps.repetitionStats(docs)
      .select($"doc_id", $"n_words", $"dup_word_frac", $"dup_bigram_frac")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((4L, 0.0, 0.0)))
    assert(got(2L) === ((4L, 0.75, math.floor((1.0 - 1.0 / 3) * 1e4 + 0.5) / 1e4)))
    assert(got(3L) === ((5L, 0.6, 0.5)))
    assert(got(4L) === ((1L, 0.0, 0.0)))
  }

  test("quality score is monotone in length up to the cap") {
    val docs = Seq((1L, "one two"), (2L, Seq.fill(60)("word").mkString(" ")))
      .toDF("doc_id", "text")
    val q = TextOps.qualityScored(docs)
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    assert(q(2L) > q(1L))
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("c4Rules: line keeps, sentence count, page verdicts per the paper") {
    val good = (1 to 6).map(i => s"this is sentence number $i.").mkString("\n")
    val docs = Seq(
      (1L, good),                                    // passes everything
      (2L, "no punctuation here\nshort.\nuses javascript today.\n" +
        "a good line stays here."),                  // line rules bite
      (3L, good + "\nlorem ipsum dolor sit."),       // lorem page drop
      (4L, good + "\nhas a { brace."),               // brace page drop
      (5L, good + "\nhas obscene0 inside."),         // blocklist page drop
      (6L, good + "\nobscene0!")                     // punctuation/newline-
                                                     // adjacent blockword
    ).toDF("doc_id", "text")
    val got = TextOps.c4Rules(docs)
      .select($"doc_id", $"n_lines", $"n_kept_lines", $"clean_text",
        $"n_sentences", $"has_lorem", $"has_brace", $"has_blockword",
        $"c4_pass")
      .as[(Long, Long, Long, String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._9 === 1L && got(1L)._5 === 6L)
    // doc 2: "no punctuation" dropped (no terminal mark), "short." dropped
    // (<3 words), the javascript line dropped, one survivor
    assert(got(2L)._2 === 4L && got(2L)._3 === 1L)
    assert(got(2L)._4 === "a good line stays here.")
    assert(got(2L)._9 === 0L, "fewer than 5 sentences must fail the page")
    assert(got(3L)._6 === 1L && got(3L)._9 === 0L)
    assert(got(4L)._7 === 1L && got(4L)._9 === 0L)
    assert(got(5L)._8 === 1L && got(5L)._9 === 0L)
    assert(got(6L)._8 === 1L && got(6L)._9 === 0L,
      "a blockword adjacent to punctuation/newline must still be caught")
    // map-only: no exchange anywhere in the plan
    val plan = TextOps.c4Rules(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"c4Rules must stay map-only:\n$plan")
  }
}
