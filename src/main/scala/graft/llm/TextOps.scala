package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, corpus
  * stats, quality scoring, language ID, document fingerprinting.
  *
  * All token/n-gram machinery uses codegen'd higher-order functions
  * (`split` / `transform` / `filter` / `explode`) — no UDFs, so the hot
  * path stays inside WholeStageCodegen and scales linearly with executors.
  */
object TextOps {

  /** Whitespace tokens as an array column (documents are single-space
    * separated; matches DuckDB `string_split(text, ' ')` for oracles). */
  val tokens: Column = split(col("text"), " ")

  /** Character n-grams of `text` as an array column (with counts, i.e. not
    * deduplicated). For text shorter than n, the single truncated gram. */
  def charNgrams(n: Int): Column =
    expr(s"transform(sequence(0, greatest(length(text) - $n, 0)), i -> substring(text, i + 1, $n))")

  /** Word k-shingles (distinct) — the unit for MinHash/Jaccard dedup. */
  def wordShingles(k: Int): Column =
    // the outer single-element transform BINDS the split once per row —
    // slice(split(text), …) inside the position lambda would re-split
    // the whole text per position (O(words²) per document; measured as
    // the dominant per-task cost of the span/ngram dedup keys)
    expr(s"""array_distinct(flatten(transform(array(split(text, ' ')), ws ->
       |  transform(sequence(0, greatest(size(ws) - $k, 0)),
       |    i -> concat_ws(' ', slice(ws, i + 1, $k))))))""".stripMargin)

  /** Token frequency over a corpus: one explode + one hash aggregate. */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(explode(tokens).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))

  /** Bigram language-model document scoring — the cheap perplexity proxy a
    * training-data pipeline runs before any neural quality scorer: fit
    * corpus bigram statistics in one pass, then score every document by
    * the mean conditional probability of its bigram instances,
    * p(w2|w1) = c(w1,w2) / c(w1,·).
    *
    * Determinism: probabilities are integer MICRO-units via floor division
    * and the per-doc mean is an integer-divided integer sum — no doubles
    * anywhere, so partial-aggregation order can never perturb a bit
    * (summed log-prob doubles would differ in ulps across engines and
    * combine orders). Scale: the corpus is scanned once into a persisted
    * bigram bag; counts are two hash aggregates bounded by vocabulary²,
    * re-joined on the bigram key — all shuffles carry (word, word, count),
    * never document text.
    */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val bi = docs
      .select(col("doc_id"), tokens.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
          |  (a, b) -> named_struct('w1', a, 'w2', b))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .persist() // scanned 3×: bigram counts, unigram counts, scoring
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("n1"))
    val out = graft.Materialize(
      bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .select(col("doc_id"), expr("(1000000L * n2) div n1").as("micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(micro) div count(*)").as("score_micro")))
    bi.unpersist()
    out
  }

  /** Reference-LM corpus filtering (the CCNet/CC-100 shape, Wenzek et al.
    * 2020, arXiv:1911.00359): fit bigram statistics on a TRUSTED
    * reference slice (there: Wikipedia; here: `ref`), score every corpus
    * document by its mean conditional probability under that model —
    * p(w2|w1) with a penalized unigram backoff for bigrams the reference
    * never saw — and keep documents above a threshold. Filtering against
    * a reference separates "fluent text the reference distribution
    * recognizes" from boilerplate/gibberish, which self-trained scores
    * ([[bigramLmScore]]) cannot: a corpus full of spam scores spam high.
    *
    * Determinism: integer micro-units throughout ([[bigramLmScore]]'s
    * discipline) — a known bigram scores `(1e6 * n2) div n1`, an unknown
    * one backs off to `(1e5 * u(w2)) div T` (unigram frequency capped at
    * a 10× penalty, zero for out-of-reference words); the per-doc score
    * is the integer mean. No doubles, no ulp drift, combine-order-free.
    *
    * Scale: the reference model is vocabulary-bounded (a wiki-sized
    * slice, not the corpus) — `c2`/`c1`/`uni` broadcast to every
    * executor and the corpus is scanned ONCE through three broadcast
    * hash joins, no corpus-sized shuffle anywhere. */
  def refLmFilter(docs: DataFrame, ref: DataFrame,
      keepAboveMicro: Long): DataFrame = {
    def bigrams(d: DataFrame) = d
      .select(col("doc_id"), tokens.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
          |  (a, b) -> named_struct('w1', a, 'w2', b))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // the reference is small by contract (a wiki-sized trusted slice,
    // not the corpus), so its four aggregation scans stay cheap and the
    // result returns LAZY — no materialization of a corpus-sized output
    val rb = bigrams(ref)
    val c2 = rb.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val c1 = rb.groupBy("w1").agg(count(lit(1)).as("n1"))
    val uni = ref.select(explode(tokens).as("w2"))
      .groupBy("w2").agg(count(lit(1)).as("u"))
    val tot = ref.select(explode(tokens).as("w"))
      .agg(count(lit(1)).as("t_ref"))
    bigrams(docs)
      .join(broadcast(c2), Seq("w1", "w2"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .join(broadcast(uni), Seq("w2"), "left")
      .crossJoin(broadcast(tot)) // one scalar row: the token total
      .select(col("doc_id"), expr(
        // t_ref = 0 (an empty reference slice) must fail LOUDLY, not
        // null-out every unknown-bigram backoff — the guard stays inside
        // the plan so the result remains lazy with no extra driver job
        """CASE WHEN n2 IS NOT NULL THEN (1000000L * n2) div n1
          |     ELSE (100000L * coalesce(u, 0L)) div
          |       (CASE WHEN t_ref > 0 THEN t_ref ELSE raise_error(
          |          'refLmFilter: empty reference corpus (t_ref = 0)') END)
          |END""".stripMargin).as("micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(micro) div count(*)").as("score_micro"))
      .withColumn("kept",
        (col("score_micro") >= keepAboveMicro).cast("long"))
  }

  /** BPE-style pre-tokenization (GPT-2-ish regex): contraction suffixes,
    * letter runs, digit runs, punctuation runs, each with optional leading
    * space. The COUNT of these pieces is the usual cheap proxy for LLM
    * token cost before a real tokenizer runs. Kept to the regex subset
    * with identical semantics in Java regex and RE2 (oracle parity).
    */
  val bpeTokenPattern: String =
    """'(?:s|d|m|t|ll|ve|re)| ?[\p{L}]+| ?[0-9]+| ?[^\s\p{L}0-9]+"""

  def bpeishTokens: Column =
    expr(s"regexp_extract_all(text, '''(?:s|d|m|t|ll|ve|re)| ?[\\\\p{L}]+| ?[0-9]+| ?[^\\\\s\\\\p{L}0-9]+', 0)")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** The Gopher/MassiveWeb quality-rule battery (Rae et al. 2021,
    * arXiv:2112.11446 §A.1.1) — the published rule set most large corpus
    * pipelines start from: word-count window, mean word length window,
    * symbol-to-word ratio (# and ellipsis), bullet-/ellipsis-line
    * fractions, alphabetic-word fraction, and the ≥2-distinct-stop-words
    * requirement. Every rule is a codegen column expression over one text
    * scan — MAP-ONLY at any corpus size, no shuffle, no UDF — and each
    * rule's measurement is emitted alongside the verdict so a pipeline
    * can re-threshold without recomputing.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val nWords = "size(split(text, ' '))"
    val sumWlen = "aggregate(split(text, ' '), 0L, (acc, x) -> acc + length(x))"
    val nHash = "(length(text) - length(replace(text, '#', '')))"
    val nEll = "((length(text) - length(replace(text, '...', ''))) / 3)"
    val nLines = "size(split(text, '\\n'))"
    val nBullet = "size(filter(split(text, '\\n'), l -> " +
      "startswith(ltrim(l), '-') OR startswith(ltrim(l), '*')))"
    val nEllLine = "size(filter(split(text, '\\n'), l -> " +
      "endswith(rtrim(l), '...')))"
    val nAlpha = "size(filter(split(text, ' '), w -> w rlike '[A-Za-z]'))"
    val stopArr = gopherStops.map(s => s"'$s'").mkString("array(", ", ", ")")
    val nStopKinds =
      s"size(array_intersect(array_distinct(split(text, ' ')), $stopArr))"
    docs
      .withColumn("n_words", expr(nWords).cast("long"))
      .withColumn("mean_wlen", graft.Det.roundSafe(
        expr(sumWlen).cast("double") / col("n_words"), 4))
      .withColumn("symbol_ratio", graft.Det.roundSafe(
        (expr(nHash) + expr(nEll)).cast("double") / col("n_words"), 4))
      .withColumn("bullet_frac", graft.Det.roundSafe(
        expr(nBullet).cast("double") / expr(nLines), 4))
      .withColumn("ellipsis_frac", graft.Det.roundSafe(
        expr(nEllLine).cast("double") / expr(nLines), 4))
      .withColumn("alpha_frac", graft.Det.roundSafe(
        expr(nAlpha).cast("double") / col("n_words"), 4))
      .withColumn("n_stop_kinds", expr(nStopKinds).cast("long"))
      // the paper's thresholds, verbatim; emitted as 0/1 for a
      // cross-engine-stable column type
      .withColumn("gopher_pass",
        (col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_wlen") >= 3.0 && col("mean_wlen") <= 10.0 &&
          col("symbol_ratio") < 0.1 &&
          col("bullet_frac") < 0.9 && col("ellipsis_frac") < 0.3 &&
          col("alpha_frac") > 0.8 && col("n_stop_kinds") >= 2)
          .cast("long"))
  }

  /** Gopher's stop-word set (§A.1.1), verbatim. */
  private[llm] val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Heuristic quality score in [0,1]: length, stopword ratio, average word
    * length — the usual cheap pre-LLM corpus filters. Pure double
    * arithmetic on exact inputs → deterministic across engines.
    */
  def qualityScored(docs: DataFrame): DataFrame = {
    val inList = stopwords.map(s => s"x = '$s'").mkString(" OR ")
    docs
      .withColumn("n_tok", size(tokens).cast("long"))
      .withColumn("n_stop", expr(s"size(filter(split(text, ' '), x -> $inList))").cast("long"))
      .withColumn("avg_wlen",
        (length(col("text")) - col("n_tok") + lit(1)).cast("double") / col("n_tok"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tok"))
      .withColumn("quality", graft.Det.roundSafe(
        least(col("n_tok").cast("double") / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - col("stop_ratio")) * 0.3
          + least(col("avg_wlen") / 8.0, lit(1.0)) * 0.2, 4))
  }

  /** Letter-distribution entropy (bits) — a cheap gibberish/quality signal:
    * natural prose lands near the language's letter-frequency entropy
    * (~4.1 bits for English), while repeated-character spam, base64 blobs
    * and single-token noise score far off it.
    *
    * MAP-ONLY at any scale: the 26-letter histogram is computed as
    * `length(s) - length(replace(s, c, ''))` per letter — 26 codegen'd
    * scans of the doc string, zero explodes, zero shuffles — and the
    * entropy folds over it with left-associated additions (the exact
    * shape the DuckDB oracle spells, so sums agree bit-for-bit).
    * H = (ln N − Σ cᵢ·ln cᵢ / N) / ln 2 over letter counts cᵢ, N = Σ cᵢ.
    */
  def letterEntropy(docs: DataFrame): DataFrame = {
    val cnt = ('a' to 'z').map(c =>
      s"(length(__lt) - length(replace(__lt, '$c', '')))")
    val total = cnt.mkString("(", " + ", ")")
    val sumClnC = cnt.map(c =>
      s"(CASE WHEN $c > 0 THEN CAST($c AS DOUBLE) * ln(CAST($c AS DOUBLE)) ELSE 0.0D END)")
      .mkString("(", " + ", ")")
    docs
      .withColumn("__lt", lower(col("text")))
      .withColumn("n_letters", expr(total).cast("long"))
      .withColumn("entropy_bits", graft.Det.roundSafe(expr(
        s"""CASE WHEN $total > 0 THEN
           |  (ln(CAST($total AS DOUBLE)) - $sumClnC / CAST($total AS DOUBLE))
           |    / ln(2.0D)
           |ELSE 0.0D END""".stripMargin), 6))
      .drop("__lt")
  }

  /** PII-redaction patterns (kept to the regex subset with identical
    * semantics in Java regex and RE2, for oracle parity): emails, US-style
    * SSNs and phone numbers, IPv4 addresses. Order matters — emails first
    * (their local part can contain digits, dots and dashes), then the more
    * specific numeric shapes before the less specific. */
  val piiPatterns: Seq[(String, String)] = Seq(
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""" -> "<EMAIL>",
    """\b\d{3}-\d{2}-\d{4}\b""" -> "<SSN>",
    """\b\d{3}[-.]\d{3}[-.]\d{4}\b""" -> "<PHONE>",
    """\b(?:\d{1,3}\.){3}\d{1,3}\b""" -> "<IP>")

  /** Redact PII in `c`: a chain of codegen `regexp_replace`, no UDFs — the
    * scrub stays inside WholeStageCodegen and costs one projection. */
  def scrubPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (re, tag)) =>
      regexp_replace(acc, re, tag)
    }

  /** Repetition signals (Gopher-style quality filters): the fraction of
    * duplicate words and duplicate word-bigrams per document. High values
    * flag the boilerplate/spam that length and stopword filters miss.
    * Codegen HOFs over the token array; one projection, no shuffle. */
  def repetitionStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", tokens)
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("dup_word_frac", graft.Det.roundSafe(
        lit(1.0) - size(array_distinct(col("ws"))).cast("double") /
          col("n_words"), 4))
      .withColumn("bigrams", expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), (a, b) -> concat(a, ' ', b))"))
      .withColumn("dup_bigram_frac", when(col("n_words") < 2, lit(0.0))
        .otherwise(graft.Det.roundSafe(
          lit(1.0) - size(array_distinct(col("bigrams"))).cast("double") /
            (col("n_words") - lit(1)), 4)))
      .drop("ws", "bigrams")

  /** Language ID via character-trigram profiles, self-trained on a labeled
    * corpus (n-gram heuristic in the Cavnar–Trenkle style): keep each
    * language's `topK` most frequent trigrams, score a document by how many
    * of its distinct trigrams hit each profile, predict the argmax
    * (ties broken by language name for determinism).
    *
    * Scale: profiles are tiny (`langs × topK` rows) → broadcast join
    * against the exploded documents; one aggregate per (doc, lang).
    */
  def languageProfiles(labeled: DataFrame, topK: Int = 40): DataFrame = {
    val byLang = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("tri"))
    labeled.select(col("lang"), explode(charNgrams(3)).as("tri"))
      .groupBy("lang", "tri").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(byLang))
      .filter(col("rk") <= topK)
      .select(col("lang").as("plang"), col("tri"))
  }

  def predictLanguage(docs: DataFrame, profiles: DataFrame): DataFrame = {
    val docTris = docs.select(col("doc_id"), explode(array_distinct(charNgrams(3))).as("tri"))
    val hits = docTris.join(broadcast(profiles), "tri")
      .groupBy("doc_id", "plang").agg(count(lit(1)).as("hits"))
    // argmax by (hits desc, plang asc) as ONE hash aggregate — min over a
    // (-hits, plang) struct orders lexicographically, so this replaces the
    // former row_number window (shuffle + per-partition sort, no partial
    // aggregation) with a map-side-combinable aggregate
    val predicted = hits.groupBy("doc_id")
      .agg(min(struct((-col("hits")).as("nh"), col("plang"))).as("m"))
      .select(col("doc_id"), col("m.plang").as("pred"))
    docs.join(predicted, Seq("doc_id"), "left")
      .withColumn("pred", coalesce(col("pred"), lit("und")))
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD 2003 style):
    * hash every k-gram, slide a window of `w` hashes, keep each window's
    * minimum; the distinct kept hashes are the fingerprint. Near-identical
    * documents share most fingerprint hashes, enabling shared-hash joins
    * for plagiarism/near-dup detection at corpus scale.
    */
  def fingerprints(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    docs
      .withColumn("grams",
        expr(s"transform(sequence(0, greatest(length(text) - $k, 0)), i -> xxhash64(substring(text, i + 1, $k)))"))
      .withColumn("fp", array_distinct(
        expr(s"transform(sequence(0, greatest(size(grams) - $w, 0)), j -> array_min(slice(grams, j + 1, $w)))")))
      .drop("grams")

  /** Placeholder for the published C4 blocklist ("List of Dirty, Naughty,
    * Obscene or Otherwise Bad Words") — the sandbox ships no wordlists, so
    * these tokens stand in; production passes the real list, the rule is
    * identical. */
  private[llm] val c4Blocklist = Seq("obscene0", "obscene1")

  /** The C4 cleaning ruleset (Raffel et al. 2020, arXiv:1910.10683 §2.2),
    * the other canonical published corpus battery beside [[gopherRules]]:
    * keep only lines ending in terminal punctuation (. ! ? ") with ≥3
    * words and no "javascript"; drop pages with <5 surviving sentences,
    * any blocklist word, "lorem ipsum", or a curly brace. Emits the
    * CLEANED text (surviving lines rejoined) plus every rule's measurement
    * beside the verdict, so a pipeline can re-threshold without rescanning.
    *
    * Scale shape, same as the Gopher battery: every rule is a codegen
    * column expression over ONE text scan — map-only at any corpus size,
    * no shuffle, no UDF — so the gate runs at parquet scan speed and its
    * selectivity prunes everything downstream.
    */
  def c4Rules(docs: DataFrame,
      blocklist: Seq[String] = c4Blocklist): DataFrame = {
    // terminal punctuation + ≥3 words + no "javascript" per the paper;
    // the end-quote case covers sentences closing a quotation
    val kept = "filter(split(text, '\\n'), l -> " +
      "(endswith(rtrim(l), '.') OR endswith(rtrim(l), '!') OR " +
      "endswith(rtrim(l), '?') OR endswith(rtrim(l), '\"')) AND " +
      "size(split(l, ' ')) >= 3 AND NOT contains(lower(l), 'javascript'))"
    val blockArr = blocklist.map(s => s"'$s'").mkString("array(", ", ", ")")
    // sentence count = terminal marks in the SURVIVING text (the paper
    // counts sentences after line filtering); three replace-diffs keep the
    // expression portable across engines (no translate/regexp dialects)
    val nSent = Seq(".", "!", "?").map(c =>
        s"(length(clean_text) - length(replace(clean_text, '$c', '')))")
      .mkString("(", " + ", ")")
    docs
      .withColumn("__kept", expr(kept))
      .withColumn("n_lines", expr("size(split(text, '\\n'))").cast("long"))
      .withColumn("n_kept_lines", size(col("__kept")).cast("long"))
      .withColumn("clean_text", array_join(col("__kept"), "\n"))
      .withColumn("n_sentences", expr(nSent).cast("long"))
      .withColumn("has_lorem",
        expr("contains(lower(text), 'lorem ipsum')").cast("long"))
      .withColumn("has_brace", expr("contains(text, '{')").cast("long"))
      // word boundary = any non-alphanumeric run, NOT just spaces: the
      // paper's rule is "any page containing any word on the list", and a
      // space-split would let "obscene0." or a newline-adjacent word
      // escape detection
      .withColumn("has_blockword", expr(
        s"size(array_intersect(array_distinct(split(lower(text), '[^a-z0-9]+')), $blockArr)) > 0")
        .cast("long"))
      .withColumn("c4_pass",
        (col("n_sentences") >= 5 && col("has_lorem") === 0 &&
          col("has_brace") === 0 && col("has_blockword") === 0).cast("long"))
      .drop("__kept")
  }
}
