package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data pipeline operators: benchmark
  * decontamination, deterministic stratified sampling, and
  * concatenate-then-chunk sequence packing.
  *
  * All three are exact and SQL-oracle-able (unlike the sketch-based dedup
  * ladder), and each is designed map-side-first: decontamination broadcasts
  * the (tiny) benchmark gram set, sampling is a shuffle-free filter, and
  * packing windows inside hash shards so no global sort exists anywhere.
  */
object Corpus {

  /** Benchmark decontamination — the n-gram-overlap test used to keep eval
    * data out of training corpora: a candidate document is contaminated iff
    * it shares at least one word k-shingle with any benchmark document.
    *
    * Returns every NON-benchmark document with its overlapping-gram count
    * and a contaminated flag (callers drop or downweight as policy).
    *
    * Scale shape: an eval benchmark is tiny by nature, so its distinct gram
    * set builds cheaply and BROADCASTS; the corpus side is one projection +
    * explode + broadcast semi-side join + partial-aggregated count — the
    * 100 TB corpus is never shuffled by text, only by doc_id for the final
    * count, and the left join back is doc_id-to-doc_id.
    */
  def decontaminate(docs: DataFrame, isBench: Column, grams: Column): DataFrame = {
    val bench = docs.filter(isBench)
    val candidates = docs.filter(!isBench)
    val benchGrams = bench.select(explode(grams).as("g")).distinct()
    // grams is produced distinct-per-doc (TextOps.wordShingles), so the
    // exploded (doc_id, g) stream needs no extra dedup shuffle
    val hits = candidates.select(col("doc_id"), explode(grams).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit_grams"))
    candidates.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"))
      .withColumn("contaminated", col("n_hit_grams") > 0)
  }

  /** Uniform-ish deterministic bucket in [0, 1000) from a long id: a
    * multiplicative hash (Knuth's 2654435761) mod a prime, all in plain
    * positive-integer arithmetic so ANY engine computes it bit-identically
    * (no float, no engine-specific hash, and the pre-reduction keeps every
    * intermediate < 2^63 for ids of any magnitude). */
  def idBucket(id: Column): Column =
    ((id % lit(1000003L)) * lit(2654435761L) + lit(40503L)) % lit(1000003L) % lit(1000L)

  /** [[idBucket]] rendered for the DuckDB oracle. */
  def idBucketSql(expr: String): String =
    s"((($expr) % 1000003) * 2654435761 + 40503) % 1000003 % 1000"

  /** Deterministic stratified sampling: keep a document iff its id's
    * [[idBucket]] lands under its stratum's per-mille rate. Reproducible
    * under any partitioning or retry (pure function of the id, no RNG
    * state), and embarrassingly parallel — a map-only filter, zero
    * shuffles, so at 100 TB it runs at scan speed with full pushdown of
    * any preceding predicates. */
  def sampleStratified(docs: DataFrame, stratum: Column,
      ratesPerMille: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, r)) => when(stratum === lit(k), lit(r)).otherwise(acc)
    }
    docs.withColumn("bucket", idBucket(col("doc_id")))
      .filter(col("bucket") < rate)
  }

  /** One-scan quality gate (the C4/Gopher-style rule stack): length,
    * composite quality score and repetition fractions are all computed in
    * a single projection over one pass of the corpus — no joins, no
    * shuffles, every rule a codegen column expression — then applied as
    * one conjunctive filter. At 100 TB this is the shape that matters:
    * the gate runs at scan speed and its selectivity prunes everything
    * downstream. */
  def qualityGate(docs: DataFrame, minQuality: Double, maxDupWordFrac: Double,
      minTokens: Long, langs: Seq[String]): DataFrame =
    TextOps.repetitionStats(TextOps.qualityScored(docs))
      .filter(col("quality") >= minQuality &&
        col("dup_word_frac") <= maxDupWordFrac &&
        col("n_tok") >= minTokens &&
        col("lang").isin(langs: _*))

  /** Rebalance a skewed stratum mix by downsampling every stratum toward
    * the SMALLEST one's size: stratum s keeps ⌊1000·min_n/n_s⌋ per mille
    * of its documents, survivors chosen by the deterministic [[idBucket]].
    *
    * Scale shape: the stratum-count aggregate is tiny (|strata| rows), so
    * the rate table broadcasts back onto the corpus and the keep decision
    * is a map-side filter — the 100 TB side is scanned once and never
    * shuffled. */
  def rebalanceToMin(docs: DataFrame, stratum: Column): DataFrame = {
    val counts = docs.groupBy(stratum.as("__stratum")).agg(count(lit(1)).as("__n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__t"))))
      .select(col("__stratum"),
        floor(col("__t") * lit(1000) / col("__n")).as("__rate_pm"))
    docs.join(broadcast(rates), stratum === col("__stratum"))
      .withColumn("bucket", idBucket(col("doc_id")))
      .filter(col("bucket") < col("__rate_pm"))
      .drop("__stratum", "__rate_pm")
  }

  /** Rare-token (OOV-against-corpus-vocabulary) scoring: a token is rare
    * when its corpus document frequency is below `minDf`; each document
    * reports its token count, rare-token count, and rare ratio — the
    * vocabulary-based garbage/ocr-noise filter that length and stopword
    * heuristics miss. All-integer counts and one exactly-rounded IEEE
    * division, so the score is bit-identical across engines and
    * partitionings (no log/entropy ulp hazards).
    *
    * Scale shape: pass 1 aggregates per-token document frequencies
    * (vocabulary-sized output, partial map-side combine); pass 2 rejoins
    * tokens to the df table and re-aggregates per doc. Both shuffles key
    * on bounded-cardinality columns (token, doc_id); nothing quadratic.
    */
  def rareTokenStats(docs: DataFrame, minDf: Long): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val df = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .join(df, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("df") < minDf, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_ratio",
        graft.Det.roundSafe(col("n_rare").cast("double") / col("n_tok"), 4))
  }

  /** Source-level (domain-level) filtering, RefinedWeb/DCLM-style: score
    * every document, aggregate mean quality per stratum (a tiny frame —
    * one row per source/domain), keep only documents whose stratum's mean
    * clears the threshold. The mean uses decimal-exact accumulation
    * ([[graft.Det.davg]]) so a threshold sitting near a boundary cannot
    * flip with partition combine order.
    *
    * Scale shape: one corpus scan feeds both the per-stratum aggregate
    * (partial map-side combine, |strata| rows out) and the broadcast
    * LEFT SEMI join back — the corpus itself is never shuffled. */
  def filterBySourceQuality(docs: DataFrame, stratum: Column,
      minMeanQuality: Double): DataFrame = {
    val scored = TextOps.qualityScored(docs)
    val good = scored.groupBy(stratum.as("__stratum"))
      .agg(graft.Det.davg(col("quality")).as("__mq"))
      .filter(col("__mq") >= minMeanQuality)
      .select(col("__stratum"))
    scored.join(broadcast(good), stratum === col("__stratum"), "left_semi")
  }

  /** Overlapping character-window chunking (the RAG / context-window
    * splitter): each document yields ⌈max(len - overlap, 1) / stride⌉
    * chunks of up to `size` chars starting every `stride = size -
    * overlap` chars, each tagged (doc_id, chunk_no, chunk). Pure
    * map-side: one `sequence` + `posexplode` projection per row, no
    * shuffle, no UDF — at 100 TB this runs at scan speed and the output
    * inherits the input's partitioning. */
  def chunkText(docs: DataFrame, size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > 0 and 0 <= overlap < size")
    val stride = size - overlap
    docs
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  sequence(0, cast(ceil(greatest(length(text) - $overlap, 1)
           |                        / $stride.0) AS INT) - 1),
           |  i -> substring(text, i * $stride + 1, $size))""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_no"),
        col("col").as("chunk"))
  }

  /** Token-budget sampling: keep each stratum's documents, in
    * deterministic doc_id order, until the stratum's token budget is
    * reached ("take N tokens per language/domain" — the standard way a
    * training mix is specified). A document is kept iff the running token
    * total INCLUDING it fits the budget; later documents drop.
    *
    * Scale shape: one running-sum window partitioned by stratum — each
    * stratum's scan is independent, no global sort; the window keys on
    * the same column a mix-aware layout would partition by. */
  def sampleTokenBudget(docs: DataFrame, stratum: Column, tokens: Column,
      budgetPerStratum: Long): DataFrame = {
    val w = Window.partitionBy(col("__stratum")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.withColumn("__stratum", stratum)
      .withColumn("n_tok", tokens.cast("long"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budgetPerStratum)
      .drop("__stratum")
  }

  /** Concatenate-then-chunk sequence packing (the GPT-style training
    * layout): within each shard, documents are laid out in doc_id order
    * and the concatenated token stream is cut into fixed `ctx`-size
    * chunks; each document records its token offset and the first/last
    * chunk it lands in.
    *
    * Sharding is the scale story: the running-offset window partitions by
    * shard (PARTITION BY shard ORDER BY doc_id), so there is no global
    * sort — each shard packs independently in one task, exactly how a
    * 100 TB corpus is packed into independent training files.
    */
  def packSequences(docs: DataFrame, tokens: Column, ctx: Int,
      shards: Int): DataFrame = {
    require(ctx > 0 && shards > 0, "ctx and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        tokens.cast("long").as("n_tok"))
      .withColumn("start_off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("chunk_first", floor(col("start_off") / ctx).cast("long"))
      .withColumn("chunk_last",
        floor((col("start_off") + col("n_tok") - lit(1)) / ctx).cast("long"))
  }

  /** Deterministic corpus shuffle into training shards: every doc gets a
    * pseudo-random but REPRODUCIBLE position — shard by the multiplicative
    * id hash, order within a shard by (hash, doc_id). The training-prep
    * step between dedup/filter and [[packSequences]]: breaks source/time
    * ordering so no shard (and no contiguous read) is source-correlated.
    *
    * Scale shape: no global sort. Shard assignment is a map-side
    * expression; within-shard positions come from one window per shard
    * (PARTITION BY shard), so shards order independently in parallel —
    * and re-running on the same corpus yields byte-identical shards (pure
    * function of ids, no RNG state, survives retries and repartitions).
    */
  def shuffleIntoShards(docs: DataFrame, shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    // full-range hash (no mod-1000 bucketing): enough spread that ordering
    // by it permutes, with doc_id as the total-order tiebreak
    val key = shuffleKeyCol(col("doc_id"))
    val w = Window.partitionBy(col("shard")).orderBy(col("key"), col("doc_id"))
    docs.select(col("doc_id"), key.as("key"))
      .withColumn("shard", (col("key") % lit(shards.toLong)).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long") - lit(1L))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** The deterministic multiplicative shuffle key — ONE definition shared
    * by [[shuffleIntoShards]] and [[interleaveSources]] so the constants
    * can never drift between the two (or from [[shuffleKeySql]]'s oracle
    * rendering). */
  def shuffleKeyCol(c: Column): Column =
    ((c % lit(1000003L)) * lit(2654435761L) + lit(40503L)) % lit(1000003L)

  /** [[shuffleKeyCol]] rendered for the DuckDB oracle. */
  def shuffleKeySql(expr: String): String =
    s"((($expr) % 1000003) * 2654435761 + 40503) % 1000003"

  /** Source-fair training order: within each source, rows rank by the
    * deterministic shuffle key; the global curriculum is the sort order
    * (rank, source), which cycles sources round-robin — no stretch of
    * the training stream is single-source, the fairness property a plain
    * hash shuffle only gives in expectation. One window sort per source
    * partition; the (rank, source) pair IS the order key, so writing the
    * stream in curriculum order is a range-partitioned sort, never a
    * single global window. */
  def interleaveSources(docs: DataFrame): DataFrame = {
    val key = shuffleKeyCol(col("doc_id"))
    val w = Window.partitionBy(col("source")).orderBy(col("key"), col("doc_id"))
    docs.select(col("doc_id"), col("source"), key.as("key"))
      .withColumn("rank", row_number().over(w).cast("long") - lit(1L))
      .select(col("rank"), col("source"), col("doc_id"))
  }

  /** The pretraining corpus pipeline END-TO-END in one declarative plan:
    * quality gate → exact dedup → benchmark decontamination → stratified
    * sampling. Every stage is the already-oracled operator, composed —
    * which is the point: the whole pipeline stays ONE Catalyst plan and
    * nothing is materialized between stages. At 100 TB the stage order
    * IS the cost model: the map-only gate prunes at the scan, dedup pays
    * the pipeline's one full-row shuffle (rows must co-locate by content
    * digest to pick winners — the minimum for emitting survivor rows),
    * the shingle explode + broadcast-gram probe of decontamination runs
    * over DEDUPED SURVIVORS only (the benchmark slice itself still comes
    * from the full corpus), and the sampler is a map-side filter.
    *
    * Dedup keeps the smallest doc_id per content digest among GATED
    * docs; decontamination drops candidates sharing any `grams` shingle
    * with the `isBench` slice (and the bench docs themselves). */
  def pipeline(docs: DataFrame, isBench: Column, grams: Column,
      ratesPerMille: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val gated = qualityGate(docs, minQuality = 0.7, maxDupWordFrac = 0.6,
      minTokens = 20, langs = Seq("en", "de", "fr", "es"))
    val win = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
    val deduped = gated
      .withColumn("__h", sha2(col("text"), 256))
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") === 1).drop("__h", "__rn")
    // candidate side = survivors only — running the shingle explode over
    // the full raw corpus would make the most expensive stage the one
    // stage the gate can't prune; the bench slice must stay corpus-wide
    val contaminationInput = docs.filter(isBench)
      .select(col("doc_id"), col("text"))
      .unionByName(deduped.filter(!isBench)
        .select(col("doc_id"), col("text")))
    val clean = decontaminate(contaminationInput, isBench, grams)
      .filter(!col("contaminated")).select(col("doc_id"))
    sampleStratified(deduped.join(clean, Seq("doc_id"), "left_semi"),
      col("lang"), ratesPerMille, defaultPerMille)
  }

  /** Weighted EPOCH upsampling — the pretraining mixture primitive (the
    * Pile / LLaMA-style source weighting): each stratum is repeated
    * `weightsPerMille / 1000` epochs, fractional epochs realized by
    * repeating the deterministic [[idBucket]]-chosen fraction of its
    * documents once more (2500‰ ⇒ every doc twice, the hash-chosen half a
    * third time; 300‰ ⇒ the chosen 30%). Output carries an `epoch`
    * ordinal per copy so downstream shuffling/packing can interleave
    * copies instead of clustering them.
    *
    * Determinism and scale: the epoch count is a pure integer function of
    * (stratum weight, doc_id) — no RNG state, identical under retries and
    * any partitioning — and the expansion is a map-side `explode` over a
    * bounded sequence (≤ ⌈w⌉ copies), so the corpus is scanned once with
    * zero shuffles; 100 TB in, weight-scaled bytes out, at scan speed.
    */
  def upsample(docs: DataFrame, stratum: Column,
      weightsPerMille: Map[String, Int],
      defaultPerMille: Int = 1000): DataFrame = {
    require((defaultPerMille +: weightsPerMille.values.toSeq).forall(_ >= 0),
      "weights must be non-negative")
    val w = weightsPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, v)) => when(stratum === lit(k), lit(v)).otherwise(acc)
    }
    docs.withColumn("__w", w.cast("long"))
      .withColumn("n_epochs",
        expr("__w div 1000") +
          when(idBucket(col("doc_id")) < col("__w") % 1000, 1L).otherwise(0L))
      .filter(col("n_epochs") > 0)
      .withColumn("epoch", explode(expr("sequence(0L, n_epochs - 1L)")))
      .drop("__w")
  }
}
