package graft.rdf

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RDF term dictionary: every distinct term (subject/predicate/object
  * string) ↔ a numeric id, so joins run over longs instead of strings.
  *
  * Reference parity: D-SPARQ dictionary-encodes terms with an MD5-style
  * digest plus assigned numeric ids persisted in MongoDB collections
  * (SURVEY.md §2 R2/R3). Two Spark-native strategies:
  *
  *  - [[build]]: *dense, deterministic* ids = rank of the term in global
  *    sort order. Implemented as sort + `zipWithIndex` — distributed (no
  *    single-partition window), one shuffle for the sort. Reproducible
  *    across runs and engines, which is what the DuckDB oracle checks.
  *  - [[hashIds]]: *hashed* ids via xxhash64 — zero coordination, O(1) per
  *    term, the right choice at 100 TB where a global sort of the
  *    dictionary is pure overhead. Collision probability at 10^10 terms is
  *    ~3e-7 (birthday bound at 64 bits); [[auditCollisions]] verifies
  *    emptiness as a cheap post-load invariant, mirroring the reference's
  *    digest-uniqueness assumption.
  */
object Dictionary {

  /** Distinct terms of the triples table, one column `term`. */
  def terms(triples: DataFrame): DataFrame =
    triples.select(col("s").as("term"))
      .unionByName(triples.select(col("p").as("term")))
      .unionByName(triples.select(col("o").as("term")))
      .distinct()

  /** Dense deterministic dictionary: id = 1-based rank in term sort order. */
  def build(spark: SparkSession, triples: DataFrame): DataFrame =
    rankIds(spark, terms(triples))

  /** Distinct terms of a quads table — graph names are terms too (the
    * dataset axis decodes through the same dictionary). */
  def quadTerms(quads: DataFrame): DataFrame =
    terms(quads)
      .unionByName(quads.select(col("g").as("term")))
      .distinct()

  /** [[build]] over a quads table (s, p, o AND g terms). */
  def buildQuads(spark: SparkSession, quads: DataFrame): DataFrame =
    rankIds(spark, quadTerms(quads))

  private def rankIds(spark: SparkSession, termsDf: DataFrame): DataFrame = {
    // zipWithIndex runs TWO jobs over its parent (per-partition counts,
    // then the data pass), and the consumer adds a third — without a
    // persist the distinct+sort lineage would recompute each time.
    // MEMORY_AND_DISK (never recompute, spill not drop).
    val sorted = termsDf.orderBy("term").rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = sorted.zipWithIndex.map { case (r, i) => Row(i + 1L, r.getString(0)) }
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("term", StringType, nullable = false))))
    // materialize the dictionary (checkpoint truncates lineage), then
    // DROP the sorted intermediate immediately — relying on the
    // ContextCleaner to GC the handle lets repeated builds in a
    // long-lived driver accumulate cached partitions and pressure the
    // block store. Consumers re-read the (smaller) checkpointed
    // dictionary, never the sorted term RDD.
    val mat = graft.Materialize(df)
    sorted.unpersist(blocking = false)
    mat
  }

  /** Hash-based dictionary ids (scale path). */
  def hashIds(triples: DataFrame): DataFrame =
    terms(triples).withColumn("id", xxhash64(col("term")))

  /** Terms whose hashed ids collide (expected empty; run after bulk load). */
  def auditCollisions(dict: DataFrame): DataFrame =
    dict.groupBy("id").agg(count(lit(1)).as("n"), collect_list("term").as("terms"))
      .filter(col("n") > 1)

  /** (s,p,o) strings → (sid,pid,oid) longs. The dictionary is usually much
    * smaller than the triples table; Catalyst/AQE picks broadcast vs
    * shuffle join by size, so no hint is hard-coded.
    */
  def encode(triples: DataFrame, dict: DataFrame): DataFrame =
    triples
      .join(dict.withColumnRenamed("term", "s").withColumnRenamed("id", "sid"), "s")
      .join(dict.withColumnRenamed("term", "p").withColumnRenamed("id", "pid"), "p")
      .join(dict.withColumnRenamed("term", "o").withColumnRenamed("id", "oid"), "o")
      .select("sid", "pid", "oid")

  /** (s,p,o,g) strings → (sid,pid,oid,gid) longs — the id-space dataset
    * (the graph column joins the same dictionary). */
  def encodeQuads(quads: DataFrame, dict: DataFrame): DataFrame =
    quads
      .join(dict.withColumnRenamed("term", "s").withColumnRenamed("id", "sid"), "s")
      .join(dict.withColumnRenamed("term", "p").withColumnRenamed("id", "pid"), "p")
      .join(dict.withColumnRenamed("term", "o").withColumnRenamed("id", "oid"), "o")
      .join(dict.withColumnRenamed("term", "g").withColumnRenamed("id", "gid"), "g")
      .select("sid", "pid", "oid", "gid")

  /** (sid,pid,oid) → (s,p,o) on result emission (reference's decode step). */
  def decode(encoded: DataFrame, dict: DataFrame): DataFrame =
    encoded
      .join(dict.withColumnRenamed("id", "sid").withColumnRenamed("term", "s"), "sid")
      .join(dict.withColumnRenamed("id", "pid").withColumnRenamed("term", "p"), "pid")
      .join(dict.withColumnRenamed("id", "oid").withColumnRenamed("term", "o"), "oid")
      .select("s", "p", "o")

  /** (sid,pid,oid,gid) → (s,p,o,g) — the dataset decode. */
  def decodeQuads(encoded: DataFrame, dict: DataFrame): DataFrame =
    encoded
      .join(dict.withColumnRenamed("id", "sid").withColumnRenamed("term", "s"), "sid")
      .join(dict.withColumnRenamed("id", "pid").withColumnRenamed("term", "p"), "pid")
      .join(dict.withColumnRenamed("id", "oid").withColumnRenamed("term", "o"), "oid")
      .join(dict.withColumnRenamed("id", "gid").withColumnRenamed("term", "g"), "gid")
      .select("s", "p", "o", "g")
}
