package graft.rdf

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persisted triple storage, bucketed by subject.
  *
  * Reference parity: D-SPARQ partitions the RDF graph METIS-style, places
  * each subject's triples on one node, and replicates boundary triples so
  * subject-star queries run without cross-node communication (ISWC 2013
  * demo; SURVEY.md §2 R10). The Spark-native equivalent is hash bucketing
  * on `s`: every self-join of the triples table on the subject — i.e.
  * every star pattern — becomes *shuffle-free*, because both sides already
  * share the same partitioning (verified by TripleStoreSpec: the physical
  * plan of a bucketed star join contains no shuffle exchange). Boundary
  * replication is unnecessary — chain joins simply shuffle on demand, and
  * at 100 TB the win is precisely that the dominant star workload reads
  * co-located buckets while Catalyst plans the rest.
  *
  * `sortBy(s)` within buckets additionally lets the star join run as a
  * sort-merge without re-sorting.
  */
object TripleStore {

  /** Write the triples table bucketed+sorted by subject as a catalog table
    * (bucketing metadata lives in the catalog, so `bucketBy` requires
    * `saveAsTable` rather than a path write). `subjectCol` defaults to the
    * string store's `s`; pass `sid` to bucket the encoded id-store, which
    * composes both reference techniques — subject co-location (R10) over
    * dictionary ids (R2) — into shuffle-free star joins on 8-byte keys. */
  def saveBucketed(triples: DataFrame, table: String, buckets: Int = 32,
      subjectCol: String = "s"): Unit =
    triples.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, subjectCol)
      .sortBy(subjectCol)
      .format("parquet")
      .saveAsTable(table)

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Vertical partitioning (S2RDF-style, SURVEY.md §1.2): the triples table
    * written `partitionBy("p")` — one directory per predicate. A triple
    * pattern with a constant predicate then *partition-prunes* to exactly
    * its predicate's files (the scan's PartitionFilters; asserted in
    * TripleStoreSpec), the parquet-native analog of d-sparq's per-predicate
    * Mongo indexes. Chain joins over VP read two 2-column slices instead
    * of the whole graph.
    *
    * Skew note: predicate frequencies are zipfian, so a hot predicate's
    * directory is large — combine with bucketing by `s` inside partitions
    * ([[saveBucketed]]) when star joins dominate.
    */
  def saveVerticalPartitioned(triples: DataFrame, path: String): Unit =
    triples.write.mode(SaveMode.Overwrite).partitionBy("p").parquet(path)

  def loadVertical(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // one encoded store per dataset per JVM; the on-disk copy outlives the
  // JVM so later sessions skip the dictionary build entirely
  private val encoded = scala.collection.concurrent.TrieMap
    .empty[String, (DataFrame, DataFrame)]

  /** The dictionary-encoded id-triple store for a dataset: `(dict,
    * encoded)` read from the persisted load artifacts, building + saving
    * them first only if they were never materialized. This is the
    * reference's load phase (SURVEY.md §3.3: dictionary encoding runs in
    * MapReduce at load, never at query time) — queries must come through
    * here so term→id encoding stays ingest-time work. At cluster scale the
    * encoded table would additionally be bucketed by `sid`
    * ([[saveBucketed]]) to make star joins shuffle-free.
    */
  def encodedFor(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) =
    encoded.getOrElseUpdate(sfDir, {
      // keyed by dataset AND corpus definition: a change to Triples.build
      // (fingerprinted by its DuckDB rendering) must invalidate the store,
      // not silently serve the previous corpus. SHA-256 key — a 32-bit
      // hash could collide across datasets and serve the wrong store.
      val base = s"${sys.props("java.io.tmpdir")}/graft_idtriples_" +
        graft.sources.AtomicStore.key(sfDir, Triples.duckCte)
      val path = graft.sources.AtomicStore.materialize(base) { tmp =>
        val t = Triples.build(spark, sfDir)
        val dict = Dictionary.build(spark, t)
        dict.write.parquet(s"$tmp/dict")
        Dictionary.encode(t, spark.read.parquet(s"$tmp/dict"))
          .write.parquet(s"$tmp/enc")
      }
      (spark.read.parquet(s"$path/dict"), spark.read.parquet(s"$path/enc"))
    })
}
