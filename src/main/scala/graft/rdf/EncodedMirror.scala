package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** An ID-SPACE mirror of a delta-log [[QuadStore]] — the reference's
  * dictionary-encoded execution model (8-byte ids everywhere, decode at
  * emission) kept IN SYNC with SPARQL UPDATE traffic, instead of being a
  * read-only ingest artifact.
  *
  * Design, built from parts that already exist:
  *  - ids are `xxhash64(term)` ([[Dictionary.hashIds]]' scale path) — a
  *    PURE function of the term, so id assignment needs zero coordination
  *    with the store's writers and the mirror's dictionary is append-only
  *    by construction ([[Dictionary.auditCollisions]] is the 64-bit
  *    collision check, ~n²/2⁶⁵ expected).
  *  - each `sync` folds [[QuadStore.changes]] (net adds/dels between the
  *    last synced version and the head — O(|delta|), computed from the
  *    delta segments without rescanning the base) into ONE encoded
  *    segment of (sid,pid,oid,gid,op) rows plus one dictionary segment of
  *    genuinely-new terms. Segments are AtomicStore-published under the
  *    TARGET version's name, so a replayed or crashed sync is a no-op and
  *    concurrent syncers collapse to one winner.
  *  - [[encoded]] reads the mirror with the same last-op-per-quad fold as
  *    the store's flat replay: union the segments, keep each quad's
  *    latest op, emit adds — constant plan depth however many syncs have
  *    accumulated.
  *
  * Retention contract: `sync` needs the last-synced version to still be
  * pinned-readable in the store ([[QuadStore.changes]] reads it for the
  * clear-fallback and phantom screens) — sync at least as often as
  * retention allows, i.e. before `vacuum` drops the last synced version.
  * A violated contract fails loudly, never silently diverges.
  */
object EncodedMirror {

  private def encDir(root: String) = s"$root/enc"
  private def dictDir(root: String) = s"$root/dict"
  private def segPath(dir: String, v: Int) = f"$dir%s/s$v%05d"
  private val SegRe = "s(\\d{5})".r

  /** Highest store version folded into the mirror (0 = never synced). */
  def lastSynced(root: String): Int =
    graft.sources.AtomicStore.list(encDir(root)).flatMap { f =>
      f.getPath.getName match {
        case SegRe(n)
          if graft.sources.AtomicStore.isComplete(f.getPath.toString) =>
          Some(n.toInt)
        case _ => None
      }
    }.maxOption.getOrElse(0)

  /** Fold the store's changes since the last sync into the mirror;
    * returns the store version the mirror now reflects. Idempotent and
    * crash-safe (marker-gated segments named by target version). */
  def sync(spark: SparkSession, storeRoot: String, root: String): Int = {
    val cur = QuadStore.currentVersion(storeRoot).getOrElse(
      throw new IllegalArgumentException(
        s"no store under $storeRoot — init() before sync()"))
    val last = lastSynced(root)
    if (cur <= last) return last
    val (adds, dels) =
      if (last == 0) (QuadStore.readVersion(spark, storeRoot, cur),
        QuadStore.readVersion(spark, storeRoot, cur).limit(0))
      else QuadStore.changes(spark, storeRoot, last, cur)
    // dictionary first: a crash between the two writes leaves extra terms
    // (harmless superset) — never an encoded row without its terms.
    // Deleted quads' terms entered the dictionary when the quad did, so
    // only `adds` can introduce new terms.
    val known = dict(spark, root).select("term")
    graft.sources.AtomicStore.materialize(segPath(dictDir(root), cur)) {
      tmp =>
        Dictionary.quadTerms(adds)
          .join(known, Seq("term"), "left_anti")
          .withColumn("id", xxhash64(col("term")))
          .write.parquet(tmp)
    }
    val full = dict(spark, root)
    graft.sources.AtomicStore.materialize(segPath(encDir(root), cur)) {
      tmp =>
        Dictionary.encodeQuads(adds, full).withColumn("op", lit("a"))
          .unionByName(
            Dictionary.encodeQuads(dels, full).withColumn("op", lit("d")))
          .write.parquet(tmp)
    }
    cur
  }

  /** The mirror's dictionary: union of the append-only segments. */
  def dict(spark: SparkSession, root: String): DataFrame = {
    val segs = graft.sources.AtomicStore.list(dictDir(root)).collect {
      case f if graft.sources.AtomicStore.isComplete(f.getPath.toString) =>
        spark.read.parquet(f.getPath.toString)
    }
    if (segs.isEmpty)
      spark.range(0).select(col("id").cast("string").as("term"), col("id"))
    else segs.reduce(_.unionByName(_)).distinct()
  }

  /** The mirror's CURRENT id-quads (sid,pid,oid,gid): last-op-per-quad
    * fold over the encoded segments — same constant-depth shape as the
    * store's flat replay. */
  def encoded(spark: SparkSession, root: String): DataFrame = {
    val keys = Seq("sid", "pid", "oid", "gid")
    val segs = graft.sources.AtomicStore.list(encDir(root)).flatMap { f =>
      f.getPath.getName match {
        case SegRe(n)
          if graft.sources.AtomicStore.isComplete(f.getPath.toString) =>
          Some(spark.read.parquet(f.getPath.toString)
            .withColumn("__seq", lit(n.toInt)))
        case _ => None
      }
    }
    require(segs.nonEmpty, s"no synced mirror under $root — sync() first")
    segs.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(max(struct(col("__seq"),
        when(col("op") === "a", lit(1)).otherwise(lit(0)).as("__rank")))
        .as("m"))
      .filter(col("m.__rank") === 1)
      .select(keys.map(col): _*)
  }

  /** SPARQL over the mirror — the reference's id-space execution
    * ([[Sparql.runQuadsEncoded]]: every join over longs, decode at
    * emission), against update-fresh data. */
  def query(spark: SparkSession, root: String, text: String,
      collapseStars: Boolean = false): DataFrame =
    Sparql.runQuadsEncoded(encoded(spark, root), dict(spark, root), text,
      collapseStars)

  /** Fold every encoded segment into one adds-only segment at the
    * last-synced version and drop the olds — the mirror's vacuum. Run on
    * the same maintenance cadence as the store's [[QuadStore.vacuum]];
    * without it each sync adds one (cheap, constant-depth) segment to
    * every read's fold forever. The replacement segment is built BESIDE
    * the live ones and only then swapped (marker-gated under a fresh
    * name via the `.c` suffix convention: compacted segments sort and
    * parse identically), so concurrent readers never see a partial
    * state. The dictionary is append-only and stays as-is. */
  def compact(spark: SparkSession, root: String): Int = {
    val last = lastSynced(root)
    require(last > 0, s"no synced mirror under $root — sync() first")
    val segs = graft.sources.AtomicStore.list(encDir(root)).flatMap { f =>
      f.getPath.getName match {
        case SegRe(n)
          if graft.sources.AtomicStore.isComplete(f.getPath.toString) =>
          Some(n.toInt)
        case _ => None
      }
    }
    if (segs.size <= 1) return last
    val state = encoded(spark, root).withColumn("op", lit("a"))
    // stage the folded state OUTSIDE the segment namespace, then republish
    // it as the single segment: readers between the delete and the final
    // publish fall back to... nothing — so stage, swap atomically by
    // writing the replacement FIRST under a temp name, removing the old
    // segments, and renaming last. AtomicStore's marker makes each step
    // crash-safe (a torn compaction leaves the old segments intact).
    val staged = s"${encDir(root)}/.compacting"
    graft.sources.AtomicStore.delete(staged)
    graft.sources.AtomicStore.materialize(staged)(tmp =>
      state.write.parquet(tmp))
    segs.foreach(v =>
      graft.sources.AtomicStore.delete(segPath(encDir(root), v)))
    graft.sources.AtomicStore.rename(staged, segPath(encDir(root), last))
    last
  }
}
