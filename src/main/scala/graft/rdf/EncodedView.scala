package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted materialized views IN ID SPACE, over an [[EncodedMirror]] —
  * the last string-vs-id asymmetry closed: an id-space deployment
  * (the reference's execution model — 8-byte keys everywhere, decode at
  * emission) can now also MAINTAIN its views without ever touching term
  * strings. Create folds the mirror's id-quads once; sync feeds
  * [[BgpView.delta]] with the mirror's own net id-changes
  * ([[EncodedMirror.changesSince]]); reads fold id-binding segments and
  * decode only at emission ([[readDecoded]]).
  *
  * Same lifecycle contracts as [[ViewStore]]: one-shot armored
  * definition, coverage-named segments, contiguity-gated reads,
  * compaction — plus the mirror-side retention rule: sync views BEFORE
  * compacting the mirror (a pruned change range fails loudly in
  * `changesSince`, never a silently stale view).
  *
  * Pattern constants encode as `xxhash64(term)` — the mirror's PURE id
  * function — so encoding a definition needs no dictionary read, and a
  * view can be created before its constants ever appear in the data.
  */
object EncodedView {

  private def basePath(root: String, v: Int) = f"$root%s/b$v%05d"
  private def segPath(root: String, from: Int, to: Int) =
    f"$root%s/s$from%05d" + f"_$to%05d"
  // {5,}: %05d pads to five digits but grows past them at version
  // 100000 — exact-width would silently freeze the fold
  private val BaseRe = "b(\\d{5,})".r
  private val SegRe = "s(\\d{5,})_(\\d{5,})".r

  private def entries(root: String): Seq[(String, Int, Int)] =
    graft.sources.AtomicStore.list(root).flatMap { f =>
      val complete =
        () => graft.sources.AtomicStore.isComplete(f.getPath.toString)
      f.getPath.getName match {
        case BaseRe(v) if complete() => Some(("b", v.toInt, v.toInt))
        case SegRe(a, b) if complete() => Some(("s", a.toInt, b.toInt))
        case _ => None
      }
    }

  /** Highest mirror version the view reflects (0 = never created). */
  def lastSynced(root: String): Int =
    entries(root).map(_._3).maxOption.getOrElse(0)

  def segmentCount(root: String): Int = entries(root).size

  // ---- definition metadata (string-space, shared with ViewStore) -----

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")
  private def termEnc(t: Term): String = t match {
    case V(n) => "V:" + b64(n)
    case C(v: String) => "C:" + b64(v)
    case C(other) => throw new IllegalArgumentException(
      s"definitions are STRING patterns (ids derive by hash), got $other")
  }
  private def termDec(s: String): Term = s.splitAt(2) match {
    case ("V:", b) => V(unb64(b))
    case ("C:", b) => C(unb64(b))
    case _ => throw new IllegalArgumentException(s"bad term encoding: $s")
  }

  private def writeMeta(root: String, graph: String,
      patterns: Seq[TP]): Unit = {
    require(patterns.nonEmpty, "empty view definition")
    val lines = s"encgraph\t${b64(graph)}" +: patterns.map(tp =>
      Seq(termEnc(tp.s), termEnc(tp.p), termEnc(tp.o)).mkString("\t"))
    graft.sources.AtomicStore.writeString(s"$root/meta.tsv",
      lines.mkString("\n"))
  }

  /** The persisted definition: (graph, STRING patterns). */
  def definition(root: String): (String, Seq[TP]) = {
    val lines = graft.sources.AtomicStore.readString(s"$root/meta.tsv")
      .split("\n").toSeq
    val g = lines.head.split("\t", -1) match {
      case Array("encgraph", b) => unb64(b)
      case _ => throw new IllegalArgumentException(
        s"not an encoded view under $root")
    }
    (g, lines.tail.map { l =>
      val Array(s, p, o) = l.split("\t")
      TP(termDec(s), termDec(p), termDec(o))
    })
  }

  // ---- id encoding of the definition ----------------------------------

  /** Encode a definition's constants by the mirror's pure id function.
    * The collect is bounded by the number of DISTINCT pattern constants
    * (a handful per definition — driver-scale by construction). */
  private def encodePatterns(spark: SparkSession,
      patterns: Seq[TP]): Seq[TP] = {
    import spark.implicits._
    val consts = patterns.flatMap(tp => Seq(tp.s, tp.p, tp.o))
      .collect { case C(v: String) => v }.distinct
    val ids =
      if (consts.isEmpty) Map.empty[String, Long]
      else consts.toDF("term").select(col("term"), xxhash64(col("term")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def tr(t: Term): Term = t match {
      case C(v: String) => C(ids(v))
      case other => other
    }
    patterns.map(tp => TP(tr(tp.s), tr(tp.p), tr(tp.o)))
  }

  private def gidOf(spark: SparkSession, graph: String): Long = {
    import spark.implicits._
    // one row — the same pure hash the mirror's dictionary assigns
    Seq(graph).toDF("term").select(xxhash64(col("term")))
      .collect()(0).getLong(0)
  }

  /** The `graph` slice of an id-quads frame as (s, p, o) id-triples. */
  private def slice(quads: DataFrame, gid: Long): DataFrame =
    quads.filter(col("gid") === gid)
      .select(col("sid").as("s"), col("pid").as("p"), col("oid").as("o"))

  // ---- lifecycle -------------------------------------------------------

  /** Bootstrap at the mirror's current version: one fold of the
    * id-quads through [[BgpView.compute]]; idempotent (an existing base
    * at the same version is kept). */
  def create(spark: SparkSession, mirrorRoot: String, viewRoot: String,
      patterns: Seq[TP], graph: String = ""): Int = {
    val cur = EncodedMirror.lastSynced(mirrorRoot)
    require(cur > 0, s"no synced mirror under $mirrorRoot — sync() first")
    writeMeta(viewRoot, graph, patterns)
    val enc = encodePatterns(spark, patterns)
    val gid = gidOf(spark, graph)
    // the gid filter rides BELOW the mirror's last-op fold (pushdown in
    // every scan), and the folded slice is materialized ONCE — compute
    // scans it per pattern leg, and re-running the fold per leg is the
    // difference between slice-sized and mirror-sized work each time
    val old = graft.Materialize(slice(EncodedMirror.encodedAt(spark,
      mirrorRoot, cur, Some(col("gid") === gid)), gid))
    try graft.sources.AtomicStore.materialize(basePath(viewRoot, cur)) {
      tmp => BgpView.compute(old, enc).write.parquet(tmp)
    } finally graft.Materialize.release(old)
    cur
  }

  /** [[create]] from SPARQL text — the same conjunctive fragment (and
    * parser) as the string-space [[ViewStore.createFromSparql]]. */
  def createFromSparql(spark: SparkSession, mirrorRoot: String,
      viewRoot: String, text: String, graph: String = ""): Int =
    create(spark, mirrorRoot, viewRoot,
      ViewStore.patternsFromSparql(text), graph)

  /** Advance the view to the mirror head: net id-changes through the
    * telescoping delta rule, one O(|Δview|) segment — never a
    * recompute, never a decode. Idempotent, crash-safe, loud on a
    * compacted-away range. */
  def sync(spark: SparkSession, mirrorRoot: String,
      viewRoot: String): Int = {
    val cur = EncodedMirror.lastSynced(mirrorRoot)
    val last = lastSynced(viewRoot)
    require(last > 0, s"no view under $viewRoot — create() before sync()")
    if (cur <= last) return last
    val (graph, patterns) = definition(viewRoot)
    val enc = encodePatterns(spark, patterns)
    val gid = gidOf(spark, graph)
    val sliceOnly = Some(col("gid") === gid)
    val (adds, dels) = EncodedMirror.changesSince(spark, mirrorRoot, last,
      sliceOnly)
    // the telescoping delta rule scans its pre-state once per leg —
    // materialize the (slice-sized, gid-pushed-down) fold so each leg
    // reads a cached frame instead of re-shuffling the fold
    val old = graft.Materialize(slice(
      EncodedMirror.encodedAt(spark, mirrorRoot, last, sliceOnly), gid))
    try {
      val (va, vd) = BgpView.delta(old, slice(adds, gid),
        slice(dels, gid), enc)
      val segment = va.withColumn("__op", lit("a"))
        .unionByName(vd.withColumn("__op", lit("d")))
      graft.sources.AtomicStore.materialize(segPath(viewRoot, last, cur)) {
        tmp => segment.write.parquet(tmp)
      }
    } finally graft.Materialize.release(old)
    cur
  }

  /** Newest base ≤ v + the contiguous segments reaching exactly v —
    * loud on gaps/overlaps, on a compaction that rewrote past v, and
    * on a v no sync landed on. */
  private def chainAt(root: String, v: Int): (Int, Seq[(Int, Int)]) = {
    val es = entries(root)
    require(es.nonEmpty, s"no view under $root")
    val baseV = es.collect { case ("b", b, _) if b <= v => b }
      .maxOption.getOrElse(throw new IllegalArgumentException(
        s"no view base at or below $v under $root — compacted past it?"))
    val segs = es.collect {
      case ("s", f, t) if t > baseV && t <= v => (f, t)
    }.sortBy(_._2)
    val reached = segs.foldLeft(baseV) { case (at, (f, t)) =>
      require(f == at, s"view chain gap under $root: segment s$f..$t " +
        s"does not extend $at — concurrent syncs? rebuild with create()")
      t
    }
    require(reached == v, s"$v is not a synced boundary of $root " +
      s"(chain reaches $reached)")
    (baseV, segs)
  }

  /** The maintained ID-BINDING view: base + segments, one
    * last-op-per-binding window — all 8-byte columns. */
  def read(spark: SparkSession, viewRoot: String): DataFrame =
    readAt(spark, viewRoot, lastSynced(viewRoot))

  /** TIME-TRAVEL id read: the view at pinned mirror version `v`
    * (the [[ViewStore.readAt]] contract, in id space). */
  def readAt(spark: SparkSession, viewRoot: String, v: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (baseV, segs) = chainAt(viewRoot, v)
    val base = graft.sources.AtomicStore.readParquet(spark, basePath(viewRoot, baseV))
    if (segs.isEmpty) return base
    val cols = base.columns.toSeq
    val all = base.withColumn("__v", lit(baseV))
      .withColumn("__op", lit("a"))
      .unionByName(segs.map { case (f, t) =>
        graft.sources.AtomicStore.readParquet(spark, segPath(viewRoot, f, t)).withColumn("__v", lit(t))
      }.reduce(_.unionByName(_)))
    val w = Window.partitionBy(cols.map(col): _*)
      .orderBy(col("__v").desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") === "a")
      .select(cols.map(col): _*)
  }

  /** [[read]] decoded at emission through the mirror's dictionary —
    * the only place term strings appear. One join per binding column
    * (ids are unique by the mirror's collision audit, so joins cannot
    * fan out). */
  def readDecoded(spark: SparkSession, mirrorRoot: String,
      viewRoot: String): DataFrame = {
    val ids = read(spark, viewRoot)
    val dict = EncodedMirror.dict(spark, mirrorRoot)
    val cols = ids.columns.toSeq
    cols.foldLeft(ids) { (df, c) =>
      df.join(dict.select(col("id").as(c), col("term").as(s"__t_$c")),
          Seq(c))
        .drop(c).withColumnRenamed(s"__t_$c", c)
    }.select(cols.map(col): _*)
  }

  /** Fold everything into a fresh base at the synced head — publish
    * first, then drop the subsumed entries (every intermediate state
    * reads consistently). */
  def compact(spark: SparkSession, viewRoot: String): Unit = {
    val before = entries(viewRoot)
    val head = lastSynced(viewRoot)
    val baseV = before.collect { case ("b", v, _) => v }.max
    if (head > baseV)
      graft.sources.AtomicStore.materialize(basePath(viewRoot, head)) {
        tmp => read(spark, viewRoot).write.parquet(tmp)
      }
    before.filter { case (k, _, t) => t < head || k == "s" }.foreach {
      case ("b", v, _) =>
        graft.sources.AtomicStore.delete(basePath(viewRoot, v))
      case (_, f, t) =>
        graft.sources.AtomicStore.delete(segPath(viewRoot, f, t))
    }
  }

  def compactIfDeep(spark: SparkSession, viewRoot: String,
      maxChain: Int = 8): Boolean =
    if (segmentCount(viewRoot) > maxChain) { compact(spark, viewRoot); true }
    else false

  // ---- id-space aggregate summary ------------------------------------

  private def writeMetaAgg(root: String, groupVars: Seq[String],
      countCol: String): Unit =
    graft.sources.AtomicStore.writeString(s"$root/meta.tsv",
      (Seq("mode", "aggenc", b64(countCol)) ++ groupVars.map(b64))
        .mkString("\t"))

  /** The id-space summary definition: (groupVars, countCol). */
  def definitionAgg(root: String): (Seq[String], String) =
    graft.sources.AtomicStore.readString(s"$root/meta.tsv")
      .split("\t").toSeq match {
      case Seq("mode", "aggenc", cc, gv @ _*) => (gv.map(unb64), unb64(cc))
      case _ => throw new IllegalArgumentException(
        s"not an id-space aggregate view under $root")
    }

  /** Bootstrap a PERSISTED grouped-count summary over a maintained
    * ID-SPACE view — [[ViewStore.createAgg]]'s shape with every group
    * key an 8-byte id: the dashboard over an id-space deployment never
    * touches a term string until [[readAggDecoded]]'s emission joins.
    * COUNT is the only measure — binding CELLS are ids here, so a SUM
    * over them would sum dictionary hashes; a numeric-measure summary
    * belongs on the string-space [[ViewStore]] (or decode first). */
  def createAgg(spark: SparkSession, viewRoot: String, aggRoot: String,
      groupVars: Seq[String], countCol: String = "n"): Int = {
    val v = lastSynced(viewRoot)
    require(v > 0, s"no view under $viewRoot — create() before createAgg()")
    require(!groupVars.contains(countCol),
      "the count column must not collide with a group variable")
    writeMetaAgg(aggRoot, groupVars, countCol)
    graft.sources.AtomicStore.materialize(basePath(aggRoot, v)) { tmp =>
      read(spark, viewRoot).groupBy(groupVars.map(col): _*)
        .agg(count(lit(1)).as(countCol)).write.parquet(tmp)
    }
    v
  }

  /** Advance the summary from the view's delta SEGMENTS alone — the
    * segments are exact set transitions (a binding enters as "a",
    * leaves as "d"), so ±1 signs sum to each group's exact count
    * change; the view's base is never refolded. Same retention
    * contract as [[ViewStore.syncAgg]]: a compacted-away range fails
    * loudly here. */
  def syncAgg(spark: SparkSession, viewRoot: String,
      aggRoot: String): Int = {
    val (gv, countCol) = definitionAgg(aggRoot)
    val aggLast = lastSynced(aggRoot)
    require(aggLast > 0, s"no summary under $aggRoot — createAgg() first")
    val viewLast = lastSynced(viewRoot)
    if (viewLast <= aggLast) return aggLast
    val vsegs = entries(viewRoot)
      .collect { case ("s", f, t) if f >= aggLast => (f, t) }.sortBy(_._2)
    val covered = vsegs.foldLeft(aggLast) { case (at, (f, t)) =>
      require(f == at, s"view segment chain gap above $aggLast under " +
        s"$viewRoot: s$f..$t does not extend $at")
      t
    }
    require(covered == viewLast,
      s"view segments cover $aggLast..$covered but the view is at " +
        s"$viewLast — compacted past the summary's last sync? syncAgg " +
        "before compact(view), or rebuild with createAgg()")
    val sgn = when(col("__op") === "a", 1L).otherwise(-1L)
    val delta = vsegs.map { case (f, t) =>
        graft.sources.AtomicStore.readParquet(spark, segPath(viewRoot, f, t))
      }.reduce(_.unionByName(_))
      .select(gv.map(col) :+ sgn.as("__sgn"): _*)
      .groupBy(gv.map(col): _*).agg(sum("__sgn").as(countCol))
      .filter(col(countCol) =!= 0L)
    graft.sources.AtomicStore.materialize(
      segPath(aggRoot, aggLast, viewLast)) { tmp =>
      delta.write.parquet(tmp)
    }
    viewLast
  }

  /** The maintained id-keyed summary: base + net segment changes summed
    * per group over summary-sized frames. */
  def readAgg(spark: SparkSession, aggRoot: String): DataFrame = {
    val (gv, countCol) = definitionAgg(aggRoot)
    val (baseV, segs) = chainAt(aggRoot, lastSynced(aggRoot))
    (graft.sources.AtomicStore.readParquet(spark, basePath(aggRoot, baseV)) +:
      segs.map { case (f, t) => graft.sources.AtomicStore.readParquet(spark, segPath(aggRoot, f, t)) })
      .reduce(_.unionByName(_))
      .groupBy(gv.map(col): _*).agg(sum(countCol).as(countCol))
      .filter(col(countCol) =!= 0L)
  }

  /** [[readAgg]] with the group keys decoded at emission — the only
    * strings in the whole summary lifecycle. */
  def readAggDecoded(spark: SparkSession, mirrorRoot: String,
      aggRoot: String): DataFrame = {
    val (gv, _) = definitionAgg(aggRoot)
    val ids = readAgg(spark, aggRoot)
    val dict = EncodedMirror.dict(spark, mirrorRoot)
    gv.foldLeft(ids) { (df, c) =>
      df.join(dict.select(col("id").as(c), col("term").as(s"__t_$c")),
          Seq(c))
        .drop(c).withColumnRenamed(s"__t_$c", c)
    }.select(ids.columns.toSeq.map(col): _*)
  }

  /** Fold the summary chain into a fresh base at its synced head. */
  def compactAgg(spark: SparkSession, aggRoot: String): Unit = {
    val before = entries(aggRoot)
    val head = lastSynced(aggRoot)
    val baseV = before.collect { case ("b", v, _) => v }.max
    if (head > baseV)
      graft.sources.AtomicStore.materialize(basePath(aggRoot, head)) {
        tmp => readAgg(spark, aggRoot).write.parquet(tmp)
      }
    before.filter { case (k, _, t) => t < head || k == "s" }.foreach {
      case ("b", v, _) =>
        graft.sources.AtomicStore.delete(basePath(aggRoot, v))
      case (_, f, t) =>
        graft.sources.AtomicStore.delete(segPath(aggRoot, f, t))
    }
  }

  def compactAggIfDeep(spark: SparkSession, aggRoot: String,
      maxChain: Int = 8): Boolean =
    if (segmentCount(aggRoot) > maxChain) { compactAgg(spark, aggRoot); true }
    else false
}
