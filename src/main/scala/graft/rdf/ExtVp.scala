package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2RDF-style extended vertical partitioning (Schätzle et al.,
  * "S2RDF: RDF Querying with SPARQL on Spark", VLDB 2016 — the published
  * Spark SPARQL engine): beyond one VP table per predicate, precompute
  * SEMI-JOIN REDUCTIONS of each VP table against its possible join
  * partners —
  *
  *   ExtVP_SS[p|q] = rows of VP[p] whose subject occurs as a subject of q
  *   ExtVP_SO[p|q] = rows of VP[p] whose subject occurs as an OBJECT of q
  *   ExtVP_OS[p|q] = rows of VP[p] whose OBJECT occurs as a subject of q
  *
  * — so a BGP join scans only the join-surviving subset of each
  * predicate's table. Reductions with selectivity above `threshold` are
  * discarded (they would not pay for their storage), exactly S2RDF's SF
  * threshold. Build is ingest-time: #preds is schema-sized, so the
  * reduction enumeration is O(#preds²) SMALL semi-joins over
  * predicate-pruned scans, each delta written once; at query time the
  * solver picks, per pattern, the lowest-selectivity reduction its join
  * partners admit (VP as the fallback) — scans shrink before any shuffle
  * happens, which at 100 TB is the difference between shuffling a
  * predicate's full fact table and its join-relevant slice.
  */
object ExtVp {

  /** kind ∈ {SS, SO, OS}; key (p, q, kind) = reduction of VP[p] by q. */
  final case class Store(vp: Map[String, DataFrame],
      red: Map[(String, String, String), DataFrame],
      sel: Map[(String, String, String), Double])

  /** Build VP + reductions for every predicate of `triples`. Driver work
    * is bounded by the schema (#preds² selectivity checks, each a count
    * over a cached predicate slice), never by the data volume. */
  def build(triples: DataFrame, threshold: Double = 0.9): Store = {
    import triples.sparkSession.implicits._
    val preds = triples.select("p").distinct().as[String].collect().sorted
    val vp = preds.map(p =>
      p -> triples.filter(col("p") === p).select("s", "o").persist()).toMap
    val n = preds.map(p => p -> vp(p).count().toDouble).toMap
    val red = scala.collection.mutable.Map.empty[(String, String, String), DataFrame]
    val sel = scala.collection.mutable.Map.empty[(String, String, String), Double]
    for (p <- preds; q <- preds if p != q; kind <- Seq("SS", "SO", "OS")) {
      val (leftKey, rightKey) = kind match {
        case "SS" => ("s", "s")
        case "SO" => ("s", "o")
        case "OS" => ("o", "s")
      }
      val reduced = vp(p).join(
        vp(q).select(col(rightKey).as(leftKey)).distinct(),
        Seq(leftKey), "left_semi")
      val cnt = reduced.count().toDouble
      val s = if (n(p) == 0) 1.0 else cnt / n(p)
      if (s <= threshold && cnt > 0) {
        red((p, q, kind)) = reduced
        sel((p, q, kind)) = s
      }
    }
    Store(vp, red.toMap, sel.toMap)
  }

  /** Solve a constant-predicate BGP over the store: each pattern scans
    * the LOWEST-selectivity reduction its join partners admit (its VP
    * table when none survives the threshold), then the ordinary solved
    * join tree runs — identical semantics to [[Bgp.solve]], smaller
    * inputs. */
  def solve(store: Store, patterns: Seq[TP]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    def pred(tp: TP): String = tp.p match {
      case C(v: String) => v
      case _ => throw new IllegalArgumentException(
        "ExtVP requires constant predicates (variable-predicate patterns " +
          "scan the full triples table — use Bgp.solve)")
    }
    def vars(t: Term): Option[String] = t match {
      case V(n) => Some(n)
      case _ => None
    }
    val solved = patterns.zipWithIndex.map { case (tp, i) =>
      val p = pred(tp)
      // partner patterns sharing an endpoint variable, with the join kind
      // seen from THIS pattern's side
      val candidates = patterns.zipWithIndex.filter(_._2 != i).flatMap {
        case (other, _) =>
          val q = pred(other)
          val kinds = scala.collection.mutable.ArrayBuffer.empty[String]
          for (a <- vars(tp.s); b <- vars(other.s)) if (a == b) kinds += "SS"
          for (a <- vars(tp.s); b <- vars(other.o)) if (a == b) kinds += "SO"
          for (a <- vars(tp.o); b <- vars(other.s)) if (a == b) kinds += "OS"
          kinds.map(k => (p, q, k))
      }
      val best = candidates.filter(store.sel.contains)
        .sortBy(k => (store.sel(k), k.toString))
        .headOption
      // unknown predicate matches nothing; an EMPTY store has no vp to
      // slice, so synthesize the (s, o) shape from the session
      def emptyScan: DataFrame = org.apache.spark.sql.SparkSession.active
        .range(0).select(lit("").as("s"), lit("").as("o"))
      val scan = best.map(store.red).getOrElse(
        store.vp.getOrElse(p,
          store.vp.headOption.map(_._2.limit(0)).getOrElse(emptyScan)))
      // σ(constants) + π(variables) + repeated-var equality over the VP
      // layout — the shared pattern solver, with no `p` component
      Bgp.onePattern(scan, Seq("s" -> tp.s, "o" -> tp.o))
    }
    solved.reduce(Bgp.joinSolved)
  }

  private val stores =
    scala.collection.concurrent.TrieMap.empty[String, (Store, String)]

  /** The persisted ExtVP store for the canonical triples of `sfDir` —
    * reductions are parquet directories under one AtomicStore-published
    * root (crash-safe, built once per dataset), with the selectivity map
    * in `sel.json`. Queries through here measure the reduced-scan solve,
    * not the ingest-time reduction build. */
  def forDataset(spark: SparkSession, sfDir: String,
      threshold: Double = 0.9): Store =
    stores.getOrElseUpdate(s"$sfDir#$threshold", {
      val key = graft.sources.AtomicStore.key(sfDir, Triples.duckCte,
        s"extvp-$threshold")
      val base = s"${sys.props("java.io.tmpdir")}/graft_extvp_$key"
      val path = graft.sources.AtomicStore.materialize(base) { tmp =>
        val st = build(Triples.build(spark, sfDir), threshold)
        st.vp.foreach { case (p, df) =>
          df.write.parquet(s"$tmp/vp/${enc(p)}") }
        st.red.foreach { case ((p, q, k), df) =>
          df.write.parquet(s"$tmp/red/${enc(p)}__${enc(q)}__$k") }
        val json = st.sel.toSeq.sortBy(_._1.toString).map {
          case ((p, q, k), s) => s"""["${enc(p)}","${enc(q)}","$k",$s]"""
        }.mkString("[", ",", "]")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(tmp, "sel.json"), json): Unit
        st.vp.values.foreach(_.unpersist())
      }
      val selRows = parseSel(java.nio.file.Files.readString(
        java.nio.file.Paths.get(path, "sel.json")))
      val sel = selRows.map { case (p, q, k, s) => ((dec(p), dec(q), k), s) }.toMap
      val vp = graft.sources.AtomicStore.list(s"$path/vp").map(f =>
        dec(f.getPath.getName) ->
          spark.read.parquet(f.getPath.toString)).toMap
      val red = sel.keys.map { case (p, q, k) =>
        (p, q, k) -> spark.read.parquet(s"$path/red/${enc(p)}__${enc(q)}__$k")
      }.toMap
      (Store(vp, red, sel), path)
    })._1

  // predicate names are IRIs/terms — hex-encode for directory safety
  private def enc(p: String): String =
    p.getBytes("UTF-8").map(b => f"$b%02x").mkString
  private def dec(h: String): String =
    new String(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8")

  /** Minimal parser for the sel.json written above (no JSON lib on the
    * classpath): [["hex","hex","K",0.5],...] */
  private def parseSel(s: String): Seq[(String, String, String, Double)] = {
    val row = """\["([0-9a-f]*)","([0-9a-f]*)","(SS|SO|OS)",([0-9.eE+-]+)\]""".r
    row.findAllMatchIn(s).map(m =>
      (m.group(1), m.group(2), m.group(3), m.group(4).toDouble)).toSeq
  }
}
