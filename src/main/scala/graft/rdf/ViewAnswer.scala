package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** View-based query answering: rewrite a BGP to read MATERIALIZED views
  * for the pattern legs they cover, scanning the triples only for the
  * residual.
  *
  * This is the payoff side of [[BgpView]]/[[ViewStore]]: maintenance
  * keeps a view current for O(|Δ|) per sync, and answering turns a
  * k-pattern query into ONE scan of the (pre-joined, usually far
  * smaller) view plus joins for the uncovered patterns. At warehouse
  * scale that replaces k triples-scans and k−1 shuffles of the biggest
  * table in the system with one columnar read of a result-sized
  * artifact — the entire economic argument for materialized views.
  *
  * Soundness (conjunctive fragment, set semantics): if `h` maps every
  * view pattern onto SOME query pattern (constants exactly, variables
  * consistently), then `h(view)` — the view filtered where `h` merges
  * variables or binds them to constants, renamed to the query's names —
  * equals the solve of the covered query patterns, because the view
  * stores the FULL binding of its pattern set (the [[ViewStore]]
  * create-time invariant) and triples frames are sets, so the full
  * binding join is a set. Hence
  * `solve(Q) = h(view) ⋈ solve(Q \ covered)`. Overlapping covers are
  * harmless for the same reason (idempotent joins).
  */
object ViewAnswer {

  /** A homomorphism from the view's patterns into the query's BGP:
    * each view pattern maps to some query pattern, constants match
    * exactly, and each view variable maps to ONE query term throughout
    * (a variable may map to a constant — the view then answers a more
    * specific query than it stores, via a filter). Returns the variable
    * mapping and the covered query-pattern indices, or None. The search
    * is driver-side backtracking over pattern lists (tens of entries),
    * never touching data. */
  def embed(viewPats: Seq[TP],
      query: Seq[TP]): Option[(Map[String, Term], Set[Int])] = {
    def term(vt: Term, qt: Term,
        m: Map[String, Term]): Option[Map[String, Term]] = (vt, qt) match {
      case (C(a), C(b)) => if (a == b) Some(m) else None
      // a view constant can never produce the open binding a query
      // variable needs
      case (C(_), V(_)) => None
      case (V(n), t) => m.get(n) match {
        case Some(prev) => if (prev == t) Some(m) else None
        case None => Some(m + (n -> t))
      }
    }
    def rec(vps: List[TP], m: Map[String, Term],
        used: Set[Int]): Option[(Map[String, Term], Set[Int])] = vps match {
      case Nil => Some((m, used))
      case vp :: rest =>
        query.zipWithIndex.view.flatMap { case (qp, i) =>
          for {
            m1 <- term(vp.s, qp.s, m)
            m2 <- term(vp.p, qp.p, m1)
            m3 <- term(vp.o, qp.o, m2)
            r <- rec(rest, m3, used + i)
          } yield r
        }.headOption
    }
    require(viewPats.nonEmpty && query.nonEmpty, "empty pattern set")
    rec(viewPats.toList, Map.empty, Set.empty)
  }

  /** Apply an embedding to the materialized view: filter where the
    * mapping merges view variables or binds them to constants, then
    * rename the surviving columns to the query's variable names. */
  def rewrite(view: DataFrame, h: Map[String, Term]): DataFrame = {
    val byTarget = h.toSeq.sortBy(_._1).groupBy(_._2)
    val filtered = byTarget.foldLeft(view) {
      case (df, (C(v), vs)) =>
        vs.foldLeft(df) { case (d, (vn, _)) => d.filter(col(vn) === v) }
      case (df, (V(_), vs)) if vs.size > 1 =>
        vs.tail.foldLeft(df) { case (d, (vn, _)) =>
          d.filter(col(vn) === col(vs.head._1)) }
      case (df, _) => df
    }
    val cols = byTarget.toSeq.collect {
      case (V(q), vs) => (q, vs.head._1)
    }.sortBy(_._1)
    require(cols.nonEmpty,
      "the embedding binds every view variable to a constant — the " +
        "rewrite would be a boolean, not a binding set; solve directly")
    filtered.select(cols.map { case (q, vn) => col(vn).as(q) }: _*)
  }

  /** Answer `query` using whichever of `views` embed into it (greedy,
    * most-covering first, each view at most once, views covering
    * nothing new skipped), joining the residual patterns solved from
    * `triples`. Falls back to a plain [[Bgp.solve]] when nothing
    * embeds. */
  def answer(triples: DataFrame, query: Seq[TP],
      views: Seq[(Seq[TP], DataFrame)]): DataFrame = {
    val embeds = views.flatMap { case (pats, df) =>
      embed(pats, query).map { case (h, covered) => (df, h, covered) }
    }.sortBy(-_._3.size)
    val (frames, covered) = embeds
      .foldLeft((Seq.empty[DataFrame], Set.empty[Int])) {
        case ((fs, cov), (df, h, c)) =>
          if ((c -- cov).isEmpty) (fs, cov)
          else (fs :+ rewrite(df, h), cov ++ c)
      }
    val residual = query.zipWithIndex.collect {
      case (qp, i) if !covered(i) => qp
    }
    val pieces = frames ++
      (if (residual.isEmpty) Nil else Seq(Bgp.solve(triples, residual)))
    pieces.reduce(Bgp.joinSolved)
  }

  /** [[answer]] over PERSISTED views: reads each conjunctive view's
    * definition and maintained state from its [[ViewStore]] root and the
    * triples from the store head. Every view must be synced to the
    * store's current version and defined over `graph` — a stale or
    * cross-graph view would silently answer from the past, so both are
    * loud errors (sync() first; it's O(|Δ|)). */
  def answerStored(spark: SparkSession, storeRoot: String,
      viewRoots: Seq[String], query: Seq[TP],
      graph: String = ""): DataFrame = {
    val cur = QuadStore.currentVersion(storeRoot).getOrElse(
      throw new IllegalArgumentException(s"no store under $storeRoot"))
    val views = viewRoots.map { root =>
      require(ViewStore.mode(root) == "triple",
        s"$root: view-based answering serves the conjunctive fragment " +
          "— union/optional/path views compose downstream")
      val (g, pats) = ViewStore.definition(root)
      require(g == graph,
        s"$root is a view over graph '$g', query runs over '$graph'")
      val synced = ViewStore.lastSynced(root)
      require(synced == cur,
        s"$root reflects store version $synced but the store is at " +
          s"$cur — sync() before answering, or the answer is stale")
      (pats, ViewStore.read(spark, root))
    }
    val triples = QuadStore.readVersion(spark, storeRoot, cur)
      .filter(col("g") === graph).select("s", "p", "o")
    answer(triples, query, views)
  }
}
