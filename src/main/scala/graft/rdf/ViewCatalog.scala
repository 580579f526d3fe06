package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A catalog of registered materialized-view roots — the DISCOVERY
  * layer above [[ViewAnswer]]. The answering calls are deliberately
  * STRICT (a stale or cross-graph view passed explicitly is a loud
  * error); the catalog is where policy lives: [[answer]] FILTERS the
  * registry down to the views usable for THIS query — conjunctive
  * mode, same graph, synced to the store head — and hands exactly
  * those through, so registering views over other graphs, or letting
  * one lag a sync behind, never breaks unrelated queries. A query no
  * registered view can serve still answers (plain solve fallback
  * inside [[ViewAnswer.answer]]).
  *
  * The registry is one small base64-armored TSV, rewritten whole on
  * each (rare, administrative) registration — deliberately NOT a
  * segment log: it is driver-scale metadata, and last-writer-wins on
  * an admin race is acceptable where silent view staleness is not.
  */
object ViewCatalog {

  private def file(root: String) = s"$root/catalog.tsv"
  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** Registered view roots, registration order, deduplicated. */
  def roots(catalogRoot: String): Seq[String] =
    try graft.sources.AtomicStore.readString(file(catalogRoot))
      .split("\n").toSeq.filter(_.nonEmpty).map(unb64).distinct
    catch { case _: java.io.FileNotFoundException => Nil }

  /** Add a view root (idempotent). The view must already exist — a
    * typo'd root would otherwise poison every later [[answer]]. */
  def register(catalogRoot: String, viewRoot: String): Unit = {
    ViewStore.mode(viewRoot): Unit // loud if there is no view here
    val now = (roots(catalogRoot) :+ viewRoot).distinct
    graft.sources.AtomicStore.writeString(file(catalogRoot),
      now.map(b64).mkString("\n"))
  }

  def deregister(catalogRoot: String, viewRoot: String): Unit =
    graft.sources.AtomicStore.writeString(file(catalogRoot),
      roots(catalogRoot).filterNot(_ == viewRoot).map(b64).mkString("\n"))

  /** The registered views usable for a query over `graph` right now:
    * conjunctive mode, defined over the same graph, synced to the
    * store's current version. */
  def usable(spark: SparkSession, storeRoot: String, catalogRoot: String,
      graph: String = ""): Seq[String] = {
    val cur = QuadStore.currentVersion(storeRoot).getOrElse(
      throw new IllegalArgumentException(s"no store under $storeRoot"))
    roots(catalogRoot).filter { r =>
      ViewStore.mode(r) == "triple" &&
        ViewStore.definition(r)._1 == graph &&
        ViewStore.lastSynced(r) == cur
    }
  }

  /** Answer a conjunctive SPARQL query from whatever registered views
    * are usable — see [[ViewAnswer.answerSparql]] for the fragment. */
  def answer(spark: SparkSession, storeRoot: String, catalogRoot: String,
      text: String, graph: String = ""): DataFrame =
    ViewAnswer.answerSparql(spark, storeRoot,
      usable(spark, storeRoot, catalogRoot, graph), text, graph)

  // ---- aggregate-summary routing ------------------------------------

  private def aggFile(root: String) = s"$root/catalog_agg.tsv"

  /** Registered (binding view, summary) pairs, registration order. */
  def aggPairs(catalogRoot: String): Seq[(String, String)] =
    try graft.sources.AtomicStore.readString(aggFile(catalogRoot))
      .split("\n").toSeq.filter(_.nonEmpty).map { line =>
        val Array(v, a) = line.split("\t")
        (unb64(v), unb64(a))
      }.distinct
    catch { case _: java.io.FileNotFoundException => Nil }

  /** Register a maintained summary with its binding view (idempotent);
    * both must already exist. */
  def registerAgg(catalogRoot: String, viewRoot: String,
      aggRoot: String): Unit = {
    ViewStore.mode(viewRoot): Unit
    ViewStore.definitionAgg(aggRoot): Unit // loud if not a summary
    val now = (aggPairs(catalogRoot) :+ ((viewRoot, aggRoot))).distinct
    graft.sources.AtomicStore.writeString(aggFile(catalogRoot),
      now.map { case (v, a) => s"${b64(v)}\t${b64(a)}" }.mkString("\n"))
  }

  def deregisterAgg(catalogRoot: String, viewRoot: String,
      aggRoot: String): Unit =
    graft.sources.AtomicStore.writeString(aggFile(catalogRoot),
      aggPairs(catalogRoot).filterNot(_ == ((viewRoot, aggRoot)))
        .map { case (v, a) => s"${b64(v)}\t${b64(a)}" }.mkString("\n"))

  /** Route a grouped COUNT/SUM/MIN/MAX/AVG query to the first registered
    * summary that can serve it — same policy shape as [[answer]]: the
    * strict checks live in [[ViewAnswer.answerAggSparql]] (isomorphic
    * BGP, aligned groups and measures, double staleness gate), and the
    * catalog tries each usable pair, skipping the ones whose strictness
    * trips. A query no summary serves — or one outside the maintainable
    * aggregate fragment entirely — falls back to the plain solve over
    * the store head, so registration mistakes degrade to performance,
    * never to wrong or refused answers. */
  def answerAgg(spark: SparkSession, storeRoot: String,
      catalogRoot: String, text: String, graph: String = ""): DataFrame = {
    val fallback = () => {
      val cur = QuadStore.currentVersion(storeRoot).getOrElse(
        throw new IllegalArgumentException(s"no store under $storeRoot"))
      Sparql.run(QuadStore.readVersion(spark, storeRoot, cur)
        .filter(org.apache.spark.sql.functions.col("g") === graph)
        .select("s", "p", "o"), text)
    }
    val parsed =
      try { ViewStore.aggPatternsFromSparql(text); true }
      catch { case _: IllegalArgumentException => false }
    if (!parsed) return fallback()
    aggPairs(catalogRoot).view.flatMap { case (v, a) =>
      try Some(ViewAnswer.answerAggSparql(spark, storeRoot, v, a, text,
        graph))
      catch { case _: IllegalArgumentException => None }
    }.headOption.getOrElse(fallback())
  }
}
