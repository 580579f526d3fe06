package graft

import org.apache.spark.sql.SparkSession

/** The one local-session factory all entry points share, so the semantics-
  * bearing settings (UTC timezone for oracle parity, nanosAsLong for the
  * nanosecond events table, AQE) are maintained in exactly one place.
  */
object GraftSession {
  def local(cpus: String, extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      // StarCollapse analyzer rule (default ON; graft.star.collapse=false opts out)
      .config("spark.sql.extensions", classOf[plans.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // cost-based optimization: inert without statistics, active for
      // anything registered through Tables.analyzeAll (TPC-H, CBO chains)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      // events.ts is parquet TIMESTAMP(NANOS); read as raw nanos (see Tables)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // dead localCheckpoint blocks are reclaimed by the ContextCleaner
      // only when GC notices their RDDs are unreachable; the default
      // 30min periodic GC lets a long session (the 261-key bench, a
      // maintenance service) accumulate superseded loop-round and
      // fold-cache blocks — in local mode that is driver-heap pressure
      // that taxes every later shuffle. 5min keeps reclamation ahead of
      // accumulation at negligible GC cost.
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.ui.enabled", "false")
    extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
  }
}
