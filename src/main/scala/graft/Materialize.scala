package graft

import org.apache.spark.sql.DataFrame

/** Eager materialization of intermediate frames with lineage truncation —
  * the primitive behind the dedup pair builders, iterative path closures
  * and multi-template CONSTRUCT (re-deriving those relations per consumer
  * would re-run whole join trees).
  *
  * Two modes, switched by the session conf `graft.checkpoint.dir`:
  *
  *  - UNSET (default): `localCheckpoint(eager = true)` — blocks live on
  *    executors, zero external storage, the right call single-JVM and for
  *    clusters that prefer recompute-from-source on loss. NOT
  *    fault-tolerant past the checkpoint: losing an executor loses its
  *    blocks and the lineage that could rebuild them.
  *  - SET to a durable directory (HDFS/object store on a cluster):
  *    RELIABLE `checkpoint(eager = true)` — blocks persist to that
  *    directory, and recomputation after executor loss replays from
  *    durable storage. The 100 TB deployment setting.
  *
  * The checkpoint directory is installed on the SparkContext on first use
  * and re-installed if the conf changes between queries.
  */
object Materialize {

  /** Session conf key: durable checkpoint directory (empty/unset →
    * executor-local checkpointing). */
  val DirProp = "graft.checkpoint.dir"

  def apply(df: DataFrame): DataFrame = {
    // tag the eager job with the real caller — every checkpoint
    // otherwise profiles as "Materialize.scala", hiding which lifecycle
    // stage pays the fixed cost (the dominant tax on the IVM keys)
    val sc = df.sparkSession.sparkContext
    val caller = Thread.currentThread.getStackTrace
      .find(e => e.getClassName.startsWith("graft.") &&
        !e.getClassName.contains("Materialize"))
      .map(e => s"materialize at ${e.getFileName}:${e.getLineNumber}")
    caller.foreach(sc.setCallSite)
    try df.sparkSession.conf.getOption(DirProp).filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir appends a per-install UUID subdir; only
        // (re)install when the configured root actually changed
        if (!sc.getCheckpointDir.exists(_.startsWith(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    } finally caller.foreach(_ => sc.clearCallSite())
  }

  /** [[apply]] fused with a row-count probe in ONE scheduler job: the
    * checkpoint is marked lazily and the probe aggregate's pass over it
    * both materializes the blocks and returns `count_if(pred)` — where
    * the eager-checkpoint-then-probe shape pays two driver-blocking
    * jobs, this pays one. On this sandbox a scheduler job floors at
    * ~0.3 s regardless of data, and the fixpoint loops (closure, DRed,
    * min-label propagation, OWL entailment) each run one
    * materialize+probe per round — fusing them nearly halves every
    * round's fixed cost (measured: q_graph_cc loop 12.3 → 6.7 s).
    *
    * The probe aggregate consumes every row of every partition, so the
    * localCheckpoint/checkpoint cache is complete after it — identical
    * post-state to [[apply]]. */
  def probed(df: DataFrame,
      pred: org.apache.spark.sql.Column): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.{sum, when}
    val sc = df.sparkSession.sparkContext
    val caller = Thread.currentThread.getStackTrace
      .find(e => e.getClassName.startsWith("graft.") &&
        !e.getClassName.contains("Materialize"))
      .map(e => s"materialize+probe at ${e.getFileName}:${e.getLineNumber}")
    caller.foreach(sc.setCallSite)
    try {
      val ck = df.sparkSession.conf.getOption(DirProp)
        .filter(_.nonEmpty) match {
        case Some(dir) =>
          if (!sc.getCheckpointDir.exists(_.startsWith(dir)))
            sc.setCheckpointDir(dir)
          df.checkpoint(eager = false)
        case None => df.localCheckpoint(eager = false)
      }
      val row = ck.agg(sum(when(pred, 1L).otherwise(0L))).first()
      (ck, if (row.isNullAt(0)) 0L else row.getLong(0))
    } finally caller.foreach(_ => sc.clearCallSite())
  }

  /** [[probed]] with the always-true predicate: materialize + total row
    * count in one job — the fused form of `Materialize(df)` followed by
    * `df.isEmpty`/`df.count()`. */
  def counted(df: DataFrame): (DataFrame, Long) =
    probed(df, org.apache.spark.sql.functions.lit(true))

  /** [[apply]] unless the frame is ALREADY cheap to re-read: a
    * deterministic project/filter/limit chain over an existing
    * checkpoint, a local relation, or a bare parquet scan. Re-reading
    * those per consumer costs a scan of data that is already sitting in
    * blocks or small files — re-checkpointing them costs a whole
    * scheduler job, which on delta-sized lifecycle plans IS the cost.
    *
    * Use at call sites that never [[release]] the result: the returned
    * frame may alias its INPUT's checkpoint blocks, so releasing it
    * would free storage some other consumer still reads. */
  def reuse(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def cheap(p: LogicalPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: LocalRelation => true
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.catalogTable.isEmpty // bare file scan
      case Project(pl, c) => pl.forall(_.deterministic) && cheap(c)
      case Filter(cond, c) => cond.deterministic && cheap(c)
      case GlobalLimit(_, c) => cheap(c)
      case LocalLimit(_, c) => cheap(c)
      case SubqueryAlias(_, c) => cheap(c)
      case _ => false
    }
    if (cheap(df.queryExecution.analyzed)) df else apply(df)
  }

  /** Free the executor blocks of a frame produced by [[apply]] once it is
    * superseded. Iterative loops (PageRank, BFS, closure, min-label
    * propagation) otherwise pin EVERY round's checkpoint blocks until
    * driver GC — on a long-converging run that is rounds × |labels| of
    * executor memory for frames that will never be read again.
    *
    * Only call on frames that are dead: a local checkpoint's lineage is
    * truncated, so unpersisting its RDD is irrecoverable by design. No-op
    * for non-checkpointed frames (round-0 seeds over source tables) and
    * harmless for reliable checkpoints (the files on the durable store
    * remain authoritative; only cached blocks drop).
    *
    * Scope: only the checkpoint the frame OWNS is freed — the one on its
    * unary plan spine ([[apply]]'s product, possibly under projections a
    * caller added). The walk stops at joins/unions: a checkpoint reached
    * through a binary node belongs to some OTHER, possibly-live frame
    * (e.g. the still-current round of an enclosing loop feeding this
    * frame's lineage), and deep-collecting leaves there would unpersist
    * it mid-flight — the CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND failure mode.
    */
  def release(df: DataFrame): Unit = {
    @annotation.tailrec
    def walk(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
      p match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false): Unit
        case u: org.apache.spark.sql.catalyst.plans.logical.UnaryNode =>
          walk(u.child)
        case _ => ()
      }
    walk(df.queryExecution.logical)
  }
}
