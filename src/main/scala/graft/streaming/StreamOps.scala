package graft.streaming

import graft.{Det, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time windowing over the `events` table, written once and used two
  * ways: batch DataFrames (oracle-checkable against DuckDB) and Structured
  * Streaming (same transform over `readStream`/MemoryStream, verified in
  * StreamingSpec with watermarks and late data).
  *
  * Timestamp discipline: events carry nanosecond timestamps; Spark windows
  * operate on the micros-truncated TimestampType column while oracles use
  * `epoch_ns(ts) // 1000` integer arithmetic, so both engines bucket the
  * exact same microsecond values. Window starts are emitted as epoch-micro
  * longs, never rendered strings.
  *
  * Scale: tumbling/sliding aggregation is partial-agg + one shuffle on
  * (window, key); sliding emits one row per overlapping window (ratio
  * length/slide) at map side. Session windows shuffle on the user key; in
  * streaming mode state is per (key, open session) and bounded by the
  * watermark.
  */
object StreamOps extends QueryModule {

  /** Shared transform: tumbling 10-minute window per event_type. */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts_us"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_start_us"), col("event_type"),
        col("n"), col("sum_value"))

  /** Shared transform: 10-minute windows sliding every 5 minutes. */
  def sliding(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts_us"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_start_us"), col("event_type"),
        col("n"), col("sum_value"))

  /** Shared transform: gap-based session windows (5 min) per user. */
  def session(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("ts_us"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("sess_start_us"),
        col("n"), col("sum_value"))

  /** Batch dual of [[streamingDedup]]'s first-arrival semantics, widened
    * to a composite business key: the EARLIEST event per (user,
    * event_type), ties broken by event_id. One partial-aggregated shuffle
    * on the key — a struct `min`, not a window sort — so over a stream's
    * full history the dedup costs one combine-friendly aggregation and
    * never a per-partition total order. */
  def firstEventPerKey(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts_us_long"), col("event_id"))).as("f"))
      .select(col("user_id"), col("event_type"),
        col("f.ts_us_long").as("first_us"), col("f.event_id").as("event_id"))

  /** Batch dual of [[streamStreamJoin]]: purchase events matched to the
    * same user's signup events in the trailing hour (inclusive ends, the
    * helper's BETWEEN contract). The join key is the user equi-column
    * only, so the shuffle is hash-partitioned and AQE-splittable; the
    * interval lands as a post-join filter, never a nested-loop
    * condition. */
  def purchaseAttribution(ev: DataFrame,
      windowUs: Long = 3600L * 1000000L): DataFrame = {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us_long").as("purchase_us"))
    val sg = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("ts_us_long").as("signup_us"))
    p.join(sg, Seq("user_id"))
      .filter(col("signup_us") >= col("purchase_us") - lit(windowUs) &&
        col("signup_us") <= col("purchase_us"))
  }

  /** CDC materialization, batch dual: LAST-writer-wins per key with
    * tombstones. Events replay as a change stream keyed by user —
    * `error` rows act as deletes (tombstones), everything else upserts
    * its value — and the materialized state is each key's latest
    * surviving row: one struct-`max` aggregation (combine-friendly, no
    * window sort), then tombstoned keys drop. The mirror image of
    * [[firstEventPerKey]]: ingest dedup keeps the FIRST arrival, CDC
    * materialization the LAST write. At table-maintenance scale this is
    * the compaction step of a Delta/Hudi-style merge-on-read sink. */
  def cdcMaterialize(ev: DataFrame): DataFrame =
    ev.withColumn("op",
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts_us_long"), col("event_id"), col("op"),
        col("value"))).as("last"))
      .filter(col("last.op") =!= "D")
      .select(col("user_id"), col("last.ts_us_long").as("last_us"),
        col("last.event_id").as("event_id"), col("last.value").as("value"))

  val queries: Map[String, Q] = Map(
    "q_stream_cdc" -> ((s, d) =>
      cdcMaterialize(Tables.events(s, d)).orderBy(col("user_id"))),
    "q_stream_tumbling" -> ((s, d) =>
      tumbling(Tables.events(s, d))
        .orderBy(col("win_start_us"), col("event_type"))),
    "q_stream_dedup" -> ((s, d) =>
      firstEventPerKey(Tables.events(s, d))
        .orderBy(col("user_id"), col("event_type"))),
    "q_stream_join" -> ((s, d) =>
      purchaseAttribution(Tables.events(s, d))
        .orderBy(col("user_id"), col("purchase_id"), col("signup_id"))),
    "q_stream_sliding" -> ((s, d) =>
      sliding(Tables.events(s, d))
        .orderBy(col("win_start_us"), col("event_type"))),
    "q_stream_session" -> ((s, d) =>
      session(Tables.events(s, d))
        .orderBy(col("user_id"), col("sess_start_us"))),
    // Star completion over the triples feed: the batch dual of
    // streamingStarMatch — subjects that have seen ALL star predicates,
    // with the deterministic first (min) object per predicate.
    "q_stream_star" -> ((s, d) =>
      starMatch(graft.rdf.Triples.build(s, d),
        Seq("name", "mktsegment", "nation"))
        .orderBy(col("s"), col("p")))
  )

  private val sumv = Det.dsumSql("value")

  val oracleSql: Map[String, String] = Map(
    // last row per user by (us, event_id), then tombstones drop; value
    // passes through unaggregated so the double is exact on both sides
    "q_stream_cdc" ->
      """WITH e AS (SELECT user_id, (epoch_ns(ts) // 1000) AS us, event_id,
        |  CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, value
        |  FROM events),
        |m AS (SELECT user_id, max(us) AS last_us FROM e GROUP BY 1),
        |l AS (SELECT e.user_id, e.us AS last_us, max(e.event_id) AS event_id
        |      FROM e JOIN m ON e.user_id = m.user_id AND e.us = m.last_us
        |      GROUP BY 1, 2)
        |SELECT l.user_id, l.last_us, l.event_id, e.value
        |FROM l JOIN e ON e.user_id = l.user_id AND e.us = l.last_us
        |  AND e.event_id = l.event_id
        |WHERE e.op <> 'D'
        |ORDER BY l.user_id""".stripMargin,

    "q_stream_dedup" ->
      """WITH e AS (SELECT user_id, event_type, (epoch_ns(ts) // 1000) AS us,
        |                  event_id FROM events),
        |m AS (SELECT user_id, event_type, min(us) AS first_us
        |      FROM e GROUP BY 1, 2)
        |SELECT m.user_id, m.event_type, m.first_us,
        |  min(e.event_id) AS event_id
        |FROM m JOIN e ON e.user_id = m.user_id
        |  AND e.event_type = m.event_type AND e.us = m.first_us
        |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,

    "q_stream_join" ->
      """WITH e AS (SELECT user_id, event_type, (epoch_ns(ts) // 1000) AS us,
        |                  event_id FROM events)
        |SELECT p.user_id, p.event_id AS purchase_id, p.us AS purchase_us,
        |       s.event_id AS signup_id, s.us AS signup_us
        |FROM e p JOIN e s ON s.user_id = p.user_id
        |WHERE p.event_type = 'purchase' AND s.event_type = 'signup'
        |  AND s.us >= p.us - 3600000000 AND s.us <= p.us
        |ORDER BY 1, 2, 4""".stripMargin,

    "q_stream_tumbling" ->
      s"""WITH e AS (SELECT (epoch_ns(ts) // 1000) AS us, event_type, value FROM events)
         |SELECT (us - (us % 600000000)) AS win_start_us, event_type,
         |  CAST(count(*) AS BIGINT) AS n, $sumv AS sum_value
         |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Each event belongs to exactly two 10-min windows on a 5-min slide:
    // the slide-aligned bucket and the one before it.
    "q_stream_sliding" ->
      s"""WITH e AS (SELECT (epoch_ns(ts) // 1000) AS us, event_type, value FROM events),
         |w AS (
         |  SELECT (us - (us % 300000000)) AS win_start_us, event_type, value FROM e
         |  UNION ALL
         |  SELECT (us - (us % 300000000)) - 300000000, event_type, value FROM e)
         |SELECT win_start_us, event_type,
         |  CAST(count(*) AS BIGINT) AS n, $sumv AS sum_value
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Gaps-and-islands: a new session starts when the gap from the
    // previous event of the same user is >= 5 minutes (session_window
    // merges only strictly-closer events).
    "q_stream_session" ->
      s"""WITH e AS (SELECT user_id, (epoch_ns(ts) // 1000) AS us, value FROM events),
         |x AS (
         |  SELECT user_id, us, value,
         |    CASE WHEN lag(us) OVER w IS NULL
         |              OR us - lag(us) OVER w >= 300000000
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
         |y AS (
         |  SELECT user_id, us, value,
         |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM x)
         |SELECT user_id, min(us) AS sess_start_us,
         |  CAST(count(*) AS BIGINT) AS n, $sumv AS sum_value
         |FROM y GROUP BY user_id, sid ORDER BY user_id, sess_start_us""".stripMargin,

    "q_stream_star" ->
      s"""WITH triples AS (
         |${graft.rdf.Triples.duckCte}
         |), m AS (
         |  SELECT s, p, min(o) AS o FROM triples
         |  WHERE p IN ('name', 'mktsegment', 'nation') GROUP BY s, p
         |)
         |SELECT s, p, o FROM m
         |WHERE s IN (SELECT s FROM m GROUP BY s HAVING count(*) = 3)
         |ORDER BY s, p""".stripMargin
  )

  /** Batch star-completion: subjects of `triples` carrying ALL `preds`,
    * emitted as the star's (s, p, o) rows with the deterministic minimum
    * object per predicate. Two partial-agg shuffles, (s, p) then s.
    * Agrees with [[streamingStarMatch]] when each (subject, predicate)
    * is single-valued — the property-table assumption — or when arrival
    * order presents the minimum first; with multi-valued predicates the
    * streaming matcher keeps the FIRST arrival (its contract), which
    * need not be the minimum. */
  def starMatch(triples: DataFrame, preds: Seq[String]): DataFrame = {
    val m = triples.filter(col("p").isin(preds: _*))
      .groupBy(col("s"), col("p")).agg(min(col("o")).as("o"))
    val complete = m.groupBy(col("s")).agg(count(lit(1)).as("np"))
      .filter(col("np") === preds.size)
      .select("s")
    m.join(complete, Seq("s"), "left_semi")
  }

  // ---------------- true-streaming helpers (tested via MemoryStream) ------

  /** Streaming tumbling aggregate with a watermark: late events beyond
    * `lateness` are dropped, windows finalize in append mode. */
  def streamingTumbling(ev: DataFrame, lateness: String = "10 minutes"): DataFrame =
    ev.withWatermark("ts_us", lateness)
      .groupBy(window(col("ts_us"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_start_us"), col("event_type"), col("n"))

  /** Streaming exactly-once-style dedup by event_id within the watermark. */
  def streamingDedup(ev: DataFrame, lateness: String = "10 minutes"): DataFrame =
    ev.withWatermark("ts_us", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming incremental corpus dedup — [[graft.llm.Dedup.incrementalExact]]
    * lifted to Structured Streaming. New documents dedup against BOTH:
    *
    *  - the persisted corpus snapshot, via a stream-static LEFT ANTI join
    *    on the 32-byte content digest (stateless, re-planned per
    *    micro-batch; at 100 TB the snapshot side is digest-only rows);
    *  - in-stream repeats, via `dropDuplicatesWithinWatermark` on the
    *    digest — cross-micro-batch state that the watermark ages out, so
    *    the state store holds only the recent-digest window while the
    *    snapshot side covers everything older.
    */
  def streamingIncrementalDedup(docs: DataFrame, snapshot: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val seen = snapshot.select(sha2(col("text"), 256).as("h")).distinct()
    docs.withColumn("h", sha2(col("text"), 256))
      .withWatermark("ts_us", lateness)
      .join(seen, Seq("h"), "left_anti")
      .dropDuplicatesWithinWatermark("h")
      .drop("h")
  }

  /** Stream-stream interval join: events match orders of the same user
    * within the trailing `window`. Both sides carry watermarks, so join
    * state is bounded — Spark can discard buffered rows once the other
    * side's watermark passes the interval, which is what keeps a 100 TB/day
    * stream join's state from growing without bound.
    */
  def streamStreamJoin(events: DataFrame, orders: DataFrame,
      window: String = "1 hour", lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts_us", lateness)
      .join(orders.withWatermark("o_ts", lateness),
        expr(s"user_id = o_uid AND o_ts BETWEEN ts_us - INTERVAL $window AND ts_us"))

  case class Ev(user_id: Long, ts_us_long: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, sess_start_us: Long, n: Long, sum_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * arbitrary-state API the built-in session_window can't express (e.g.
    * emitting closed sessions with custom payloads). State per user is one
    * open session; a closed session emits on the next event beyond the
    * gap, or — when `idleTimeout` is set — at the processing-time timeout.
    * Production streams SHOULD set it: without a timeout an idle user's
    * last session never emits and its state entry lives forever (unbounded
    * state at stream scale). It defaults to off because a timeout-armed
    * query keeps scheduling timeout batches, which never quiesces under
    * the synchronous `processAllAvailable` used in tests/backfills.
    */
  def statefulSessionize(ev: Dataset[Ev], gapUs: Long,
      idleTimeout: Option[String] = None): Dataset[SessionOut] = {
    import ev.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closing = state.getOption
              .map(s => SessionOut(uid, s.start, s.n, s.sum))
            state.remove()
            closing.iterator
          } else {
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            rows.toSeq.sortBy(e => (e.ts_us_long, e.value)).foreach { e =>
              cur match {
                case Some(s) if e.ts_us_long - s.last < gapUs =>
                  cur = Some(SessionState(s.start, e.ts_us_long, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  out += SessionOut(uid, s.start, s.n, s.sum)
                  cur = Some(SessionState(e.ts_us_long, e.ts_us_long, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts_us_long, e.ts_us_long, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }
  }

  case class Triple3(s: String, p: String, o: String)
  case class StarState(bound: Map[String, String], done: Boolean)
  case class StarOut(s: String, bindings: Map[String, String])

  /** Continuous star matching over a TRIPLE STREAM — the reference's
    * subject-star lookup (one grouped fetch per star) turned into a
    * standing query: as triples arrive, per-subject state accumulates the
    * star's predicate bindings and EMITS EXACTLY ONCE the moment every
    * predicate of `preds` has been seen. The entity-completeness gate of
    * a streaming KG ingest — "release the customer record downstream once
    * name, segment and nation have all arrived".
    *
    * Semantics (deterministic): first arrival binds a predicate (later
    * objects for an already-bound predicate are ignored; within one
    * micro-batch "first" is the (p, o)-least row); a completed subject is
    * remembered as done so replays/extras never re-emit. State per
    * subject is one partial map, bounded by the star width; production
    * streams SHOULD set `idleTimeout` so never-completing subjects are
    * evicted instead of living in the state store forever (same contract
    * as [[statefulSessionize]]).
    */
  def streamingStarMatch(triples: Dataset[Triple3], preds: Seq[String],
      idleTimeout: Option[String] = None): Dataset[StarOut] = {
    import triples.sparkSession.implicits._
    val want = preds.toSet
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    triples.filter(t => want.contains(t.p))
      .groupByKey(_.s)
      .flatMapGroupsWithState[StarState, StarOut](
        OutputMode.Append, timeoutConf) {
        (subj: String, rows: Iterator[Triple3], state: GroupState[StarState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(StarState(Map.empty, done = false))
            val out = scala.collection.mutable.ArrayBuffer.empty[StarOut]
            rows.toSeq.sortBy(t => (t.p, t.o)).foreach { t =>
              if (!st.done && !st.bound.contains(t.p)) {
                st = st.copy(bound = st.bound + (t.p -> t.o))
                if (want.forall(st.bound.contains)) {
                  out += StarOut(subj, st.bound)
                  st = st.copy(done = true)
                }
              }
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** foreachBatch sink appending each micro-batch of quads into a
    * delta-log [[graft.rdf.QuadStore]] — the continuous-KG-ingest shape:
    * a triple/quad stream lands as O(|batch|) delta segments on one
    * evolving, versioned, SPARQL-queryable store. Exactly-once
    * end-to-end: delivery is at-least-once, but
    * [[graft.rdf.QuadStore.appendQuads]] presence-screens the batch
    * against the store (set semantics), so a replayed batch appends an
    * empty segment and the quad SET is unchanged. Usage:
    * `stream.writeStream.foreachBatch(StreamOps.quadStoreSink(root))`. */
  def quadStoreSink(root: String)
      : (Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, _) => {
      graft.rdf.QuadStore.appendQuads(batch.sparkSession, root,
        batch.toDF()): Unit
    }

  /** [[quadStoreSink]] composed with maintained-view sync: each
    * micro-batch lands in the delta store exactly-once AND folds into
    * the persisted BGP view ([[graft.rdf.ViewStore.sync]] — one
    * O(|Δview|) segment per batch, coverage-named so replays are
    * no-ops). The CDC loop from stream to materialization as one
    * foreachBatch hook; `maxChain` bounds the view's read-side fold via
    * compactIfDeep on the same cadence. */
  def maintainedViewSink(storeRoot: String, viewRoot: String,
      maxChain: Int = 16)
      : (Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, batchId) => {
      quadStoreSink(storeRoot)(batch, batchId)
      graft.rdf.ViewStore.sync(batch.sparkSession, storeRoot, viewRoot): Unit
      graft.rdf.ViewStore.compactIfDeep(batch.sparkSession, viewRoot,
        maxChain): Unit
    }

  /** [[maintainedViewSink]] extended through the PERSISTED summary:
    * store append → view sync → summary sync per micro-batch, then
    * compaction — view before summary only AFTER syncAgg consumed the
    * segments (the retention contract: compacting the view past the
    * summary's coverage is a loud error, so the order here is
    * load-bearing). The full CDC chain stream → store → view → dashboard
    * summary as one foreachBatch hook, each stage O(|Δ|). */
  def maintainedAggSink(storeRoot: String, viewRoot: String,
      aggRoot: String, maxChain: Int = 16)
      : (Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, batchId) => {
      quadStoreSink(storeRoot)(batch, batchId)
      val spark = batch.sparkSession
      graft.rdf.ViewStore.sync(spark, storeRoot, viewRoot): Unit
      graft.rdf.ViewStore.syncAgg(spark, viewRoot, aggRoot): Unit
      graft.rdf.ViewStore.compactIfDeep(spark, viewRoot, maxChain): Unit
      graft.rdf.ViewStore.compactAggIfDeep(spark, aggRoot, maxChain): Unit
    }

  /** The ID-SPACE CDC chain: each micro-batch lands in the delta store,
    * folds into the encoded mirror (one encoded segment + new dict
    * terms), and advances the id-space view ([[graft.rdf.EncodedView]])
    * — every per-batch maintenance step over 8-byte ids. Compaction
    * order is load-bearing: the view consumes the mirror's change range
    * BEFORE the mirror may fold it away. */
  def encodedViewSink(storeRoot: String, mirrorRoot: String,
      viewRoot: String, maxChain: Int = 16)
      : (Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, batchId) => {
      quadStoreSink(storeRoot)(batch, batchId)
      val spark = batch.sparkSession
      graft.rdf.EncodedMirror.sync(spark, storeRoot, mirrorRoot): Unit
      graft.rdf.EncodedView.sync(spark, mirrorRoot, viewRoot): Unit
      graft.rdf.EncodedView.compactIfDeep(spark, viewRoot, maxChain): Unit
      if (graft.rdf.EncodedMirror.segmentCount(mirrorRoot) > maxChain)
        graft.rdf.EncodedMirror.compact(spark, mirrorRoot): Unit
    }

  /** foreachBatch sink for CONTINUOUS EMBEDDING INGEST into a persisted
    * IVF ANN index ([[graft.llm.IvfIndex.create]] must have run once —
    * the quantizer is ingest-time state, exactly like the quad sink's
    * init()). Exactly-once the same way [[quadStoreSink]] is: delivery
    * is at-least-once, but the batch is presence-screened by `vec_id`
    * against the live index (ONE scan-only probe of the id column
    * against the BROADCAST batch — the store never shuffles), so a
    * replayed or duplicate micro-batch appends nothing and an empty one
    * writes no segment at all. `compactIfDeep` bounds the read-side
    * fold on the same cadence. Usage:
    * `stream.writeStream.foreachBatch(StreamOps.ivfIndexSink(root))`. */
  def ivfIndexSink(root: String, maxSegments: Int = 8)
      : (Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, _) => {
      val spark = batch.sparkSession
      val block = batch.toDF().distinct()
      val present = graft.llm.IvfIndex.readIndex(spark, root).assigned
        .select("vec_id")
        .join(org.apache.spark.sql.functions.broadcast(
          block.select("vec_id")), Seq("vec_id"), "left_semi")
      val fresh = block.join(present, Seq("vec_id"), "left_anti")
      if (!fresh.isEmpty) {
        graft.llm.IvfIndex.append(fresh, root): Unit
        graft.llm.IvfIndex.compactIfDeep(spark, root, maxSegments)
      }
    }

  /** The LSH near-dup twin of [[ivfIndexSink]]: a document stream
    * (doc_id, text) lands in a persisted [[graft.llm.LshIndex]] one
    * screened segment per micro-batch ([[graft.llm.LshIndex.build]]
    * must have run once), replays and duplicates append nothing, and
    * compaction bounds the probe fold. */
  def lshIndexSink(root: String, maxSegments: Int = 8)
      : (Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, _) => {
      val spark = batch.sparkSession
      val block = batch.toDF().distinct()
      val present = graft.llm.LshIndex.indexedIds(spark, root)
        .join(org.apache.spark.sql.functions.broadcast(
          block.select("doc_id")), Seq("doc_id"), "left_semi")
      val fresh = block.join(present, Seq("doc_id"), "left_anti")
      if (!fresh.isEmpty) {
        graft.llm.LshIndex.append(fresh, root): Unit
        graft.llm.LshIndex.compactIfDeep(spark, root, maxSegments): Unit
      }
    }

  /** Publish one micro-batch as an immutable AtomicStore snapshot keyed by
    * batch id. foreachBatch delivery is AT-LEAST-once: on failure replay
    * Structured Streaming re-runs a batch with the SAME id, and
    * `materialize` then finds the completed snapshot and writes nothing —
    * making the sink idempotent per batch and therefore exactly-once
    * end-to-end. Returns the published path. */
  def publishBatch(batch: DataFrame, root: String, batchId: Long): String =
    graft.sources.AtomicStore.materialize(s"$root/batch_$batchId")(tmp =>
      batch.write.mode("overwrite").parquet(tmp))

  /** Exactly-once parquet sink via [[publishBatch]]: attach with
    * `stream.writeStream.foreachBatch(StreamOps.versionedSink(root))`.
    * Readers use [[readVersioned]] — batch directories are only visible
    * once complete (marker-stamped atomic rename), so a reader never
    * observes a half-written batch. */
  def versionedSink(root: String): (Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, batchId) => { publishBatch(batch.toDF(), root, batchId); () }

  /** Union of all COMPLETE published batches under `root` (incomplete
    * build dirs carry no completion marker and are skipped). */
  def readVersioned(spark: SparkSession, root: String): DataFrame = {
    val dirs = graft.sources.AtomicStore.list(root)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("batch_")
        && graft.sources.AtomicStore.isComplete(d.getPath.toString))
      .map(_.getPath.toString).sorted
    require(dirs.nonEmpty, s"no complete batches under $root")
    spark.read.parquet(dirs.toIndexedSeq: _*)
  }
}
