package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** True Structured-Streaming semantics: watermarks dropping late data,
  * in-watermark dedup, arbitrary-state sessionization — none of which a
  * batch oracle can express (SURVEY.md §2.2 "test-only" rows).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1700000000000000L // arbitrary epoch micros

  private def mkEvents(rows: (Long, Long, String, Double)*) =
    rows.map { case (id, us, typ, v) => (id, us, typ, v) }

  case class Raw(event_id: Long, us: Long, event_type: String, value: Double)

  private def toEventDF(ms: MemoryStream[Raw]) =
    ms.toDF()
      .withColumn("ts_us", timestamp_micros(col("us")))
      .withColumn("user_id", col("event_id") % 3)

  test("watermark drops events later than the allowed lateness") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Raw]
    val out = StreamOps.streamingTumbling(toEventDF(mem), lateness = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      val min10 = 10L * 60 * 1000000
      // batch 1: events in window [T0, T0+10m) and one far ahead to advance
      // the watermark past that window's end
      mem.addData(Raw(1, T0 + 1, "a", 1.0), Raw(2, T0 + 2, "a", 1.0),
        Raw(3, T0 + 4 * min10, "a", 1.0))
      q.processAllAvailable()
      // batch 2: a straggler inside the now-expired first window → dropped
      mem.addData(Raw(4, T0 + 3, "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wm_out")
        .select($"win_start_us", $"n").as[(Long, Long)].collect().toMap
      val w0 = T0 - T0 % min10
      assert(rows(w0) === 2L, s"late event must not be counted: $rows")
    } finally q.stop()
  }

  test("the corpus quality gate runs unchanged on a stream (stateless ops)") {
    // every text operator is a codegen column expression, so the same
    // Corpus.qualityGate call compiles onto a streaming relation: the
    // 100 TB batch gate IS the ingest-time gate, no reimplementation
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, lang: String, text: String)
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "lang", "text")
    val gated = graft.llm.Corpus.qualityGate(docs, minQuality = 0.5,
      maxDupWordFrac = 0.6, minTokens = 10, langs = Seq("en"))
    val q = gated.select("doc_id").writeStream.outputMode("append")
      .format("memory").queryName("gate_out").start()
    try {
      val rich = "careful measurement rewards distributed engines whose " +
        "plans avoid needless movement across networks entirely"
      mem.addData((1L, "en", rich), (2L, "en", "short"),
        (3L, "en", ("spam " * 30).trim), (4L, "de", rich))
      q.processAllAvailable()
      assert(spark.table("gate_out").as[Long].collect().toSeq === Seq(1L))
      // and the result matches the batch gate on the same data
      val batch = graft.llm.Corpus.qualityGate(
        Seq((1L, "en", rich), (2L, "en", "short"),
          (3L, "en", ("spam " * 30).trim), (4L, "de", rich))
          .toDF("doc_id", "lang", "text"),
        0.5, 0.6, 10, Seq("en")).select("doc_id").as[Long].collect().toSeq
      assert(batch === Seq(1L))
    } finally q.stop()
  }

  test("firstEventPerKey keeps the earliest event per key, event_id tiebreak") {
    val ev = Seq(
      (1L, 100L, 7L, "a", 1.0), // later than id 3 → dropped
      (3L, 50L, 7L, "a", 1.0),
      (2L, 50L, 7L, "a", 1.0), // same ts as id 3, smaller id → kept
      (9L, 10L, 7L, "b", 1.0),
      (8L, 10L, 8L, "a", 1.0))
      .toDF("event_id", "ts_us_long", "user_id", "event_type", "value")
    val got = StreamOps.firstEventPerKey(ev)
      .orderBy("user_id", "event_type")
      .select("user_id", "event_type", "first_us", "event_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq((7L, "a", 50L, 2L), (7L, "b", 10L, 9L),
      (8L, "a", 10L, 8L)))
  }

  test("cdcMaterialize is last-writer-wins with tombstone deletes") {
    val ev = Seq(
      (1L, 10L, 7L, "signup", 1.0),
      (2L, 20L, 7L, "purchase", 2.5), // latest for user 7 → survives
      (3L, 5L, 8L, "purchase", 9.0),
      (4L, 30L, 8L, "error", 0.0),    // tombstone is the last write → gone
      (5L, 40L, 9L, "error", 0.0),
      (6L, 50L, 9L, "signup", 3.0),   // resurrected after the delete
      (7L, 60L, 5L, "signup", 4.0),
      (8L, 60L, 5L, "signup", 5.0))   // same ts: larger event_id wins
      .toDF("event_id", "ts_us_long", "user_id", "event_type", "value")
    val got = StreamOps.cdcMaterialize(ev)
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((5L, 8L, 5.0), (7L, 2L, 2.5), (9L, 6L, 3.0)))
  }

  test("purchaseAttribution agrees with streamStreamJoin on a replay") {
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000000
    // purchase at T0 for user 0; signups in-window, at the window edge,
    // too old, and for another user
    val rows = Seq(
      (3L, T0, "purchase", 1.0),                 // user 3 % 3 = 0
      (6L, T0 - hour / 2, "signup", 1.0),        // user 0, in window
      (9L, T0 - hour, "signup", 1.0),            // user 0, inclusive edge
      (12L, T0 - hour - 1, "signup", 1.0),       // user 0, too old
      (7L, T0 - hour / 2, "signup", 1.0))        // user 1, other user
    val batch = StreamOps.purchaseAttribution(
      rows.toDF("event_id", "ts_us_long", "event_type", "value")
        .withColumn("user_id", col("event_id") % 3))
      .select($"purchase_id", $"signup_id").as[(Long, Long)].collect().toSet
    assert(batch === Set((3L, 6L), (3L, 9L)))
    // the same pairs from the streaming interval join, signups presented
    // as the trailing side
    val evMem = MemoryStream[Raw]
    val odMem = MemoryStream[Ord]
    val joined = StreamOps.streamStreamJoin(toEventDF(evMem),
      odMem.toDF().withColumn("o_ts", timestamp_micros(col("o_us"))))
      .select(col("event_id"), col("o_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("pa_out").start()
    try {
      odMem.addData(Ord(6, T0 - hour / 2, 0), Ord(9, T0 - hour, 0),
        Ord(12, T0 - hour - 1, 0), Ord(7, T0 - hour / 2, 1))
      evMem.addData(Raw(3, T0, "purchase", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("pa_out").as[(Long, Long)].collect().toSet
      assert(streamed === batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups repeated event ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Raw]
    val out = StreamOps.streamingDedup(toEventDF(mem))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dd_out").start()
    try {
      mem.addData(Raw(1, T0, "a", 1.0), Raw(1, T0 + 5, "a", 1.0), Raw(2, T0 + 9, "b", 2.0))
      q.processAllAvailable()
      assert(spark.table("dd_out").count() === 2)
    } finally q.stop()
  }

  test("streaming incremental dedup drops snapshot and cross-batch duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val snapshot = Seq((1L, "aaa")).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, Long, String)] // (doc_id, us, text)
    val docs = mem.toDF().toDF("doc_id", "us", "text")
      .withColumn("ts_us", timestamp_micros(col("us")))
    val out = StreamOps.streamingIncrementalDedup(docs, snapshot)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("inc_dedup").start()
    try {
      // batch 1: a snapshot duplicate, a new doc, and an in-batch repeat
      mem.addData((2L, T0, "aaa"), (3L, T0 + 1, "bbb"), (4L, T0 + 2, "bbb"))
      q.processAllAvailable()
      // batch 2: a cross-micro-batch repeat (state) and a genuinely new doc
      mem.addData((5L, T0 + 3, "bbb"), (6L, T0 + 4, "ccc"))
      q.processAllAvailable()
      val kept = spark.table("inc_dedup")
        .select("doc_id").as[Long].collect().toSet
      // doc 2 dropped (snapshot), 4 dropped (in-batch), 5 dropped
      // (cross-batch watermark state); one representative of bbb and ccc
      assert(kept === Set(3L, 6L), s"got $kept")
    } finally q.stop()
  }

  test("foreachBatch lands streaming aggregates in parquet (file sink path)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = new java.io.File("target/stream-sink")
    rmTree(dir)
    val mem = MemoryStream[Raw]
    val out = StreamOps.streamingTumbling(toEventDF(mem))
    val q = out.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("append").parquet(dir.getPath)
      }
      .start()
    try {
      mem.addData(Raw(1, T0, "a", 1.0), Raw(2, T0 + 1, "a", 2.0))
      q.processAllAvailable()
      val landed = spark.read.parquet(dir.getPath)
      assert(landed.count() >= 1)
      assert(landed.columns.toSet === Set("win_start_us", "event_type", "n"))
    } finally q.stop()
  }

  test("file-source stream over the events parquet equals the batch aggregate") {
    // the file source wants a directory: stage the events file into one
    val dir = new java.io.File("target/stream-file-src")
    rmTree(dir); dir.mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(dir.getPath, "events.parquet"))
    val schema = spark.read.parquet(dir.getPath).schema
    val stream = graft.sources.Tables.normalizeEvents(
      spark.readStream.schema(schema).parquet(dir.getPath))
    val q = StreamOps.tumbling(stream).writeStream
      .outputMode("complete").format("memory").queryName("file_src_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_src_out")
      val batch = StreamOps.tumbling(graft.sources.Tables.events(spark, sf0001))
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0)
    } finally q.stop()
  }

  test("N-Triples files stream through the same parse pipeline as batch") {
    import graft.rdf.{NTriples, Triples}
    // streaming RDF ingest: the reference's load path (N-Triples on a
    // distributed FS) expressed as a file-source stream; parse is pure
    // column logic, so batch and streaming share one implementation
    val dir = new java.io.File("target/stream-nt")
    rmTree(dir)
    val triples = Triples.build(spark, sf0001)
    // render every object as a literal (the EAV corpus carries no node
    // kind); the parse side decodes it back to the same plain string
    NTriples.write(triples.withColumn("o_is_iri", lit(false)), dir.getPath)
    val batch = NTriples.read(spark, dir.getPath)
    val q = NTriples.parse(spark.readStream.text(dir.getPath))
      .writeStream.outputMode("append")
      .format("memory").queryName("nt_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("nt_stream_out")
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
      // and the round trip itself is lossless vs the source triples
      assert(streamed.exceptAll(triples).count() === 0)
    } finally q.stop()
  }

  case class Ord(o_id: Long, o_us: Long, o_uid: Long)

  test("stream-stream interval join matches events to in-window orders only") {
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000000
    val evMem = MemoryStream[Raw]
    val odMem = MemoryStream[Ord]
    val ev = toEventDF(evMem)
    val od = odMem.toDF().withColumn("o_ts", timestamp_micros(col("o_us")))
      .withColumnRenamed("o_uid", "o_uid_raw")
      .withColumn("o_uid", col("o_uid_raw")).drop("o_uid_raw")
    val joined = StreamOps.streamStreamJoin(ev, od)
      .select(col("event_id"), col("o_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      // user 0 = event_id 3 (3 % 3 = 0): one order in-window, one too old,
      // one for another user
      odMem.addData(Ord(100, T0 - hour / 2, 0), Ord(101, T0 - 2 * hour, 0),
        Ord(102, T0 - hour / 2, 1))
      evMem.addData(Raw(3, T0, "a", 1.0))
      q.processAllAvailable()
      val got = spark.table("ssj_out").as[(Long, Long)].collect().toSet
      assert(got === Set((3L, 100L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization matches batch session_window on closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val min5 = 5L * 60 * 1000000
    val mem = MemoryStream[Raw]
    val ev = toEventDF(mem)
      .select(col("user_id"), col("us").as("ts_us_long"), col("value"))
      .as[StreamOps.Ev]
    val out = StreamOps.statefulSessionize(ev, gapUs = min5)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // user 0 (ids divisible by 3): two sessions separated by > gap
      mem.addData(
        Raw(3, T0, "a", 1.0), Raw(6, T0 + 1000, "a", 2.0),
        Raw(9, T0 + 2 * min5, "a", 5.0))
      q.processAllAvailable()
      // first session closed by the third event; second still open in state
      val closed = spark.table("sess_out")
        .as[StreamOps.SessionOut].collect().filter(_.user_id == 0)
      assert(closed.length === 1)
      assert(closed.head.sess_start_us === T0 && closed.head.n === 2
        && closed.head.sum_value === 3.0)

      // batch equivalent over the same rows: session assignment agrees
      val batch = StreamOps.session(
        Seq((3L, T0, "a", 1.0), (6L, T0 + 1000, "a", 2.0), (9L, T0 + 2 * min5, "a", 5.0))
          .toDF("event_id", "us", "event_type", "value")
          .withColumn("ts_us", timestamp_micros(col("us")))
          .withColumn("user_id", col("event_id") % 3))
      val batchRows = batch.orderBy("sess_start_us")
        .select($"sess_start_us", $"n").as[(Long, Long)].collect().toSeq
      assert(batchRows === Seq((T0, 2L), (T0 + 2 * min5, 1L)))
    } finally q.stop()
  }

  test("versioned sink publishes each micro-batch exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val root = new java.io.File(sys.props("java.io.tmpdir"), "vsink_test")
    rmTree(root)
    val mem = MemoryStream[Raw]
    val q = toEventDF(mem).writeStream
      .foreachBatch(StreamOps.versionedSink(root.getPath))
      .start()
    try {
      mem.addData(Raw(1, T0, "a", 1.0), Raw(2, T0 + 1, "b", 2.0))
      q.processAllAvailable()
      mem.addData(Raw(3, T0 + 2, "c", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = StreamOps.readVersioned(spark, root.getPath)
    assert(out.select("event_id").as[Long].collect().toSet === Set(1L, 2L, 3L))

    // at-least-once replay: re-delivering batch 1 with DIFFERENT content
    // must be a no-op — the completed snapshot wins (idempotent per id)
    val replay = Seq((99L, T0 + 9, "x", 9.0))
      .toDF("event_id", "us", "event_type", "value")
      .withColumn("ts_us", timestamp_micros(col("us")))
      .withColumn("user_id", col("event_id") % 3)
    StreamOps.publishBatch(replay, root.getPath, batchId = 1L)
    val after = StreamOps.readVersioned(spark, root.getPath)
    assert(after.select("event_id").as[Long].collect().toSet === Set(1L, 2L, 3L),
      "replayed batch id must not republish")

    // an in-flight (markerless) batch dir is invisible to readers
    val partial = new java.io.File(root, "batch_7")
    partial.mkdirs()
    assert(StreamOps.readVersioned(spark, root.getPath)
      .select("event_id").as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("quad stream lands in the delta-log store exactly once") {
    import StreamOps.Triple3
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("qs_sink").toString
    graft.rdf.QuadStore.init(
      Seq(("s0", "p", "o0", "")).toDF("s", "p", "o", "g"), root)
    val mem = MemoryStream[Triple3]
    val quads = mem.toDF().withColumn("g", lit("g:live"))
    val q = quads.writeStream
      .foreachBatch(StreamOps.quadStoreSink(root))
      .outputMode("append").start()
    try {
      mem.addData(Triple3("a", "p", "1"), Triple3("b", "p", "2"))
      q.processAllAvailable()
      // batch 2 repeats a quad (at-least-once shape) and adds one more
      mem.addData(Triple3("a", "p", "1"), Triple3("c", "p", "3"))
      q.processAllAvailable()
      val st = graft.rdf.QuadStore.read(spark, root)
      assert(st.filter($"g" === "g:live").count() === 3,
        "replayed quad must not duplicate")
      assert(st.count() === 4)
      // each batch appended a delta segment, never a base rewrite
      assert(new java.io.File(root, "d00002").isDirectory)
      assert(new java.io.File(root, "d00003").isDirectory)
      assert(!new java.io.File(root, "v00002").exists())
      // the store stays SPARQL-queryable mid-ingest
      val ans = graft.rdf.QuadStore.query(spark, root,
        """SELECT ?s WHERE { GRAPH <g:live> { ?s <p> ?v . } } ORDER BY ?s""")
      assert(ans.as[String].collect().toSeq === Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("streaming star match emits once per completed subject") {
    import StreamOps.{Triple3, StarOut}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Triple3]
    val out = StreamOps.streamingStarMatch(mem.toDS(), Seq("a", "b"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("star_out").start()
    try {
      // partial star: nothing emits, state holds the binding
      mem.addData(Triple3("s1", "a", "v1"), Triple3("s2", "a", "x"))
      q.processAllAvailable()
      assert(spark.table("star_out").count() === 0)
      // completion emits exactly one row; first arrival bound `a`
      mem.addData(Triple3("s1", "b", "v2"),
        Triple3("s1", "a", "LATER-IGNORED"))
      q.processAllAvailable()
      val rows = spark.table("star_out").as[StarOut].collect()
      assert(rows.toSeq === Seq(StarOut("s1", Map("a" -> "v1", "b" -> "v2"))))
      // replays / extra triples never re-emit a done subject
      mem.addData(Triple3("s1", "b", "again"), Triple3("s1", "a", "again"))
      q.processAllAvailable()
      assert(spark.table("star_out").count() === 1)
      // non-star predicates are filtered before state
      mem.addData(Triple3("s2", "zzz", "noise"))
      q.processAllAvailable()
      assert(spark.table("star_out").count() === 1)
      // s2 completes later
      mem.addData(Triple3("s2", "b", "y"))
      q.processAllAvailable()
      assert(spark.table("star_out").count() === 2)
    } finally q.stop()
  }

  test("streaming star match agrees with the batch starMatch dual") {
    import StreamOps.Triple3
    implicit val sqlCtx = spark.sqlContext
    val preds = Seq("name", "mktsegment", "nation")
    val triples = graft.rdf.Triples.build(spark, sf0001)
    val rows = triples.as[(String, String, String)].collect()
      .map { case (s, p, o) => Triple3(s, p, o) }
    val mem = MemoryStream[Triple3]
    val out = StreamOps.streamingStarMatch(mem.toDS(), preds)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("star_batch_eq").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rest.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("star_batch_eq")
        .select(col("s"), explode(col("bindings")).as(Seq("p", "o")))
      val batch = StreamOps.starMatch(triples, preds)
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("embedding stream ingests into the persisted IVF index exactly " +
      "once: replay, duplicate and empty batches append nothing; final " +
      "index probe-identical to a one-shot build") {
    import graft.llm.IvfIndex
    implicit val sqlCtx = spark.sqlContext
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      "ivf_stream_sink_test")
    rmTree(root)
    // the quantizer is ingest-time state: create on the first half
    IvfIndex.create(vecs.filter(pmod(col("vec_id"), lit(2)) === 0)
      .limit(1000000), root.toString, k = 8)
    val segsAfterCreate = IvfIndex.segmentCount(root.toString)
    val rest = vecs.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect().toSeq
    val (b1, b2) = rest.splitAt(rest.length / 2)
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val q = mem.toDF().toDF("vec_id", "embedding", "label").writeStream
      .foreachBatch(StreamOps.ivfIndexSink(root.toString, maxSegments = 8))
      .start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      // DUPLICATE micro-batch: same rows again — the presence screen
      // must append nothing
      val before = IvfIndex.segmentCount(root.toString)
      mem.addData(b1); q.processAllAvailable()
      assert(IvfIndex.segmentCount(root.toString) === before,
        "a duplicate micro-batch appended a segment")
    } finally q.stop()
    // EMPTY micro-batch through the same hook: no segment either
    val before2 = IvfIndex.segmentCount(root.toString)
    StreamOps.ivfIndexSink(root.toString)(
      vecs.filter(lit(false)).select("vec_id", "embedding", "label"), 99L)
    assert(IvfIndex.segmentCount(root.toString) === before2)
    // stream ingest ≡ one-shot encode of the full corpus at the model
    val idx = IvfIndex.readIndex(spark, root.toString)
    val oneShot = IvfIndex.assignWith(idx.centroids, vecs)
      .select("vec_id", "list_id")
    assert(idx.assigned.select("vec_id", "list_id")
      .exceptAll(oneShot).isEmpty)
    assert(oneShot.exceptAll(
      idx.assigned.select("vec_id", "list_id")).isEmpty)
    assert(IvfIndex.search(idx, 0L, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq ===
      IvfIndex.search(IvfIndex.Model(idx.centroids,
          IvfIndex.assignWith(idx.centroids, vecs)), 0L, 10, nProbe = 4)
        .select("vec_id").as[Long].collect().toSeq)
    assert(segsAfterCreate === 1)
  }

  test("document stream ingests into the persisted LSH index exactly " +
      "once and probes like a one-shot build") {
    import graft.llm.LshIndex
    implicit val sqlCtx = spark.sqlContext
    def variant(i: Int): String =
      (Seq.fill(30)("lorem ipsum dolor sit amet") :+ s"tail $i")
        .mkString(" ")
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      "lsh_stream_sink_test").toString
    new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    LshIndex.build(Seq((1L, variant(1))).toDF("doc_id", "text"), root)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(StreamOps.lshIndexSink(root, maxSegments = 8))
      .start()
    try {
      mem.addData((2L, variant(2))); q.processAllAvailable()
      mem.addData((3L, variant(3))); q.processAllAvailable()
      // duplicate delivery of doc 2: screened out, no new segment
      val before = LshIndex.segmentCount(root)
      mem.addData((2L, variant(2))); q.processAllAvailable()
      assert(LshIndex.segmentCount(root) === before)
    } finally q.stop()
    // the streamed index probes identically to a one-shot build
    val probe = Seq((99L, variant(1))).toDF("doc_id", "text")
    val got = LshIndex.probe(spark, root, probe, minEst = 0.5)
      .select("corpus_id").as[Long].collect().toSet
    val oneRoot = new java.io.File(sys.props("java.io.tmpdir"),
      "lsh_stream_oneshot_test").toString
    new scala.reflect.io.Directory(new java.io.File(oneRoot))
      .deleteRecursively()
    LshIndex.build((1 to 3).map(i => (i.toLong, variant(i)))
      .toDF("doc_id", "text"), oneRoot)
    val expected = LshIndex.probe(spark, oneRoot, probe, minEst = 0.5)
      .select("corpus_id").as[Long].collect().toSet
    assert(got === expected && got === Set(1L, 2L, 3L))
  }
}
