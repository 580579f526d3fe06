package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodedMirrorSpec extends SparkSpec {

  test("mirror tracks store updates; id-space queries match string-space") {
    val store = java.nio.file.Files.createTempDirectory("emstore").toString
    val mirror = java.nio.file.Files.createTempDirectory("emmirror").toString
    QuadStore.init(Quads.build(spark, sf0001), store)
    assert(EncodedMirror.sync(spark, store, mirror) === 1)
    def stateEq(): Unit = {
      val decoded = Dictionary.decodeQuads(
        EncodedMirror.encoded(spark, mirror),
        EncodedMirror.dict(spark, mirror))
      val truth = QuadStore.read(spark, store)
      assert(decoded.exceptAll(truth).count() === 0 &&
        truth.exceptAll(decoded).count() === 0,
        "mirror must decode to exactly the store state")
    }
    stateEq()
    // updates with NEW terms, a pattern delete, and a graph clear; then
    // ONE catch-up sync folds versions 2..4 into a single segment
    QuadStore.update(spark, store,
      """INSERT DATA { <new:1> <brand-new> "term" .
        |              GRAPH <g:x> { <new:2> <p> "q" . } }""".stripMargin)
    QuadStore.update(spark, store,
      """DELETE WHERE { GRAPH <g:orders> { ?o <orderpriority> "2-HIGH" . } }""")
    QuadStore.update(spark, store, "CLEAR GRAPH <g:x>")
    assert(EncodedMirror.sync(spark, store, mirror) === 4)
    stateEq()
    // re-sync with no new store versions is a no-op
    assert(EncodedMirror.sync(spark, store, mirror) === 4)
    // the dictionary picked up the new terms exactly once
    val d = EncodedMirror.dict(spark, mirror)
    assert(d.filter(col("term") === "new:1").count() === 1)
    assert(d.groupBy("term").count().filter(col("count") > 1).count() === 0)
    // id-space SPARQL over the mirror ≡ string-space over the store,
    // GRAPH blocks included
    val text =
      """SELECT ?g ?o ?pr WHERE {
        |  GRAPH ?g { ?o <orderpriority> ?pr . }
        |}""".stripMargin
    val viaMirror = EncodedMirror.query(spark, mirror, text)
    val viaStore = QuadStore.query(spark, store, text)
    assert(viaMirror.exceptAll(viaStore).count() === 0 &&
      viaStore.exceptAll(viaMirror).count() === 0)
    // the deleted priority is really gone from the id-space answer
    assert(viaMirror.filter(col("pr") === "2-HIGH").count() === 0)
    assert(viaMirror.count() > 0)
    // compaction folds base + segment into ONE new base; contents
    // unchanged
    assert(EncodedMirror.compact(spark, mirror) === 4)
    assert(graft.sources.AtomicStore.list(mirror + "/enc")
      .map(_.getPath.getName)
      .count(n => n.startsWith("s") || n.startsWith("b")) === 1)
    assert(new java.io.File(mirror + "/enc", "b00004").isDirectory)
    val decoded2 = Dictionary.decodeQuads(
      EncodedMirror.encoded(spark, mirror),
      EncodedMirror.dict(spark, mirror))
    val truth2 = QuadStore.read(spark, store)
    assert(decoded2.exceptAll(truth2).count() === 0 &&
      truth2.exceptAll(decoded2).count() === 0)
    // further syncs keep working off the compacted base
    QuadStore.update(spark, store,
      """INSERT DATA { <new:3> <brand-new> "again" . }""")
    assert(EncodedMirror.sync(spark, store, mirror) === 5)
    assert(EncodedMirror.query(spark, mirror,
      """SELECT ?s WHERE { ?s <brand-new> "again" . }""").count() === 1)
    // a no-new-terms update then compact exercises the DICT fold path
    // (the target name is free): segments collapse to one, terms intact
    val dictBefore = EncodedMirror.dict(spark, mirror).count()
    QuadStore.update(spark, store,
      """DELETE DATA { <new:3> <brand-new> "again" . }""")
    assert(EncodedMirror.sync(spark, store, mirror) === 6)
    assert(EncodedMirror.compact(spark, mirror) === 6)
    assert(new java.io.File(mirror + "/dict").list()
      .count(_.startsWith("s")) === 1)
    assert(EncodedMirror.dict(spark, mirror).count() === dictBefore)
    val decoded3 = Dictionary.decodeQuads(
      EncodedMirror.encoded(spark, mirror),
      EncodedMirror.dict(spark, mirror))
    val truth3 = QuadStore.read(spark, store)
    assert(decoded3.exceptAll(truth3).count() === 0 &&
      truth3.exceptAll(decoded3).count() === 0)
  }

  test("a dictionary id collision fails LOUDLY, at sync time") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("emcstore").toString
    val mirror = java.nio.file.Files.createTempDirectory("emcmirror").toString
    QuadStore.init(
      Seq(("a:1", "p", "v", "")).toDF("s", "p", "o", "g"), store)
    EncodedMirror.sync(spark, store, mirror): Unit
    // inject a synthetic colliding segment (two terms, one id) — xxhash64
    // collisions can't be manufactured cheaply, so the corrupt state is
    // written directly in the mirror's own segment format
    graft.sources.AtomicStore.materialize(s"$mirror/dict/s00099") { tmp =>
      Seq(("collide-x", 42L), ("collide-y", 42L)).toDF("term", "id")
        .write.parquet(tmp)
    }: Unit
    val e = intercept[IllegalStateException](
      EncodedMirror.auditDict(spark, mirror))
    assert(e.getMessage.contains("collision"))
    // ...and the screen is ON the sync path: a dictionary-growing sync
    // trips over the corruption instead of silently building on it
    QuadStore.update(spark, store,
      """INSERT DATA { <fresh:term> <p> "new" . }""")
    val e2 = intercept[IllegalStateException](
      EncodedMirror.sync(spark, store, mirror))
    assert(e2.getMessage.contains("collision"))
  }
}
