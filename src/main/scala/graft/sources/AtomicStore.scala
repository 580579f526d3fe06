package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFileSystem, FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash- and concurrency-safe materialization for build-once persisted
  * artifacts (ANN indexes, encoded triple stores, quad-store versions).
  *
  * The builder writes into a process-private temp directory next to the
  * final path, a completion marker is stamped inside it, and a single
  * atomic directory rename publishes the whole store. Completeness is the
  * MARKER, not bare directory existence: a partial directory left by a
  * crash (or by /tmp cleaners pruning files inside it) is detected and
  * rebuilt, never served. Two JVMs racing to build both succeed — one
  * rename wins, the loser discards its build and reads the winner's.
  *
  * All filesystem traffic goes through the Hadoop [[FileSystem]] API
  * resolved from the path's own scheme, so bare paths and `file://` hit
  * the local disk while `hdfs://`-style URIs hit the cluster filesystem —
  * the same store code runs against either. Portability contract by
  * backend:
  *  - local / HDFS: directory rename is atomic; readers see either the
  *    old state or the complete new store, never a torn one.
  *  - object stores (s3a:// and friends): "rename" is copy+delete, NOT
  *    atomic — a reader CAN list a store mid-copy. The completion marker
  *    is what keeps that safe: [[isComplete]] gates every consumer, and
  *    the marker is stamped before the copy starts, so it lands with the
  *    rest of the directory; a half-copied store missing its marker reads
  *    as absent and is rebuilt. What object stores do NOT get is the
  *    two-writer economy (both racers pay a full copy) — acceptable for
  *    build-once artifacts, and correctness is unaffected.
  */
object AtomicStore {

  private val Marker = "_GRAFT_COMPLETE"

  /** The Hadoop filesystem owning `p`, configured from the active Spark
    * session when one exists (so `fs.defaultFS`, s3a credentials, etc.
    * follow the session's Hadoop conf). For the local scheme the RAW
    * filesystem is used — checksum sidecar files would only pollute
    * store directories that parquet already integrity-checks itself. */
  private def fsFor(p: Path): FileSystem = {
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
    p.getFileSystem(conf) match {
      case c: ChecksumFileSystem => c.getRawFileSystem
      case fs => fs
    }
  }

  /** Ensure a complete store exists at `path`, building it via
    * `build(tempDir)` if absent or partial. Returns `path`. */
  def materialize(path: String)(build: String => Unit): String = {
    val dest = new Path(path)
    val fs = fsFor(dest)
    if (!complete(fs, dest)) {
      // partial or pre-marker-format leftovers: rebuild from scratch
      fs.delete(dest, true)
      val tmp = new Path(path + ".build." + java.util.UUID.randomUUID().toString.take(8))
      try {
        build(tmp.toString)
        stampMarker(fs, tmp)
        // rename-if-absent: a racing winner leaves dest in place and our
        // rename either returns false or (HDFS mv-into-dir semantics)
        // lands tmp INSIDE dest — detect the stray and discard it, then
        // demand the winner's store is complete
        if (fs.exists(dest) || !fs.rename(tmp, dest)) {
          require(complete(fs, dest), s"failed to materialize store at $path")
        } else {
          val stray = new Path(dest, tmp.getName)
          if (fs.exists(stray)) fs.delete(stray, true)
          require(complete(fs, dest), s"failed to materialize store at $path")
        }
      } finally fs.delete(tmp, true) // no-op when the rename won
    }
    path
  }

  /** [[materialize]] that also reports OWNERSHIP: true iff OUR build is
    * the one now published at `path`; false when a complete store already
    * existed or a racing writer won the publish. Content-keyed stores
    * never need this (any winner has the same bytes); VERSION-numbered
    * stores do — a quad-store delta losing the race for d{v+1} must NOT
    * be silently dropped, it must retry at the next version with a
    * recomputed delta (see QuadStore.update's OCC loop). Detection: a
    * writer-unique nonce file travels inside the build and is checked at
    * the published destination. */
  def materializeExclusive(path: String)(build: String => Unit): Boolean = {
    val dest = new Path(path)
    val fs = fsFor(dest)
    if (complete(fs, dest)) return false
    // clear only a PRE-EXISTING torn directory (a dead writer's partial
    // build). An unconditional delete here would race a concurrent
    // writer whose publish landed between our completeness check and the
    // delete — destroying a COMPLETE segment and letting both OCC
    // writers report success, the exact lost update this primitive
    // exists to prevent. With the existence gate, a racer publishing
    // after our check merely makes our rename fail below, and we
    // correctly report the loss.
    if (fs.exists(dest)) {
      if (complete(fs, dest)) return false
      fs.delete(dest, true): Unit
    }
    val nonce = "_GRAFT_WRITER_" +
      java.util.UUID.randomUUID().toString.take(12)
    val tmp = new Path(path + ".build." +
      java.util.UUID.randomUUID().toString.take(8))
    try {
      build(tmp.toString)
      require(fs.createNewFile(new Path(tmp, nonce)),
        s"cannot stamp writer nonce in $tmp")
      stampMarker(fs, tmp)
      if (fs.exists(dest) || !fs.rename(tmp, dest)) {
        require(complete(fs, dest), s"failed to materialize store at $path")
      } else {
        val stray = new Path(dest, tmp.getName)
        if (fs.exists(stray)) fs.delete(stray, true)
        require(complete(fs, dest), s"failed to materialize store at $path")
      }
      fs.exists(new Path(dest, nonce))
    } finally fs.delete(tmp, true): Unit
  }

  /** Stamp the completion marker with a random UUID as CONTENT — the
    * publish token [[markerToken]] fingerprints on. Mtime would be the
    * cheaper fingerprint, but filesystems with coarse (1 s) granularity
    * can wipe + re-publish within one tick and hand a cache the same
    * (path, mtime) key for different bytes. */
  private def stampMarker(fs: FileSystem, dir: Path): Unit = {
    val out = fs.create(new Path(dir, Marker), false)
    try out.write(
      java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
    finally out.close()
  }

  private def complete(fs: FileSystem, dest: Path): Boolean =
    fs.exists(new Path(dest, Marker))

  /** Is there a COMPLETE (marker-stamped) store at `path`? Partial
    * directories left by a crash read as absent. */
  def isComplete(path: String): Boolean = {
    val p = new Path(path)
    complete(fsFor(p), p)
  }

  /** Publish token of a directory's completion marker ("" when absent) —
    * the store FINGERPRINT: every publish stamps a fresh random UUID into
    * the marker, so a cache keyed on (path, token) can never serve
    * pre-wipe state — even on filesystems whose 1 s mtime granularity
    * lets a wipe + re-publish land within one timestamp tick. Markers
    * published before the token era are empty; those fall back to the
    * mtime fingerprint (their coarse-tick exposure ends at their next
    * re-publish). */
  def markerToken(path: String): String = {
    val p = new Path(path, Marker)
    val fs = fsFor(p)
    if (!fs.exists(p)) return ""
    val st = fs.getFileStatus(p)
    if (st.getLen == 0) return "mtime:" + st.getModificationTime
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](math.min(st.getLen, 64L).toInt)
      in.readFully(0, buf)
      new String(buf, "UTF-8")
    } finally in.close()
  }

  // (path, publish token) → inferred parquet schema. A schema-less
  // spark.read.parquet launches a footer-sampling inference JOB per call;
  // the lifecycle reads fold chains of segments and re-open the same
  // immutable published directories many times per invocation, so the
  // inference jobs — not the data — dominated their job counts
  // (ProfileOne r12: 27-37 of ~150 jobs per path-view invocation were
  // schema inference at the sandbox's ~0.1-0.3 s/job floor). Keyed on the
  // publish token, so a wiped + re-published path can never serve a stale
  // schema; entries are a few hundred bytes (schema metadata only, never
  // data — every read still scans the parquet itself).
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), org.apache.spark.sql.types.StructType]()

  /** Read a COMPLETE published artifact directory as parquet, with the
    * inferred schema cached per publish (the first read pays the one
    * inference job; every later read skips it). Directories without a
    * completion marker fall back to a plain inferring read. */
  def readParquet(spark: SparkSession, path: String)
      : org.apache.spark.sql.DataFrame = {
    val token = markerToken(path)
    if (token.isEmpty) return spark.read.parquet(path)
    if (schemaCache.size > 4096) schemaCache.clear() // unbounded-growth guard
    val sch = schemaCache.computeIfAbsent((path, token),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** Child entries of `path` (empty when absent) — the Hadoop-portable
    * replacement for `java.io.File.listFiles`. */
  def list(path: String): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = fsFor(p)
    if (!fs.exists(p)) Seq.empty else fs.listStatus(p).toIndexedSeq
  }

  /** Recursive delete through the Hadoop filesystem; absent paths no-op. */
  def delete(path: String): Unit = {
    val p = new Path(path)
    fsFor(p).delete(p, true): Unit
  }

  /** Rename through the Hadoop filesystem (dest must not exist). */
  def rename(from: String, to: String): Unit = {
    val f = new Path(from)
    val fs = fsFor(f)
    require(fs.rename(f, new Path(to)), s"rename $from -> $to failed")
  }

  /** Recursive byte size of a tree (0 when absent) — drives size-based
    * retention policies (compact when deltas rival the base). */
  def sizeBytes(path: String): Long = {
    val p = new Path(path)
    val fs = fsFor(p)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  /** Does `path` exist (file or directory) on its filesystem? */
  def exists(path: String): Boolean = {
    val p = new Path(path)
    fsFor(p).exists(p)
  }

  /** Write a small metadata string (store manifests, selectivity maps)
    * through the Hadoop filesystem — bare paths, file:// and hdfs:// all
    * take the same code path as the data files next to it. Overwrites. */
  def writeString(path: String, content: String): Unit = {
    val p = new Path(path)
    val out = fsFor(p).create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Read a small metadata string written by [[writeString]]. */
  def readString(path: String): String = {
    val p = new Path(path)
    val in = fsFor(p).open(p)
    try {
      val baos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { baos.write(buf, 0, n); n = in.read(buf) }
      new String(baos.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Collision-resistant store key from the build inputs: SHA-256 over the
    * length-prefixed inputs, truncated to 128 bits of hex. 32-bit
    * `hashCode`-based keys can collide across datasets (or a corpus change
    * whose XOR cancels out) and would silently serve the wrong persisted
    * artifacts; at 128 bits an accidental collision is impossible in
    * practice. Length-prefixing keeps ("ab","c") ≠ ("a","bc").
    */
  def key(inputs: String*): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    inputs.foreach { s =>
      val b = s.getBytes("UTF-8")
      md.update(java.nio.ByteBuffer.allocate(4).putInt(b.length).array())
      md.update(b)
    }
    md.digest().take(16).map(b => f"$b%02x").mkString
  }

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
