package graft.sources

import java.io.File

/** Crash- and concurrency-safe materialization for build-once persisted
  * artifacts (ANN indexes, encoded triple stores).
  *
  * The builder writes into a process-private temp directory next to the
  * final path, a completion marker is stamped inside it, and a single
  * atomic directory rename publishes the whole store. Completeness is the
  * MARKER, not bare directory existence: a partial directory left by a
  * crash (or by /tmp cleaners pruning files inside it) is detected and
  * rebuilt, never served. Two JVMs racing to build both succeed — one
  * rename wins, the loser discards its build and reads the winner's.
  */
object AtomicStore {

  private val Marker = "_GRAFT_COMPLETE"

  /** Ensure a complete store exists at `path`, building it via
    * `build(tempDir)` if absent or partial. Returns `path`. */
  def materialize(path: String)(build: String => Unit): String = {
    val dest = new File(path)
    if (!complete(dest)) {
      // partial or pre-marker-format leftovers: rebuild from scratch
      deleteRecursively(dest)
      val tmp = new File(path + ".build." + java.util.UUID.randomUUID().toString.take(8))
      try {
        build(tmp.getPath)
        require(new File(tmp, Marker).createNewFile(),
          s"cannot stamp completion marker in $tmp")
        if (!tmp.renameTo(dest))
          require(complete(dest), s"failed to materialize store at $path")
      } finally deleteRecursively(tmp) // no-op when the rename won
    }
    path
  }

  private def complete(dest: File): Boolean = new File(dest, Marker).exists()

  /** Is there a COMPLETE (marker-stamped) store at `path`? Partial
    * directories left by a crash read as absent. */
  def isComplete(path: String): Boolean = complete(new File(path))

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

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
