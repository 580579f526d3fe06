package graft.sources

import java.io.File

/** Crash- and concurrency-safe materialization for build-once persisted
  * artifacts (ANN indexes, encoded triple stores).
  *
  * The builder writes into a process-private temp directory next to the
  * final path, then a single atomic directory rename publishes it. A
  * reader therefore sees either the complete store or no store — never a
  * half-written one (a crash between two parquet writes leaves only an
  * unpublished temp dir). Two JVMs racing to build both succeed: one
  * rename wins, the loser discards its build and reads the winner's.
  */
object AtomicStore {

  /** Ensure `path` exists, building it via `build(tempDir)` if not.
    * Returns `path`. */
  def materialize(path: String)(build: String => Unit): String = {
    val dest = new File(path)
    if (!dest.exists()) {
      val tmp = new File(path + ".build." + java.util.UUID.randomUUID().toString.take(8))
      build(tmp.getPath)
      if (!tmp.renameTo(dest)) {
        rm(tmp)
        require(dest.exists(), s"failed to materialize store at $path")
      }
    }
    path
  }

  private def rm(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete(): Unit
  }
}
