package graft.sources

/** Shared plumbing for SEGMENTED persisted artifacts — the
  * append/compact lifecycle [[graft.llm.LshIndex]] established, factored
  * so the ANN indexes ([[graft.llm.IvfIndex]], [[graft.llm.PqIndex]],
  * [[graft.llm.IvfPq]]) follow the identical contract:
  *
  *  - `seg00001, seg00002, …` — one immutable AtomicStore-published
  *    directory per build/append; existing segments never recompute.
  *  - at most one live `baseNNNNN` — the fold a compaction publishes.
  *  - readers take the highest complete base plus every segment numbered
  *    ABOVE it; superseded entries a crashed compaction left behind are
  *    invisible, and a batch appended concurrently with a compaction
  *    numbers above the fold and survives it untouched.
  */
object SegmentedStore {

  private val SegRe = "seg(\\d{5,})".r
  private val BaseRe = "base(\\d{5,})".r

  def segPath(root: String, n: Int): String = f"$root%s/seg$n%05d"
  def basePath(root: String, n: Int): String = f"$root%s/base$n%05d"

  private def complete(root: String, re: scala.util.matching.Regex) =
    AtomicStore.list(root).flatMap { f =>
      f.getPath.getName match {
        case re(n) if AtomicStore.isComplete(f.getPath.toString) =>
          Some(n.toInt)
        case _ => None
      }
    }.sorted

  def segments(root: String): Seq[Int] = complete(root, SegRe)
  def bases(root: String): Seq[Int] = complete(root, BaseRe)

  /** The entries a reader folds RIGHT NOW: highest complete base (if
    * any) plus the segments above it. */
  def liveEntries(root: String): Seq[String] = {
    val b = bases(root).maxOption
    b.map(basePath(root, _)).toSeq ++
      segments(root).filter(n => b.forall(n > _)).map(segPath(root, _))
  }

  /** Live entry count (0 = nothing built yet) — the fold depth of every
    * read. */
  def liveCount(root: String): Int = liveEntries(root).size

  /** The number the NEXT segment must take. Counts bases too: after a
    * fold into base k the next batch lands at k+1 — a reused low number
    * would sit below the base and be invisible to readers. */
  def nextN(root: String): Int =
    (segments(root) ++ bases(root)).maxOption.getOrElse(0) + 1

  /** Fold every live entry into ONE new base via `write(liveEntries,
    * tmpDir)`, then drop the superseded entries — publish-then-drop, so
    * a crash between the two leaves a larger-but-consistent store.
    * Returns the live entry count after. */
  def compactWith(root: String)(
      write: (Seq[String], String) => Unit): Int = {
    val live = liveEntries(root)
    require(live.nonEmpty, s"no segmented store under $root")
    if (live.size <= 1) return live.size
    val top = (segments(root) ++ bases(root)).max
    AtomicStore.materialize(basePath(root, top))(tmp => write(live, tmp))
    segments(root).filter(_ <= top).foreach(n =>
      AtomicStore.delete(segPath(root, n)))
    bases(root).filter(_ < top).foreach(n =>
      AtomicStore.delete(basePath(root, n)))
    liveEntries(root).size
  }
}
