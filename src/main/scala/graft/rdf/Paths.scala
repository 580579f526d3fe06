package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property-path evaluation: SPARQL `p+` (one-or-more) reachability over
  * an edge set, the graph-traversal operator BGP joins can't express at a
  * fixed depth.
  *
  * Semi-naive iteration (the distributed datalog pattern): each round
  * joins only the FRONTIER (paths discovered last round) against the edge
  * list, anti-joins away already-known pairs, and stops when the frontier
  * is empty. Work per round is O(new paths), not O(all paths) — the
  * difference between this converging and re-deriving everything every
  * round. Rounds = longest simple path; each is two shuffles (join +
  * dedup). Driver sees only per-round emptiness checks, never data.
  */
object Paths {

  /** All (src, dst) pairs connected by 1+ hops over `edges(src, dst)`. */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    var all = e.localCheckpoint(true)
    var delta = all
    var i = 0
    while (i < maxIter && !delta.isEmpty) {
      val next = delta.as("d").join(e.as("e"), col("d.dst") === col("e.src"))
        .select(col("d.src").as("src"), col("e.dst").as("dst"))
        .distinct()
        // only genuinely new pairs survive into the next frontier
        .join(all, Seq("src", "dst"), "left_anti")
        .localCheckpoint(true)
      if (!next.isEmpty) all = all.unionByName(next).localCheckpoint(true)
      delta = next
      i += 1
    }
    e.unpersist()
    // silent truncation would return a subset that LOOKS complete
    require(delta.isEmpty,
      s"transitive closure did not converge in $maxIter rounds — " +
        "raise maxIter (a path is longer than it)")
    all
  }

  /** SPARQL `pred+` over the triples table: reachability through edges
    * labeled with any of the given predicates. */
  def predicatePlus(triples: DataFrame, preds: Seq[String],
      maxIter: Int = 20): DataFrame =
    transitiveClosure(
      triples.filter(col("p").isin(preds: _*))
        .select(col("s").as("src"), col("o").as("dst")),
      maxIter)
}
