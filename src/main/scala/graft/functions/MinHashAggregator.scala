package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"): a mergeable MinHash
  * sketch as an `Aggregator[String, Array[Long], Array[Long]]`.
  *
  * The buffer is the element-wise minimum of `numHashes` hash functions
  * over the values seen — associative and commutative, so Spark can
  * partial-aggregate map-side, merge across shuffles, and (because merge is
  * a pure sketch union) maintain it as streaming state. The resulting
  * signatures estimate Jaccard similarity as the fraction of agreeing
  * components ([[MinHashAggregator.estimateJaccard]]).
  *
  * Complements [[graft.llm.Dedup.signatures]] (the columnar/codegen
  * formulation): same sketch, but usable wherever a typed aggregate is
  * required — `groupByKey(...).agg(sketch.toColumn)`, streaming
  * `mapGroupsWithState`, or ad-hoc set-similarity of arbitrary keyed data.
  */
class MinHashAggregator(numHashes: Int = 64)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], value: String): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val h = MinHashAggregator.hash(value, i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {
  /** Deterministic 64-bit hash of (value, seed): FNV-1a digest of the
    * UTF-8 bytes, seed-mixed and pushed through a splitmix64 finalizer.
    * The finalizer matters: without full avalanche the per-seed orderings
    * stay correlated (e.g. by string length) and the MinHash estimator is
    * biased, not just noisy. Stable across JVMs/runs.
    */
  def hash(value: String, seed: Int): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h ^= seed.toLong * 0x9e3779b97f4a7c15L
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^= h >>> 31
    h
  }

  /** Jaccard estimate: fraction of agreeing signature components. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }
}
