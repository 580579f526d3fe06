package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Probe into a PER-BUCKET serialized [[BloomFilter]] column —
  * `bloom_check_bucketed(bucket, filter_binary, key)` — the distributed
  * counterpart of [[BloomMightContain]].
  *
  * [[BloomMightContain]] holds ONE driver-built filter object and ships it
  * in the task binary — optimal until the filter itself outgrows the
  * driver (≈1.2 GB at 10⁹ keys / 1% fpp). Beyond that the filters are
  * built executor-side per hash bucket ([[graft.llm.Dedup.incrementalExactBloomPartitioned]])
  * and arrive here as a joined BINARY column: each task sees only its own
  * buckets' filters, never the full set.
  *
  * A per-bucket column probe cannot fuse the filter into codegen (the
  * binary differs row to row), so this expression is CodegenFallback with
  * a per-instance bucket→filter memo: rows leave the bucket equi-join
  * clustered by bucket, so each task deserializes each of its buckets'
  * filters exactly once and every subsequent row is a plain
  * `mightContainLong`. Expression instances are per-task plan copies —
  * the memo is single-threaded by construction.
  *
  * Null semantics: any null input → false ("no filter / no key" reads as
  * NOT seen; callers route null keys explicitly, as in the single-filter
  * path). No false negatives; `true` means candidate, never "seen".
  */
case class BloomCheckBucketed(bucket: Expression, bin: Expression,
    key: Expression) extends TernaryExpression with CodegenFallback {

  override def first: Expression = bucket
  override def second: Expression = bin
  override def third: Expression = key

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_check_bucketed"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bucket.dataType == LongType && bin.dataType == BinaryType &&
      key.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT bucket, BINARY filter, BIGINT key), " +
        s"got (${bucket.dataType.simpleString}, ${bin.dataType.simpleString}, " +
        s"${key.dataType.simpleString})")

  @transient private lazy val memo =
    scala.collection.mutable.HashMap.empty[Long, BloomFilter]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = bucket.eval(input)
    val f = bin.eval(input)
    val k = key.eval(input)
    if (b == null || f == null || k == null) false
    else {
      val filter = memo.getOrElseUpdate(b.asInstanceOf[Long],
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(
          f.asInstanceOf[Array[Byte]])))
      filter.mightContainLong(k.asInstanceOf[Long])
    }
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(bucket = newFirst, bin = newSecond, key = newThird)
}
