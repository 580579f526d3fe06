package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen probe into a pre-built [[BloomFilter]] over xxhash64
  * keys — the runtime-filter primitive for set-membership prefilters
  * (see [[graft.llm.Dedup.incrementalExactBloom]]).
  *
  * Why an Expression holding the filter object, not a UDF and not a
  * binary-literal argument: the filter rides the expression into the
  * generated code via `addReferenceObj`, so executors receive it once per
  * stage through the task-binary broadcast (the same transport Spark's own
  * injected runtime bloom filters use), each probe is a branch-free
  * `mightContainLong` fused into whole-stage codegen, and a multi-megabyte
  * filter never has to be rendered into SQL text or a Literal tree.
  *
  * Semantics: NO false negatives, bounded false positives (the builder's
  * fpp). Callers must treat `true` as "candidate", never as "seen" —
  * correctness requires an exact confirm on the true side only.
  */
case class BloomMightContain(bloom: BloomFilter, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key (use xxhash64), got " +
        child.dataType.simpleString)

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
