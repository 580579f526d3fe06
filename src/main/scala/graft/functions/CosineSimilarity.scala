package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns, with whole-stage codegen.
  *
  * Why an Expression and not a UDF / higher-order function: the generated
  * code is a tight primitive loop over the two ArrayDatas — no per-element
  * lambda dispatch, no boxing, and it fuses into the surrounding
  * WholeStageCodegen stage. On the LSH near-dup verification path this is
  * the hot kernel (candidates × dimensions multiply-adds).
  *
  * Determinism contract: the fold order is left-to-right per accumulator,
  * matching the `aggregate(zip_with(...))` formulation in
  * [[graft.llm.EmbeddingOps.cosineHof]] bit-for-bit on equal-length
  * inputs, so swapping between the two cannot change oracle-checked
  * results; mismatched dimensions throw rather than silently truncate.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // Nullable even over non-null inputs: a null *element* yields NULL (the
  // HOF `zip_with` formulation propagates element nulls the same way).
  override def nullable: Boolean = true

  // ExpectsInputTypes.inputTypes is private[sql] in Spark 4 — check by hand.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // fail loudly on dimension mismatch: silently truncating to the
    // shorter array would return a plausible-but-wrong similarity for a
    // corrupt embedding (and diverge from the HOF reference formulation)
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"cosine_sim: dimension mismatch ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      // null element ⇒ NULL result (not 0.0): matches cosineHof, where the
      // zip_with lambda's null propagates through the aggregate
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: dimension mismatch " + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |  double xi = (double) $a.getFloat($i);
         |  double yi = (double) $b.getFloat($i);
         |  $dot += xi * yi; $nx += xi * xi; $ny += yi * yi;
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Register graft's native expressions in a session's function registry
    * (idempotent). SQL then resolves `cosine_sim(a, b)` /
    * `nt_unescape(s)` / `nt_escape(s)` to the codegen'd expressions.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "nt_unescape", exprs => graft.rdf.NtUnescape(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "nt_escape", exprs => graft.rdf.NtEscape(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_check_bucketed",
      exprs => BloomCheckBucketed(exprs.head, exprs(1), exprs(2)), "built-in")
  }
}
