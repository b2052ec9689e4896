package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact fixed-point dot product over 2^20-quantized embeddings:
  * `Σ round(xᵢ·2^20) · round(yᵢ·2^20)` as a LONG — the integer
  * similarity kernel behind [[graft.operators.Similarity.mmrRerank]]
  * (and any consumer that wants bit-replayable similarity instead of
  * float cosine). Quantization is FUSED into the loop, replacing an
  * interpreted `transform(...round...)` + `aggregate(zip_with(...))`
  * chain per row pair with one codegen'd loop (the PqKernels lesson:
  * the interpreted-HOF form was the measured hot path).
  *
  * Rounding is HALF AWAY FROM ZERO, matching Spark SQL `round(double)`
  * and DuckDB `round` exactly — NOT `Math.round` (floor(x+0.5)),
  * which differs on negative halves. Bounds: |q| ≲ 2^20·|v|; unit-ish
  * embeddings at 64 dims keep the sum < 2^47, far inside long.
  *
  * Null element or ragged pair → null, like the zip_with form.
  */
case class IntDotQ20(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_dot_q20 expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot_q20"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += IntDotQ20.q20(x.getFloat(i)) * IntDotQ20.q20(y.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val cls = IntDotQ20.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $cls.q20($a.getFloat($i)) * $cls.q20($b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntDotQ20 {
  /** round(v·2^20) half away from zero — Spark/DuckDB `round(double)`
    * semantics; called from generated code, keep it a static-forwarded
    * object method.
    */
  def q20(v: Float): Long = {
    val x = v.toDouble * 1048576.0
    if (x >= 0) math.floor(x + 0.5d).toLong else math.ceil(x - 0.5d).toLong
  }
}
