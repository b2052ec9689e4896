package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: TRUE iff every element of an
  * `array<float>` is present and finite (no NULL, NaN, or ±Inf) —
  * the embedding-family input contract (r13 fuzz).
  *
  * Why an Expression and not `exists`: the higher-order form plans a
  * `lambdafunction` that is interpreted per element on the corpus
  * scan — exactly the regression class PlanAuditSpec pins for the PQ
  * path. This kernel is one fused primitive loop inside whole-stage
  * codegen. NULL array → NULL (filters drop it, matching the DuckDB
  * mirror `len(list_filter(v, x -> x IS NULL OR NOT isfinite(x))) = 0`
  * whose NULL input yields NULL).
  */
case class AllFinite(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"all_finite expects array<float> or array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "all_finite"
  override def nullable: Boolean = child.nullable

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return false
      val v = if (isDouble) x.getDouble(i) else x.getFloat(i).toDouble
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
        return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val get = if (isDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |${ev.value} = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.value} = false; break; }
         |  double $v = $get;
         |  if (Double.isNaN($v) || Double.isInfinite($v)) { ${ev.value} = false; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AllFinite {
  /** Column-API entry point: `allFinite($"embedding")`. */
  def apply(vec: Column): Column = Bridge.column(AllFinite(Bridge.expression(vec)))
}
