package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native intersection size of two SORTED-ascending distinct
  * `array<long>` columns: one linear merge loop in whole-stage codegen.
  *
  * This is the open-vocabulary counterpart of the ≤64-symbol bitmask
  * trick in Dedup.pairScorer: sets are dictionary-free sorted hash
  * arrays, and pair scoring is O(|a|+|b|) primitive compares instead of
  * `array_intersect`'s per-pair hash-set build (which dominated the
  * shingle-dedup join). Union size follows as |a|+|b|-intersect.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < nx && j < ny) {
      // null elements (array_sort puts them LAST, where getLong would
      // read 0 and break the ascending precondition) → null result,
      // matching array_intersect's null-intolerant callers
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { cnt += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0, $j = 0, $cnt = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $cnt++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $cnt; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
