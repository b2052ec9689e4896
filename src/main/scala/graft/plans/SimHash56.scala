package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 56-bit SimHash over an `array<long>` of token hashes: bit b
  * of the result is set when more than half the hashes have bit b set.
  *
  * The `functions._` formulation (`aggregate(sequence(0,55), ...)` with
  * a nested `filter`) evaluates 56 interpreted higher-order lambdas per
  * row and dominated the whole simhash pipeline (~30s of a 35s query at
  * sf0.1); this expression is one fused counter loop inside whole-stage
  * codegen. Semantics identical to the HOF version (majority vote,
  * ties → 0).
  */
case class SimHash56(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash56 expects array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash56"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](56)
    // null elements (Md5Hash56Array preserves null tokens as null
    // hashes) contribute NO votes — reading them as hash 0 would cast
    // 56 phantom zero-bit votes each
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        m += 1
        val h = arr.getLong(i)
        var b = 0
        while (b < 56) { cnt(b) += ((h >>> b) & 1L).toInt; b += 1 }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 56) { if (2 * cnt(b) > m) sim |= (1L << b); b += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      val m = ctx.freshName("m")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[56];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue; // null hash casts no votes
         |  $m++;
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 56; $b++) { $cnt[$b] += (int) (($h >>> $b) & 1L); }
         |}
         |long $sim = 0L;
         |for (int $b = 0; $b < 56; $b++) { if (2 * $cnt[$b] > $m) $sim |= (1L << $b); }
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash56 {
  def apply(tokenHashes: Column): Column =
    Bridge.column(SimHash56(Bridge.expression(tokenHashes)))
}
