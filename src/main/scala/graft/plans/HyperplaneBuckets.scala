package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native random-hyperplane LSH: computes one bucket id per hash table
  * from an `array<float>` vector in a single fused loop.
  *
  * The sign matrix (±1 per (plane, dimension)) is generated
  * deterministically from a splitmix64-style mix of the plane/dim
  * indices at plan time and shipped as a codegen reference object, so
  * bucket assignments are stable across runs and cluster topologies.
  * Replaces `tables * planes` interpreted `zip_with`/`aggregate`
  * reductions per row with `O(tables * planes * dim)` primitive
  * multiply-adds inside whole-stage codegen.
  */
case class HyperplaneBuckets(child: Expression, dim: Int, planes: Int, tables: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  @transient lazy val signs: Array[Array[Float]] =
    HyperplaneBuckets.signMatrix(dim, planes * tables)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val s = signs(t * planes + p)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += v.getFloat(j) * s(j); j += 1 }
        if (dot > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("signs", signs, "float[][]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    float[] $s = $signsRef[$t * $planes + $p];
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $n; $j++) { $dot += $a.getFloat($j) * $s[$j]; }
         |    if ($dot > 0) $bucket |= (1L << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Deterministic ±1 sign matrix (splitmix64 finalizer over (plane, dim)). */
  def signMatrix(dim: Int, numPlanes: Int): Array[Array[Float]] =
    Array.tabulate(numPlanes) { p =>
      Array.tabulate(dim) { j =>
        var z = (p.toLong << 32 | (j.toLong & 0xffffffffL)) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if ((z & 1L) == 0L) -1.0f else 1.0f
      }
    }

  def apply(vec: Column, dim: Int, planes: Int, tables: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec), dim, planes, tables))
}
