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
  * deterministically from md5 over the "plane:dim" index string at
  * plan time and shipped as a codegen reference object, so bucket
  * assignments are stable across runs and cluster topologies AND
  * replayable by an external SQL engine (`('0x' ||
  * substring(md5(p || ':' || j), 1, 2))::int % 2` reproduces each
  * sign — the same md5-portability contract as HashFunctions). Sign
  * multiplication is exact in float, and both engines accumulate the
  * dot product in index order with a double accumulator, so the
  * `dot > 0` threshold decides identically.
  * Replaces `tables * planes` interpreted `zip_with`/`aggregate`
  * reductions per row with `O(tables * planes * dim)` primitive
  * multiply-adds inside whole-stage codegen.
  */
case class HyperplaneBuckets(child: Expression, dim: Int, planes: Int, tables: Int)
  extends UnaryExpression {

  // planes caps at 63: `1L << p` wraps its shift count at 64, which
  // would silently alias plane 64's vote onto bit 0 (same bug class
  // mortonInterleave guards against)
  require(dim >= 1, s"dim must be positive, got $dim")
  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")
  require(tables >= 1, s"tables must be positive, got $tables")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  @transient lazy val signs: Array[Array[Float]] =
    HyperplaneBuckets.signMatrix(dim, planes * tables)

  // nullable: a vector shorter than dim cannot be bucketed — null,
  // consistent with PqCodes/CosineSimilarity on dimension mismatch
  // (silent prefix-truncation would bucket corrupt rows as if
  // zero-padded)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dim) return null
    var z = 0
    while (z < dim) { // null element reads as 0.0 — null out instead
      if (v.isNullAt(z)) return null
      z += 1
    }
    val n = dim
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
      val z = ctx.freshName("z")
      s"""
         |if ($a.numElements() < $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  // null element reads as 0.0 — null out instead
         |  for (int $z = 0; $z < $dim; $z++) {
         |    if ($a.isNullAt($z)) { ${ev.isNull} = true; break; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  int $n = $dim;
         |  long[] $out = new long[$tables];
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $bucket = 0L;
         |    for (int $p = 0; $p < $planes; $p++) {
         |      float[] $s = $signsRef[$t * $planes + $p];
         |      double $dot = 0.0;
         |      for (int $j = 0; $j < $n; $j++) { $dot += $a.getFloat($j) * $s[$j]; }
         |      if ($dot > 0) $bucket |= (1L << $p);
         |    }
         |    $out[$t] = $bucket;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Deterministic ±1 sign matrix: parity of the first md5 byte of
    * "plane:dim" (md5-derived like every other hash in graft, so an
    * external SQL oracle can regenerate the exact matrix).
    */
  def signMatrix(dim: Int, numPlanes: Int): Array[Array[Float]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes) { p =>
      Array.tabulate(dim) { j =>
        val h = md.digest(s"$p:$j".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) -1.0f else 1.0f
      }
    }
  }

  def apply(vec: Column, dim: Int, planes: Int, tables: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec), dim, planes, tables))
}
