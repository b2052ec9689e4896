package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native product-quantization kernels. The expression-tree form of PQ
  * ([[graft.operators.Similarity.pqTopK]]'s original shape) evaluates
  * `subspaces * cells` interpreted `zip_with`+`aggregate` lambdas per
  * row for coding plus `subspaces` more per candidate pair for ADC —
  * higher-order functions sit OUTSIDE whole-stage codegen, and at 16
  * subspaces x 16 cells that interpreter round-trip dominated the
  * query (3.3s for a 500-vector corpus at sf0.1). These kernels run
  * the same arithmetic as one fused loop inside codegen.
  *
  * Bit-compatibility contract (PqKernelSpec proves it, the DuckDB
  * oracle relies on it): float elements widen to double exactly;
  * per-subspace L2² accumulates `(v[t]-c[t])²` left-to-right in a
  * double starting at 0.0; the argmin scans cells ascending replacing
  * only on strictly-smaller distance (== array_min over (dist, cell)
  * structs: lower cell wins ties); ADC sums subspace terms in
  * ascending j (== reduceLeft(_ + _)). Identical fold orders, so the
  * kernels are drop-in replacements for the lambda chains.
  */
object PqKernels {
  /** codebook(j)(c)(t): subspace j, cell c, component t — as the exact
    * doubles the lambda form compared against.
    */
  type Codebook = Array[Array[Array[Double]]]
}

/** `array<float>` vector → `array<int>` of per-subspace argmin codes. */
case class PqCodes(child: Expression, codebook: PqKernels.Codebook)
  extends UnaryExpression {

  private def subspaces = codebook.length
  private def subDim = codebook(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"
  // a vector too short to cover every subspace cannot be coded —
  // null, like CosineSimilarity on ragged pairs
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < subspaces * subDim) return null
    var z = 0
    while (z < subspaces * subDim) { // null element → uncodeable
      if (v.isNullAt(z)) return null
      z += 1
    }
    val out = new Array[Int](subspaces)
    var j = 0
    while (j < subspaces) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < codebook(j).length) {
        val cent = codebook(j)(c)
        var d = 0.0
        var t = 0
        while (t < subDim) {
          val diff = v.getFloat(j * subDim + t).toDouble - cent(t)
          d += diff * diff
          t += 1
        }
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("codebook", codebook, "double[][][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val cent = ctx.freshName("cent")
      val z = ctx.freshName("z")
      s"""
         |if ($a.numElements() < ${subspaces * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $z = 0; $z < ${subspaces * subDim}; $z++) {
         |    if ($a.isNullAt($z)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    int[] $out = new int[$subspaces];
         |    for (int $j = 0; $j < $subspaces; $j++) {
         |      double $best = Double.POSITIVE_INFINITY;
         |      int $bestC = 0;
         |      for (int $c = 0; $c < $cbRef[$j].length; $c++) {
         |        double[] $cent = $cbRef[$j][$c];
         |        double $d = 0.0;
         |        for (int $t = 0; $t < $subDim; $t++) {
         |          double $diff = (double) $a.getFloat($j * $subDim + $t) - $cent[$t];
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $best) { $best = $d; $bestC = $c; }
         |      }
         |      $out[$j] = $bestC;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodes {
  def apply(vec: Column, codebook: PqKernels.Codebook): Column =
    Bridge.column(PqCodes(Bridge.expression(vec), codebook))
}

/** (query `array<float>`, codes `array<int>`) → ADC distance double:
  * `Σ_j L2²(q_sub_j, codebook(j)(codes(j)))` in ascending j.
  */
case class PqAdc(left: Expression, right: Expression, codebook: PqKernels.Codebook)
  extends BinaryExpression {

  private def subspaces = codebook.length
  private def subDim = codebook(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<float>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  override def nullSafeEval(q: Any, cd: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val codes = cd.asInstanceOf[ArrayData]
    if (qv.numElements() < subspaces * subDim ||
      codes.numElements() < subspaces) return null
    var z = 0
    while (z < subspaces * subDim) {
      if (qv.isNullAt(z)) return null
      z += 1
    }
    var j = 0
    while (j < subspaces) { // foreign/null codes → null, not AIOOBE
      if (codes.isNullAt(j)) return null
      val cj = codes.getInt(j)
      if (cj < 0 || cj >= codebook(j).length) return null
      j += 1
    }
    var total = 0.0
    j = 0
    while (j < subspaces) {
      val cent = codebook(j)(codes.getInt(j))
      var d = 0.0
      var t = 0
      while (t < subDim) {
        val diff = qv.getFloat(j * subDim + t).toDouble - cent(t)
        d += diff * diff
        t += 1
      }
      total += d
      j += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cd) => {
      val cbRef = ctx.addReferenceObj("codebook", codebook, "double[][][]")
      val total = ctx.freshName("total")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val cent = ctx.freshName("cent")
      val z = ctx.freshName("z")
      val cj = ctx.freshName("cj")
      s"""
         |if ($q.numElements() < ${subspaces * subDim} ||
         |    $cd.numElements() < $subspaces) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $z = 0; $z < ${subspaces * subDim}; $z++) {
         |    if ($q.isNullAt($z)) { ${ev.isNull} = true; break; }
         |  }
         |  for (int $z = 0; !${ev.isNull} && $z < $subspaces; $z++) {
         |    // foreign/null codes -> null, not AIOOBE
         |    if ($cd.isNullAt($z)) { ${ev.isNull} = true; break; }
         |    int $cj = $cd.getInt($z);
         |    if ($cj < 0 || $cj >= $cbRef[$z].length) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    double $total = 0.0;
         |    for (int $j = 0; $j < $subspaces; $j++) {
         |      double[] $cent = $cbRef[$j][$cd.getInt($j)];
         |      double $d = 0.0;
         |      for (int $t = 0; $t < $subDim; $t++) {
         |        double $diff = (double) $q.getFloat($j * $subDim + $t) - $cent[$t];
         |        $d += $diff * $diff;
         |      }
         |      $total += $d;
         |    }
         |    ${ev.value} = $total;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def apply(qv: Column, codes: Column, codebook: PqKernels.Codebook): Column =
    Bridge.column(PqAdc(Bridge.expression(qv), Bridge.expression(codes), codebook))
}
