package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-bigram Shannon entropy in integer
  * micro-nats: `h_q = floor(ln(n)·2²⁰) − (Σ_g c_g·floor(ln(c_g)·2²⁰))
  * div n` over the document's n = (chars − 1) consecutive
  * code-point bigrams with per-bigram counts c_g — exactly the value
  * the explode → groupBy(doc, bigram) → per-doc aggregation pipeline
  * produced, computed in ONE pass over the string inside whole-stage
  * codegen. The exploded shape shuffled ~one cell row per distinct
  * (doc, bigram) (tens of millions at bench scale) through two
  * exchanges; per-doc entropy needs no cross-row data at all, so the
  * kernel reduces the whole pipeline to a map plus one tiny per-group
  * aggregation (guide §2.3 / §4 — the [[SimHash56]] precedent).
  *
  * Arithmetic identity with the SQL form: bigrams are consecutive
  * code-point pairs (UTF8String `substr(i, 2)` semantics, surrogate
  * pairs = one char), counts come from a sort + run-length pass over
  * the packed (cp1 << 21 | cp2) longs (injective: code points <
  * 2^21), ln is java.lang.Math.log — the same function Spark's `log`
  * evaluates — and the divide is the truncating int64 `div` on
  * non-negative exact integers.
  *
  * NULL semantics: NULL text → NULL; fewer than 2 code points (no
  * bigram) → NULL — mirroring the exploded pipeline, where such
  * documents produced no cell row and dropped out of the per-doc
  * aggregation entirely.
  */
case class CharBigramEntropyQ(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_bigram_entropy_q expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "char_bigram_entropy_q"

  override def nullSafeEval(input: Any): Any =
    CharBigramEntropyQ.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("hq")
      s"""
         |java.lang.Long $r = graft.plans.CharBigramEntropyQ.compute($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharBigramEntropyQ {

  /** h_q in micro-nats, or null when the text has < 2 code points. */
  def compute(t: UTF8String): java.lang.Long = {
    val s = t.toString
    val len = s.length
    if (len < 2) { // < 2 UTF-16 units cannot hold 2 code points
      return null
    }
    // pack consecutive code-point pairs; count = #codepoints - 1
    var cap = len - 1 // upper bound on bigram count
    val grams = new Array[Long](cap)
    var prev = s.codePointAt(0)
    var idx = Character.charCount(prev)
    var gi = 0
    while (idx < len) {
      val cp = s.codePointAt(idx)
      grams(gi) = (prev.toLong << 21) | cp.toLong
      gi += 1
      prev = cp
      idx += Character.charCount(cp)
    }
    if (gi == 0) return null // one code point only (e.g. single non-BMP char)
    java.util.Arrays.sort(grams, 0, gi)
    val n = gi.toLong
    var sum = 0L
    var i = 0
    while (i < gi) {
      var j = i + 1
      while (j < gi && grams(j) == grams(i)) j += 1
      val c = (j - i).toLong
      sum += c * math.floor(math.log(c.toDouble) * 1048576.0).toLong
      i = j
    }
    java.lang.Long.valueOf(
      math.floor(math.log(n.toDouble) * 1048576.0).toLong - sum / n)
  }

  def apply(text: Column): Column =
    Bridge.column(CharBigramEntropyQ(Bridge.expression(text)))
}
