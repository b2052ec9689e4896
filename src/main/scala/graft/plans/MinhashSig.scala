package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native one-pass MinHash signature over an `array<string>` token set:
  * ONE md5 per token at the byte level (Kirsch–Mitzenmacher pairs
  * h1 = digest bytes 0–6, h2 = bytes 7–13, big-endian — exactly the
  * hex-digit ranges `conv(substring(md5(w), 1, 14), 16, 10)` /
  * `(15, 14)` parse), then all `numHashes` seeded minima
  * `min_w (h1 + i·h2) mod 2^56` accumulated in the same loop.
  *
  * Replaces the `transform(toks, w -> kmHashPair(w))` +
  * `array_min(transform(...))` chain: higher-order lambdas evaluate
  * interpreted (outside whole-stage codegen) and the conv/substring
  * path allocates a 32-char hex string plus two substrings per token —
  * this kernel allocates one byte[] per token and no strings.
  * Bit-identical to the HOF chain (MinhashKernelSpec proves it on the
  * corpus); the md5-derived values keep the DuckDB oracles replayable
  * verbatim.
  *
  * NULL semantics mirror the chain it replaces: NULL input → NULL;
  * empty array or all-null elements → array of `numHashes` NULLs
  * (`array_min` of an empty/all-null array); null elements skipped.
  */
case class MinhashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 128,
    s"numHashes must be in [1, 128] (seed <= 127 keeps h1 + i*h2 < 2^63), got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.MinhashSig.compute($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 7 / next 7 digest bytes as unsigned big-endian 56-bit longs. */
  @inline private def h56(d: Array[Byte], off: Int): Long = {
    var h = 0L; var j = off
    while (j < off + 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
    h
  }

  def compute(arr: ArrayData, numHashes: Int): GenericArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val md = digests.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val h1 = h56(d, 0); val h2 = h56(d, 7)
        var k = 0
        while (k < numHashes) {
          val h = (h1 + k * h2) % (1L << 56)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](numHashes)) // all nulls
    else new GenericArrayData(mins.map(Long.box(_): Any))
  }

  def apply(toks: Column, numHashes: Int): Column =
    Bridge.column(MinhashSig(Bridge.expression(toks), numHashes))
}

/** Native per-element 56-bit md5 hash of an `array<string>`, with a
  * constant prefix: element i becomes the first 7 md5 bytes of
  * `prefix + w` — exactly `conv(substring(md5(prefix || w), 1, 14),
  * 16, 10)`, the seeded stableHash56 the SimHash pipeline feeds to
  * [[SimHash56]]. Same motivation as [[MinhashSig]]: the
  * `transform(...)` form runs interpreted with per-token hex strings.
  * Null elements stay null.
  */
case class Md5Hash56Array(child: Expression, prefix: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_hash56_array expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "md5_hash56_array"

  override def nullSafeEval(input: Any): Any =
    Md5Hash56Array.compute(input.asInstanceOf[ArrayData],
      prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pref = ctx.addReferenceObj("prefix",
        prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8), "byte[]")
      s"${ev.value} = graft.plans.Md5Hash56Array.compute($a, $pref);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash56Array {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def compute(arr: ArrayData, prefix: Array[Byte]): GenericArrayData = {
    val md = digests.get()
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(prefix)
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L; var j = 0
        while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        out(i) = Long.box(h)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(toks: Column, prefix: String): Column =
    Bridge.column(Md5Hash56Array(Bridge.expression(toks), prefix))
}
