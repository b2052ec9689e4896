package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Misra–Gries heavy-hitters summary: at most `k` counters
  * per group, with the classic guarantee that every item whose true
  * frequency exceeds n/(k+1) is PRESENT in the summary (counters
  * under-count by at most n/(k+1), never over-count). The merge is
  * the Agarwal et al. "mergeable summaries" form — pointwise counter
  * sum, then subtract the (k+1)-st largest counter and drop the
  * non-positive — which preserves the guarantee under ANY merge
  * order, so the aggregator is safe under Spark's partial
  * aggregation: each partition reduces to ≤ k counters before the
  * shuffle, and the shuffle carries `groups * k` counters no matter
  * the stream length.
  *
  * The candidate SET can vary with merge order (only the guarantee is
  * order-invariant), so the summary itself is not SQL-replayable —
  * the oracle-facing query confirms candidates against EXACT counts
  * (a broadcast-semi-joined second pass over ≤ k items) and emits
  * only true heavy hitters, which ARE deterministic.
  */
class HeavyHittersAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  override def zero: Map[String, Long] = Map.empty
  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None => // decrement-all: drop zeros, the MG step
        buf.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-st largest counter from every counter
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
    }
  }
  override def finish(buf: Map[String, Long]): Map[String, Long] = buf
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}

object HeavyHittersAgg {
  /** Column form: `heavyHitters(k)(itemCol)` → map<string,long> of ≤ k
    * candidate counters.
    */
  def heavyHitters(k: Int): Column => Column = {
    require(k >= 1, s"heavy-hitters k must be >= 1, got $k")
    val fn = udaf(new HeavyHittersAgg(k))
    c => fn(c)
  }
}
