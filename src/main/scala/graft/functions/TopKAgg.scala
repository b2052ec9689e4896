package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Map-side-combinable top-k selection: keeps a bounded, sorted
  * (score desc, id asc) buffer of size k per group, merged pairwise.
  *
  * Why not `row_number() over (partition by group order by score)`: the
  * window form shuffles EVERY candidate row to its group's single task
  * and sorts there — at corpus scale that is one straggler task per
  * query holding ~corpus rows. This aggregator reduces each partition
  * to k rows before the shuffle (classic TakeOrdered-per-key), so the
  * shuffle carries `groups * k` rows regardless of corpus size.
  * Selection order (score desc, id asc) is total, so results are
  * deterministic and identical to the window form.
  *
  * NULL id or NULL score rows are SKIPPED (fuzz r12): the previous
  * primitive (Long, Double) input encoder silently read a NULL id as
  * 0 — a fabricated identity in the top-k output. Skipping matches
  * SQL's `max_by`/aggregate NULL semantics, and a row with no identity
  * or no score has no defensible rank anyway.
  */
class TopKAgg(k: Int) extends Aggregator[(java.lang.Long, java.lang.Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean = {
    // NaN scores (e.g. cosine of a zero vector) rank LAST,
    // deterministically — plain `>` would leave them unordered and
    // merge-order-dependent.
    val aN = a._2.isNaN; val bN = b._2.isNaN
    if (aN != bN) bN
    else {
      val cmp = java.lang.Double.compare(a._2, b._2)
      cmp > 0 || (cmp == 0 && a._1 < b._1)
    }
  }

  private def insert(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] = {
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      (pre ++ (x +: post)).take(k)
    }
  }

  override def zero: Seq[(Long, Double)] = Vector.empty
  override def reduce(buf: Seq[(Long, Double)], x: (java.lang.Long, java.lang.Double)): Seq[(Long, Double)] =
    if (x._1 == null || x._2 == null) buf
    else insert(buf, (x._1.longValue(), x._2.doubleValue()))
  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}

object TopKAgg {
  /** Column form: `topK(k)(idCol, scoreCol)` → array<struct<_1,_2>>
    * sorted best-first. NULL id/score inputs contribute nothing.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k))
    (id, score) => fn(id, score)
  }
}
