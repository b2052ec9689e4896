package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Map-side-combinable k-minimum-values buffer: keeps the k smallest
  * DISTINCT longs seen per group, merged pairwise — the aggregation
  * kernel of the KMV distinct-count sketch.
  *
  * Why not `distinct` + `row_number() over (partition by group order
  * by hash)`: that shape shuffles every distinct hash to its group's
  * single task and sorts there — at corpus scale one straggler task
  * per group holds ~cardinality rows. This aggregator reduces each
  * partition to ≤ k values before the shuffle, so the shuffle carries
  * `groups * k` longs regardless of corpus size, and the merge is
  * associative/commutative (safe under partial aggregation). The
  * result is the set of k global minima — deterministic, so an
  * external SQL oracle can replay it with the window form over the
  * same md5-derived hashes.
  */
class KMinAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], x: Long): Seq[Long] = KMinAgg.insert(buf, x, k)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(KMinAgg.insert(_, _, k))
  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}

object KMinAgg {
  /** Sorted-ascending bounded insert of a distinct value — shared by
    * the batch aggregator and the streaming state update.
    */
  def insert(buf: Seq[Long], x: Long, k: Int): Seq[Long] = {
    if (buf.size >= k && buf.last < x) buf // bounded: full and x too big
    else {
      val (pre, post) = buf.span(_ < x)
      if (post.headOption.contains(x)) buf // KMV needs DISTINCT minima
      else (pre ++ (x +: post)).take(k)
    }
  }

  /** Bottom-k estimator over a [[insert]]-maintained buffer: exact
    * below k, else `(k-1) * 2^56 DIV h_(k)` (integer math, matching
    * the SQL replay).
    */
  def estimate(buf: Seq[Long], k: Int): Long = {
    // (k-1) * 2^56 overflows signed 64-bit at k >= 129 — the bound is
    // the kernel's, not just its call sites'
    require(k >= 2 && k <= 128, s"kmv k must be in [2, 128], got $k")
    if (buf.size < k) buf.size.toLong
    else (k - 1).toLong * (1L << 56) / buf.last
  }

  /** Column form: `kMin(k)(hashCol)` → array<long>, the k smallest
    * distinct values, ascending.
    */
  def kMin(k: Int): Column => Column = {
    require(k >= 2 && k <= 128, s"kmv k must be in [2, 128], got $k")
    val fn = udaf(new KMinAgg(k))
    h => fn(h)
  }
}
