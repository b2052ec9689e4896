package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without an inequality join.
  *
  * Catalyst plans `a.ts BETWEEN b.start AND b.end` as a broadcast
  * nested loop or cartesian — quadratic per key, dead at scale. Here
  * intervals are exploded over the fixed-width buckets they span, the
  * point side maps to its single bucket, and an ordinary EQUI-join on
  * (key, bucket) meets each qualifying (point, interval) pair exactly
  * once — at the interval copy living in the point's bucket — so the
  * exact containment filter needs no post-join dedup. One shuffle,
  * codegen-friendly, skew handled like any hash join (AQE).
  *
  * `bucketWidth` trades interval replication (a span of length L makes
  * ~L/width copies) against bucket population; set it near the typical
  * interval length.
  */
object RangeJoin {

  /** Join each point row to every interval row of the same key whose
    * `[startCol, endCol]` (inclusive) contains `pointCol`. All three
    * columns must be integral (e.g. epoch seconds).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointKey: String, intervalKey: String,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__b", expr(s"`$pointCol` div $bucketWidth")).as("p")
    val iv = intervals.withColumn("__b",
      explode(sequence(expr(s"`$startCol` div $bucketWidth"),
        expr(s"`$endCol` div $bucketWidth")))).as("i")
    p.join(iv,
        col(s"p.$pointKey") === col(s"i.$intervalKey") &&
          col("p.__b") === col("i.__b") &&
          col(s"p.$pointCol") >= col(s"i.$startCol") &&
          col(s"p.$pointCol") <= col(s"i.$endCol"))
      .drop(col("p.__b")).drop(col("i.__b"))
  }

  /** INTERVAL-interval overlap join (the temporal-join general case of
    * [[pointInInterval]]): same-key pairs with `[aStart,aEnd]` ∩
    * `[bStart,bEnd]` ≠ ∅ (inclusive ends). Both sides explode over
    * their spanned buckets, and the pair is accepted ONLY in its
    * canonical meeting bucket — the bucket of `greatest(aStart,
    * bStart)`, which overlapping intervals always share — so each
    * qualifying pair meets exactly once and the equi-join needs no
    * post-join dedup, preserving the one-shuffle shape. Column name
    * collisions are the caller's concern (alias inputs `a`/`b`).
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
                      aKey: String, bKey: String,
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val av = a.withColumn("__b",
      explode(sequence(expr(s"`$aStart` div $bucketWidth"),
        expr(s"`$aEnd` div $bucketWidth")))).as("a")
    val bv = b.withColumn("__b",
      explode(sequence(expr(s"`$bStart` div $bucketWidth"),
        expr(s"`$bEnd` div $bucketWidth")))).as("b")
    av.join(bv,
        col(s"a.$aKey") === col(s"b.$bKey") &&
          col("a.__b") === col("b.__b") &&
          col(s"a.$aStart") <= col(s"b.$bEnd") &&
          col(s"b.$bStart") <= col(s"a.$aEnd") &&
          col("a.__b") === expr(s"greatest(a.`$aStart`, b.`$bStart`) div $bucketWidth"))
      .drop(col("a.__b")).drop(col("b.__b"))
  }
}
