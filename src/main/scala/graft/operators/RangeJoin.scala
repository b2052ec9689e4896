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
}
