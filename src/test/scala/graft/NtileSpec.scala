package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pins the ntile dual-path equality (r13, ADVICE): q_rfm/q_lorenz
  * size-dispatch between the single-window ntile (fast below 2M
  * entities) and `distributedNtile` (range-partitioned parallel rank —
  * the >2M scale path). This spec EXERCISES the scale path the
  * dispatch would only take at 2M+ rows and asserts it equals Spark's
  * own ntile bit-for-bit, on sizes that cover every bucket-boundary
  * shape (n % k = 0, n < k, ragged).
  */
class NtileSpec extends SparkSpecBase {

  private def check(n: Int, k: Int): Unit = {
    import spark.implicits._
    // deterministic values with heavy ties; id tiebreak = total order
    val df = (1 to n).map(i => (i.toLong, (i * 7919 % 97).toLong)).toDF("id", "v")
    val order = Seq(col("v"), col("id"))
    val want = df.withColumn("nt", ntile(k).over(Window.orderBy(order: _*)).cast("long"))
      .select("id", "nt").as[(Long, Long)].collect().toMap
    val got = operators.Analytics.distributedNtile(df, k, order, "nt")
      .select("id", "nt").as[(Long, Long)].collect().toMap
    assert(got === want, s"distributedNtile != window ntile at n=$n k=$k")
  }

  test("distributedNtile equals window ntile across boundary shapes") {
    check(50000, 5)  // ragged (n % k = 0 here, large)
    check(5003, 10)  // ragged remainder
    check(7, 10)     // n < k: buckets of size 1
    check(10, 10)    // n == k
  }
}
