package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpecBase {

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("asofJoin picks the latest right row at or before each left row") {
    import spark.implicits._
    val trades = Seq((1L, ts(10), "t1"), (1L, ts(20), "t2"), (2L, ts(10), "t3"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, ts(5), 100.0), (1L, ts(10), 101.0), (1L, ts(15), 102.0),
      (2L, ts(50), 999.0))
      .toDF("k", "qt", "px")
    val got = AsOf.asofJoin(trades, quotes, "k", "k", "t", "qt",
      rightCols = Seq("px"), rightTiebreak = Seq("px"))
      .select("trade", "px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got("t1") === Some(101.0), "equal timestamps match (<= is inclusive)")
    assert(got("t2") === Some(102.0), "latest prior quote wins")
    assert(got("t3") === None, "no prior right row -> left-outer null")
  }

  test("asofJoin tie on (key, ts) resolves by the tiebreak, deterministically") {
    import spark.implicits._
    val left = Seq((1L, ts(10), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(10), 7L), (1L, ts(10), 9L), (1L, ts(10), 8L))
      .toDF("k", "qt", "rid")
    val got = AsOf.asofJoin(left, right, "k", "k", "t", "qt",
      rightCols = Seq("rid"), rightTiebreak = Seq("rid"))
      .select("rid").head().getLong(0)
    assert(got === 9L, "max tiebreak wins among equal timestamps")
  }

  test("asofJoin handles dotted column names and reserves its internal prefix") {
    import spark.implicits._
    // columns with dots mis-resolve under string-path extraction; the
    // getField-based extraction must bind them correctly
    val left = Seq((1L, ts(10), "x")).toDF("k", "t", "my.tag")
    val right = Seq((1L, ts(5), 7.5)).toDF("k", "qt", "px.usd")
    val got = AsOf.asofJoin(left, right, "k", "k", "t", "qt",
      rightCols = Seq("px.usd"))
    assert(got.columns.toSeq === Seq("k", "t", "my.tag", "px.usd"))
    val row = got.head()
    assert(row.getAs[String]("my.tag") === "x" && row.getAs[Double]("px.usd") === 7.5)
    // a user column that collides with the internal namespace is refused
    val bad = Seq((1L, ts(10), "x")).toDF("k", "t", "__graft_asof_lrow")
    val e = intercept[IllegalArgumentException](
      AsOf.asofJoin(bad, right, "k", "k", "t", "qt", rightCols = Seq("px.usd")))
    assert(e.getMessage.contains("reserved"))
  }

  test("range join meets each (point, interval) pair exactly once, no cartesian") {
    import graft.operators.RangeJoin
    import spark.implicits._
    val points = Seq((1L, 10L, "a"), (1L, 250L, "b"), (1L, 999L, "c"), (2L, 10L, "d"))
      .toDF("k", "t", "tag")
    // interval spanning many buckets (width 100) + a disjoint one
    val ivs = Seq((1L, 5L, 300L, "i1"), (1L, 400L, 450L, "i2"), (2L, 500L, 600L, "i3"))
      .toDF("k", "s", "e", "iv")
    val got = RangeJoin.pointInInterval(points, ivs, "k", "k", "t", "s", "e",
      bucketWidth = 100)
      .select("tag", "iv").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "i1"), ("b", "i1")),
      "multi-bucket interval must match once per contained point, nothing else")
    val plan = RangeJoin.pointInInterval(points, ivs, "k", "k", "t", "s", "e", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "range join must plan as an equi-join on (key, bucket)")
  }

  test("intervalOverlap meets each overlapping pair exactly once across bucket spans") {
    import graft.operators.RangeJoin
    import spark.implicits._
    val a = Seq((1L, 0L, 250L, "a1"),    // spans buckets 0-2 (width 100)
      (1L, 300L, 310L, "a2"), (2L, 0L, 50L, "a3")).toDF("k", "s", "e", "ta")
    val b = Seq((1L, 240L, 320L, "b1"),  // overlaps a1 (at 240-250) AND a2 (300-310)
      (1L, 251L, 299L, "b2"),            // gap between a1 and a2: no overlap
      (2L, 50L, 60L, "b3")).toDF("k", "s", "e", "tb")
    val got = RangeJoin.intervalOverlap(a, b, "k", "k", "s", "e", "s", "e", 100)
      .select("ta", "tb").collect().map(r => (r.getString(0), r.getString(1))).toList
    // exactly-once despite b1 sharing MULTIPLE buckets with a1
    assert(got.sorted === List(("a1", "b1"), ("a2", "b1"), ("a3", "b3")).sorted)
    val plan = RangeJoin.intervalOverlap(a, b, "k", "k", "s", "e", "s", "e", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "interval overlap must plan as an equi-join on (key, bucket)")
  }

  test("snapshotDiff classifies created/updated and drops unchanged keys") {
    import spark.implicits._
    val log = Seq(
      (1L, ts(5), 100L),   // before t1, unchanged after -> dropped
      (2L, ts(5), 101L),   // before t1, updated between t1 and t2
      (2L, ts(15), 102L),
      (3L, ts(15), 103L)   // first seen between t1 and t2 -> created
    ).toDF("user_id", "ts", "event_id")
    val got = AsOf.snapshotDiff(log, "ts",
      lit(ts(10)), lit(ts(20)), key = Seq("user_id"), tiebreak = Seq("event_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "updated", 3L -> "created"))
  }
}
