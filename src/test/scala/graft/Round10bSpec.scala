package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Discovery, Hierarchy, Stats, TimeSeries}

class Round10bSpec extends SparkSpecBase {

  test("hierarchy: ancestor closure by doubling and subtree rollup match the hand tree") {
    import spark.implicits._
    //        1
    //       / \
    //      2   3
    //     / \
    //    4   5
    //    |
    //    6
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 4L))
      .toDF("child", "parent")
    val closure = Hierarchy.ancestorClosure(edges, "child", "parent")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(closure === Set((2L, 1L), (3L, 1L), (4L, 2L), (4L, 1L), (5L, 2L),
      (5L, 1L), (6L, 4L), (6L, 2L), (6L, 1L)), s"full proper-ancestor set: $closure")

    val nodes = (1L to 6L).map(i => (i, i)).toDF("id", "v")
    val roll = Hierarchy.subtreeRollup(edges, "child", "parent", nodes, "id", "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(roll === Map(1L -> ((6L, 21L)), 2L -> ((4L, 17L)), 3L -> ((1L, 3L)),
      4L -> ((2L, 10L)), 5L -> ((1L, 5L)), 6L -> ((1L, 6L))), s"subtree (n, sum): $roll")
  }

  test("hierarchy: a depth-32 chain closes (doubling, not per-level) with the full closure") {
    import spark.implicits._
    val chain = (2L to 33L).map(i => (i, i - 1)).toDF("child", "parent")
    val c = Hierarchy.ancestorClosure(chain, "child", "parent")
    // node i has i-1 proper ancestors: sum over 33 nodes = 33*32/2
    assert(c.count() === 33L * 32 / 2)
    assert(c.filter(col("node") === 33L).count() === 32)
  }

  test("functional dependencies: keys hold, violations counted exactly") {
    import spark.implicits._
    val t = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"), (4L, "b", "x"))
      .toDF("id", "dep", "city")
    val fd = Discovery.functionalDependencies(t, Seq("id", "dep", "city"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(fd(("id", "dep")) === ((4L, 0L, true)), "id is a key")
    assert(fd(("id", "city")) === ((4L, 0L, true)))
    assert(fd(("dep", "id")) === ((2L, 2L, false)), "both dep groups split")
    assert(fd(("dep", "city")) === ((2L, 1L, false)), "a -> {x,y} violates")
    assert(fd(("city", "dep")) === ((2L, 1L, false)), "x -> {a,b} violates")
    assert(fd(("city", "id")) === ((2L, 1L, false)), "only x's group splits")
  }

  test("chi-square cells: exact marginals, integer expected, hand contribution") {
    import spark.implicits._
    val rows = Seq.fill(10)(("x", 0L)) ++ Seq.fill(20)(("x", 1L)) ++
      Seq.fill(30)(("y", 0L)) ++ Seq.fill(40)(("y", 1L))
    val df = rows.toDF("a", "b")
    val out = Stats.chiSquareCells(df, col("a"), col("b"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7)))).toMap
    // cell (x,0): o=10 rt=30 ct=40 n=100 → e = 12, d = 1000-1200 = -200
    assert(out(("x", 0L)) === ((10L, 30L, 40L, 100L, 12000000L, 200.0 * 200 / 120000)))
    assert(out(("y", 1L))._5 === 42000000L, "e(y,1) = 70*60/100 in micro")
    assert(out.size === 4)
  }

  test("roc auc: tie-corrected Mann-Whitney matches the hand pair count") {
    import spark.implicits._
    // pos scores {3,5}, neg {1,3}: pairs = 3 wins + 1 tie → AUC 3.5/4
    val df = Seq((3L, true), (5L, true), (1L, false), (3L, false))
      .toDF("s", "y")
    val r = Stats.rocAuc(df, col("s"), col("y")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 7L)))
    assert(r.getDouble(3) === 0.875)
    // perfect separation and perfect inversion bracket the scale
    val hi = Stats.rocAuc(Seq((9L, true), (1L, false)).toDF("s", "y"),
      col("s"), col("y")).collect().head
    assert(hi.getDouble(3) === 1.0)
    val lo = Stats.rocAuc(Seq((1L, true), (9L, false)).toDF("s", "y"),
      col("s"), col("y")).collect().head
    assert(lo.getDouble(3) === 0.0)
  }

  test("peak concurrency: overlap counts, touching sessions, midnight split") {
    import spark.implicits._
    // A: [1000,2000]; B: [1500,1500]; C: [2001,2001] — C starts the
    // second A releases (end+1 rule) so peak stays 2;
    // D: [86300,86500] spans midnight into day 1
    val ev = Seq((1L, 1000L), (1L, 2000L), (2L, 1500L), (3L, 2001L),
        (4L, 86300L), (4L, 86500L))
      .toDF("user_id", "ep")
      .withColumn("ts", timestamp_seconds(col("ep")))
    val out = Analytics.peakConcurrency(ev, "user_id", "ts", 1800)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) === ((4L, 2L)), s"day 0: A,B,C,D active, peak A+B: $out")
    assert(out(1L) === ((1L, 1L)), s"day 1: D's tail only: $out")
  }

  test("clamped balance: Lindley closed form equals the sequential recursion") {
    import spark.implicits._
    // A: [5,-10,3] → balances 5,0,3 (5 units lost to the clamp)
    // B: [-3,4]    → balances 0,4  (3 lost)
    val mv = Seq(("A", 1L, 5L), ("A", 2L, -10L), ("A", 3L, 3L),
        ("B", 1L, -3L), ("B", 2L, 4L))
      .toDF("sk", "t", "delta")
    val out = TimeSeries.clampedBalance(mv, "sk", "delta", Seq("t"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("A") === ((3L, 5L, 3L, 5L)), s"(n, peak, final, lost): $out")
    assert(out("B") === ((2L, 4L, 4L, 3L)), s"(n, peak, final, lost): $out")
    // cross-check against the literal per-row recursion on a longer
    // pseudo-random series
    val xs = (1L to 200L).map(i => (i, ((i * 2654435761L) % 21L) - 10L))
    val seq = xs.map(_._2).scanLeft(0L)((s, x) => math.max(0L, s + x)).drop(1)
    val df = xs.map { case (t, x) => ("S", t, x) }.toDF("sk", "t", "delta")
    val r = TimeSeries.clampedBalance(df, "sk", "delta", Seq("t")).collect().head
    assert(r.getLong(2) === seq.max, "peak equals the recursion's max")
    assert(r.getLong(3) === seq.last, "final equals the recursion's last")
  }
}
