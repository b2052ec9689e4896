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
    // sparse table (ADVICE r10): an UNOBSERVED cell still emits with
    // o=0 — its contribution (0−e)²/e = e is part of the statistic
    val sp = (Seq.fill(5)(("x", 0L)) ++ Seq.fill(5)(("y", 0L)) ++
      Seq.fill(5)(("y", 1L))).toDF("a", "b")
    val so = Stats.chiSquareCells(sp, col("a"), col("b"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7)))).toMap
    assert(so.size === 4, "full |A|*|B| spine")
    // (x,1): o=0 rt=5 ct=5 n=15 → e_micro = 25e6 div 15, contrib = 625/375
    assert(so(("x", 1L)) === ((0L, 5L, 5L, 15L, 1666666L, 625.0 / 375.0)))
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

  test("correlation matrix: exact sums, known correlations, NULL handling") {
    import spark.implicits._
    // y = 2x (corr 1), z = -x (corr -1), c constant (corr NULL);
    // one row with a NULL drops entirely (complete-case n = 4)
    val df = Seq(
      (1L, 2L, -1L, 7L), (2L, 4L, -2L, 7L), (3L, 6L, -3L, 7L),
      (4L, 8L, -4L, 7L)).toDF("x", "y", "z", "c")
      .unionByName(Seq((Some(9L), None: Option[Long], Some(1L), Some(7L)))
        .toDF("x", "y", "z", "c"))
    val out = Stats.correlationMatrix(df, Seq(
        "x" -> col("x"), "y" -> col("y"), "z" -> col("z"), "c" -> col("c")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size === 6)
    val xy = out(("x", "y"))
    assert(xy.getLong(2) === 4L, "complete-case n excludes the NULL row")
    assert(xy.getLong(3) === 10L && xy.getLong(4) === 20L, "exact sums")
    assert(xy.getLong(7) === 60L, "exact sum of products")
    assert(math.abs(xy.getDouble(8) - 1.0) < 1e-12, "y=2x correlates at 1")
    assert(math.abs(out(("x", "z")).getDouble(8) + 1.0) < 1e-12, "z=-x at -1")
    assert(out(("x", "c")).isNullAt(8), "constant column has NULL corr")
    assert(out(("y", "c")).isNullAt(8) && out(("z", "c")).isNullAt(8))
  }

  test("benford digits: exact counts, micro-constants sum to 1e6, exclusions") {
    import spark.implicits._
    // digits: 1,1,2,2,3,1,9 — 0.5, 0 and NULL excluded (no leading digit)
    val df = Seq(Some(1.0), Some(19.4), Some(2.0), Some(25.0), Some(3.9),
      Some(123.0), Some(9999.0), Some(0.5), Some(0.0), None).toDF("v")
    val out = Stats.benfordDigits(df, col("v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === (1L to 9L).toSet, "all nine digits always emit")
    assert(out(1L) === ((3L, 7L, 7L * 301030L, 3L * 1000000L - 7L * 301030L)))
    assert(out(2L) === ((2L, 7L, 7L * 176091L, 2L * 1000000L - 7L * 176091L)))
    assert(out(9L) === ((1L, 7L, 7L * 45757L, 1L * 1000000L - 7L * 45757L)))
    // an unobserved digit carries its full negative deviation
    assert(out(4L) === ((0L, 7L, 7L * 96910L, -7L * 96910L)))
    // empty input stays empty (no NULL-total spine rows)
    assert(Stats.benfordDigits(Seq(0.5, 0.0).toDF("v"), col("v")).count() === 0L)
    // the shipped micro-unit Benford table telescopes to exactly 1
    assert(Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L,
      51153L, 45757L).sum === 1000000L)
  }

  test("rolling actives: contribution expansion equals the sliding distinct") {
    import spark.implicits._
    // day0: u1,u2 (u1 twice); day1: u1; day3: u3 — day2 has no events
    val ev = Seq((1L, 100L), (1L, 200L), (2L, 300L), (1L, 86400L + 10L),
        (3L, 3L * 86400L + 10L))
      .toDF("user_id", "ep")
      .withColumn("ts", timestamp_seconds(col("ep")))
    val out = Analytics.rollingActives(ev, "user_id", "ts", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L), "full day spine incl. empty day 2")
    assert(out(0L) === ((2L, 2L)), "day 0: {u1,u2}")
    assert(out(1L) === ((1L, 2L)), "day 1 window {0,1}: {u1,u2}")
    assert(out(2L) === ((0L, 2L)), "empty day still rolls {u1,u2} from days 0-1")
    assert(out(3L) === ((1L, 2L)), "day 3 window {1,2,3}: {u1,u3}")
  }

  test("golden record: field majority, tie to smallest, NULL survives only alone") {
    import graft.operators.Dedup
    import spark.implicits._
    // docs 1,2,3 share identical text (one cluster); 4 distinct; 5 NULL text
    val docs = Seq(
      (1L, Option("alpha beta gamma delta epsilon zeta"), Option("en"), Option("s1")),
      (2L, Option("alpha beta gamma delta epsilon zeta"), Option("en"), None),
      (3L, Option("alpha beta gamma delta epsilon zeta"), Option("de"), Option("s2")),
      (4L, Option("omega psi chi phi upsilon tau"), Option("fr"), Option("s9")),
      (5L, None, None, None)
    ).toDF("doc_id", "text", "lang", "source")
    val out = Dedup.goldenRecord(docs, "doc_id", "text", Seq("lang", "source"),
        bands = 2, rowsPerBand = 4)
      .collect().map(r => r.getLong(1) -> r).toList
    val byN = out.toMap
    assert(out.map(_._1).sorted === List(1L, 1L, 3L), "one 3-cluster, two singletons")
    val big = byN(3L)
    assert(big.getString(2) === "en", "lang majority 2-1")
    assert(big.getString(3) === "s1", "source tie 1-1 breaks to the smaller value")
    val singles = out.filter(_._1 == 1L).map(_._2)
    assert(singles.exists(r => r.getString(2) == "fr" && r.getString(3) == "s9"))
    assert(singles.exists(r => r.isNullAt(2) && r.isNullAt(3)),
      "all-NULL cluster keeps NULL fields")
  }

  test("weighted shortest paths: hop bound, min-weight parallel collapse, frontier exactness") {
    import graft.operators.ShortestPaths
    import spark.implicits._
    // 1-2 (w1, plus a w7 parallel restated reversed), 2-3 (w1), 1-3 (w5):
    // best 1→3 is 2 via two hops, 5 within one hop
    val e = Seq((1L, 2L, 1L), (2L, 1L, 7L), (2L, 3L, 1L), (1L, 3L, 5L),
        (3L, 3L, 99L)) // self-loop dropped
      .toDF("s", "t", "w")
    val src = Seq(1L).toDF("id")
    val h1 = ShortestPaths.weightedHops(e, "s", "t", "w", src, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 === Map(1L -> 0L, 2L -> 1L, 3L -> 5L), s"one hop: direct only: $h1")
    val h3 = ShortestPaths.weightedHops(e, "s", "t", "w", src, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h3 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L), s"two hops beat direct: $h3")
    // unreachable island never appears
    val e2 = e.unionByName(Seq((8L, 9L, 1L)).toDF("s", "t", "w"))
    val r2 = ShortestPaths.weightedHops(e2, "s", "t", "w", src, maxHops = 5)
      .collect().map(_.getLong(0)).toSet
    assert(r2 === Set(1L, 2L, 3L))
  }

  test("proximity search: position pairs within window per term pair") {
    import graft.operators.Retrieval
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "c c c"))
      .toDF("doc_id", "text")
    // counts: a=3, b=2, c=3 → top-2 by (cnt desc, token): a, c; c never
    // meets a → pick nTerms=3 so (a,b) and (a,c)/(b,c) candidates exist
    val out = Retrieval.proximitySearch(docs, "doc_id", "text",
        nTerms = 3, window = 1, maxDfFrac = 1.0)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getLong(2)), r.getLong(3))).toMap
    assert(out === Map(("a", "b", 1L) -> 2L, ("a", "b", 2L) -> 1L),
      s"doc1: a@0,a@2 vs b@1 (2 pairs), doc2: b@0,a@1 (1): $out")
  }

  test("winsorized stats: discrete bounds, closed-form winsorized sum, hand check") {
    import spark.implicits._
    // A: 1..20 at (0.1, 0.9): kLo=2, kHi=18 → lo=2, hi=18;
    // trim = Σ2..18 = 170; wins = 170 + 1·2 + 2·18 = 208
    // B: ties at the boundary — [5,5,5,9]: kLo=1, kHi=4 → untrimmed
    val df = ((1L to 20L).map(("A", _)) ++ Seq(5L, 5L, 5L, 9L).map(("B", _)))
      .toDF("g", "v")
    val out = Stats.winsorizedStats(df, col("g"), col("v"), 1, 9, 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((20L, 2L, 18L)), "n, lo, hi")
    assert((a.getLong(4), a.getLong(5), a.getLong(6)) === ((17L, 170L, 208L)),
      "trim_n, trim_sum, wins_sum")
    assert(a.getDouble(8) === 208.0 / 20.0, "wins_mean one exact division")
    val manual = (1L to 20L).map(v => math.max(2L, math.min(18L, v))).sum
    assert(manual === 208L, "closed form equals the literal clip")
    val b = out("B")
    assert((b.getLong(2), b.getLong(3), b.getLong(5), b.getLong(6)) ===
      ((5L, 9L, 24L, 24L)), "full-range percentiles leave the group untouched")
    // the float-ceil trap (ADVICE r10): 7% of 100 must cut at rank 7 —
    // ceil(0.07 * 100) in double is ceil(7.000000000000001) = 8
    val c = (1L to 100L).map(("C", _)).toDF("g", "v")
    val cc = Stats.winsorizedStats(c, col("g"), col("v"), 7, 93, 100)
      .collect().head
    assert((cc.getLong(2), cc.getLong(3)) === ((7L, 93L)),
      s"integer ceil-div cutoffs, got (${cc.getLong(2)}, ${cc.getLong(3)})")
  }

  test("url canonicalization: case, www, port, fragment, utm, order, slash") {
    import graft.functions.UrlFunctions
    import spark.implicits._
    val in = Seq(
      "HTTPS://WWW.Example.COM:443/A/b/?b=2&a=1&utm_source=x#frag",
      "http://Host.com:80",
      "https://h.com/p?utm_a=1&utm_b=2",
      "host.com/no-scheme",
      null
    ).toDF("url")
    val out = in.select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toList
    assert(out(0) === "https://example.com/A/b?a=1&b=2",
      s"all seven rules at once: ${out(0)}")
    assert(out(1) === "http://host.com", "default port and empty path")
    assert(out(2) === "https://h.com/p", "all-utm query drops the '?' entirely")
    assert(out(3) === null, "no scheme → malformed → NULL")
    assert(out(4) === null, "NULL in, NULL out")
  }
}
