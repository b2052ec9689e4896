package graft

import org.apache.spark.sql.functions._

/** Round-14 unit pins: the guarded-BIGINT narrowing's RAISE branch
  * (designed never to fire below ~4.3e9 rows, so no registry query
  * can execute it — r13 verdict #7), the Friedman same-treatment-SET
  * completeness guard (equal-sized blocks over different treatment
  * subsets — the r13 ADVICE hole), and the HITS decimal-normalization
  * exactness past the old int64 wrap point.
  */
class Round14Spec extends SparkSpecBase {

  test("guardedLong raises its named error instead of wrapping past 2^63") {
    import spark.implicits._
    // 2^63 exactly — one ulp past Long.MaxValue; a bare cast would
    // wrap (non-ANSI) or throw a generic ArithmeticException (ANSI),
    // the guard must fail with the OPERATOR'S name instead
    val df = Seq("9223372036854775808", "42")
      .toDF("s").select(col("s").cast("decimal(38,0)").as("c_pairs"))
    val ex = intercept[Exception] {
      df.select(operators.Stats.guardedLong("c_pairs", "kendallTau")).collect()
    }
    assert(ex.getMessage.contains("graft.kendallTau") &&
      ex.getMessage.contains("overflows BIGINT"),
      s"expected the named overflow error, got: ${ex.getMessage}")
  }

  test("guardedLong narrows exactly at the int64 boundary") {
    import spark.implicits._
    // Long.MaxValue itself must PASS (the guard is strict-greater)
    val df = Seq("9223372036854775807", "0", "17")
      .toDF("s").select(col("s").cast("decimal(38,0)").as("ties_x"))
    val out = df.select(operators.Stats.guardedLong("ties_x", "wilcoxon"))
      .as[Long].collect().sorted
    assert(out.toList === List(0L, 17L, Long.MaxValue))
  }

  test("friedmanTest rejects equal-sized blocks over DIFFERENT treatment sets") {
    import spark.implicits._
    // b1={a,b}, b2={b,c}: uniform size 2, no duplicates — the r13
    // guard passed this and mixed incomparable rank sums; the r14
    // guard pins global distinct treatments == per-block count
    val skewed = Seq((1L, "a", 3L), (1L, "b", 5L),
      (2L, "b", 2L), (2L, "c", 4L)).toDF("b", "j", "v")
    val ex = intercept[Exception] {
      operators.Stats.friedmanTest(skewed, col("b"), col("j"), col("v"))
        .collect()
    }
    assert(ex.getMessage.contains("graft.friedmanTest"),
      s"expected the named completeness error, got: ${ex.getMessage}")
  }

  test("jonckheereTerpstra recovers the textbook dominance count") {
    import spark.implicits._
    // groups a={1,2}, b={3,4}, c={5,6} in the hypothesized order:
    // every cross-group pair is strictly increasing -> J = 4+4+4 = 12,
    // j2 = 24; E[J] = (36 - 12)/4 = 6
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).toDF("g", "v")
    val r = operators.Stats.jonckheereTerpstra(df, col("g"), col("v"))
      .select("k_groups", "n", "j2", "e_j").as[(Long, Long, Long, Double)]
      .collect().head
    assert(r === ((3L, 6L, 24L, 6.0)))
  }

  test("cliffsDelta is +1 on complete dominance and 0 on identical arms") {
    import spark.implicits._
    val dom = Seq((true, 10L), (true, 11L), (false, 1L), (false, 2L))
      .toDF("arm", "v")
    val d1 = operators.Stats.cliffsDelta(dom, col("arm"), col("v"))
      .select("delta").as[Double].collect().head
    assert(d1 === 1.0)
    val same = Seq((true, 5L), (true, 7L), (false, 5L), (false, 7L))
      .toDF("arm", "v")
    val d0 = operators.Stats.cliffsDelta(same, col("arm"), col("v"))
      .select("delta").as[Double].collect().head
    assert(d0 === 0.0)
  }

  test("gumbelBlockMaxima reports NULL fit below 2 blocks or zero variance") {
    import spark.implicits._
    // one series with constant weekly maxima (zero variance), one with
    // a single block: both must emit rows with NULL beta/mu/r52
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(day: Int) = new java.sql.Timestamp(ts.getTime + day * 86400000L)
    val events = (0 until 28).map(d => ("flat", at(d))) ++ Seq(("single", at(0)))
    val out = operators.TimeSeries.gumbelBlockMaxima(
        events.toDF("event_type", "ts"), "event_type", "ts")
      .select("series", "beta").collect()
      .map(r => (r.getString(0), r.isNullAt(1))).toMap
    assert(out === Map("flat" -> true, "single" -> true))
  }

  test("quotaRebalance keeps whole small groups and exact quotas on large ones") {
    import spark.implicits._
    // 3 groups of sizes 6/3/3 -> quota = 12/3 = 4: big group keeps 4,
    // small groups keep everything; kept_id_sum pins the selection
    val rows = (1L to 6L).map(i => ("big", i)) ++
      (7L to 9L).map(i => ("s1", i)) ++ (10L to 12L).map(i => ("s2", i))
    val out = operators.Sampling.quotaRebalance(
        rows.toDF("source", "doc_id"), "source", "doc_id", seed = 3)
      .select("g", "n_before", "quota", "n_kept")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out === Set(("big", 6L, 4L, 4L), ("s1", 3L, 4L, 3L),
      ("s2", 3L, 4L, 3L)))
  }

  test("hits normalization is exact past the old int64 wrap point") {
    import spark.implicits._
    // one authority with in-degree large enough that sum(h)·10⁶ would
    // overflow int64 if multiplied before widening: sum(h) = d·10⁶,
    // d = 10_000 gives a·10⁶ = 10¹⁶ — safe; the wrap class needs
    // a > ~9.2e12, unreachable in-memory, so pin the FORMULA instead:
    // hub scores all equal ⇒ every auth score = (a·10⁶) div amax with
    // a = amax ⇒ exactly 10⁶, and the decimal path must agree
    val d = 1000
    val edges = (1 to d).map(i => (i.toLong, 0L)) :+ (0L, 999999L)
    val out = operators.GraphMetrics.hits(
        edges.toDF("src", "dst"), "src", "dst", iters = 1)
      .filter(col("node_id") === 0L)
      .select("auth_micro").as[Long].collect()
    assert(out.toList === List(1000000L),
      s"the max-degree authority must normalize to exactly 10^6, got $out")
  }
}
