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
