package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpecBase {

  private def ev(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, s, t), i) => (u, s, t, i.toLong) }
      .toDF("user_id", "sec", "event_type", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
  }

  test("funnel: only strictly ordered first occurrences convert") {
    // u1: view -> click -> purchase (converts fully)
    // u2: click BEFORE first view — another click later does not help
    //     (first-occurrence semantics), so u2 stops at 'view'
    // u3: view then click in the SAME second — strictness rejects
    val df = ev(Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 100L, "click"), (2L, 200L, "view"), (2L, 300L, "click"),
      (3L, 100L, "view"), (3L, 100L, "click")))
    val out = Analytics.sessionFunnel(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).orderBy("step_no").collect()
    assert(out.map(r => (r.getString(1), r.getAs[Long]("n_sessions"))).toSeq ===
      Seq(("view", 3L), ("click", 1L), ("purchase", 1L)))
    assert(out.head.getAs[Double]("conv_pct") === 1.0)
    assert(out.last.getAs[Double]("conv_pct") === 1.0 / 3)
  }

  test("funnel: a session gap resets the chain") {
    // the view and the click are 2h apart — separate sessions, neither
    // session carries a full chain
    val df = ev(Seq((1L, 0L, "view"), (1L, 7200L, "click")))
    val out = Analytics.sessionFunnel(df, "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("step_no").collect()
    assert(out.map(_.getAs[Long]("n_sessions")).toSeq === Seq(1L, 0L),
      "cross-session order must not convert")
  }

  test("markov transitions: session-scoped pairs with per-from probabilities") {
    // u1 session: a->b->a (pairs a->b, b->a); u2 session: a->a; the
    // 2h gap in u2 splits sessions, so NO pair spans it
    val df = ev(Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "a"),
      (2L, 100L, "a"), (2L, 200L, "a"), (2L, 9000L, "b")))
    val out = Analytics.transitionMatrix(df, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(out === Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "a") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("cohort retention: offsets count distinct users against the cohort size") {
    val wk = 604800L
    // cohort week 0: users 1,2 — user 1 returns in weeks 1 and 2,
    // user 2 never returns. cohort week 1: user 3.
    val df = ev(Seq(
      (1L, 10L, "view"), (1L, wk + 5L, "view"), (1L, 2 * wk + 5L, "view"),
      (2L, 20L, "view"),
      (3L, wk + 30L, "view"), (3L, wk + 40L, "view")))
    val out = Analytics.cohortRetention(df, "user_id", "ts")
      .collect().map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("ret_pct"))).toMap
    assert(out((0L, 0L)) === ((2L, 1.0)))
    assert(out((0L, 1L)) === ((1L, 0.5)))
    assert(out((0L, 2L)) === ((1L, 0.5)))
    assert(out((1L, 0L)) === ((1L, 1.0)))
    assert(out.size === 4, "same-week repeat visits must not add rows")
  }
}
