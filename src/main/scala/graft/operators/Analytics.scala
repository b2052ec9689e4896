package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams: ordered funnel conversion
  * within sessions and cohort retention — the two queries every
  * product-analytics engine is asked for first.
  *
  * Scale story: both reduce the event stream with ONE map-side-
  * combinable aggregation on its natural key ((user, session) /
  * user) before anything else; every later stage runs on
  * session- or cohort-sized frames. Conversion and retention
  * fractions are single IEEE divisions of exact integer counts —
  * engine-deterministic.
  */
object Analytics {

  /** Ordered funnel: for each prefix of `steps`, the number of
    * sessions whose first occurrences of the step events appear in
    * strictly increasing time order (`min ts(step_0) < min ts(step_1)
    * < ...`). Output: (step_no, step, n_sessions, conv_pct) with
    * conv_pct relative to the step-0 count.
    *
    * Semantics: first-occurrence ordering (the standard funnel), so a
    * click before the first view does NOT convert even if another
    * click follows; same-second first occurrences (ties at epoch
    * resolution) do not convert either — strictness keeps both
    * engines exact.
    */
  def sessionFunnel(events: DataFrame, keyCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String],
                    gapSeconds: Long = 1800): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    val stepMins = steps.map(st =>
      min(when(col(typeCol) === st, col("__epoch"))).as(s"t_$st"))
    val sessions = Sessionize.assignSessions(events, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(stepMins.head, stepMins.tail: _*)
    val reached = steps.indices.map { i =>
      // strictly increasing chain over the first i+1 steps
      val chain = (0 until i).map(j =>
        col(s"t_${steps(j)}") < col(s"t_${steps(j + 1)}"))
        .foldLeft(col(s"t_${steps.head}").isNotNull)(_ && _)
      sum(when(chain, 1L).otherwise(0L)).as(s"n_$i")
    }
    val counts = sessions.agg(reached.head, reached.tail: _*)
    import spark.implicits._
    val stepDf = steps.zipWithIndex
      .map { case (st, i) => (i.toLong, st) }.toDF("step_no", "step")
    stepDf.crossJoin(broadcast(counts))
      .select(col("step_no"), col("step"),
        steps.indices.map(i => when(col("step_no") === i, col(s"n_$i")))
          .reduce(coalesce(_, _)).as("n_sessions"),
        steps.indices.map(i =>
          when(col("step_no") === i, col(s"n_$i") / col("n_0")))
          .reduce(coalesce(_, _)).as("conv_pct"))
  }

  /** Next-event Markov transition matrix: within each session the
    * ordered (event, next event) pairs, counted, with the conditional
    * probability P(to | from). The classic "where do users go next"
    * path analysis, and the model behind Markov-chain attribution.
    *
    * Scale shape: the only window is per-(key, session) event order —
    * partitioned on the stream's natural key; pair counts are one
    * combinable aggregation on (from, to) (cardinality = |types|²);
    * the per-from totals table is |types| rows and broadcasts.
    * Ordering is deterministic because the window sorts on the full
    * microsecond timestamp (unique per user in the event stream), not
    * the second-floored session epoch.
    */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, gapSeconds: Long = 1800): DataFrame = {
    val sess = Sessionize.assignSessions(events, keyCol, tsCol, gapSeconds)
    val w = Window.partitionBy(col(keyCol), col("session_id")).orderBy(col(tsCol))
    val counts = sess
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum("n").as("__tot"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n") / col("__tot")).as("p"))
  }

  /** Weekly cohort retention: users cohorted by the epoch-week of
    * their first event; one row per (cohort_week, week_offset) with
    * the distinct users active that week and the retained fraction of
    * the cohort (offset 0 is the cohort size itself, ret_pct 1.0).
    */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val weeks = events.select(col(keyCol).as("u"),
      floor(unix_timestamp(col(tsCol)) / lit(604800L)).as("wk"))
    val cohorts = weeks.groupBy("u").agg(min("wk").as("cohort_week"))
    val active = weeks.join(cohorts, "u")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("u").as("n_users"))
    val sizes = cohorts.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    active.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        (col("n_users") / col("cohort_size")).as("ret_pct"))
  }
}
