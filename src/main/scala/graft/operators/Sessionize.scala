package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (batch form; the
  * streaming form is Structured Streaming's session window /
  * flatMapGroupsWithState in graft.streaming).
  *
  * One shuffle on the key; session ids come from a running sum of
  * gap-break flags — no self-join, no driver loop.
  */
object Sessionize {

  /** Per-event session assignment: the input rows plus `__epoch` and
    * `session_id` — the shared first stage of [[sessions]] and the
    * funnel/path analyses that need the events themselves.
    *
    * NULL-key/NULL-timestamp rows are EXCLUDED (r12, fuzz-pinned): an
    * event with no owner can't belong to a session and an event with
    * no time can't be ordered into one — and engines disagree on where
    * NULLs sort (Spark windows default NULLS FIRST, DuckDB NULLS
    * LAST), so leaving them in makes every downstream session id
    * engine-dependent. Dirty rows belong in the q_quarantine path.
    */
  def assignSessions(df0: DataFrame, keyCol: String, tsCol: String,
                     gapSeconds: Long): DataFrame = {
    val df = df0.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val byTime = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val epoch = graft.functions.TimeFunctions.epochSec(col(tsCol))
    val prev = lag(epoch, 1).over(byTime)
    val isBreak = when(prev.isNull || epoch - prev > gapSeconds, 1).otherwise(0)
    df.withColumn("__epoch", epoch)
      .withColumn("__brk", isBreak)
      .withColumn("session_id", sum(col("__brk")).over(byTime))
  }

  /** Assign session ids per key where a gap > `gapSeconds` starts a new
    * session, then aggregate one row per session: event count, start /
    * end epoch seconds, duration.
    */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
               gapSeconds: Long): DataFrame = {
    assignSessions(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__epoch")).as("session_start"),
        max(col("__epoch")).as("session_end"),
        (max(col("__epoch")) - min(col("__epoch"))).as("duration_sec"))
  }

  /** Event-burst deduplication — the bot-double-fire / retry-storm
    * cleanup: within each composite key, events closer than
    * `gapSeconds` to their predecessor chain into one BURST, and the
    * burst reduces to its FIRST event plus a multiplicity count.
    * "Keep the first of each burst" sounds sequential (each kept event
    * re-anchors the window) but gap-chaining IS that recursion's
    * closed form: a burst ends exactly where a gap exceeds the
    * threshold, so one lag-compare + running-sum window and one
    * combinable aggregation produce the same kept set the row-by-row
    * scan would.
    *
    * Scale shape: one window per (composite key) ordered by time —
    * partitions are key-sized, never the global stream — then a
    * combinable (key, burst) aggregation. Output: keyCols…, burst_id,
    * first_epoch, n_in_burst (n − kept = rows a dedup would drop).
    */
  def burstDedup(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 gapSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty, "burstDedup needs at least one key column")
    val byTime = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val epoch = graft.functions.TimeFunctions.epochSec(col(tsCol))
    val prev = lag(epoch, 1).over(byTime)
    val isBreak = when(prev.isNull || epoch - prev > gapSeconds, 1L).otherwise(0L)
    df.filter(keyCols.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
      .withColumn("__epoch", epoch)
      .withColumn("burst_id", sum(isBreak).over(byTime))
      .groupBy(keyCols.map(col) :+ col("burst_id"): _*)
      .agg(min(col("__epoch")).as("first_epoch"),
        count(lit(1)).as("n_in_burst"))
  }
}
