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
    */
  def assignSessions(df: DataFrame, keyCol: String, tsCol: String,
                     gapSeconds: Long): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val epoch = unix_timestamp(col(tsCol))
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
}
