package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-as-of semantics (reference: internal/libqpu — the
  * SnapshotTimePredicate bounds on every query select which version of
  * the state a snapshot reads; the reference tracks versions with
  * vector clocks per record).
  *
  * Batch re-expression: the "state" is an event log; the snapshot as of
  * time T is the latest record per key with event time <= T. One
  * shuffle on the key; the time filter pushes to the scan so later
  * snapshots don't rescan the future.
  */
object AsOf {

  /** Latest row per `key` with `timeCol <= asOf`. `tiebreak` makes the
    * winner deterministic when event times collide.
    */
  def snapshotAsOf(df: DataFrame, timeCol: String, asOf: Column,
                   key: Seq[String], tiebreak: Seq[String]): DataFrame = {
    val order = (col(timeCol).desc +: tiebreak.map(col(_).desc))
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.filter(col(timeCol) <= asOf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
