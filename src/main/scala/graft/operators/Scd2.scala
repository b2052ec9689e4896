package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: turn a stream of
  * keyed change events into versioned validity intervals — the batch
  * complement of the engine's versioned reads (snapshot-as-of,
  * version-diff) and the standard way a warehouse materializes a CDC
  * tail into a queryable dimension.
  *
  * Scale shape: ONE shuffle on the dimension key; both windows (the
  * change-collapse lag and the interval lead/version number) share the
  * same partitioning AND sort order, so Catalyst plans a single
  * exchange + sort and the second window rides the first's order.
  * Per-key frames are version-count-sized, never corpus-sized.
  */
object Scd2 {

  /** Build the SCD-2 history of `attrCols` keyed by `keyCol`, change
    * times from `tsCol` (epoch seconds) tie-broken by `tieCol` (a
    * unique event id — required so same-timestamp changes order
    * deterministically). Consecutive events whose attributes are
    * unchanged are collapsed (only a CHANGE opens a version). Output:
    * key, attrs, `valid_from`/`valid_to` epoch-second interval
    * (`valid_to` NULL on the open version), `is_current`, and the
    * per-key `version` number from 1.
    */
  def history(changes: DataFrame, keyCol: String, tsCol: String,
              tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "SCD-2 needs at least one tracked attribute")
    // NULL ts/tie rows can't be versioned (engines NULL-sort
    // differently) and a NULL tracked attribute makes the
    // change-detection comparison three-valued — all excluded
    // (fuzz r12); dirty rows belong in the quarantine path
    val clean = (Seq(tsCol, tieCol) ++ attrCols).map(col(_).isNotNull).reduce(_ && _)
    val order = Seq(graft.functions.TimeFunctions.epochSec(col(tsCol)).as("__ep"), col(tieCol).as("__tie"))
    val attrs = struct(attrCols.map(col): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ep"), col("__tie"))
    val collapsed = changes.filter(clean)
      .select(col(keyCol) +: (order ++ attrCols.map(col)): _*)
      .withColumn("__prev", lag(attrs, 1).over(w))
      // first event per key (lag NULL) always opens version 1
      .filter(col("__prev").isNull || col("__prev") =!= attrs)
    collapsed
      .withColumn("valid_from", col("__ep"))
      .withColumn("valid_to", lead(col("__ep"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("version", row_number().over(w).cast("long"))
      .drop("__ep", "__tie", "__prev")
  }
}
