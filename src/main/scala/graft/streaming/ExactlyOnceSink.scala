package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once batch output from an at-least-once stream: Structured
  * Streaming's `foreachBatch` re-delivers a micro-batch after recovery
  * (same epochId, same data), so a sink that APPENDS duplicates on
  * retry breaks downstream exactness. The classic fix is an
  * EPOCH-IDEMPOTENT write: each batch overwrites its own
  * `epoch=<id>` directory, so re-delivery of an epoch replaces
  * identical output instead of duplicating it — at-least-once
  * delivery + idempotent write = exactly-once visible output. The
  * epoch column doubles as a partition key, so readers prune by epoch
  * like any hive-partitioned layout.
  *
  * (The same contract the reference's materialized-view sinks need
  * when a notification stream replays after a crash; the streaming
  * materialized-view row's memory sink sidesteps it only because it
  * is in-memory.)
  */
object ExactlyOnceSink {

  /** The function to hand to `writeStream.foreachBatch`. */
  def epochWriter(path: String): (DataFrame, Long) => Unit =
    (batch, epochId) =>
      batch.write.mode("overwrite").parquet(s"$path/epoch=$epochId")

  /** Read everything delivered so far (partition-discovers the epoch
    * dirs; `epoch` surfaces as a column).
    */
  def readAll(spark: SparkSession, path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)
}
