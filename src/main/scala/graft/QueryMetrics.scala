package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query execution metrics (reference: internal/metrics.go +
  * the per-connection `measureDataTransfer` flag in the QPU configs —
  * the reference reports response time and bytes moved per query).
  *
  * Spark's task metrics already carry all of it; this wraps one query
  * execution in a listener and reports wall time, records/bytes read
  * from sources, and shuffle volume — the numbers that tell you
  * whether a plan change actually reduced data movement.
  *
  * Scoped to ONE query at a time: the listener sums every task that
  * finishes while `body` runs, so concurrent queries on the same
  * session would pollute the numbers (document/serialize usage, or
  * use the Spark UI's per-SQL-execution metrics for multi-tenant
  * sessions).
  */
object QueryMetrics {

  final case class QueryStats(wallMs: Long, recordsRead: Long, bytesRead: Long,
                              shuffleBytesWritten: Long, shuffleBytesRead: Long)

  def profile[T](spark: SparkSession)(body: => T): (T, QueryStats) = {
    val records = new AtomicLong; val bytes = new AtomicLong
    val shufW = new AtomicLong; val shufR = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          records.addAndGet(m.inputMetrics.recordsRead)
          bytes.addAndGet(m.inputMetrics.bytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      val result = body
      // listener events are delivered asynchronously; drain the bus so
      // the last tasks' metrics are counted
      org.apache.spark.graftbridge.CoreBridge.drainListenerBus(spark.sparkContext)
      ((result, QueryStats((System.nanoTime() - t0) / 1000000,
        records.get(), bytes.get(), shufW.get(), shufR.get())))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
