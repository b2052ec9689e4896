package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Notification-latency metrics for the streaming paths (reference:
  * the MySQL datastore driver measures end-to-end notification
  * latency and reports percentiles over the observed deliveries,
  * datastore_driver/mysql/store.go:249-252; QueryMetrics covers data
  * transfer but none of the streaming paths exposed delivery latency
  * until now).
  *
  * Structured Streaming already emits everything needed in its
  * per-micro-batch progress events; this listener folds them into the
  * reference's shape:
  *
  *  - `triggerMs` — wall time to process the micro-batch (the cost of
  *    delivering one notification batch to subscribers);
  *  - `eventTimeLagMs` — batch completion wall-clock minus the
  *    batch's max event time: the true end-to-end notification
  *    latency from source-op timestamp to subscriber visibility
  *    (present when the query carries event time, i.e. a watermark);
  *  - percentiles over a bounded ring of recent batches — bounded
  *    because a long-lived 100 TB-scale subscription must not grow
  *    driver memory with uptime.
  *
  * Listener callbacks run on the listener bus thread while readers
  * poll from test/driver threads, hence the synchronized ring.
  */
object StreamingMetrics {

  final case class BatchLatency(batchId: Long, inputRows: Long,
                                triggerMs: Long, addBatchMs: Long,
                                eventTimeLagMs: Option[Long])

  /** `queryName`: the listener bus is SESSION-wide, so without a
    * filter two concurrent subscriptions would pollute each other's
    * rings (a fast stream's 10ms triggers averaged into a slow
    * stream's seconds). Name the subscription's query and pin the
    * tracker to it; None tracks everything (single-query sessions).
    */
  final class LatencyTracker(maxBatches: Int = 1024,
                             queryName: Option[String] = None)
      extends StreamingQueryListener {
    private val ring = new scala.collection.mutable.ArrayDeque[BatchLatency]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (queryName.exists(_ != p.name)) return
      def dur(k: String): Long =
        Option(p.durationMs.get(k)).map(_.longValue()).getOrElse(0L)
      // completion wall clock = batch-start timestamp + trigger duration
      val completedAt = java.time.Instant.parse(p.timestamp).toEpochMilli + dur("triggerExecution")
      val lag = Option(p.eventTime.get("max")).map { maxEt =>
        completedAt - java.time.Instant.parse(maxEt).toEpochMilli
      }
      val rec = BatchLatency(p.batchId, p.numInputRows,
        dur("triggerExecution"), dur("addBatch"), lag)
      ring.synchronized {
        ring.append(rec)
        while (ring.size > maxBatches) ring.removeHead()
      }
    }

    def batches: Seq[BatchLatency] = ring.synchronized(ring.toVector)

    /** Nearest-rank percentiles over the recorded batches' trigger
      * latencies (every batch) or end-to-end event-time lags (batches
      * that carried event time). Empty map until data flows.
      */
    def percentiles(ps: Seq[Double] = Seq(0.5, 0.9, 0.95, 0.99),
                    endToEnd: Boolean = false): Map[Double, Long] = {
      val xs = batches.flatMap(b =>
        if (endToEnd) b.eventTimeLagMs else Some(b.triggerMs)).sorted
      if (xs.isEmpty) Map.empty
      else ps.map { p =>
        val idx = math.min(xs.size - 1, math.max(0, math.ceil(p * xs.size).toInt - 1))
        p -> xs(idx)
      }.toMap
    }
  }

  /** Attach a tracker to the session's streaming listener bus. The
    * caller owns the lifecycle: `detach` when the subscription ends
    * (a leaked listener keeps accumulating every query's batches).
    */
  def attach(spark: SparkSession, maxBatches: Int = 1024,
             queryName: Option[String] = None): LatencyTracker = {
    val t = new LatencyTracker(maxBatches, queryName)
    spark.streams.addListener(t)
    t
  }

  def detach(spark: SparkSession, t: LatencyTracker): Unit =
    spark.streams.removeListener(t)
}
