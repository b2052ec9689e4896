package graft

import org.apache.spark.sql.functions._

class QueryMetricsSpec extends SparkSpecBase {

  test("profile reports source reads for a scan and shuffle volume for an agg") {
    val events = Tables.load(spark, sf(), "events")
    val (n, scanStats) = QueryMetrics.profile(spark) {
      events.select("event_id").count()
    }
    assert(n > 0)
    assert(scanStats.recordsRead >= n, "every output row was read from the source")
    assert(scanStats.bytesRead > 0)
    assert(scanStats.wallMs >= 0)

    val (_, aggStats) = QueryMetrics.profile(spark) {
      events.groupBy("user_id").agg(sum("value")).count()
    }
    assert(aggStats.shuffleBytesWritten > 0,
      "a group-by must show its shuffle volume (the reference's measureDataTransfer)")
    assert(aggStats.shuffleBytesRead > 0)
  }

  test("notification latency: per-micro-batch trigger and end-to-end percentiles") {
    import graft.streaming.{StreamingMetrics, Subscribe}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // pinned to this query's name: other specs' streams on the shared
    // session must not leak into the ring
    val tracker = StreamingMetrics.attach(spark, queryName = Some("lat_sums"))
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    // a watermark puts event time into the progress events, which is
    // what end-to-end (source-op ts -> subscriber visibility) needs
    val sums = Subscribe.windowedSum(input.toDF().toDF("ts", "user_id", "value"),
      "ts", "user_id", "value", "1 hour", "2 hours")
    val q = sums.writeStream.format("memory").queryName("lat_sums")
      .outputMode("update").start()
    try {
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      // recent event times so the computed lag is positive and sane
      val base = System.currentTimeMillis() - 5000
      input.addData((ts(base), 1L, 2.0), (ts(base + 100), 2L, 3.0))
      q.processAllAvailable()
      input.addData((ts(base + 200), 1L, 4.0))
      q.processAllAvailable()
      val withRows = tracker.batches.filter(_.inputRows > 0)
      assert(withRows.size >= 2, s"expected >=2 data batches, got ${tracker.batches}")
      assert(withRows.forall(_.triggerMs > 0), "every batch carries its trigger wall time")
      val trig = tracker.percentiles(Seq(0.5, 0.99))
      assert(trig.keySet === Set(0.5, 0.99) && trig(0.5) <= trig(0.99),
        s"trigger percentiles must be ordered: $trig")
      // end-to-end: completion minus max event time — positive (events
      // were stamped in the past) and bounded by test wall time
      val e2e = withRows.flatMap(_.eventTimeLagMs)
      assert(e2e.nonEmpty, "watermarked batches must carry event-time lag")
      assert(e2e.forall(l => l > 0 && l < 600000), s"lag out of range: $e2e")
      assert(tracker.percentiles(Seq(0.5), endToEnd = true).nonEmpty)
    } finally {
      q.stop()
      StreamingMetrics.detach(spark, tracker)
    }
  }
}
