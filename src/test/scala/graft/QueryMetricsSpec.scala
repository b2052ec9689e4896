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
}
