package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpecBase {

  test("resample: gap days are synthesized and carry the previous day-end value") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 09:00:00", 7L, 10.0),
      (1L, "2024-01-01 17:00:00", 8L, 20.0), // day-end value for Jan 1
      (1L, "2024-01-04 12:00:00", 9L, 40.0)  // Jan 2-3 are gaps
    ).toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = TimeSeries.resampleDailyFfill(ev, "user_id", "ts", "event_id", "value")
      .orderBy("day_no").collect()
      .map(r => (r.getAs[Int]("day_no"), r.getAs[Double]("value_ffill"),
        r.getAs[Boolean]("is_gap")))
    assert(out.toSeq === Seq((0, 20.0, false), (1, 20.0, true),
      (2, 20.0, true), (3, 40.0, false)),
      "grid spans first..last day; gaps forward-fill the last day-end value")
  }

  test("resample: ts ties on a day resolve by event id, per entity independently") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-02 12:00:00", 5L, 1.0),
      (1L, "2024-01-02 12:00:00", 6L, 2.0), // same ts — higher id wins
      (2L, "2024-01-03 12:00:00", 7L, 9.0)
    ).toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = TimeSeries.resampleDailyFfill(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getAs[Long]("entity_id"), r.getAs[Int]("day_no"),
        r.getAs[Double]("value_ffill"))).toSet
    assert(out === Set((1L, 1, 2.0), (2L, 2, 9.0)),
      "deterministic day-end pick; single-day entities get a single-row grid")
  }
}
