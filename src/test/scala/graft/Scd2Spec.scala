package graft

import graft.operators.Scd2
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpecBase {

  private def changes(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("key", "sec", "eid", "attr")
      .withColumn("ts", timestamp_seconds(col("sec")))
  }

  test("scd2: collapses unchanged runs, versions changes, leaves the tail open") {
    // key 1: A A B A — the repeated A collapses; three versions
    // key 2: single event — one open version
    val df = changes(Seq(
      (1L, 100L, 1L, "A"), (1L, 200L, 2L, "A"),
      (1L, 300L, 3L, "B"), (1L, 400L, 4L, "A"),
      (2L, 100L, 5L, "X")))
    val out = Scd2.history(df, "key", "ts", "eid", Seq("attr"))
      .orderBy("key", "version").collect()
    val k1 = out.filter(_.getAs[Long]("key") == 1L)
      .map(r => (r.getAs[String]("attr"), r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
        r.getAs[Boolean]("is_current"), r.getAs[Long]("version")))
    assert(k1.toSeq === Seq(
      ("A", 100L, Some(300L), false, 1L),
      ("B", 300L, Some(400L), false, 2L),
      ("A", 400L, None, true, 3L)))
    val k2 = out.filter(_.getAs[Long]("key") == 2L)
    assert(k2.length === 1 && k2.head.getAs[Boolean]("is_current"))
  }

  test("scd2: same-timestamp changes order by the tie column") {
    val df = changes(Seq((1L, 100L, 2L, "B"), (1L, 100L, 1L, "A")))
    val out = Scd2.history(df, "key", "ts", "eid", Seq("attr"))
      .orderBy("version").collect()
    assert(out.map(_.getAs[String]("attr")).toSeq === Seq("A", "B"),
      "the lower event id is the earlier version")
    assert(out.map(_.getAs[Boolean]("is_current")).toSeq === Seq(false, true))
  }

  test("scd2: one exchange — both windows share the key partitioning") {
    val df = changes(Seq((1L, 100L, 1L, "A"), (1L, 200L, 2L, "B")))
    val plan = Scd2.history(df, "key", "ts", "eid", Seq("attr"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected a single key shuffle, got:\n$plan")
  }
}
