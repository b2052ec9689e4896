package graft

import graft.qpu._
import org.apache.spark.sql.functions._

class QpuSpec extends SparkSpecBase {

  test("filter predicates push down to the parquet scan") {
    val df = FilterQpu(DatastoreQpu(spark, sf(), "orders"),
      Seq(Eq("o_orderstatus", "F"), Range("o_totalprice", 1000.0, 20000.0))).toDF
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("o_orderstatus"), "EQ filter should reach the scan")
    assert(df.count() > 0)
  }

  test("projection prunes the read schema at the scan") {
    val df = DatastoreQpu(spark, sf(), "lineitem", Seq("l_orderkey", "l_quantity")).toDF
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("l_extendedprice"),
      "unprojected columns must not be read")
  }

  test("index point and range lookups match a manual filter") {
    val idx = IndexQpu(DatastoreQpu(spark, sf(), "lineitem"), "l_partkey")
    val manual = DatastoreQpu(spark, sf(), "lineitem").toDF
      .filter(col("l_partkey") === 1L).count()
    assert(idx.point(1L).count() === manual)
    val r = idx.range(10L, 20L)
    val vals = r.select("l_partkey").collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 10 && v < 20))
    assert(vals.sorted.sameElements(vals), "range lookup must be ordered")
  }

  test("topK plans as TakeOrderedAndProject (no global sort)") {
    val counts = DatastoreQpu(spark, sf(), "orders").toDF
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
    val top = IndexQpu(DataFrameQpu(counts), "cnt").topK(5, Seq("o_custkey"))
    assert(top.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    assert(top.count() === 5)
  }

  test("sum QPU equals a plain group-by sum") {
    val viaQpu = SumQpu(DatastoreQpu(spark, sf(), "events"), "value", "user_id").toDF
    val expected = Tables.load(spark, sf(), "events")
      .groupBy("user_id").agg(sum("value").as("value_sum"))
    assert(viaQpu.except(expected).isEmpty && expected.except(viaQpu).isEmpty)
  }

  test("join QPU with broadcastRight plans a broadcast hash join") {
    val j = JoinQpu(DatastoreQpu(spark, sf(), "orders"),
      DatastoreQpu(spark, sf(), "customer"),
      "o_custkey", "c_custkey", broadcastRight = true).toDF
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(j.count() > 0)
  }

  test("router union concatenates child results exactly") {
    val types = Seq("click", "view")
    val children = types.map(t =>
      FilterQpu(DatastoreQpu(spark, sf(), "events"), Seq(Eq("event_type", t))): Qpu)
    val routed = RouterQpu(children).toDF.count()
    val direct = Tables.load(spark, sf(), "events")
      .filter(col("event_type").isin(types: _*)).count()
    assert(routed === direct)
  }
}
