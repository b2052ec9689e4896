package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The 100-TB co-location story: fact-fact joins (orders ⋈ lineitem)
  * shuffle both sides every query unless the tables are bucketed on the
  * join key. Bucketed writes pay the shuffle once at ingest; every
  * subsequent join is shuffle-free on that key.
  */
class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed orders ⋈ lineitem plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-wh").toString
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Tables.load(spark, sf(), "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.load(spark, sf(), "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    // force the shuffle-join path (at this toy scale AQE would just
    // broadcast, which hides what bucketing buys at fact-fact scale)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"))

      val expected = Tables.load(spark, sf(), "orders")
        .join(Tables.load(spark, sf(), "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
