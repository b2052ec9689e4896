package graft

import graft.qpu._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class RoutedRouterSpec extends SparkSpecBase {

  private lazy val shards: (String, Seq[RoutedChild]) = {
    val tmp = Files.createTempDirectory("graft-shards").toString
    val events = Tables.load(spark, sf(), "events")
    val types = Seq("click", "purchase", "view")
    types.foreach(t => events.filter(col("event_type") === t)
      .write.mode("overwrite").parquet(s"$tmp/$t"))
    (tmp, types.map(t =>
      RoutedChild(Eq("event_type", t), FormatSourceQpu(spark, "parquet", s"$tmp/$t"))))
  }

  test("route(EQ) scans only the covering shard") {
    val (_, children) = shards
    val router = PartitionedRouterQpu(children)
    val routed = router.route(Eq("event_type", "click"))
    val expected = Tables.load(spark, sf(), "events")
      .filter(col("event_type") === "click").count()
    assert(routed.count() === expected)
    val plan = routed.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      "an EQ query covered by one shard must scan exactly that shard")
    // unrouted scatter reads every shard
    val full = router.toDF.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(full).size === 3)
  }

  test("routing comparisons are exact for big longs and binary-ordered for strings") {
    // doubleValue rounds 2^53+3 onto 2^53+4: float comparison would
    // falsely prune the only covering shard (nanosecond timestamps and
    // snowflake ids live up here)
    val ub = 9007199254740996L
    val v = 9007199254740995L
    assert(Predicates.mayIntersect(Range("id", 0L, ub), Eq("id", v)),
      "value strictly inside the range must not be pruned by double rounding")
    assert(!Predicates.mayIntersect(Range("id", 0L, ub), Eq("id", ub)),
      "half-open upper bound stays exclusive")
    // Spark orders strings by UTF-8 bytes: U+1F600 (4-byte) sorts AFTER
    // U+FFFD (3-byte); Java's UTF-16 compareTo says the opposite
    assert(Predicates.mayIntersect(Range("s", "", "😀"), Eq("s", "�")),
      "UTF-8 binary order must keep the shard that holds the record")
  }

  test("range coverage prunes time/value-sharded children") {
    import spark.implicits._
    val a = Seq((1L, 50.0), (2L, 80.0)).toDF("id", "v")
    val b = Seq((3L, 150.0), (4L, 180.0)).toDF("id", "v")
    val c = Seq((5L, 950.0)).toDF("id", "v")
    val router = PartitionedRouterQpu(Seq(
      RoutedChild(Range("v", 0.0, 100.0), DataFrameQpu(a)),
      RoutedChild(Range("v", 100.0, 900.0), DataFrameQpu(b)),
      RoutedChild(Range("v", 900.0, 1e6), DataFrameQpu(c))))
    val hit = router.route(Range("v", 150.0, 200.0))
      .collect().map(_.getLong(0)).toSet
    assert(hit === Set(3L, 4L), "only the covering shard's matches")
    // provably-empty route keeps the schema and returns nothing
    assert(router.route(Eq("v", -5.0)).count() === 0)
    // undecidable predicates (different attribute) keep every child
    val all = router.route(IsNotNull("id")).count()
    assert(all === 5)
  }
}
