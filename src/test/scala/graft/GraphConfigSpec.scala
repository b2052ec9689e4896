package graft

import graft.qpu.GraphConfig
import org.apache.spark.sql.functions._

class GraphConfigSpec extends SparkSpecBase {

  test("flagship graph deployed from config matches the programmatic graph") {
    val fromConfig = GraphConfig.fromResource(spark, "/graft/flagship.json", sf())
      .toDF.collect().map(_.toSeq)
    val programmatic = Queries.asMap("q_graph_flagship").build(spark, sf())
      .collect().map(_.toSeq)
    assert(fromConfig.length === 20)
    assert(fromConfig.toSeq === programmatic.toSeq)
  }

  test("filter + router + cache operators assemble from json") {
    val json = """{
      "root": "routed",
      "qpus": {
        "events": {"operator": "datastore", "table": "events"},
        "clicks": {"operator": "filter", "children": ["events"],
          "predicates": [{"op": "eq", "attr": "event_type", "value": "click"}]},
        "purchases": {"operator": "filter", "children": ["events"],
          "predicates": [{"op": "eq", "attr": "event_type", "value": "purchase"},
                         {"op": "range", "attr": "value", "lb": 0.0, "ub": 1000000.0}]},
        "routed": {"operator": "router", "children": ["clicks", "purchases"],
          "projection": ["event_id", "event_type", "value"]}
      }
    }"""
    val df = GraphConfig.fromJson(spark, json, sf()).toDF
    val types = df.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types === Set("click", "purchase"))
    // both children filter the same datastore source → single merged scan
    val plan = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size === 1)
  }

  test("index range + point lookups assemble from json") {
    val json = """{
      "root": "probe",
      "qpus": {
        "orders": {"operator": "datastore", "table": "orders"},
        "probe": {"operator": "index", "children": ["orders"],
          "attribute": "o_totalprice", "lbound": 1000.0, "ubound": 20000.0,
          "projection": ["o_orderkey", "o_totalprice"]}
      }
    }"""
    val got = GraphConfig.fromJson(spark, json, sf()).toDF
    val want = Queries.asMap("q_index_range").build(spark, sf())
    assert(got.collect().map(_.toSeq).toSeq === want.collect().map(_.toSeq).toSeq)
  }

  test("routed router assembles from json and answers like the direct filter") {
    val json = """{
      "root": "routed",
      "qpus": {
        "events": {"operator": "datastore", "table": "events"},
        "clicks": {"operator": "filter", "children": ["events"],
          "predicates": [{"op": "eq", "attr": "event_type", "value": "click"}]},
        "views": {"operator": "filter", "children": ["events"],
          "predicates": [{"op": "eq", "attr": "event_type", "value": "view"}]},
        "routed": {"operator": "routed_router", "children": ["clicks", "views"],
          "coverages": [{"op": "eq", "attr": "event_type", "value": "click"},
                        {"op": "eq", "attr": "event_type", "value": "view"}],
          "route": {"op": "eq", "attr": "event_type", "value": "view"}}
      }
    }"""
    val got = GraphConfig.fromJson(spark, json, sf()).toDF.count()
    val want = Tables.load(spark, sf(), "events")
      .filter(col("event_type") === "view").count()
    assert(got === want)
  }

  test("malformed configs fail fast with a useful message") {
    val cycle = """{"root": "a", "qpus": {
      "a": {"operator": "cache", "children": ["b"]},
      "b": {"operator": "cache", "children": ["a"]}}}"""
    val e1 = intercept[IllegalArgumentException](
      GraphConfig.fromJson(spark, cycle, sf()))
    assert(e1.getMessage.contains("cycle"))
    val unknown = """{"root": "x", "qpus": {"x": {"operator": "teleport"}}}"""
    val e2 = intercept[IllegalArgumentException](
      GraphConfig.fromJson(spark, unknown, sf()))
    assert(e2.getMessage.contains("teleport"))
  }

  test("index node: ubound without lbound and explicit-null params are named errors") {
    val uboundOnly = """{"root": "i", "qpus": {
      "d": {"operator": "datastore", "table": "orders"},
      "i": {"operator": "index", "children": ["d"],
            "attribute": "o_totalprice", "ubound": 100.0}}}"""
    val e1 = intercept[IllegalArgumentException](
      GraphConfig.fromJson(spark, uboundOnly, sf()))
    assert(e1.getMessage.contains("ubound") && e1.getMessage.contains("lbound"),
      s"got: ${e1.getMessage}")
    val nullTopk = """{"root": "i", "qpus": {
      "d": {"operator": "datastore", "table": "orders"},
      "i": {"operator": "index", "children": ["d"],
            "attribute": "o_totalprice", "topk": null}}}"""
    val e2 = intercept[IllegalArgumentException](
      GraphConfig.fromJson(spark, nullTopk, sf()))
    assert(e2.getMessage.contains("topk"), s"got: ${e2.getMessage}")
  }

  test("missing param VALUES fail with the named error, not an NPE") {
    // an 'eq' without 'value'
    val eqNoValue = """{"root": "f", "qpus": {
      "d": {"operator": "datastore", "table": "customer"},
      "f": {"operator": "filter", "children": ["d"],
            "predicates": [{"op": "eq", "attr": "c_nationkey"}]}}}"""
    val e1 = intercept[IllegalArgumentException](
      GraphConfig.fromJson(spark, eqNoValue, sf()))
    assert(e1.getMessage.contains("value"))
    // a 'range' without 'lb'
    val rangeNoLb = """{"root": "f", "qpus": {
      "d": {"operator": "datastore", "table": "customer"},
      "f": {"operator": "filter", "children": ["d"],
            "predicates": [{"op": "range", "attr": "c_acctbal", "ub": 10}]}}}"""
    val e2 = intercept[IllegalArgumentException](
      GraphConfig.fromJson(spark, rangeNoLb, sf()))
    assert(e2.getMessage.contains("lb"))
    // a 'sum' aggregate without 'attribute'
    val sumNoAttr = """{"root": "a", "qpus": {
      "d": {"operator": "datastore", "table": "customer"},
      "a": {"operator": "aggregation", "children": ["d"],
            "groupBy": ["c_nationkey"],
            "aggregates": [{"function": "sum", "as": "s"}]}}}"""
    val e3 = intercept[IllegalArgumentException](
      GraphConfig.fromJson(spark, sumNoAttr, sf()))
    assert(e3.getMessage.contains("attribute"))
  }

  test("objectstore + changelog drivers assemble from json like any other operator") {
    import graft.sources.ObjectStore
    import org.apache.spark.sql.functions._
    // a bucket of two objects, then a graph that filters + aggregates it
    val bucket = java.nio.file.Files.createTempDirectory("graft-cfg-bucket").toString
    val nation = Tables.load(spark, sf(), "nation")
    ObjectStore.put(spark, bucket, "a.parquet", nation.filter(col("n_nationkey") < 10))
    ObjectStore.put(spark, bucket, "b.parquet", nation.filter(col("n_nationkey") >= 10))
    val bucketCfg = s"""{"root": "agg", "qpus": {
      "store": {"operator": "objectstore", "bucket": "$bucket"},
      "agg": {"operator": "aggregation", "children": ["store"],
              "groupBy": ["n_regionkey"],
              "aggregates": [{"function": "count", "as": "n"}]}}}"""
    val got = GraphConfig.fromJson(spark, bucketCfg, sf()).toDF.collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val want = nation.groupBy("n_regionkey").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(got === want, "objectstore node must read the committed objects")

    // a changelog file, then a graph that projects + sums it
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-cdc")
    def env(op: String, ts: Long, id: Long, v: Double): String =
      s"""{"payload":{"op":"$op","ts_ms":$ts,"source":{"table":"orders"},
         |"after":{"id":"$id","value":"$v"}}}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(dir.resolve("log.jsonl"),
      Seq(env("r", 1, 1, 2.5), env("c", 2, 2, 4.0), env("u", 3, 1, 1.5))
        .mkString("", "\n", "\n"))
    val cdcCfg = s"""{"root": "agg", "qpus": {
      "log": {"operator": "changelog", "path": "$dir", "keyField": "id",
              "table": "orders", "columns": {"value": "double"}},
      "agg": {"operator": "aggregation", "children": ["log"],
              "groupBy": ["key"],
              "aggregates": [{"function": "sum", "as": "v", "attribute": "value"}]}}}"""
    val sums = GraphConfig.fromJson(spark, cdcCfg, sf()).toDF.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sums === Map(1L -> 4.0, 2L -> 4.0),
      "changelog node must replay the envelope stream as typed rows")
  }

  test("objectstore subscribe node: streaming aggregation over arrivals, schema from config") {
    import graft.sources.ObjectStore
    import org.apache.spark.sql.functions._
    // EMPTY bucket + explicit schema DDL: the tail consumer deploys
    // before the first PUT — the natural startup order
    val bucket = java.nio.file.Files.createTempDirectory("graft-cfg-tail").toString
    val cfg = s"""{"root": "agg", "qpus": {
      "store": {"operator": "objectstore", "bucket": "$bucket", "subscribe": true,
                "schema": "n_nationkey bigint, n_name string, n_regionkey bigint"},
      "agg": {"operator": "aggregation", "children": ["store"],
              "groupBy": ["n_regionkey"],
              "aggregates": [{"function": "count", "as": "n"}]}}}"""
    val stream = GraphConfig.fromJson(spark, cfg, sf()).toDF
    assert(stream.isStreaming, "subscribe mode must yield a streaming frame")
    val q = stream.writeStream.format("memory").queryName("cfg_tail")
      .outputMode("complete").start()
    try {
      val nation = Tables.load(spark, sf(), "nation")
        .select(col("n_nationkey").cast("bigint"), col("n_name"),
          col("n_regionkey").cast("bigint"))
      ObjectStore.put(spark, bucket, "n1.parquet", nation)
      q.processAllAvailable()
      val got = spark.table("cfg_tail").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = nation.groupBy("n_regionkey").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want,
        "the config-deployed tail must aggregate objects that arrived after deploy")
    } finally q.stop()
  }

  test("geo-federation: per-DC warehouses under one router, routed queries prune to one DC") {
    // reference parity: configs/cloudserver-federation/ wires per-DC
    // datastore→filter graphs under one router across regions. Here
    // each DC is a separate warehouse ROOT (the two-metastore
    // analogue), named per-datastore via "dir"; coverage metadata on
    // the router prunes a routed query to the covering DC at assembly
    // time.
    import org.apache.spark.sql.functions._
    val fed = java.nio.file.Files.createTempDirectory("graft-federation").toString
    val orders = Tables.load(spark, sf(), "orders")
    val split = 3000L
    orders.filter(col("o_orderkey") < split)
      .write.mode("overwrite").parquet(s"$fed/dc_east/orders.parquet")
    orders.filter(col("o_orderkey") >= split)
      .write.mode("overwrite").parquet(s"$fed/dc_west/orders.parquet")
    def config(route: String) = s"""{
      "root": "federated",
      "qpus": {
        "east_orders": {"operator": "datastore", "table": "orders", "dir": "$fed/dc_east"},
        "west_orders": {"operator": "datastore", "table": "orders", "dir": "$fed/dc_west"},
        "federated": {"operator": "routed_router",
          "children": ["east_orders", "west_orders"],
          "coverages": [
            {"op": "range", "attr": "o_orderkey", "lb": 0, "ub": $split},
            {"op": "range", "attr": "o_orderkey", "lb": $split, "ub": 9007199254740992}],
          $route
          "projection": ["o_orderkey", "o_totalprice"]}
      }
    }"""
    // routed to one DC: answers like the direct filter, scans ONLY that DC
    val routed = GraphConfig.fromJson(spark,
      config(s"""\"route\": {"op": "eq", "attr": "o_orderkey", "value": 7}, """),
      sf()).toDF
    val want = orders.filter(col("o_orderkey") === 7)
      .select("o_orderkey", "o_totalprice").collect().toSeq
    assert(routed.filter(col("o_orderkey") === 7).collect().toSeq === want)
    val plan = routed.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      "a routed point query must scan exactly the covering DC")
    assert(plan.contains("dc_east") && !plan.contains("dc_west"),
      "the non-covering DC's warehouse must not appear in the plan")
    // unrouted scatter-gather: both DCs, complete federation
    val all = GraphConfig.fromJson(spark, config(""), sf()).toDF
    assert(all.count() === orders.count(),
      "the unrouted federation must union every DC")
    val allPlan = all.queryExecution.executedPlan.toString
    assert(allPlan.contains("dc_east") && allPlan.contains("dc_west"))
  }
}
