package graft.qpu

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Config-driven QPU graph assembly
  * (reference: internal/qpuGraph/qpuGraph.go + configs/ — each QPU is
  * deployed from a config file naming its `operator` class, the
  * operator's parameters, and `connections` to its child QPUs; the
  * running graph is the transitive closure of those configs).
  *
  * Spark-first re-expression: the whole graph lives in ONE JSON
  * document of named nodes — no addresses or ports, because composing
  * QPUs here composes logical plans, not network services. Each node:
  *
  * {{{
  * "node_name": {
  *   "operator": "datastore | filter | aggregation | join | index |
  *                cache | router",
  *   "children": ["child_name", ...],   // like [[connections]]
  *   ... operator params ...,
  *   "projection": ["col", ...]         // optional, any node
  * }
  * }}}
  *
  * Operator params mirror the reference's config sections:
  * `aggregation` takes `groupBy` + `aggregates` (cf. TOML
  * `[AggregationConfig] AggregationFunc/AggregationAttribute/GroupBy`),
  * `index` takes `attribute` plus either `lbound`/`ubound` (cf.
  * `[IndexConfig] lbound/ubound`), a `point` lookup value, or
  * `topk`/`tiebreak` for the ranking read; `filter` takes the
  * EQ/RANGE/ISNULL predicate list; `router` fans to all children.
  * `root` names the graph's output node. The loaded graph is an
  * ordinary [[Qpu]]: Catalyst still collapses it into one distributed
  * plan with pushdown and broadcast intact.
  */
object GraphConfig {

  /** Load a graph bundled on the classpath (e.g. "/graft/flagship.json"). */
  def fromResource(spark: SparkSession, resource: String, dir: String): Qpu = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"config resource not found: $resource")
    try fromJson(spark, scala.io.Source.fromInputStream(in, "UTF-8").mkString, dir)
    finally in.close()
  }

  def fromFile(spark: SparkSession, path: String, dir: String): Qpu =
    fromJson(spark, new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"), dir)

  def fromJson(spark: SparkSession, json: String, dir: String): Qpu = {
    val doc = new ObjectMapper().readTree(json)
    val qpus = doc.get("qpus")
    require(qpus != null, "config must have a 'qpus' object")
    val memo = mutable.Map.empty[String, Qpu]
    val building = mutable.Set.empty[String]

    def strSeq(n: JsonNode, field: String): Seq[String] =
      Option(n.get(field)).map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)

    // every operator's required fields go through this so a missing
    // field always names the qpu and the field, never a bare NPE
    def req(n: JsonNode, name: String, field: String): JsonNode = {
      require(n.hasNonNull(field), s"qpu '$name' needs a '$field'")
      n.get(field)
    }

    // JSON scalars → the Scala types the predicate/lookup builders lit()
    def value(n: JsonNode): Any =
      if (n.isIntegralNumber) n.asLong()
      else if (n.isNumber) n.asDouble()
      else if (n.isBoolean) n.asBoolean()
      else n.asText()

    def predicate(n: JsonNode): Predicate = {
      require(n.hasNonNull("op") && n.hasNonNull("attr"),
        s"predicate needs 'op' and 'attr': $n")
      predicateOf(n)
    }

    def predicateOf(n: JsonNode): Predicate = {
      // op-specific value fields go through the same named-error path
      // as the structural fields — an 'eq' without 'value' (or 'range'
      // without 'lb'/'ub') must say so, not NPE
      def pv(field: String): Any = {
        require(n.hasNonNull(field),
          s"'${n.get("op").asText()}' predicate needs '$field': $n")
        value(n.get(field))
      }
      n.get("op").asText() match {
        case "eq" => Eq(n.get("attr").asText(), pv("value"))
        case "range" => Range(n.get("attr").asText(), pv("lb"), pv("ub"))
        case "isnull" => IsNull(n.get("attr").asText())
        case "isnotnull" => IsNotNull(n.get("attr").asText())
        case op => throw new IllegalArgumentException(s"unknown predicate op '$op'")
      }
    }

    def aggregate(n: JsonNode): Column = {
      require(n.hasNonNull("function") && n.hasNonNull("as"),
        s"aggregate needs 'function' and 'as': $n")
      val as = n.get("as").asText()
      def attr: Column = {
        require(n.hasNonNull("attribute"),
          s"aggregate '${n.get("function").asText()}' needs an 'attribute': $n")
        col(n.get("attribute").asText())
      }
      n.get("function").asText() match {
        case "count" => count(lit(1)).as(as)
        case "sum" => sum(attr).as(as)
        case "min" => min(attr).as(as)
        case "max" => max(attr).as(as)
        case "avg" => avg(attr).as(as)
        case f => throw new IllegalArgumentException(s"unknown aggregate '$f'")
      }
    }

    def build(name: String): Qpu = memo.getOrElseUpdate(name, {
      require(!building.contains(name), s"cycle in qpu graph at '$name'")
      building += name
      val n = qpus.get(name)
      require(n != null, s"config references unknown qpu '$name'")
      require(n.hasNonNull("operator"), s"qpu '$name' needs an 'operator'")
      val children = strSeq(n, "children")
      def child(i: Int): Qpu = {
        require(children.size > i, s"qpu '$name' needs child $i")
        build(children(i))
      }
      val q: Qpu = n.get("operator").asText() match {
        // Optional per-node "dir": a DIFFERENT warehouse root than the
        // graph's — the geo-federation shape (reference:
        // configs/cloudserver-federation/, where per-DC datastore →
        // filter subtrees live in different regions under one router).
        // Relative dirs resolve against the graph dir; absolute or
        // scheme-qualified (s3://…) paths name a foreign store as-is.
        case "datastore" =>
          val dsDir = Option(n.get("dir")).map(_.asText())
            .map(d => if (d.contains("://") || d.startsWith("/")) d else s"$dir/$d")
            .getOrElse(dir)
          DatastoreQpu(spark, dsDir, req(n, name, "table").asText())
        case "filter" =>
          FilterQpu(child(0),
            req(n, name, "predicates").elements().asScala.map(predicate).toSeq)
        case "aggregation" =>
          val aggs = req(n, name, "aggregates").elements().asScala.map(aggregate).toSeq
          require(aggs.nonEmpty, s"aggregation qpu '$name' has an empty 'aggregates' array")
          DataFrameQpu(child(0).toDF
            .groupBy(strSeq(n, "groupBy").map(col): _*)
            .agg(aggs.head, aggs.tail: _*))
        case "join" =>
          JoinQpu(child(0), child(1),
            req(n, name, "leftAttr").asText(), req(n, name, "rightAttr").asText(),
            joinAlias = Option(n.get("alias")).map(_.asText()).getOrElse(""),
            broadcastRight = Option(n.get("broadcastRight")).exists(_.asBoolean()))
        case "index" =>
          val idx = IndexQpu(child(0), req(n, name, "attribute").asText())
          // explicit-null params and ubound-without-lbound must be named
          // errors, not silent full-table passthroughs / limit(0)
          Seq("topk", "point", "lbound", "ubound").foreach { f =>
            require(!n.has(f) || n.hasNonNull(f),
              s"qpu '$name': '$f' must not be null")
          }
          if (n.hasNonNull("topk"))
            DataFrameQpu(idx.topK(n.get("topk").asInt(), strSeq(n, "tiebreak")))
          else if (n.hasNonNull("point"))
            DataFrameQpu(idx.point(value(n.get("point"))))
          else if (n.hasNonNull("lbound"))
            DataFrameQpu(idx.range(value(n.get("lbound")),
              value(req(n, name, "ubound"))))
          else {
            require(!n.hasNonNull("ubound"),
              s"qpu '$name' has 'ubound' without 'lbound'")
            idx
          }
        case "cache" => CacheQpu(child(0))
        // object-store driver (reference: the S3 datastore driver is a
        // first-class config operator). "bucket" resolves against the
        // graph's data dir unless absolute or scheme-qualified;
        // "subscribe": true yields the State-then-Delta arrival stream
        // (schema inferred from the bucket's current objects), else
        // the batch snapshot read.
        case "objectstore" =>
          val bucket = req(n, name, "bucket").asText()
          val path = if (bucket.contains("://") || bucket.startsWith("/")) bucket
                     else s"$dir/$bucket"
          if (Option(n.get("subscribe")).exists(_.asBoolean())) {
            // an explicit "schema" (DDL) lets a tail consumer subscribe
            // BEFORE the first PUT — the natural startup order — when
            // there are no objects to infer from yet
            val schema = Option(n.get("schema")).map(s =>
              org.apache.spark.sql.types.StructType.fromDDL(s.asText()))
              .getOrElse(graft.sources.ObjectStore.read(spark, path).schema)
            DataFrameQpu(graft.sources.ObjectStore.subscribe(spark, path, schema))
          } else DataFrameQpu(graft.sources.ObjectStore.read(spark, path))
        // changelog driver (reference: the MySQL binlog-tail driver):
        // Debezium-envelope JSON lines from "path" (same dir
        // resolution), projected to "table"'s typed columns
        // ("columns": {name: sparkType}); "subscribe": true tails the
        // file(s) as a stream, else reads them as a batch frame.
        case "changelog" =>
          val p = req(n, name, "path").asText()
          val path = if (p.contains("://") || p.startsWith("/")) p else s"$dir/$p"
          val lines =
            if (Option(n.get("subscribe")).exists(_.asBoolean()))
              spark.readStream.text(path)
            else spark.read.text(path)
          val records = graft.streaming.Subscribe.fromChangelog(
            spark, lines, req(n, name, "keyField").asText())
          val cols = Option(n.get("columns")).map(c =>
            c.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty[String, String])
          DataFrameQpu(graft.streaming.Subscribe.changelogTable(
            records, req(n, name, "table").asText(), cols))
        case "router" => RouterQpu(children.map(build))
        case "routed_router" =>
          // per-child coverage predicates (the reference's advertised
          // shard metadata); an optional "route" predicate resolves the
          // node to only the covering children at assembly time
          val coverages = req(n, name, "coverages").elements().asScala.map(predicate).toSeq
          require(coverages.size == children.size,
            s"qpu '$name': ${coverages.size} coverages for ${children.size} children")
          val router = PartitionedRouterQpu(
            coverages.zip(children.map(build)).map { case (c, q) => RoutedChild(c, q) })
          if (n.hasNonNull("route")) DataFrameQpu(router.route(predicate(n.get("route"))))
          else router
        case op => throw new IllegalArgumentException(s"unknown operator '$op'")
      }
      building -= name
      val projection = strSeq(n, "projection")
      if (projection.isEmpty) q
      else DataFrameQpu(q.toDF.select(projection.map(col): _*))
    })

    require(doc.hasNonNull("root"), "config must name a 'root' qpu")
    build(doc.get("root").asText())
  }
}
