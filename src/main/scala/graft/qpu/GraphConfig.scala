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

    // JSON scalars → the Scala types the predicate/lookup builders lit()
    def value(n: JsonNode): Any =
      if (n.isIntegralNumber) n.asLong()
      else if (n.isNumber) n.asDouble()
      else if (n.isBoolean) n.asBoolean()
      else n.asText()

    def predicate(n: JsonNode): Predicate = n.get("op").asText() match {
      case "eq" => Eq(n.get("attr").asText(), value(n.get("value")))
      case "range" => Range(n.get("attr").asText(), value(n.get("lb")), value(n.get("ub")))
      case "isnull" => IsNull(n.get("attr").asText())
      case "isnotnull" => IsNotNull(n.get("attr").asText())
      case op => throw new IllegalArgumentException(s"unknown predicate op '$op'")
    }

    def aggregate(n: JsonNode): Column = {
      val as = n.get("as").asText()
      n.get("function").asText() match {
        case "count" => count(lit(1)).as(as)
        case "sum" => sum(col(n.get("attribute").asText())).as(as)
        case "min" => min(col(n.get("attribute").asText())).as(as)
        case "max" => max(col(n.get("attribute").asText())).as(as)
        case "avg" => avg(col(n.get("attribute").asText())).as(as)
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
        case "datastore" =>
          DatastoreQpu(spark, dir, n.get("table").asText())
        case "filter" =>
          require(n.hasNonNull("predicates"), s"filter qpu '$name' needs a 'predicates' array")
          FilterQpu(child(0),
            n.get("predicates").elements().asScala.map(predicate).toSeq)
        case "aggregation" =>
          require(n.hasNonNull("aggregates"), s"aggregation qpu '$name' needs an 'aggregates' array")
          val aggs = n.get("aggregates").elements().asScala.map(aggregate).toSeq
          require(aggs.nonEmpty, s"aggregation qpu '$name' has an empty 'aggregates' array")
          DataFrameQpu(child(0).toDF
            .groupBy(strSeq(n, "groupBy").map(col): _*)
            .agg(aggs.head, aggs.tail: _*))
        case "join" =>
          JoinQpu(child(0), child(1),
            n.get("leftAttr").asText(), n.get("rightAttr").asText(),
            joinAlias = Option(n.get("alias")).map(_.asText()).getOrElse(""),
            broadcastRight = Option(n.get("broadcastRight")).exists(_.asBoolean()))
        case "index" =>
          require(n.hasNonNull("attribute"), s"index qpu '$name' needs an 'attribute'")
          val idx = IndexQpu(child(0), n.get("attribute").asText())
          if (n.has("topk"))
            DataFrameQpu(idx.topK(n.get("topk").asInt(), strSeq(n, "tiebreak")))
          else if (n.has("point"))
            DataFrameQpu(idx.point(value(n.get("point"))))
          else if (n.has("lbound")) {
            require(n.hasNonNull("ubound"), s"index qpu '$name' has 'lbound' but no 'ubound'")
            DataFrameQpu(idx.range(value(n.get("lbound")), value(n.get("ubound"))))
          } else idx
        case "cache" => CacheQpu(child(0))
        case "router" => RouterQpu(children.map(build))
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
