package graft

import graft.api.ProteusQL
import graft.operators.AsOf
import graft.qpu._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator catalog: one named query per SURVEY.md §2 row, each
  * built through the library's operators, plus the ANSI-SQL oracle the
  * driver replays in DuckDB. Column names are aliased identically on
  * both sides (the driver hash-compares by sorted column name).
  */
object Queries {

  final case class QueryDef(build: (SparkSession, String) => DataFrame,
                            oracle: Option[String])

  private def ds(s: SparkSession, dir: String, t: String) = DatastoreQpu(s, dir, t)

  val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val registry: Seq[(String, QueryDef)] = Seq(

    // §2.1/1 — datastore scan with projection pushdown
    "q_scan_projection" -> QueryDef(
      (s, d) => DatastoreQpu(s, d, "orders", Seq("o_orderkey", "o_totalprice")).toDF,
      Some("SELECT o_orderkey, o_totalprice FROM orders")),

    // §2.1/2 — filter EQ
    "q_filter_eq" -> QueryDef(
      (s, d) => FilterQpu(ds(s, d, "orders"), Seq(Eq("o_orderstatus", "F"))).toDF
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
      Some("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority " +
        "FROM orders WHERE o_orderstatus = 'F'")),

    // §2.1/3 — filter RANGE [lb, ub)
    "q_filter_range" -> QueryDef(
      (s, d) => FilterQpu(ds(s, d, "lineitem"), Seq(Range("l_quantity", 30.0, 40.0))).toDF
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE l_quantity >= 30.0 AND l_quantity < 40.0")),

    // §2.1/4 — filter ISNOTNULL (testdata has no nulls; the predicate
    // still exercises the pushdown path)
    "q_filter_null" -> QueryDef(
      (s, d) => FilterQpu(ds(s, d, "events"), Seq(IsNotNull("props"))).toDF
        .groupBy("event_type").agg(count(lit(1)).as("cnt")),
      Some("SELECT event_type, count(*) AS cnt FROM events " +
        "WHERE props IS NOT NULL GROUP BY event_type")),

    // §2.1/5 — index point lookup
    "q_index_point" -> QueryDef(
      (s, d) => IndexQpu(ds(s, d, "lineitem"), "l_partkey").point(1L)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"),
      Some("SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem " +
        "WHERE l_partkey = 1")),

    // §2.1/6 — index range scan, ordered by the indexed attribute
    "q_index_range" -> QueryDef(
      (s, d) => IndexQpu(ds(s, d, "orders"), "o_totalprice").range(1000.0, 20000.0)
        .select("o_orderkey", "o_totalprice"),
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice >= 1000.0 AND o_totalprice < 20000.0 ORDER BY o_totalprice")),

    // §2.1/7 — top-k by derived attribute (lobsters vote_sum shape)
    "q_topk" -> QueryDef(
      (s, d) => {
        val counts = ds(s, d, "orders").toDF
          .groupBy("o_custkey").agg(count(lit(1)).as("order_cnt"))
        IndexQpu(DataFrameQpu(counts), "order_cnt").topK(10, tiebreak = Seq("o_custkey"))
      },
      Some("SELECT o_custkey, count(*) AS order_cnt FROM orders GROUP BY o_custkey " +
        "ORDER BY order_cnt DESC, o_custkey LIMIT 10")),

    // §2.1/8 — incremental group-by sum (sum.go parity: id, <attr>_sum)
    "q_sum_groupby" -> QueryDef(
      (s, d) => SumQpu(ds(s, d, "events"), "value", "user_id").toDF,
      Some("SELECT user_id, sum(value) AS value_sum FROM events GROUP BY user_id")),

    // §2.1/9 — 2-table materialized equi-join (dimension broadcast)
    "q_join_2way" -> QueryDef(
      (s, d) => JoinQpu(ds(s, d, "orders"), ds(s, d, "customer"),
        "o_custkey", "c_custkey", broadcastRight = true).toDF
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_nationkey"),
      Some("SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_nationkey " +
        "FROM orders JOIN customer ON o_custkey = c_custkey")),

    // §2.1/10 — composed graph: sum → join → index topk (flagship)
    "q_graph_flagship" -> QueryDef(
      (s, d) => {
        val sums = ds(s, d, "orders").toDF.groupBy("o_custkey")
          .agg(count(lit(1)).as("order_cnt"), sum("o_totalprice").as("total_spent"))
        val joined = JoinQpu(DataFrameQpu(sums), ds(s, d, "customer"),
          "o_custkey", "c_custkey", joinAlias = "custkey", broadcastRight = true)
        IndexQpu(joined, "order_cnt").topK(20, tiebreak = Seq("custkey"))
          .select("custkey", "c_name", "order_cnt", "total_spent")
      },
      Some("SELECT custkey, c_name, order_cnt, total_spent FROM " +
        "(SELECT o_custkey AS custkey, count(*) AS order_cnt, sum(o_totalprice) AS total_spent " +
        "FROM orders GROUP BY o_custkey) j JOIN customer ON custkey = c_custkey " +
        "ORDER BY order_cnt DESC, custkey LIMIT 20")),

    // §2.1/11 — router scatter-gather: the same predicate fanned over
    // per-type children, results concatenated
    "q_router_union" -> QueryDef(
      (s, d) => {
        val children = eventTypes.map { t =>
          FilterQpu(ds(s, d, "events"),
            Seq(Eq("event_type", t), Range("value", 100.0, 1000000.0))): Qpu
        }
        RouterQpu(children).toDF.select("event_id", "user_id", "event_type", "value")
      },
      Some("SELECT event_id, user_id, event_type, value FROM events " +
        "WHERE value >= 100.0 AND value < 1000000.0")),

    // §2.1/12 — cache QPU: cached plan must serve identical results
    "q_cache" -> QueryDef(
      (s, d) => {
        val counts = ds(s, d, "orders").toDF
          .groupBy("o_custkey").agg(count(lit(1)).as("order_cnt"))
        CacheQpu(DataFrameQpu(
          IndexQpu(DataFrameQpu(counts), "order_cnt").topK(10, tiebreak = Seq("o_custkey")))).toDF
      },
      Some("SELECT o_custkey, count(*) AS order_cnt FROM orders GROUP BY o_custkey " +
        "ORDER BY order_cnt DESC, o_custkey LIMIT 10")),

    // §2.1/13 — SQL surface (parser subset and beyond)
    "q_sql_select" -> QueryDef(
      (s, d) => ProteusQL.sql(s, d,
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O' " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 5"),
      Some("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O' " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 5")),

    // §2.1/14 — point lookup by primary key (ClientQuery)
    "q_point_lookup" -> QueryDef(
      (s, d) => ProteusQL.snapshot(s, d, "customer", predicates = Seq(Eq("c_custkey", 1L))),
      Some("SELECT * FROM customer WHERE c_custkey = 1")),

    // §2.1/15 — snapshot-as-of (SnapshotTimePredicate): latest event per
    // user at time T
    "q_asof_snapshot" -> QueryDef(
      (s, d) => AsOf.snapshotAsOf(
        ds(s, d, "events").toDF,
        "ts", lit("2024-01-15 00:00:00").cast("timestamp"),
        key = Seq("user_id"), tiebreak = Seq("event_id"))
        .select("user_id", "event_id", "event_type", "value"),
      Some("SELECT user_id, event_id, event_type, value FROM (" +
        "SELECT user_id, event_id, event_type, value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00') t WHERE rn = 1"))
  )

  lazy val asMap: Map[String, QueryDef] = registry.toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, q) => n -> q.build }.toMap

  def oracleSql: Map[String, String] =
    registry.collect { case (n, QueryDef(_, Some(sql))) => n -> sql }.toMap
}
