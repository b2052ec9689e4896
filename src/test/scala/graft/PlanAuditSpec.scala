package graft

/** Plan-shape audits: the queries must not only return correct rows,
  * they must compile to the plan you'd want at 100 TB — dimension
  * broadcasts, map-side partial aggregation, pushdown, top-k without a
  * global sort. Regressions here are performance bugs the row-level
  * oracle can't see.
  */
class PlanAuditSpec extends SparkSpecBase {

  private def plan(name: String): String =
    Queries.asMap(name).build(spark, sf()).queryExecution.executedPlan.toString

  test("q1_agg: two-phase hash aggregation (map-side partial combine)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "aggregation must be partial + final, not single-phase")
  }

  test("q5_local_supplier: every dimension joins as broadcast") {
    val p = plan("q5_local_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      "supplier/customer/nation/region must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "no fact-side shuffle join should remain — the only big table is lineitem/orders")
  }

  test("q_graph_flagship: topk is TakeOrdered, join is broadcast") {
    val p = plan("q_graph_flagship")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q_filter_range: range predicate reaches the parquet scan") {
    val p = plan("q_filter_range")
    assert(p.contains("PushedFilters") && p.contains("l_quantity"))
  }

  test("q_scan_projection: scan reads only the projected columns") {
    val p = plan("q_scan_projection")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"))
  }

  test("sim_ann_topk: corpus is scanned, never shuffled (broadcast NLJ)") {
    val p = plan("sim_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"), "corpus x corpus cartesian would not scale")
  }
}
