package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** Pinned exchange counts for the headline queries (r12, verdict #4).
  *
  * PlanShapeSpec catches CATASTROPHIC shapes (cartesians, driver
  * tables, UDFs) on every registry query; what it cannot catch is a
  * silent EXTRA shuffle — a lost co-partition after a refactor, a
  * broadcast join that degraded to a shuffle join, a new `distinct`
  * sneaking a fourth exchange into a three-exchange plan. Those pass
  * the row oracle and the shape sweep and only surface as a bench
  * drift weeks later. This spec executes each headline query at
  * sf0.001 and asserts the post-AQE plan's (shuffle, broadcast)
  * exchange counts against pinned expectations.
  *
  * Counting rules:
  *  - post-AQE executed plan, descending into query stages, reused
  *    exchanges, and subquery plans (same traversal as PlanShapeSpec);
  *  - each exchange INSTANCE counts once (identity-deduped):
  *    [[ReusedExchangeExec]] pointing back at a materialized stage
  *    must not double-count — exchange REUSE is an optimization, not
  *    an extra shuffle;
  *  - AQE stage reuse means counts are "distinct exchanges planned",
  *    the number that scales with data movement at 100 TB.
  *
  * When a pinned count legitimately changes (an operator is
  * restructured), re-pin with: SPARK_GRAFT_PIN_REGEN=1 sbt
  * "testOnly graft.ExchangeCountSpec" — the spec then PRINTS the
  * current map instead of failing, for copy-paste back into EXPECTED.
  */
class ExchangeCountSpec extends SparkSpecBase {

  /** query -> (shuffle exchanges, broadcast exchanges) at sf0.001.
    *
    * The iterative graph/cluster operators (q_pagerank, q_components,
    * dedup_cluster) pin (0, 0): their per-sweep shuffles run during
    * CONSTRUCTION behind eager localCheckpoints, so the returned plan
    * is a checkpoint read — the pin guards the final assembly only.
    */
  private val EXPECTED: Map[String, (Int, Int)] = Map(
    "q1_agg" -> (1, 0),
    "q3_shipping" -> (1, 2),
    "q5_local_supplier" -> (1, 5),
    "q_graph_flagship" -> (1, 1),
    "q_join_2way" -> (0, 1),
    "q_sum_groupby" -> (1, 0),
    "q_topk" -> (1, 0),
    "q_window_running" -> (1, 0),
    "q_sessionize" -> (1, 0),
    "q_skew_salted" -> (0, 1),
    "q_anti_join" -> (0, 1),
    "q17_small_qty" -> (2, 2),
    "q_funnel" -> (2, 1),
    "q_decontaminate" -> (3, 1),
    "q_stratified_sample" -> (0, 0),
    "text_bm25" -> (6, 3),
    "dedup_exact" -> (1, 0),
    "dedup_minhash" -> (3, 3),
    "dedup_shingle" -> (3, 3),
    "dedup_cluster" -> (0, 0),
    "sim_ann_topk" -> (1, 1),
    "sim_ann_lsh" -> (2, 1),
    "text_tfidf" -> (4, 2),
    "pipeline_corpus" -> (1, 1),
    "q_pagerank" -> (0, 0),
    "q_components" -> (0, 0)
  )

  /** Queries whose count legitimately varies run to run: q_triangles'
    * hot-apex salting branches on the measured degree distribution and
    * AQE finalizes one stage differently depending on which side
    * materializes first — both observed shapes are sound (the delta is
    * one reused-vs-fresh broadcast pair, not a lost co-partition).
    */
  private val EXPECTED_ANY: Map[String, Set[(Int, Int)]] = Map(
    "q_triangles" -> Set((2, 3), (3, 4))
  )

  private def descend(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    (p +: children.flatMap(descend)) ++ p.subqueries.flatMap(descend)
  }

  /** Distinct exchange instances in the executed plan (identity set:
    * the same materialized stage reached through ReusedExchangeExec
    * and through its original position is ONE exchange).
    */
  private def exchangeCounts(plan: SparkPlan): (Int, Int) = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    var shuffles = 0
    var broadcasts = 0
    descend(plan).foreach {
      case s: ShuffleExchangeLike if seen.add(s) => shuffles += 1
      case b: BroadcastExchangeLike if seen.add(b) => broadcasts += 1
      case _ =>
    }
    (shuffles, broadcasts)
  }

  test("headline queries keep their pinned exchange counts") {
    val regen = sys.env.get("SPARK_GRAFT_PIN_REGEN").contains("1")
    val dir = sf()
    val names = (EXPECTED.keySet ++ EXPECTED_ANY.keySet).toSeq.sorted
    val actual = names.map { name =>
      val df = Queries.asMap(name).build(spark, dir)
      df.collect() // finalize the adaptive plan
      name -> exchangeCounts(df.queryExecution.executedPlan)
    }
    if (regen) {
      info("current exchange counts (paste into EXPECTED):")
      actual.foreach { case (n, (s, b)) => info(s""""$n" -> ($s, $b),""") }
    } else {
      // EXPECTED pins are CEILINGS: the regression classes this spec
      // exists for (a lost co-partition, a broadcast degraded to
      // shuffle, a stray distinct) all ADD exchanges. Counts below the
      // pin are legitimate environment variance — e.g. a sf0.001 scan
      // landing in ONE partition satisfies the aggregate's
      // distribution with no exchange at all (observed on q_topk), and
      // AQE's size estimates differ box to box. EXPECTED_ANY stays an
      // exact set for the queries whose sound shapes genuinely differ.
      val bad = actual.collect {
        case (n, got) if EXPECTED_ANY.contains(n) && !EXPECTED_ANY(n).contains(got) =>
          s"$n: expected (shuffle,broadcast) in ${EXPECTED_ANY(n)}, got $got"
        case (n, got @ (s, b)) if EXPECTED.contains(n) &&
            (s > EXPECTED(n)._1 || b > EXPECTED(n)._2) =>
          s"$n: expected (shuffle,broadcast) <= ${EXPECTED(n)}, got $got"
      }
      assert(bad.isEmpty,
        s"${bad.size} exchange-count regressions (a lost co-partition or a " +
        s"degraded broadcast — or an intended restructuring: re-pin with " +
        s"SPARK_GRAFT_PIN_REGEN=1):\n${bad.mkString("\n")}")
    }
  }
}
