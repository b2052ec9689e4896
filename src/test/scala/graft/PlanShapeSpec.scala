package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The universal plan-shape regression guard: EVERY registry query is
  * executed at sf0.001 and its FINAL (post-AQE) physical plan swept
  * for the anti-patterns that would be scale-killers at 100 TB —
  * correctness is oracled per query (CORRECTNESS gate), but an
  * unpushed filter, an accidental cartesian, or a driver-materialized
  * table would pass the row oracle and only surface as a bench
  * anomaly. This spec turns each of those into a CI failure:
  *
  *  - no [[CartesianProductExec]] anywhere (the scalar-total
  *    `crossJoin(broadcast(one-row))` pattern compiles to
  *    BroadcastNestedLoopJoin, which is allowed ONLY with a bounded
  *    build side — checked against the post-run numOutputRows metric);
  *  - every [[LocalTableScanExec]] (driver-materialized data: literal
  *    spines, seeded codebooks) is bounded — a `collect()`-backed
  *    re-parallelize of corpus data would blow past the bound;
  *  - no [[ScalaUDF]] in any node's expressions — kernels are codegen
  *    Catalyst expressions or mapPartitions by design, and a stray
  *    `functions.udf` would silently break whole-stage codegen;
  *  - the §2.1 filter/scan family additionally proves its predicates
  *    reach the parquet scan (`PushedFilters` non-empty).
  *
  * Bound rationale: at sf0.001 every LEGITIMATE broadcast build /
  * literal table here is ≤ a few thousand rows (one-row totals, 9-row
  * digit spines, 256-cell codebooks, k-sized query sets); 65536 keeps
  * the guard loose enough for data growth in the fixtures yet ~3
  * orders of magnitude below any corpus-sized mistake.
  */
class PlanShapeSpec extends SparkSpecBase {

  private val maxDriverRows = 65536L

  /** Flatten the executed plan tree, descending into adaptive final
    * plans, materialized query stages, exchange reuse, AND subquery
    * plans (scalar subqueries / broadcast pruning subqueries).
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    val subs = p.subqueries
    (p +: children.flatMap(flatten)) ++ subs.flatMap(flatten)
  }

  private def outputRows(p: SparkPlan): Option[Long] =
    p.metrics.get("numOutputRows").map(_.value)

  /** The build side of an allowed BroadcastNestedLoopJoin: the child
    * whose subtree carries the broadcast exchange/stage.
    */
  private def buildSideRows(b: BroadcastNestedLoopJoinExec): Option[Long] = {
    val side = b.buildSide.toString match {
      case s if s.contains("Left") => b.left
      case _ => b.right
    }
    // the exchange's own metric is authoritative; fall back to any
    // metered node in the build subtree
    flatten(side).flatMap(outputRows).reduceOption(_ max _)
  }

  private def violations(name: String, plan: SparkPlan): Seq[String] = {
    val nodes = flatten(plan)
    val carts = nodes.collect { case c: CartesianProductExec => c }
      .map(_ => s"$name: CartesianProductExec in the executed plan")
    val bnlj = nodes.collect { case b: BroadcastNestedLoopJoinExec => b }
      .flatMap { b =>
        buildSideRows(b) match {
          case Some(n) if n > maxDriverRows =>
            Seq(s"$name: BroadcastNestedLoopJoin build side has $n rows " +
              s"(> $maxDriverRows) — not the scalar-broadcast pattern")
          case _ => Nil
        }
      }
    val locals = nodes.collect { case l: LocalTableScanExec => l }
      .flatMap { l =>
        outputRows(l) match {
          case Some(n) if n > maxDriverRows =>
            Seq(s"$name: LocalTableScan carries $n driver rows (> $maxDriverRows)")
          case _ => Nil
        }
      }
    val udfs = nodes.filter(_.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])))
      .map(n => s"$name: ScalaUDF in ${n.nodeName} — breaks whole-stage codegen")
    carts ++ bnlj ++ locals ++ udfs
  }

  test("every registry query executes with a clean plan shape at sf0.001") {
    val dir = sf()
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    var executed = 0
    Queries.registry.foreach { case (name, qd) =>
      val df =
        try qd.build(spark, dir)
        catch { case e: Throwable => bad += s"$name: build failed: $e"; null }
      if (df != null) {
        try {
          df.collect() // finalizes the adaptive plan + fills metrics
          executed += 1
          bad ++= violations(name, df.queryExecution.executedPlan)
        } catch { case e: Throwable => bad += s"$name: execution failed: $e" }
      }
    }
    assert(executed === Queries.registry.size,
      s"all ${Queries.registry.size} registry queries must execute")
    assert(bad.isEmpty, s"${bad.size} plan-shape violations:\n${bad.mkString("\n")}")
  }

  test("the filter/scan family pushes its predicates into the parquet scan") {
    val scanQueries = Seq("q_filter_eq", "q_filter_range", "q_filter_null",
      "q_index_point", "q_index_range", "q_point_lookup")
    val bad = scanQueries.flatMap { name =>
      val p = Queries.asMap(name).build(spark, sf())
        .queryExecution.executedPlan.toString
      if ("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined) Nil
      else Seq(s"$name: no pushed filters reach the scan")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
