package graft

import graft.operators.Reconcile
import org.apache.spark.sql.functions._

class ReconcileSpec extends SparkSpecBase {

  private def diff(a: Seq[(Long, String)], b: Seq[(Long, String)],
                   nBuckets: Int = 8): Set[(String, Long)] = {
    import spark.implicits._
    Reconcile.tableDiff(a.toDF("id", "v"), b.toDF("id", "v"), "id", nBuckets)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("tableDiff: add, remove, and in-place modify all surface; equal snapshots diff empty") {
    val a = Seq(1L -> "x", 2L -> "y", 3L -> "z")
    val b = Seq(1L -> "x", 3L -> "Z", 4L -> "w") // 2 removed, 3 modified, 4 added
    assert(diff(a, b) === Set(("removed", 2L), ("removed", 3L), ("added", 3L), ("added", 4L)))
    assert(diff(a, a) === Set.empty)
  }

  test("tableDiff: duplicate-row multisets reconcile by count (xor alone would cancel)") {
    // pair of identical rows xor-cancels to the digest of zero copies;
    // the count column must catch it
    val a = Seq(1L -> "x", 1L -> "x", 2L -> "y")
    val b = Seq(1L -> "x", 2L -> "y")
    assert(diff(a, b) === Set(("removed", 1L)))
    // and one bucket forces every row through the same summary row
    assert(diff(a, b, nBuckets = 1) === Set(("removed", 1L)))
  }

  test("tableDiff: only dirty buckets reach the except — clean buckets prune out") {
    import spark.implicits._
    val a = (1L to 200L).map(i => i -> s"v$i")
    val b = a.filterNot(_._1 == 57L) :+ (999L -> "new")
    val out = Reconcile.tableDiff(a.toDF("id", "v"), b.toDF("id", "v"), "id", 64)
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("removed", 57L), ("added", 999L)))
    // prune evidence: the except inputs are semi-joined on the dirty
    // bucket list, visible in the optimized plan as LeftSemi joins
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), "dirty-bucket semi-join pruning missing from plan")
  }
}
