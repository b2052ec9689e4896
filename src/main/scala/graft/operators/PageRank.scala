package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the canonical iterative graph
  * computation, Pregel-shaped but expressed as plain DataFrame joins
  * so Catalyst plans each superstep (the same architecture choice as
  * [[ConnectedComponents]]' label propagation).
  *
  * Textbook-complete: teleport (1−d)/N plus DANGLING-MASS
  * redistribution — nodes without out-edges contribute their rank
  * /N to every node each step, via a one-row aggregate broadcast
  * (never a driver action), so total rank stays 1 and the result
  * matches the power-iteration definition, not the lossy
  * drop-the-dangling shortcut.
  *
  * Scale shape per superstep: one shuffle-join of edges against the
  * rank frontier on `src` (edges are pre-partitioned on src once and
  * persisted, so every superstep reuses that partitioning), one
  * combinable sum on `dst`, and two one-row broadcasts (N, dangling
  * mass). State between supersteps is one (node, rank) row per node.
  * Summation order is engine-nondeterministic but the drift is
  * ~1e-16/term against a 1e-6 comparison tolerance — iteration count
  * is fixed, not convergence-tested, so both engines run the same
  * arithmetic.
  */
object PageRank {

  /** Ranks after `iters` power-iteration steps with damping `d`.
    * Output: (node_id, pr). Self-loops and duplicate edges are
    * deduplicated; nodes appear if they touch any edge.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist()
    val nn = nodes.agg(count(lit(1)).cast("double").as("n"))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg")).persist()
    var pr = nodes.crossJoin(broadcast(nn))
      .select(col("id"), (lit(1.0) / col("n")).as("pr"))
      .persist()
    for (_ <- 0 until iters) {
      // rank mass sitting on dangling nodes (no out-edges): one row
      val dangling = pr.join(deg, pr("id") === deg("src"), "left_anti")
        .agg(coalesce(sum("pr"), lit(0.0)).as("dm"))
      val contribs = e.join(pr.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("cid"))
        .agg(sum(col("pr") / col("deg")).as("c"))
      pr = nodes.crossJoin(broadcast(nn)).crossJoin(broadcast(dangling))
        .join(contribs, col("id") === col("cid"), "left")
        .select(col("id"),
          ((lit(1.0) - damping) / col("n") +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + col("dm") / col("n")))
            .as("pr"))
        .persist()
    }
    pr.select(col("id").as("node_id"), col("pr"))
  }
}
