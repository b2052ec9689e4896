package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source breadth-first shortest paths (hop distance) over an
  * undirected edge list — the reachability/distance member of the
  * graph family ([[PageRank]] = importance, [[Triangles]] = local
  * density, [[ConnectedComponents]] = partition structure).
  *
  * Frontier-delta iteration, not whole-table relaxation: hop `h` joins
  * ONLY the rows settled at distance `h-1` (the frontier) against the
  * adjacency list, so across the whole run each directed edge is
  * expanded exactly once — when its source settles — for O(E) total
  * join work regardless of the hop bound. Re-joining the full
  * distance table every hop would cost O(E·H) and re-shuffle settled
  * mass that can never improve.
  *
  * Scale shape: the symmetrized adjacency is deduplicated, partitioned
  * on `src` ONCE and persisted, so every hop's frontier join reuses
  * that partitioning and shuffles only the frontier (≤ nodes rows).
  * The per-hop merge is a combinable `min(dist)` aggregation; state
  * between hops is one (node, dist) row per settled node. Dedup,
  * symmetrize, and min are all map-side combinable; nothing is
  * collected to the driver. A hop whose frontier is empty terminates
  * the loop early (one cheap `limit(1).isEmpty` probe per hop — the
  * same convergence probe [[ConnectedComponents.propagateToFixpoint]]
  * uses).
  *
  * Semantics (replayable by a recursive-CTE oracle): `dist(v)` = the
  * minimum number of edges on any path from any source to `v`, capped
  * at `maxHops`; unreachable nodes are absent. Self-loops and
  * duplicate/reversed edges are cleaned. A source id that touches no
  * edge still reports dist 0 iff it appears in `sources` (sources are
  * trusted as nodes).
  */
object ShortestPaths {

  /** (node_id, dist) for every node within `maxHops` of `sources`
    * (a one-column frame of node ids).
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    val s = col(srcCol).cast("long")
    val t = col(dstCol).cast("long")
    // symmetrize + clean: each undirected edge becomes two directed
    // rows; distinct collapses duplicates and reversed re-statements
    val adj = edges.filter(s =!= t)
      .select(s.as("src"), t.as("dst"))
      .union(edges.filter(s =!= t).select(t.as("src"), s.as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val src0 = sources.select(sources.columns.head).distinct()
      .select(col(sources.columns.head).cast("long").as("node_id"),
        lit(0).as("dist"))
    // Each settled layer is an eager localCheckpoint: hop h's plan
    // references hop h-1 both as the frontier (expansion join) and
    // inside `settled` (anti-join), so un-truncated lineage doubles
    // per hop and Catalyst's driver-side optimization time grows
    // exponentially with depth (the same pathology measured in
    // [[PageRank]]). Checkpointed, every hop is ONE job over
    // frontier-sized state, its count doubling as the empty-frontier
    // termination probe; `settled` stays a union of layer scans —
    // linear plan growth.
    var frontier = src0.localCheckpoint(true)
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame](frontier)
    var settled: DataFrame = frontier
    var h = 1
    var done = maxHops == 0 || frontier.count() == 0
    while (!done) {
      // expand ONLY the frontier; anti-join drops already-settled
      // nodes (their existing dist is <= h by construction)
      val next = frontier.join(adj, frontier("node_id") === adj("src"))
        .select(col("dst").as("node_id"))
        .distinct()
        .join(settled, Seq("node_id"), "left_anti")
        .withColumn("dist", lit(h))
        .localCheckpoint(true)
      if (next.count() == 0) done = true
      else {
        layers += next
        settled = settled.union(next)
        frontier = next
        h += 1
        done = h > maxHops
      }
    }
    adj.unpersist(blocking = false)
    settled
  }
}
