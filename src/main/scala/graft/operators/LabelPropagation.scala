package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et
  * al. 2007), made DETERMINISTIC: every node starts labeled with its
  * own id, and each round every node adopts the label that is most
  * frequent among its neighbors, ties broken toward the SMALLEST
  * label. Classic async LPA is run-order dependent; the synchronous
  * sweep with a total tie-break makes the whole trajectory a pure
  * function of the edge list, so a fixed round count is replayable
  * round-for-round by an external SQL oracle — the same determinism
  * contract as [[PageRank]]'s fixed power iterations.
  *
  * Scale shape: each round is ONE edge-keyed join (neighbor labels)
  * feeding two combinable aggregations — per-(node, label) counts,
  * then the per-node argmax. The argmax rides a single packed long
  * `cnt·10^8 − label` (max = highest count, then lowest label), the
  * [[Triangles]] degree-packing convention, so no window and no
  * struct ordering is involved; it needs node ids < 10^8 and counts
  * < 9·10^10 (the documented-ceiling convention — raise the shift for
  * wider id spaces). Edges are cleaned (self-loops dropped,
  * deduplicated, symmetrized) once, persisted once, and reused every
  * round; labels stay node-sized throughout. Nothing is quadratic in
  * the graph and nothing global is sorted.
  */
object LabelPropagation {

  /** (node_id, community) after exactly `rounds` synchronous LPA
    * sweeps over the undirected edge list — `community` is the label
    * id (a node id) the node converged to so far. Nodes are the edge
    * endpoints (an isolated node has no neighbors to vote, and no row
    * here).
    */
  def communities(edges: DataFrame, srcCol: String, dstCol: String,
                  rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "label propagation needs at least one round")
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val und = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
    for (_ <- 0 until rounds) {
      // localCheckpoint per sweep — the PageRank/KCore lineage
      // discipline: each round's plan would otherwise embed the whole
      // previous round's tree (~3 stages deeper per round), so a
      // larger graph's natural round count pays a growing
      // compile/optimize tax on every sweep. Truncating keeps each
      // round's plan one join + two aggregates regardless of rounds.
      labels = und
        .join(labels.select(col("id").as("b"), col("label")), "b")
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("a").as("id"))
        .agg(max_by(col("label"), col("cnt") * 100000000L - col("label"))
          .as("label"))
        .localCheckpoint(true)
    }
    val out = labels.select(col("id").as("node_id"), col("label").as("community"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    und.unpersist()
    out
  }
}
