package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a bipartite id↔bucket membership graph by
  * alternating min-label propagation.
  *
  * Each round is two hash aggregations (both map-side combinable) and
  * advances labels ONE graph hop, so `propagateMinLabel(n)` resolves
  * components of diameter <= n exactly; longer chains keep multiple
  * labels (documented, bounded semantics — replayable round-for-round
  * by an external oracle). Duplicate/near-dup clusters are
  * near-cliques (diameter 1–2), so small fixed counts fit them.
  * `propagateToFixpoint` iterates until no label changes when exact
  * component minima matter regardless of shape.
  *
  * The membership frame is persisted only for the duration of the
  * computation: both entry points eagerly materialize the final
  * (id, label) frame — which is persisted, O(n) rows × 2 columns —
  * then drop the membership pin before returning. The caller owns the
  * returned cache and should `unpersist()` it when done (the standard
  * `Dataset.cache()` contract); nothing internal stays pinned. Note
  * that unpersisting a TRANSFORMED view of the result (e.g. after a
  * rename) does not release the underlying entry — unpersist the
  * returned frame itself, or `spark.catalog.clearCache()`.
  */
object ConnectedComponents {

  /** `membership`: columns `id` plus `bucketCols`. Returns (id, label)
    * after exactly `iterations` propagation rounds. The result is
    * persisted and materialized; internal pins are released.
    */
  def propagateMinLabel(membership: DataFrame, bucketCols: Seq[String],
                        iterations: Int): DataFrame = {
    val mem = membership.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = mem.select(col("id")).distinct().withColumn("label", col("id"))
    for (_ <- 0 until iterations) labels = round(mem, bucketCols, labels)
    materializeAndRelease(labels, mem)
  }

  /** Iterate until labels stop changing (checked with a cheap
    * existence probe per round), capped at `maxIterations`. The result
    * is persisted and materialized; internal pins are released.
    */
  def propagateToFixpoint(membership: DataFrame, bucketCols: Seq[String],
                          maxIterations: Int = 20): DataFrame = {
    val mem = membership.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = mem.select(col("id")).distinct().withColumn("label", col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var i = 0
    var converged = false
    while (i < maxIterations && !converged) {
      val next = round(mem, bucketCols, labels)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      converged = next.as("n").join(labels.as("p"), "id")
        .filter(col("n.label") =!= col("p.label"))
        .limit(1).isEmpty
      labels.unpersist(blocking = false)
      labels = next
      i += 1
    }
    materializeAndRelease(labels, mem)
  }

  /** Force the final labels into their own cache, then release the
    * membership pin — if the labels cache is later evicted, lineage
    * recomputes from the (unpinned) source, which is correct, just
    * slower.
    */
  private def materializeAndRelease(labels: DataFrame, mem: DataFrame): DataFrame = {
    val out =
      if (labels.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        labels.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else labels
    out.count()
    mem.unpersist(blocking = false)
    out
  }

  private def round(mem: DataFrame, bucketCols: Seq[String],
                    labels: DataFrame): DataFrame = {
    val bucketMin = mem.join(labels, "id")
      .groupBy(bucketCols.map(col): _*).agg(min("label").as("bmin"))
    mem.join(bucketMin, bucketCols)
      .groupBy("id").agg(min("bmin").as("label"))
  }
}
