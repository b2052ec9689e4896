package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a bipartite id↔bucket membership graph by
  * bounded alternating min-label propagation.
  *
  * Input: one row per (id, bucket) membership; ids sharing any bucket
  * end up in one component labeled by the component's min id. Each
  * round is two hash aggregations (both map-side combinable), so the
  * cost is `iterations × 2` shuffles of O(membership) rows — no
  * quadratic pair materialization anywhere. Components of diameter
  * ≤ 2^iterations converge; duplicate/near-dup clusters are
  * near-cliques, so small iteration counts suffice.
  */
object ConnectedComponents {

  /** `membership`: columns `id` plus `bucketCols`. Returns (id, label). */
  def propagateMinLabel(membership: DataFrame, bucketCols: Seq[String],
                        iterations: Int): DataFrame = {
    val mem = membership.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = mem.select(col("id")).distinct().withColumn("label", col("id"))
    for (_ <- 0 until iterations) {
      val bucketMin = mem.join(labels, "id")
        .groupBy(bucketCols.map(col): _*).agg(min("label").as("bmin"))
      labels = mem.join(bucketMin, bucketCols)
        .groupBy("id").agg(min("bmin").as("label"))
    }
    labels
  }
}
