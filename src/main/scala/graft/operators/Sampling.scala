package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling — the way a training
  * pipeline must split data: membership depends only on the row's id
  * (md5-derived), so the same row lands in the same split on every
  * run, every engine, every cluster size; splits are disjoint and
  * exhaustive by construction. `df.sample()` (seeded per-partition
  * RNG) cannot give any of those guarantees under repartitioning.
  */
object Sampling {

  /** Rows whose stable hash lands in [lo, hi) of `den` buckets. */
  def hashBucketSample(df: DataFrame, idCol: String,
                       lo: Int, hi: Int, den: Int = 100): DataFrame =
    df.filter(bucket(idCol, den) >= lo && bucket(idCol, den) < hi)

  /** (train, test) split with `testPct`% in test — disjoint, stable. */
  def trainTestSplit(df: DataFrame, idCol: String,
                     testPct: Int): (DataFrame, DataFrame) = {
    require(testPct > 0 && testPct < 100)
    (hashBucketSample(df, idCol, testPct, 100),
      hashBucketSample(df, idCol, 0, testPct))
  }

  /** Stratified (per-group) deterministic sampling — domain mixing for
    * a training corpus: each group keeps `rates(group)` percent of its
    * rows (groups absent from `rates` keep `defaultPct`). Membership
    * is the same stable id hash as [[hashBucketSample]], so re-runs,
    * engines, and cluster sizes all agree, and a row's fate never
    * depends on which other rows exist. Pure map-side filter — no
    * shuffle, no per-group count pass.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, groupCol: String,
                           rates: Map[String, Int],
                           defaultPct: Int = 0): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (g, p)) =>
      when(col(groupCol) === lit(g), lit(p)).otherwise(acc)
    }
    df.filter(bucket(idCol, 100) < pct)
  }

  /** Per-group CAP (domain balancing): keep at most `cap` rows per
    * group — the "no domain may exceed N documents" rule of corpus
    * mixing — selecting the rows with the smallest stable id hashes,
    * so the kept subset is deterministic, engine-portable, and stable
    * under corpus growth (a group's survivors only change when a new
    * row hashes below its current cap-th hash).
    *
    * Scale shape: selection is the map-side-combinable bottom-k
    * aggregator ([[graft.functions.TopKAgg]] on the negated hash), NOT
    * a `row_number` window — a hot domain with billions of rows
    * reduces to `cap` rows per partition before the shuffle instead of
    * sorting the whole domain in one task. The hash is truncated to 52
    * bits so its double representation in the aggregator is EXACT
    * (56-bit values round in a 53-bit mantissa, which could reorder
    * near-equal hashes vs. the integer-ordering oracle).
    *
    * Output: (group, id, rank) with rank 1..cap by (hash, id).
    */
  def perGroupCap(df: DataFrame, groupCol: String, idCol: String,
                  cap: Int): DataFrame = {
    val h52 = HashFunctions.stableHash52(col(idCol).cast("string"))
    df.select(col(groupCol), col(idCol), h52.as("__h"))
      .groupBy(groupCol)
      .agg(graft.functions.TopKAgg.topK(cap)(col(idCol), -col("__h").cast("double"))
        .as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "nb")))
      .select(col(groupCol), col("nb._1").as(idCol), (col("pos") + 1).as("rank"))
  }

  /** Leakage-free train/test split: membership is decided by the
    * stable hash of each document's NEAR-DUP CLUSTER id
    * ([[Dedup.minhashClusters]]), not its own id — so a near-duplicate
    * pair can never straddle the split and leak training text into
    * evaluation (the failure mode of any per-row split on a
    * deduplicated-in-name-only corpus). Split fractions hold in
    * expectation over clusters; big clusters move as units, which is
    * the point.
    *
    * The no-straddle guarantee requires CONVERGED labels, so the
    * default runs label propagation to fixpoint — a component deeper
    * than the bounded hop+jump rounds would otherwise carry two
    * labels, which can hash to opposite sides. `toFixpoint = false`
    * trades that worst-case-depth guarantee for round-for-round SQL
    * replayability (the oracled query's form; equivalent wherever the
    * bounded rounds converge, which DedupSpec pins on the test
    * corpora).
    */
  def clusterAwareSplit(df: DataFrame, idCol: String, textCol: String,
                        testPct: Int, bands: Int = 2, rowsPerBand: Int = 4,
                        iterations: Int = 3,
                        toFixpoint: Boolean = true): DataFrame = {
    require(testPct > 0 && testPct < 100)
    Dedup.minhashClusters(df, idCol, textCol, bands, rowsPerBand, iterations,
      toFixpoint = toFixpoint)
      .select(col("doc_id"), col("cluster_id"),
        (HashFunctions.stableHash56(col("cluster_id").cast("string")) % 100 < testPct)
          .as("is_test"))
  }

  private def bucket(idCol: String, den: Int) =
    HashFunctions.stableHash56(col(idCol).cast("string")) % den
}
