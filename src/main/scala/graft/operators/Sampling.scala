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

  private def bucket(idCol: String, den: Int) =
    HashFunctions.stableHash56(col(idCol).cast("string")) % den
}
