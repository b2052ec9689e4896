package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merkle-bucket snapshot reconciliation: which rows changed between
  * two snapshots of a table — the pattern that makes a 100 TB diff
  * affordable. A naive `EXCEPT` both ways shuffles BOTH full
  * snapshots; here each side is first reduced to per-bucket
  * (xor-of-row-digests, count) summaries — one combinable aggregation
  * per side, shuffle cardinality `nBuckets` however large the table,
  * the same order-insensitive digest algebra as the delivery manifest
  * (SURVEY row 126). Buckets whose summaries agree are proven equal
  * as MULTISETS (xor + count collide only adversarially for 64-bit
  * digests) and never shuffle a row; the exact `EXCEPT` runs only
  * over the differing buckets' rows — under drift rates real
  * pipelines see (<<1% of buckets touched), the row-level work is a
  * vanishing fraction of either snapshot.
  *
  * Output: (side, key) with side ∈ {added, removed} — a row modified
  * in place reports as both (its key leaves one version and gains
  * another), which is exactly what a reconciler replays. Equal to the
  * full two-way EXCEPT by construction; the oracle replays that
  * definition directly.
  */
object Reconcile {

  def tableDiff(a: DataFrame, b: DataFrame, keyCol: String,
                nBuckets: Int = 4096): DataFrame = {
    require(a.columns.sameElements(b.columns),
      s"snapshot schemas must match: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val cols = a.columns.map(col).toSeq
    def bucketed(df: DataFrame): DataFrame = df
      .withColumn("__digest", xxhash64(cols: _*))
      .withColumn("__bucket", pmod(xxhash64(col(keyCol)), lit(nBuckets)))
    def summary(df: DataFrame): DataFrame = bucketed(df)
      .groupBy("__bucket")
      .agg(expr("bit_xor(__digest)").as("__xor"), count(lit(1)).as("__n"))
    val dirty = summary(a).as("sa")
      .join(summary(b).as("sb"), Seq("__bucket"), "full_outer")
      .filter(col("sa.__xor").isNull || col("sb.__xor").isNull ||
        col("sa.__xor") =!= col("sb.__xor") || col("sa.__n") =!= col("sb.__n"))
      .select(col("__bucket"))
    // the dirty-bucket list is drift-sized; broadcast it into both
    // pruned scans so only differing buckets' rows reach the EXCEPT
    def pruned(df: DataFrame): DataFrame = bucketed(df)
      .join(broadcast(dirty), Seq("__bucket"), "left_semi")
      .select(cols: _*)
    pruned(b).exceptAll(pruned(a)).select(lit("added").as("side"), col(keyCol).as("key"))
      .union(pruned(a).exceptAll(pruned(b))
        .select(lit("removed").as("side"), col(keyCol).as("key")))
  }
}
