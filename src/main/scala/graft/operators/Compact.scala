package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Output compaction / file sizing — the unglamorous half of a 100-TB
  * pipeline: downstream readers die on millions of kilobyte files and
  * on single multi-gigabyte ones alike.
  */
object Compact {

  /** Write `df` with a bounded number of rows per file, range-clustered
    * on `sortCols` (so parquet min/max stats prune on those columns for
    * every later reader). `estimatedRows` avoids forcing a count when
    * the caller already knows the cardinality.
    */
  def writeSized(df: DataFrame, path: String, rowsPerFile: Long,
                 sortCols: Seq[String], estimatedRows: Long = -1L): Unit = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    val rows = if (estimatedRows > 0) estimatedRows else df.count()
    // Long math + clamp: a huge rows/rowsPerFile ratio must not saturate
    // Int and request ~2^31 partitions
    val files = math.min((rows + rowsPerFile - 1) / rowsPerFile, 1000000L).max(1L).toInt
    val clustered =
      if (sortCols.isEmpty) df.repartition(files)
      else df.repartitionByRange(files, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    clustered.write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .parquet(path)
  }

  /** Deterministic training shards: every row lands in shard
    * `stableHash56(id) % numShards` regardless of input partitioning or
    * cluster size, and rows within a shard are written in `sortCols`
    * order — so a training run reading shard k sees THE SAME example
    * sequence on every rebuild (reproducible data delivery, the
    * write-side complement of [[graft.operators.Pack]]'s batch
    * assignment). Give `sortCols` a total order (include the id) or
    * within-tie order follows the shuffle.
    *
    * All rows of one shard hash to one task, so each `__shard=k`
    * directory is a single file whose row order IS the sort order.
    */
  def shardedWrite(df: DataFrame, path: String, idCol: String,
                   numShards: Int, sortCols: Seq[String]): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    df.withColumn("__shard",
        org.apache.spark.sql.functions.pmod(
          graft.functions.HashFunctions.stableHash56(col(idCol).cast("string")),
          org.apache.spark.sql.functions.lit(numShards)).cast("int"))
      .repartition(numShards, col("__shard"))
      .sortWithinPartitions((col("__shard") +: sortCols.map(col)): _*)
      .write.mode("overwrite").partitionBy("__shard").parquet(path)
  }
}
