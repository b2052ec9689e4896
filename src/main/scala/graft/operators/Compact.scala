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
}
