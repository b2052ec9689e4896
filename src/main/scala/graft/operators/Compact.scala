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

  /** Hive-partitioned layout: write `df` with `partCols` as directory
    * partitions so every later reader's equality/IN predicate on those
    * columns prunes at PLANNING time — the scan's `PartitionFilters`
    * eliminate whole directories and zero data files of other
    * partitions are ever opened (CompactSpec asserts both the plan
    * shape and the inputFiles set). This is the coarse-grained
    * complement of [[writeSized]]'s row-group min/max clustering:
    * partition dirs prune without reading footers at all, min/max
    * stats prune within the surviving dirs. Choose LOW-cardinality
    * partition columns — a high-cardinality partitionBy shatters the
    * table into the millions-of-tiny-files failure mode this object
    * exists to prevent.
    *
    * Type-fidelity caveat: partitionBy removes `partCols` from the
    * data files; readers re-INFER their types from directory names.
    * A STRING partition column holding numeric-looking values (e.g.
    * "01") reads back as INT with the leading zero gone. Readers of
    * such layouts must set
    * `spark.sql.sources.partitionColumnTypeInference.enabled=false`
    * or supply an explicit schema to round-trip the type exactly
    * (CompactSpec pins both the failure and the fix).
    */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String],
                       rowsPerFile: Long = 1000000L): Unit = {
    require(partCols.nonEmpty, "writePartitioned needs at least one partition column")
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy(partCols: _*)
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
    *
    * Contract edges: a NULL id hashes via a reserved sentinel string,
    * so null-id rows get a deterministic shard instead of silently
    * landing in `__HIVE_DEFAULT_PARTITION__`; a shard that receives no
    * rows produces NO `__shard=k` directory — readers must treat a
    * missing shard directory as empty, not an error.
    */
  def shardedWrite(df: DataFrame, path: String, idCol: String,
                   numShards: Int, sortCols: Seq[String]): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(!df.columns.contains("__shard"),
      "input already has a __shard column — rename it before re-sharding, " +
        "or partitionBy would silently replace it in the output")
    import org.apache.spark.sql.functions.{coalesce, lit, pmod}
    val id = coalesce(col(idCol).cast("string"), lit("\u0000graft-null-id"))
    df.withColumn("__shard",
        pmod(graft.functions.HashFunctions.stableHash56(id), lit(numShards)).cast("int"))
      // range-partition on the shard index itself: ~one shard per write
      // task. Plain hash repartition murmurs the ALREADY-uniform index,
      // leaving ~1/e of tasks empty and stragglers writing 3-4 shards
      // sequentially at large numShards. Equal keys cannot split across
      // range boundaries, so each shard still lands in exactly one task.
      .repartitionByRange(numShards, col("__shard"))
      .sortWithinPartitions((col("__shard") +: sortCols.map(col)): _*)
      .write.mode("overwrite").partitionBy("__shard").parquet(path)
  }

  /** Delivery integrity manifest: per-shard (n_rows, xor_hash) over
    * the SAME shard assignment as [[shardedWrite]] (stable id hash %
    * numShards, null-id sentinel included), so a consumer can audit a
    * delivered dataset against the manifest — or two deliveries
    * against each other — without re-reading either in any particular
    * order. The row digest folds the id, the payload length, and the
    * payload (length is the NULL≠'' discriminator), and shard digests
    * combine by XOR: order-INSENSITIVE by design, so no sort, no
    * collect, and the aggregate combines map-side — the manifest of
    * 100 TB costs one scan and one tiny shuffle.
    *
    * Contract: any single-row change, addition, or removal flips
    * (n_rows, xor_hash). This is drift detection, not cryptography —
    * an adversary who can insert row PAIRS can cancel the XOR (the
    * count still moves); training-data delivery doesn't have
    * adversaries inside the write path.
    */
  def shardManifest(df: DataFrame, idCol: String, payloadCol: String,
                    numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    import org.apache.spark.sql.functions.{coalesce, concat_ws, count, expr,
      length, lit, pmod}
    val sid = coalesce(col(idCol).cast("string"), lit("\u0000graft-null-id"))
    val rowHash = graft.functions.HashFunctions.stableHash56(concat_ws(":",
      sid, coalesce(length(col(payloadCol)), lit(-1)),
      coalesce(col(payloadCol), lit(""))))
    df.select(
        pmod(graft.functions.HashFunctions.stableHash56(sid), lit(numShards))
          .cast("int").as("shard"),
        rowHash.as("__h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("xor_hash"))
  }
}
