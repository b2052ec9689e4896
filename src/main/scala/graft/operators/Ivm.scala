package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch incremental view maintenance — the OFFLINE half of the
  * reference's soul. Reference QPUs keep materialized state current by
  * applying each update notification to the state (sum QPU:
  * internal/qpu_classes/sum/sum.go applies deltas to the running sums;
  * join QPU: internal/qpu_classes/join/join.go upserts joined rows),
  * and this repo already has that STREAMING form (Subscribe
  * .incrementalSum / materializedJoin / parquetUpsertSink). But a
  * 100 TB pipeline refreshes most of its derived tables in batch: a
  * nightly CDC extract lands next to yesterday's materialized
  * aggregate, and recomputing the aggregate from the full base table
  * to absorb a 0.1% delta wastes 1000× the work. These operators apply
  * the delta directly to the materialized state, with results
  * spec-pinned EQUAL to full recompute (IvmSpec) and oracled against
  * the from-scratch SQL (`q_ivm_refresh`).
  *
  * Delta contract (Debezium-shaped, like [[graft.streaming.Subscribe
  * .fromChangelog]]): one row per base-table change with `opCol` ∈
  * {'I','D'}; an update travels as D(old) + I(new). Deltas must be
  * CONSISTENT with the state (a 'D' row was really in the base table):
  * group counts driven negative by a bad feed fail loudly rather than
  * merging garbage.
  *
  * Scale shape: the delta is aggregated FIRST (combinable, map-side),
  * so the merge join is state-keys × touched-keys — never base-table
  * sized; the parquet-backed variant rewrites only the partitions the
  * delta touches (same pruning discipline as `parquetUpsertSink`).
  */
object Ivm {

  /** Build the materialized group-by state: per key, `sum_<valCol>`
    * and `n_rows`. `n_rows` is not bookkeeping overhead — it is what
    * makes DELETION maintainable (a group vanishes exactly when its
    * count reaches zero, which a bare sum cannot detect).
    */
  def groupState(rows: DataFrame, keyCols: Seq[String], valCol: String): DataFrame =
    rows.groupBy(keyCols.map(col): _*)
      .agg(sum(col(valCol)).as(s"sum_$valCol"), count(lit(1)).as("n_rows"))

  /** Apply a CDC delta to a group-by-sum state without touching base
    * data: the delta collapses to per-key signed (Δsum, Δn) — one
    * combinable aggregate over the (small) delta — then merges into
    * the state by a full-outer join on the key. Groups whose count
    * reaches zero are dropped (matching full recompute); keys new in
    * the delta appear. A count driven NEGATIVE means the delta deleted
    * rows the state never had — that is a corrupt feed, and the
    * mismatch fails the run via `raise_error` instead of persisting a
    * poisoned state.
    */
  def applyGroupDelta(state: DataFrame, delta: DataFrame, opCol: String,
                      keyCols: Seq[String], valCol: String): DataFrame = {
    val sumCol = s"sum_$valCol"
    val sgn = when(col(opCol) === "I", lit(1L))
      .when(col(opCol) === "D", lit(-1L))
      .otherwise(raise_error(concat(lit("IVM delta op must be I or D, got: "),
        col(opCol))).cast("long"))
    val d = delta
      .select(keyCols.map(col) :+ sgn.as("__sgn") :+ col(valCol).as("__v"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sgn") * col("__v")).as("__dsum"), sum(col("__sgn")).as("__dn"))
    val merged = state.join(d, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("__dsum"), lit(0L))).as(sumCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n_rows")): _*)
    merged
      .withColumn("n_rows", when(col("n_rows") >= 0, col("n_rows"))
        .otherwise(raise_error(concat(lit("IVM count went negative — delta deletes "
          + "rows the state does not have, key: "), concat_ws(",", keyCols.map(c =>
            col(c).cast("string")): _*))).cast("long")))
      .filter(col("n_rows") > 0)
  }

  /** Maintain a materialized EQUI-JOIN under deltas to the fact side:
    * J = R ⋈ S keyed by R's primary key `rIdCol` (each fact row joins
    * at most one dimension row — the star-schema case). Deletes drop
    * the matching materialized rows by id (one keyed anti join);
    * inserts join ONLY the delta against the dimension (ΔR ⋈ S — the
    * classic delta rule; the base table R is never read). An update
    * travels as D+I and lands in both branches.
    */
  def applyJoinDelta(matJoin: DataFrame, deltaR: DataFrame, opCol: String,
                     rIdCol: String, dim: DataFrame, joinKey: String): DataFrame = {
    val dels = deltaR.filter(col(opCol) === "D").select(col(rIdCol))
    val ins = deltaR.filter(col(opCol) === "I").drop(opCol).join(dim, joinKey)
    matJoin.join(dels, Seq(rIdCol), "left_anti")
      .unionByName(ins.select(matJoin.columns.map(col): _*))
  }

  /** Parquet-backed refresh of a materialized group-by-sum table: read
    * ONLY the partitions the delta touches, merge with
    * [[applyGroupDelta]], rewrite only those partitions (write-scoped
    * dynamic overwrite — untouched partitions' files are never
    * opened). `partitionCol` must be one of `keyCols` (the partition
    * is then automatically a pure function of the key, so a group
    * never migrates between partitions). Same bounded-collect guard as
    * `Subscribe.upsertBatch`: the distinct partition values
    * parameterize the read-back filter, so a high-cardinality
    * partition choice fails with a named error, not an OOM.
    */
  def refreshGroupBySumTable(path: String, delta: DataFrame, opCol: String,
                             keyCols: Seq[String], valCol: String,
                             partitionCol: String,
                             maxPartitionsPerBatch: Int = 4096): Unit = {
    require(keyCols.contains(partitionCol),
      s"partitionCol '$partitionCol' must be one of the group keys $keyCols")
    val spark = delta.sparkSession
    val parts = delta.select(partitionCol).distinct()
      .limit(maxPartitionsPerBatch + 1).collect().map(_.get(0))
    require(parts.length <= maxPartitionsPerBatch,
      s"delta touches > $maxPartitionsPerBatch distinct '$partitionCol' partitions — " +
        "choose a lower-cardinality partition column or raise the bound")
    if (parts.isEmpty) return
    require(!parts.contains(null),
      s"null '$partitionCol' partition values are not supported — " +
        "map them to a sentinel before refreshing")
    // empty frame with the STATE's schema (keys + sum + count) — pins
    // the read-back types so partition-column inference can't retype
    val stateShape = groupState(delta.limit(0), keyCols, valCol)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (!fs.exists(hPath)) stateShape
      else spark.read.schema(stateShape.schema).parquet(path)
        .filter(col(partitionCol).isin(parts.toIndexedSeq: _*))
    val merged = applyGroupDelta(existing, delta, opCol, keyCols, valCol)
      .localCheckpoint(true) // severs lineage from the files being overwritten
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(path)
    // dynamic overwrite only replaces partitions PRESENT in the written
    // data: a touched partition whose groups ALL vanished writes no
    // rows, so its stale directory must be dropped explicitly or reads
    // would resurrect the deleted groups
    val survived = merged.select(partitionCol).distinct().collect().map(_.get(0)).toSet
    parts.filterNot(survived.contains).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(hPath, s"$partitionCol=$v"), true)
    }
  }
}
