package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.Path

/** Object-store source with arrival subscribe (reference: the S3
  * datastore driver, internal/qpu_classes/datastore_driver/s3/
  * store.go:122 `SubscribeOps` / :209 `opConsumer` — list the bucket
  * for the snapshot, then consume PUT notifications for the tail).
  *
  * Spark-first mapping: a bucket is a path (file://, hdfs://, s3a://
  * — everything goes through the Hadoop FileSystem resolved from the
  * path's own scheme), an object is a file committed ATOMICALLY
  * (write-to-temp + rename, the same visibility contract S3 PUT
  * gives), and the notification stream is Structured Streaming's file
  * source: each micro-batch's newly-listed files ARE the arrival
  * notifications, replayed from the initial listing first — so one
  * continuous query natively yields the reference's State catch-up
  * followed by the Delta tail, with `_metadata` tagging which phase a
  * row belongs to.
  *
  * At 100 TB the bucket listing, not the data volume, is the scale
  * hazard: list cost is per-object, so objects should be
  * file-compaction-sized (the Compact operator's job), and the
  * `maxFilesPerTrigger` option bounds per-batch admission the way the
  * reference's notification queue does.
  */
object ObjectStore {

  /** Atomic PUT of a NEW object: stage under a hidden temp name in
    * the bucket (same filesystem, so rename is a metadata move), then
    * rename into place. A subscriber listing mid-write never sees a
    * partial object — dot-prefixed files are invisible to Spark's
    * file listing.
    *
    * Objects are IMMUTABLE by default: put() refuses an existing key.
    * That is the contract the subscribe side is built on — the file
    * stream source tracks seen files by PATH, so an in-place
    * overwrite would (a) open a delete-to-rename window where a
    * reader sees the key missing and (b) never be re-delivered as a
    * Delta row. Pass `overwrite = true` only for batch-side
    * maintenance (compaction, backfill repair) where those caveats
    * are understood; live updates belong in a NEW key (versioned
    * object names), which subscribers receive as a normal arrival.
    */
  def put(spark: SparkSession, bucket: String, key: String, df: DataFrame,
          overwrite: Boolean = false): Unit = {
    require(!key.contains("/"), s"object key must be flat, got '$key'")
    val conf = spark.sessionState.newHadoopConf()
    val bucketPath = new Path(bucket)
    val fs = bucketPath.getFileSystem(conf)
    fs.mkdirs(bucketPath)
    val dest = new Path(bucketPath, key)
    require(overwrite || !fs.exists(dest),
      s"object '$key' exists; objects are immutable — PUT a new (versioned) " +
        "key, or pass overwrite = true for batch-side maintenance")
    val stage = new Path(bucket, s".stage-$key")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    // the staged write is a directory holding one part file; the part
    // file is the object
    val part = fs.listStatus(stage).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file staged for $key"))
    if (overwrite && fs.exists(dest)) fs.delete(dest, false)
    require(fs.rename(part, dest), s"atomic commit failed for $key")
    fs.delete(stage, true)
  }

  /** Bucket listing — the snapshot side of the reference's
    * ListObjects: one row per visible object (key, size, mtime).
    * Driver-side listing is correct here: this is control-plane
    * metadata (object inventory), not data.
    */
  def list(spark: SparkSession, bucket: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val bucketPath = new Path(bucket)
    val fs = bucketPath.getFileSystem(conf)
    val rows =
      if (!fs.exists(bucketPath)) Seq.empty
      else fs.listStatus(bucketPath).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
    rows.toDF("key", "size", "mtime")
  }

  /** Batch read of every visible object — the snapshot query. */
  def read(spark: SparkSession, bucket: String): DataFrame =
    spark.read.parquet(bucket)

  /** SubscribeOps: one continuous query = State catch-up over the
    * objects present at subscribe time, then a Delta tail of every
    * later arrival. `_object` is the arriving object's key and
    * `_phase` is 'state' or 'delta', decided against the subscribe-
    * time listing — the Spark shape of the reference's State /
    * EndOfStream / Delta record framing.
    */
  def subscribe(spark: SparkSession, bucket: String,
                schema: StructType,
                maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // subscribe-time inventory as a broadcast stream-static join, not
    // an IN-list: a production bucket holds 1e5+ objects and an
    // embedded literal list that size would bloat every micro-batch's
    // plan; the broadcast is one small hash relation built once
    val initial = broadcast(
      list(spark, bucket).select(col("key").as("__initial_key")))
    // maxFileAge defaults to 7d and silently EXCLUDES older files from
    // a new stream — a bucket with week-old objects would lose part of
    // its State catch-up. Snapshot-and-subscribe semantics require the
    // full inventory, whatever its age.
    val reader = spark.readStream.schema(schema)
      .option("maxFileAge", "36500d")
    val tuned = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
    val raw = tuned.parquet(bucket)
    val keyCol = element_at(split(col("_metadata.file_path"), "/"), -1)
    raw.withColumn("_object", keyCol)
      .join(initial, col("_object") === col("__initial_key"), "left")
      .withColumn("_phase",
        when(col("__initial_key").isNotNull, lit("state")).otherwise(lit("delta")))
      .drop("__initial_key")
  }
}
