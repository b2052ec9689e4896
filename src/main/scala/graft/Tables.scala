package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the benchmark tables (TPC-H-ish star schema + events/
  * documents/embeddings). One parquet file per table under a scale-factor
  * directory; see TESTDATA.md.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor. */
  val dimensions: Set[String] = Set("region", "nation", "customer", "supplier", "part")

  /** Load one table. `events.ts` is parquet TIMESTAMP(NANOS), which
    * Spark only reads as a raw long (spark.sql.legacy.parquet.
    * nanosAsLong=true — set in Verify/Bench/tests); convert it back to
    * a proper timestamp at µs precision (`div` keeps it exact — the
    * generator emits µs-granularity values).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    repairNanosTs(spark.read.parquet(s"$dir/$name.parquet"), name)

  /** Shared TIMESTAMP(NANOS) repair — used by the batch loader and the
    * streaming subscribe path so the two can't diverge.
    */
  def repairNanosTs(df: DataFrame, name: String): DataFrame =
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df

  /** Register every table as a temp view so `spark.sql` works over them. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Typed loader: `loadAs[graft.model.Lineitem](spark, dir, "lineitem")`. */
  def loadAs[T: org.apache.spark.sql.Encoder](spark: SparkSession, dir: String,
                                              name: String): org.apache.spark.sql.Dataset[T] =
    load(spark, dir, name).as[T]
}
