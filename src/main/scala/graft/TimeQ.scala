package graft

import org.apache.spark.sql.SparkSession

/** Time one named query in isolation: `runMain graft.TimeQ <name> [sfDir]`.
  * Same session config and clearCache methodology as graft.Bench —
  * for adjudicating single-query perf questions without a full bench.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warmup
    val times = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"TIMEQ $name median=${times(1)}%.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
