package graft

import org.apache.spark.sql.SparkSession

/** Bench-delta adjudication harness (the round-3 q5 protocol): run one
  * query N times under [[QueryMetrics]], each run interleaved between
  * heavy "load" queries in the SAME JVM/session to mimic the bench's
  * ordering and memory pressure (GC debt, cache churn, listener-bus
  * backlog). If the profiled byte/record volumes are identical across
  * runs while wall time spreads, the spread is environment contention,
  * not a plan regression.
  *
  * Usage: runMain graft.AdjudicateQ <query> [sfDir] [runs]
  */
object AdjudicateQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 6
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
    val target = SparkEntry.queries(name)
    // heavies that precede the target in Bench's alphabetical order —
    // the contention the driver's recorded number was measured under
    val load = Seq("dedup_minhash", "dedup_shingle", "dedup_cluster", "q_substring_pairs")
      .filterNot(_ == name).map(SparkEntry.queries)
    target(spark, sfDir).count() // warmup (parquet footers, codegen)
    val stats = (1 to runs).map { i =>
      load.foreach(q => q(spark, sfDir).count())
      spark.catalog.clearCache()
      val (_, s) = QueryMetrics.profile(spark) { target(spark, sfDir).count() }
      println(f"ADJUDICATE $name run=$i wall=${s.wallMs / 1000.0}%.2fs " +
        s"records=${s.recordsRead} bytes=${s.bytesRead} " +
        s"shufW=${s.shuffleBytesWritten} shufR=${s.shuffleBytesRead}")
      s
    }
    val walls = stats.map(_.wallMs / 1000.0).sorted
    val distinctVolumes = stats.map(s =>
      (s.recordsRead, s.bytesRead, s.shuffleBytesWritten, s.shuffleBytesRead)).distinct
    println(f"ADJUDICATE $name SUMMARY median=${walls(walls.size / 2)}%.2fs " +
      f"min=${walls.head}%.2fs max=${walls.last}%.2fs " +
      s"distinct_volume_signatures=${distinctVolumes.size}")
    spark.stop()
  }
}
