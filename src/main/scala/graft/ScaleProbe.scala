package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the driver contract): replicates the
  * sf0.1 documents corpus N× with distinct ids and times the dedup
  * operators, to check the candidate-generation cost curves hold
  * beyond the benchmark scale. Run:
  * `sbt "runMain graft.ScaleProbe 10"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val big = (0 until factor).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
    }.reduce(_.unionByName(_)).cache()
    val n = big.count()
    println(s"corpus=$n docs")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    time("dedup_exact")(Dedup.exact(big, "doc_id", "text").count())
    time("editdist_pairs")(Dedup.editDistancePairs(big, "doc_id", "text",
      maxDist = 8).count())
    time("minhash_clusters")(Dedup.minhashClusters(big, "doc_id", "text", 2, 4).count())
    if (factor <= 10) {
      // pair-emission output grows with the SQUARE of duplicate
      // multiplicity — the whole reason the cluster contract exists;
      // beyond 10x the pair queries are measuring output writing, not
      // the operator
      time("minhash_pairs")(Dedup.minhashDedup(big, "doc_id", "text", 2, 4, 9, 10).count())
      time("simhash")(Dedup.simhashPairs(big, "doc_id", "text", 3).count())
      time("shingle")(Dedup.shinglePairs(big, "doc_id", "text",
        Seq("source", "lang"), 5, 7, 10).count())
    }
    spark.stop()
  }
}
