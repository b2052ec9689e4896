package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files — the
  * before/after plan evidence for optimization rounds.
  * Usage: runMain graft.PlanQ <outDir> <suffix> <query> [query ...]
  * Writes <outDir>/<query>_<suffix>.txt for each query.
  */
object PlanQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanQ <outDir> <suffix> <query>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val registry = Queries.asMap
    val unknown = names.filterNot(registry.contains)
    require(unknown.isEmpty,
      s"unknown quer${if (unknown.size == 1) "y" else "ies"}: " +
        s"${unknown.mkString(", ")} — valid names:\n" +
        registry.keysIterator.toSeq.sorted.mkString(", "))
    names.foreach { name =>
      val df = registry(name).build(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val lines = plan.linesIterator.toSeq
      val shown =
        if (lines.size <= 600) plan
        else lines.take(600).mkString("\n") +
          s"\n… (${lines.size - 600} more lines elided — iterative lineage)"
      val textSafe = shown.map(c =>
        if (c < ' ' && c != '\n' && c != '\t') f"\\u${c.toInt}%04x" else c.toString).mkString
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), textSafe + "\n")
      println(s"wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
