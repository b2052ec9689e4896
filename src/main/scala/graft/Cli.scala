package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interactive query CLI (reference parity: `cmd/query/main.go` — the
  * reference ships a terminal client that sends a query string to the
  * endpoint and prints the result rows). Here the same session that
  * backs the Thrift endpoint is driven directly:
  *
  *   sbt "runMain graft.Cli /root/testdata/sf0.01"            # REPL
  *   sbt "runMain graft.Cli /root/testdata/sf0.01 -e 'SELECT …'"
  *
  * The session carries the library's FULL SQL surface — the testdata
  * tables, every kernel under its SQL name (GraftExtensions), and the
  * metrics views (`graft_metrics_summary`, `graft_plan_metrics`) — so
  * anything a JDBC client can ask the endpoint, this shell answers
  * too. Statements end at a line-terminating `;` (multi-line input
  * accumulates until one); `\q` quits.
  *
  * [[execute]] is the testable core: one statement in, one rendered
  * table (or `ERROR: …`) out — errors never kill the shell, matching
  * how the reference CLI surfaces a failed query.
  */
object Cli {

  /** Run one SQL statement and render the result as an aligned text
    * table, capped at `maxRows` (the driver must never collect an
    * unbounded result — the cap is the CLI's OOM guard, and the
    * truncation is stated in the footer).
    */
  def execute(spark: SparkSession, sql: String, maxRows: Int = 50): String =
    try render(spark.sql(sql), maxRows)
    catch { case e: Exception =>
      s"ERROR: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName).linesIterator.take(4).mkString(" ")}" }

  private[graft] def render(df: DataFrame, maxRows: Int): String = {
    val rows = df.limit(maxRows + 1).collect()
    val truncated = rows.length > maxRows
    val shown = rows.take(maxRows)
    val cols = df.columns
    val cells = shown.map(_.toSeq.map {
      case null => "NULL"
      case a: Array[_] => a.mkString("[", ",", "]")
      case s: Seq[_] => s.mkString("[", ",", "]")
      case v => String.valueOf(v)
    })
    val widths = cols.indices.map { i =>
      (cols(i).length +: cells.map(_(i).length)).max
    }
    def line(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    val body = (line(cols.toSeq) +: sep +: cells.map(c => line(c.toSeq))).mkString("\n")
    val footer =
      if (truncated) s"\n(first $maxRows rows shown)"
      else s"\n(${shown.length} row${if (shown.length == 1) "" else "s"})"
    body + footer
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Cli <sfDir> [-e 'SQL']")
    val sfDir = args(0)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, sfDir)
    graft.metrics.MetricsService.register(spark)
    if (args.length >= 3 && args(1) == "-e") {
      println(execute(spark, args(2)))
    } else {
      println(s"graft SQL shell over $sfDir — end statements with ';', \\q quits")
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
      val buf = new StringBuilder
      var line = in.readLine()
      while (line != null && line.trim != "\\q") {
        buf.append(line).append('\n')
        if (line.trim.endsWith(";")) {
          val stmt = buf.toString.trim.stripSuffix(";")
          buf.clear()
          if (stmt.nonEmpty) println(execute(spark, stmt))
        }
        line = in.readLine()
      }
    }
    spark.stop()
  }
}
