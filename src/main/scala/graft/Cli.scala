package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interactive query CLI (reference parity: `cmd/query/main.go` — the
  * reference ships a terminal client that sends a query string to the
  * endpoint and prints the result rows). Here the same session that
  * backs the Thrift endpoint is driven directly:
  *
  *   sbt "runMain graft.Cli /root/testdata/sf0.01"            # REPL
  *   sbt "runMain graft.Cli /root/testdata/sf0.01 -e 'SELECT …'"
  *   sbt "runMain graft.Cli /root/testdata/sf0.01 -f script.sql"
  *
  * The session carries the library's FULL SQL surface — the testdata
  * tables, every kernel under its SQL name (GraftExtensions), and the
  * metrics views (`graft_metrics_summary`, `graft_plan_metrics`) — so
  * anything a JDBC client can ask the endpoint, this shell answers
  * too. Statements end at a line-terminating `;` (multi-line input
  * accumulates until one); `\q` quits; `\metrics <name>` is the
  * debugging shortcut: the per-operator metric breakdown of query
  * `<name>`'s LATEST recorded run, straight off `graft_plan_metrics`
  * (node id/name, metric, value) without typing the latest-run
  * subquery by hand.
  *
  * `-f` runs a multi-statement script: the same line-terminating-`;`
  * convention as the REPL (so a script is literally a transcript),
  * statements executed in order, each echoed above its result, errors
  * inline — statement k failing never stops statement k+1, the batch
  * analogue of "a bad query never kills the shell".
  *
  * [[execute]] is the testable core: one statement in, one rendered
  * table (or `ERROR: …`) out — errors never kill the shell, matching
  * how the reference CLI surfaces a failed query. [[runScript]] and
  * [[executeStatement]] are the script/shortcut cores, spec-driven the
  * same way.
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

  /** One REPL/script statement: plain SQL, or the `\metrics <name>`
    * shortcut — the per-operator rows of `<name>`'s latest recorded
    * run (max run_id), ordered by node id so the table reads like the
    * plan tree.
    */
  private[graft] def executeStatement(spark: SparkSession, stmt: String,
                                      maxRows: Int = 50): String = {
    val t = stmt.trim.stripSuffix(";").trim
    if (t.startsWith("\\metrics")) {
      val name = t.stripPrefix("\\metrics").trim
      if (name.isEmpty) "ERROR: usage: \\metrics <query-name>"
      else execute(spark,
        s"""SELECT node_id, node_name, metric_name, value FROM graft_plan_metrics
           |WHERE name = '${name.replace("'", "''")}'
           |  AND run_id = (SELECT max(run_id) FROM graft_plan_metrics
           |                WHERE name = '${name.replace("'", "''")}')
           |ORDER BY node_id, metric_name""".stripMargin,
        maxRows = math.max(maxRows, 200)) // plans have many operator rows
    } else execute(spark, t, maxRows)
  }

  /** Split a script into statements: lines accumulate until one ends
    * with `;` (the REPL convention — a script is a transcript); a line
    * starting with `\` is a complete statement by itself; a trailing
    * unterminated chunk still runs (lenient on the last `;`).
    */
  private[graft] def splitScript(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val buf = new StringBuilder
    text.linesIterator.foreach { line =>
      if (buf.isEmpty && line.trim.startsWith("\\")) out += line.trim
      else {
        buf.append(line).append('\n')
        if (line.trim.endsWith(";")) {
          val stmt = buf.toString.trim
          buf.clear()
          if (stmt.stripSuffix(";").trim.nonEmpty) out += stmt
        }
      }
    }
    val last = buf.toString.trim
    if (last.stripSuffix(";").trim.nonEmpty) out += last
    out.toSeq
  }

  /** Run every statement of a script in order; a failed statement
    * reports inline and the next one still runs. Returns
    * (statement, rendered output) pairs.
    */
  private[graft] def runScript(spark: SparkSession, text: String,
                               maxRows: Int = 50): Seq[(String, String)] =
    splitScript(text).map(s => s -> executeStatement(spark, s, maxRows))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Cli <sfDir> [-e 'SQL' | -f script.sql]")
    val sfDir = args(0)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, sfDir)
    graft.metrics.MetricsService.register(spark)
    if (args.length >= 3 && args(1) == "-e") {
      println(executeStatement(spark, args(2)))
    } else if (args.length >= 3 && args(1) == "-f") {
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(args(2))), java.nio.charset.StandardCharsets.UTF_8)
      runScript(spark, text).foreach { case (stmt, out) =>
        println(stmt.linesIterator.map("-- " + _).mkString("\n"))
        println(out)
        println()
      }
    } else {
      println(s"graft SQL shell over $sfDir — end statements with ';', " +
        "\\metrics <name> for a plan breakdown, \\q quits")
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
      val buf = new StringBuilder
      var line = in.readLine()
      while (line != null && line.trim != "\\q") {
        if (buf.isEmpty && line.trim.startsWith("\\")) {
          println(executeStatement(spark, line.trim))
        } else {
          buf.append(line).append('\n')
          if (line.trim.endsWith(";")) {
            val stmt = buf.toString.trim
            buf.clear()
            if (stmt.stripSuffix(";").trim.nonEmpty)
              println(executeStatement(spark, stmt))
          }
        }
        line = in.readLine()
      }
    }
    spark.stop()
  }
}
