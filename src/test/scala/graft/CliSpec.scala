package graft

/** The query CLI's testable core: one statement in, one rendered table
  * out, errors surfaced inline (reference parity: cmd/query/main.go).
  */
class CliSpec extends SparkSpecBase {

  test("cli: renders an aligned table with a row-count footer") {
    Tables.registerAll(spark, sf())
    val out = Cli.execute(spark,
      "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 2 ORDER BY n_nationkey")
    assert(out.contains("n_nationkey") && out.contains("NATION_0") && out.contains("NATION_1"))
    assert(out.contains("(2 rows)"), s"footer missing: $out")
    // aligned: every data line has the same width as the header line
    val lines = out.linesIterator.toSeq.dropRight(1)
    assert(lines.map(_.length).distinct.size === 1, s"misaligned table:\n$out")
  }

  test("cli: kernel functions resolve by SQL name; truncation is stated") {
    graft.plans.GraftExtensions.register(spark) // what Cli.main's session does
    Tables.registerAll(spark, sf())
    val k = Cli.execute(spark,
      "SELECT cosine_sim(array(cast(1.0 AS float), cast(0.0 AS float)), " +
      "array(cast(1.0 AS float), cast(0.0 AS float))) AS cs")
    assert(k.contains("1.0"), s"kernel result missing: $k")
    val t = Cli.execute(spark, "SELECT doc_id FROM documents", maxRows = 5)
    assert(t.contains("(first 5 rows shown)"), s"truncation footer missing: $t")
  }

  test("cli: a bad statement returns ERROR text instead of throwing") {
    val out = Cli.execute(spark, "SELECT FROM nowhere AT ALL")
    assert(out.startsWith("ERROR:"), s"expected inline error, got: $out")
  }

  test("cli: -f script runs every statement in order; a failing one doesn't stop the rest") {
    Tables.registerAll(spark, sf())
    val script =
      """-- per-nation customer count (multi-line statement)
        |SELECT n_nationkey
        |FROM nation WHERE n_nationkey = 1;
        |SELECT broken FROM nowhere;
        |SELECT count(*) AS n FROM region;
        |""".stripMargin
    val results = Cli.runScript(spark, script)
    assert(results.size === 3, s"3 statements expected: ${results.map(_._1)}")
    assert(results(0)._2.contains("(1 row)"), s"statement 1: ${results(0)._2}")
    assert(results(1)._2.startsWith("ERROR:"), "statement 2 must fail inline")
    assert(results(2)._2.contains("(1 row)") && results(2)._2.contains("5"),
      s"statement 3 must still run after the failure: ${results(2)._2}")
    // unterminated last statement is lenient
    assert(Cli.splitScript("SELECT 1").size === 1)
  }

  test("cli: \\metrics <name> renders the latest run's per-operator plan breakdown") {
    import graft.metrics.{MetricsService, PlanMetricsRegistry}
    Tables.registerAll(spark, sf())
    MetricsService.register(spark)
    PlanMetricsRegistry.clear()
    MetricsService.recordPlan(spark, "cli_probe")(
      spark.sql("SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1"))
    val first = Cli.executeStatement(spark, "\\metrics cli_probe")
    assert(first.contains("number of output rows") || first.contains("Exchange"),
      s"plan metric rows expected: $first")
    // record a SECOND run — the shortcut must show only the latest
    MetricsService.recordPlan(spark, "cli_probe")(
      spark.sql("SELECT count(*) FROM orders"))
    val latest = Cli.executeStatement(spark, "\\metrics cli_probe")
    assert(!latest.contains("o_orderpriority") || latest != first,
      "shortcut must re-resolve to the latest run")
    assert(Cli.executeStatement(spark, "\\metrics").startsWith("ERROR: usage"),
      "missing name is a usage error")
    assert(Cli.executeStatement(spark, "\\metrics no_such_query").contains("(0 rows)"),
      "unknown query renders an empty table, not an exception")
  }
}
