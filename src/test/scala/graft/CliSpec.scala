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
}
