package graft

import org.apache.spark.sql.functions._

/** Equivalence pins for round-14 optimization rewrites: every rewrite
  * must produce the EXACT rows the pre-optimization shape produced
  * (the DuckDB oracles replay the OLD formulas, so any divergence is a
  * red correctness row, not just a perf delta).
  */
class Round14OptSpec extends SparkSpecBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "src_a", "the quick brown fox jumps over the lazy dog"),
      (2L, "src_a", "aaaa"), // heavy repetition → low entropy
      (3L, "src_a", "ab"), // exactly one bigram
      (4L, "src_a", "x"), // single char → NO bigram → excluded
      (5L, "src_a", ""), // empty → excluded
      (6L, "src_b", null.asInstanceOf[String]), // NULL text → excluded
      (7L, "src_b", "unicode tökens żółć 中文 é́"), // combining marks
      (8L, "src_b", "😀😀a"), // non-BMP emoji pair + ascii
      (9L, "src_b", "😀") // ONE non-BMP code point → excluded
    ).toDF("doc_id", "source", "text")
  }

  test("CharBigramEntropyQ == the explode+groupBy pipeline it replaced") {
    val kernel = docs
      .filter(col("source").isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"),
        graft.plans.CharBigramEntropyQ(col("text")).as("h_q"))
      .filter(col("h_q").isNotNull)
    val exploded = {
      val grams = docs.filter(col("source").isNotNull && col("doc_id").isNotNull)
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.charGrams(col("text"), 2)).as("bg"))
      grams.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n"),
          sum(col("c") * floor(log(col("c").cast("double")) * 1048576).cast("long"))
            .as("sum_clnc_q"))
        .select(col("doc_id"),
          (floor(log(col("n").cast("double")) * 1048576).cast("long") -
            expr("sum_clnc_q div n")).as("h_q"))
    }
    assert(kernel.exceptAll(exploded).isEmpty && exploded.exceptAll(kernel).isEmpty,
      s"kernel:\n${kernel.collect().mkString("\n")}\nexploded:\n${exploded.collect().mkString("\n")}")
    // the excluded set is exactly {no-bigram docs}: 4 (one char),
    // 5 (empty), 6 (NULL), 9 (one non-BMP code point)
    assert(kernel.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 7L, 8L))
  }

  test("grubbs struct-max argmax == the rank-window argmax it replaced") {
    import org.apache.spark.sql.expressions.Window
    val vals = spark.range(0, 1000).selectExpr(
      "pmod(id, 3) AS g", "CAST(pmod(id * id, 97) - 48 AS long) AS x")
    // windowed reference: first row by (|3x − Σx| DESC, x ASC) per group
    val mom = vals.groupBy("g").agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("s"))
    val dev = vals.join(mom, "g").withColumn("d",
      abs(col("n").cast("decimal(38,0)") * col("x").cast("decimal(38,0)") - col("s")))
    val windowed = dev.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("d").desc, col("x").asc)))
      .filter(col("rk") === 1).select("g", "x", "d")
    val structMax = dev.groupBy("g")
      .agg(max(struct(col("d").as("d"),
        (-col("x").cast("decimal(20,0)")).as("nx"))).as("k"))
      .select(col("g"), (-col("k.nx")).cast("long").as("x"), col("k.d").as("d"))
    assert(structMax.exceptAll(windowed).isEmpty && windowed.exceptAll(structMax).isEmpty)
  }

  test("multi-seed harmonicCentrality == per-seed sequential sweeps") {
    import spark.implicits._
    // a path graph 0-1-2-...-11 plus a disconnected 100-101 pair:
    // seeds (mod 5): 0, 5, 10 — distinct eccentric positions
    val edges = ((0L to 10L).map(i => (i, i + 1)) :+ (100L, 101L)).toDF("s", "t")
    val multi = graft.operators.ShortestPaths
      .harmonicCentrality(edges, "s", "t", seedMod = 5L, nSeeds = 3, maxHops = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // reference: independent single-source BFS per seed (bfsHops public API)
    val expected = Seq(0L, 5L, 10L).map { s =>
      val d = graft.operators.ShortestPaths
        .bfsHops(edges, "s", "t", Seq(s).toDF("id"), 4)
        .filter(col("dist") > 0)
        .groupBy("dist").agg(count(lit(1)).as("n_at"))
        .agg(coalesce(sum("n_at"), lit(0L)).as("n_reached"),
          coalesce(sum(col("n_at") * expr("1048576 div dist")), lit(0L)).as("h"))
        .collect().head
      (s, d.getLong(0), d.getLong(1))
    }
    assert(multi == expected, s"multi=$multi expected=$expected")
  }
}
