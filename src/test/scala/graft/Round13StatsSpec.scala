package graft

import org.apache.spark.sql.functions._

/** Unit pins for the round-13 batch-2 operator guards and edge
  * semantics that the DuckDB gate can't see (it only replays the
  * happy shape at sf0.01): the Friedman completeness guard, the k-NN
  * vote tie-break, average precision against a hand-computed case,
  * weighted-median boundary arithmetic, and the permutation test's
  * p-value contract.
  */
class Round13StatsSpec extends SparkSpecBase {

  test("friedmanTest raises its named error on ragged blocks") {
    import spark.implicits._
    // block 1 has two treatments, block 2 only one — NOT complete
    val ragged = Seq((1L, "a", 3L), (1L, "b", 5L), (2L, "a", 2L))
      .toDF("b", "j", "v")
    val ex = intercept[Exception] {
      operators.Stats.friedmanTest(ragged, col("b"), col("j"), col("v"))
        .collect()
    }
    assert(ex.getMessage.contains("graft.friedmanTest"),
      s"expected the named completeness error, got: ${ex.getMessage}")
  }

  test("friedmanTest detects a perfectly consistent ranking") {
    import spark.implicits._
    // 4 blocks, 3 treatments, identical ordering a < b < c everywhere:
    // chi2 = (k-1)*... maximal = n*(k-1) = 8 for untied complete ranks
    val cells = (1 to 4).flatMap(b =>
      Seq((b.toLong, "a", 1L + b), (b.toLong, "b", 10L + b),
        (b.toLong, "c", 20L + b))).toDF("b", "j", "v")
    val out = operators.Stats.friedmanTest(cells, col("b"), col("j"), col("v"))
      .select("treat", "r2_sum", "chi2").as[(String, Long, Double)]
      .collect().toList.sortBy(_._1)
    // double-ranks within each block: 2,4,6 -> sums 8,16,24 over 4 blocks
    assert(out.map(t => (t._1, t._2)) === List(("a", 8L), ("b", 16L), ("c", 24L)))
    assert(math.abs(out.head._3 - 8.0) < 1e-9,
      s"consistent 4x3 ranking must give chi2 = n(k-1) = 8, got ${out.head._3}")
  }

  test("knnClassify breaks vote ties by smallest label") {
    import spark.implicits._
    // query 0 at the origin-ish; two labels each get 2 of the 4
    // nearest neighbors (k=4) -> tie -> smaller label wins
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 9),
      (1L, Array(1.0f, 0.01f), 2), (2L, Array(1.0f, 0.02f), 2),
      (3L, Array(1.0f, -0.01f), 1), (4L, Array(1.0f, -0.02f), 1),
      (5L, Array(-1.0f, 0.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val out = operators.Similarity.knnClassify(rows,
        rows.filter(col("vec_id") === 0L), "vec_id", "embedding", "label", k = 4)
      .select("pred_label", "n_votes", "correct")
      .as[(Int, Long, Boolean)].collect()
    assert(out.length === 1)
    assert(out.head === ((1, 2L, false)),
      s"2-2 vote must resolve to the smaller label (1), got ${out.head}")
  }

  test("averagePrecision matches the hand-computed textbook case") {
    import spark.implicits._
    // ranking by score desc: ids 1..5, positives at ranks 1, 3, 4
    // AP = (1/1 + 2/3 + 3/4) / 3
    val df = Seq((1L, 50L, true), (2L, 40L, false), (3L, 30L, true),
      (4L, 20L, true), (5L, 10L, false)).toDF("id", "s", "y")
    val row = operators.Stats.averagePrecision(df, col("id"), col("s"), col("y"))
      .select("n", "n_pos", "avg_precision")
      .as[(Long, Long, Double)].collect().head
    assert(row._1 === 5L && row._2 === 3L)
    val want = (1.0 + math.floor(2.0 / 3.0 * (1 << 20)) / (1 << 20) + 0.75) / 3.0
    assert(math.abs(row._3 - want) < 1e-6,
      s"AP mismatch: got ${row._3}, want ~$want")
  }

  test("weightedMedian lands on the cumulative-weight boundary exactly") {
    import spark.implicits._
    // weights 1,1,2 over values 10,20,30: W=4, first cum*2 >= 4 is 20
    val df = Seq(("g", 10L, 1L), ("g", 20L, 1L), ("g", 30L, 2L))
      .toDF("grp", "v", "w")
    val row = operators.Stats.weightedMedian(df, col("grp"), col("v"), col("w"))
      .select("w_median", "total_weight", "n_values")
      .as[(Long, Long, Long)].collect().head
    assert(row === ((20L, 4L, 3L)), s"boundary weighted median wrong: $row")
  }

  test("permutationTest p-value respects the add-one bounds and null test") {
    import spark.implicits._
    // arm == hash split itself -> one replica (conceptually) matches
    // obs; with a null effect p must be large, and always within
    // [1/(R+1), 1]
    val units = (1L to 400L).map(i => (i, i % 2 == 0, (i % 7) * 100))
      .toDF("id", "arm", "v")
    val row = operators.Stats.permutationTest(units, col("id"), col("arm"),
        col("v"), reps = 99)
      .select("n_units", "reps", "n_ge", "p_value")
      .as[(Long, Long, Long, Double)].collect().head
    assert(row._1 === 400L && row._2 === 99L)
    assert(row._4 >= 1.0 / 100.0 && row._4 <= 1.0)
    assert(row._4 > 0.05, s"null effect must not look significant: p=${row._4}")
  }

  test("cochranQ and srmCheck degenerate shapes") {
    import spark.implicits._
    // all-identical rows: no within-unit variation -> Q NULL
    val units = (1 to 10).map(_ => (true, true, true)).toDF("a", "b", "c")
    val q = operators.Stats.cochranQ(units,
      Seq(("a", col("a")), ("b", col("b")), ("c", col("c"))))
      .select("n_units", "q_stat").collect().head
    assert(q.getLong(0) === 10L && q.isNullAt(1),
      "all-yes units must yield NULL Q (denominator 0)")
    val s = operators.Stats.srmCheck(
      (1 to 100).map(i => Tuple1(i % 2 == 0)).toDF("arm"), col("arm"))
      .select("n0", "n1", "chi2").as[(Long, Long, Double)].collect().head
    assert(s === ((50L, 50L, 0.0)), s"balanced split must give chi2 0: $s")
  }

  test("quantLogFit recovers an exact power law") {
    import spark.implicits._
    // y = x^2 exactly -> slope 2 (quantization error ~2^-20 per point)
    val df = (1 to 200).map(i => ("g", i.toLong * 13L, i.toLong * 13L * i * 13L))
      .toDF("grp", "x", "y")
    val row = operators.Stats.quantLogFit(df, col("grp"), col("x"), col("y"))
      .select("n_points", "slope", "r2").as[(Long, Double, Double)]
      .collect().head
    assert(row._1 === 200L)
    assert(math.abs(row._2 - 2.0) < 1e-4, s"slope must be ~2, got ${row._2}")
    assert(row._3 > 0.999999, s"r2 must be ~1, got ${row._3}")
  }
}
