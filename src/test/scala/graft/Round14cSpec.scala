package graft

import org.apache.spark.sql.functions._

/** Hand-computed pins for the round-14 wave-3 operators. */
class Round14cSpec extends SparkSpecBase {

  test("ansariBradley: textbook no-tie case has exact fold scores") {
    import spark.implicits._
    // pooled sorted values 1..4 -> Ansari scores 1,2,2,1 (doubled:
    // 2,4,4,2); arm1 holds the middle two -> AB = 4 (doubled 8)
    val df = Seq((false, 1L), (true, 2L), (true, 3L), (false, 4L))
      .toDF("arm", "v")
    val r = operators.Stats.ansariBradley(df, col("arm"), col("v"))
      .select("n0", "n1", "ab_q2", "sum_a2").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 8L * 1048576L, s"ab_q2 ${r.getLong(2)}")
    assert(r.getLong(3) === 12L, "sum of doubled scores 2+4+4+2")
  }

  test("ansariBradley: a tie block averages its positions' scores") {
    import spark.implicits._
    // values 1,2,2,3 with n=4: positions 1..4, scores 1,2,2,1;
    // the tie block {2,2} spans positions 2-3 -> avg score 2
    val df = Seq((true, 1L), (true, 2L), (false, 2L), (false, 3L))
      .toDF("arm", "v")
    val r = operators.Stats.ansariBradley(df, col("arm"), col("v"))
      .select("ab_q2").collect().head
    // arm1: value 1 (score 1) + one of the tied 2s (avg 2) -> AB = 3,
    // doubled 6
    assert(r.getLong(0) === 6L * 1048576L)
  }

  test("pettittTest: a clean level shift peaks at the break") {
    import spark.implicits._
    // series: 4 low days then 4 high days — t* at the last low day
    val df = (Seq.fill(4)(1) ++ Seq.fill(4)(9)).zipWithIndex.flatMap {
      case (perDay, day) => (0 until perDay).map(i =>
        ("s", day * 86400L + i))
    }.toDF("series", "sec").withColumn("ts", timestamp_seconds(col("sec")))
    val r = operators.TimeSeries.pettittTest(df, "series", "ts")
      .select("n_days", "k2_stat", "t_star_day").collect().head
    assert(r.getLong(0) === 8L)
    // dr: four 1s avg-rank 2.5 (dr 5), four 9s 6.5 (dr 13); U2_t = 5t−9t
    assert(r.getLong(1) === 16L, "|U2| peaks at 4 low days x (-4)")
    assert(r.getLong(2) === 3L)
  }

  test("ksUniform: a perfectly uniform group has zero distance") {
    import spark.implicits._
    val df = (1L to 10L).map(x => ("g", x)).toDF("g", "x")
    val r = operators.Stats.ksUniform(df, col("g"), col("x"))
      .select("n", "v_range", "d_num", "d_stat").collect().head
    assert(r.getLong(0) === 10L && r.getLong(1) === 10L)
    assert(r.getLong(2) === 0L && r.getDouble(3) === 0.0)
  }

  test("yuleK: all-distinct tokens give K = 0") {
    import spark.implicits._
    val df = Seq(("s", 1L, "a b c d")).toDF("source", "doc_id", "text")
    val r = operators.TfIdf.yuleK(df, "source", "text")
      .select("n_tokens", "n_types", "yule_k").collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)
    assert(r.getDouble(2) === 0.0)
  }

  test("degreePowerLaw: star graph degrees are 1 except the hub") {
    import spark.implicits._
    // star 0-{1..5}: hub degree 5, leaves 1 -> tail (>=2) = 1 node
    val e = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    val r = operators.GraphMetrics.degreePowerLaw(e, "src", "dst")
      .select("n_nodes", "n_tail", "max_degree", "alpha").collect().head
    assert(r.getLong(0) === 6L && r.getLong(1) === 1L && r.getLong(2) === 5L)
    val expect = 1.0 + 1048576.0 /
      math.floor(math.log(5.0 / 1.5) * 1048576).toLong.toDouble
    assert(math.abs(r.getDouble(3) - expect) < 1e-12)
  }

  test("gapMemory: alternating gaps have negative memory") {
    import spark.implicits._
    // gaps 10,2,10,2,10 -> consecutive pairs perfectly anti-correlated
    val secs = Seq(0L, 10L, 12L, 22L, 24L, 34L)
    val df = secs.zipWithIndex.map { case (s, i) => ("s", s, i.toLong) }
      .toDF("series", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = operators.TimeSeries.gapMemory(df, "series", "ts", "event_id")
      .select("n_pairs", "r_memory").collect().head
    assert(r.getLong(0) === 4L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-9, s"r ${r.getDouble(1)}")
  }

  test("atkinsonIndex: equal revenues give (near-)zero inequality") {
    import spark.implicits._
    val df = Seq(("m", 1L, 500L), ("m", 2L, 500L), ("m", 3L, 500L))
      .toDF("mkt", "ent", "a")
    val r = operators.Stats.atkinsonIndex(df, col("mkt"), col("ent"), col("a"))
      .select("n_entities", "rev_sum", "atkinson").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 1500L)
    // quantized ln floors shave < 2^-20 off the geomean — A ~ 1e-6
    assert(math.abs(r.getDouble(2)) < 1e-5, s"A ${r.getDouble(2)}")
  }

  test("rankBiasedOverlap: identical rankings give RBO = sum of weights") {
    import spark.implicits._
    val df = (1L to 30L).map(i => (i, 100L - i, 200L - i))
      .toDF("id", "sa", "sb")
    val r = operators.TfIdf.rankBiasedOverlap(df, "id", col("sa"), col("sb"),
        k = 20)
      .select("k", "x_k", "rbo_q", "rbo").collect().head
    assert(r.getLong(0) === 20L && r.getLong(1) === 20L)
    // identical lists: X_d = d, term = (9/10)^(d-1) * 2^20 truncated
    val expect = (1 to 20).map(d =>
      (BigInt(9).pow(d - 1) * BigInt(1048576) * BigInt(d) /
        (BigInt(10).pow(d - 1) * BigInt(d))).toLong).sum
    assert(r.getLong(2) === expect, s"rbo_q ${r.getLong(2)} vs $expect")
  }

  test("daviesBouldin: two tight far-apart clusters score well below 1") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(0.0f, 0.01f), 1), (2L, Array(0.0f, -0.01f), 1),
      (3L, Array(1.0f, 0.01f), 2), (4L, Array(1.0f, -0.01f), 2))
      .toDF("vec_id", "embedding", "label")
    val r = operators.Similarity.daviesBouldin(rows, "vec_id", "embedding",
        "label")
      .select("label", "db").collect()
    assert(r.length === 2)
    assert(r.head.getDouble(1) < 0.1, s"db ${r.head.getDouble(1)}")
  }

  test("grangerLag1: a perfect lagged copy is infinitely informative") {
    import spark.implicits._
    // y(t) = x(t-1) exactly, while y's own lag is uninformative noise
    val xCounts = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8)
    val ev = xCounts.zipWithIndex.flatMap { case (c, day) =>
      (0 until c).map(i => ("x", day * 86400L + i))
    } ++ xCounts.dropRight(1).zipWithIndex.flatMap { case (c, day) =>
      (0 until c).map(i => ("y", (day + 1) * 86400L + i))
    }
    val df = ev.toDF("series", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = operators.Stats.grangerLag1(df, "series", "ts")
      .filter(col("x_series") === "x" && col("y_series") === "y")
      .select("n_days", "f_stat").collect()
    assert(out.length === 1)
    // y_t = x_{t-1} exactly -> RSS2 = 0 up to float cancellation: the
    // guard either nulls F or the F explodes — both say "perfectly
    // informative"; a moderate F would be the actual bug
    assert(out.head.isNullAt(1) || math.abs(out.head.getDouble(1)) > 1e6,
      s"expected guarded null or enormous F, got ${out.head}")
  }
}
