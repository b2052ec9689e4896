package graft

import org.apache.spark.sql.functions._

/** Unit pins for the round-14 wave-2 operators — the hand-computable
  * cases and guard semantics the DuckDB gate can't isolate (it only
  * replays the full-table shape at sf0.01).
  */
class Round14bSpec extends SparkSpecBase {

  test("spatialAutocorr: perfect within-group clustering gives I = 1") {
    import spark.implicits._
    // two groups, constant value within each, different across:
    // every same-group pair is identical -> Moran's I = 1, Geary C = 0
    val df = Seq(("a", 10L), ("a", 10L), ("b", 20L), ("b", 20L))
      .toDF("g", "x")
    val r = operators.Stats.spatialAutocorr(df, col("g"), col("x"))
      .select("n", "w_pairs", "moran_i", "geary_c").collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12, s"I: ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3)) < 1e-12, s"C: ${r.getDouble(3)}")
  }

  test("ordinalAssociation: perfect monotone cells give gamma = 1") {
    import spark.implicits._
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (3L, 3L)).toDF("x", "y")
    val r = operators.Stats.ordinalAssociation(df, col("x"), col("y"))
      .select("n_conc", "n_disc", "gamma", "tau_c").collect().head
    // unordered concordant pairs: (1,2),(1,3)x2,(2,3)x2 = 5
    assert(r.getLong(0) === 5L && r.getLong(1) === 0L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("weightedKappa: identical ratings give kappa_w = 1") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 1L), (2L, 2L), (0L, 0L)).toDF("a", "b")
    val r = operators.Stats.weightedKappa(df, col("a"), col("b"))
      .select("dis_obs", "kappa_w").collect().head
    assert(r.getLong(0) === 0L)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("cronbachAlpha: two identical items give alpha = 1") {
    import spark.implicits._
    // V_total = 4*V_item, sum V_i = 2*V_item -> alpha = 2*(1 - 1/2) = 1
    val df = Seq((1L, 1L), (2L, 2L), (5L, 5L)).toDF("i1", "i2")
    val r = operators.Stats.cronbachAlpha(df,
        Seq("i1" -> col("i1"), "i2" -> col("i2")))
      .select("n", "alpha").collect().head
    assert(r.getLong(0) === 3L)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("concordanceIndex: a perfectly ranking risk score gives c = 1") {
    import spark.implicits._
    // all events observed; shorter lifetime always has the higher risk
    val df = Seq((1L, true, 30L), (2L, true, 20L), (3L, true, 10L))
      .toDF("t", "ev", "r0")
    val r = operators.Stats.concordanceIndex(df, col("t"), col("ev"),
        col("r0"), scoreBands = 3)
      .select("n_comparable", "n_concordant", "c_index").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("maxDrawdown: hand curve 10,30,5,20 -> drawdown 25 at the dip") {
    import spark.implicits._
    // daily deltas +10,+20,-25,+15 -> cum 10,30,5,20; runmax 10,30,30,30
    val df = Seq((86400L * 0, 10L), (86400L * 1, 20L),
        (86400L * 2, -25L), (86400L * 3, 15L))
      .map { case (s, v) => ("s", s, v) }.toDF("series", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = operators.TimeSeries.maxDrawdown(df, "series", "ts", col("v"))
      .select("n_days", "peak_cum", "max_drawdown", "trough_day")
      .collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 30L)
    assert(r.getLong(2) === 25L)
    assert(r.getLong(3) === 2L, s"trough at day 2, got ${r.getLong(3)}")
  }

  test("intervalUnion: overlapping spans merge, disjoint spans don't") {
    import spark.implicits._
    // user 1: events at 0s and 600s (spans [0,900),[600,1500) overlap
    // -> one island covering 1500s); event at 10000s -> second island
    val df = Seq((1L, 0L, 1L), (1L, 600L, 2L), (1L, 10000L, 3L))
      .toDF("user_id", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = operators.Analytics.intervalUnion(df, "user_id", "ts", "event_id",
        spanSeconds = 900)
      .select("n_events", "n_islands", "covered_sec", "max_island_sec")
      .collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 1500L + 900L)
    assert(r.getLong(3) === 1500L)
  }

  test("reciprocity: one mutual pair among three edges") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val r = operators.GraphMetrics.reciprocity(e, "src", "dst")
      .select("n_edges", "n_reciprocal", "n_mutual_dyads",
        "n_asymmetric_dyads", "reciprocity").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 1L && r.getLong(3) === 1L)
    assert(math.abs(r.getDouble(4) - 2.0 / 3.0) < 1e-12)
  }

  test("harmonicCentrality: path graph hand case") {
    import spark.implicits._
    // path 0-1-2-3, seedMod 1000 offers only node 0 (others not =0 mod)
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = operators.ShortestPaths.harmonicCentrality(e, "src", "dst",
        seedMod = 1000L, nSeeds = 3, maxHops = 4)
      .select("seed", "n_reached", "harmonic_q").collect()
    assert(r.length === 1 && r.head.getLong(0) === 0L)
    assert(r.head.getLong(1) === 3L)
    // 2^20/1 + 2^20/2 + 2^20 div 3 = 1048576 + 524288 + 349525
    assert(r.head.getLong(2) === 1048576L + 524288L + 349525L)
  }

  test("harmonicCentrality: no qualifying seed returns an empty frame") {
    import spark.implicits._
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val r = operators.ShortestPaths.harmonicCentrality(e, "src", "dst",
        seedMod = 7L, nSeeds = 2, maxHops = 2)
    assert(r.count() === 0L)
    assert(r.columns.toSeq === Seq("seed", "n_reached", "harmonic_q", "harmonic"))
  }

  test("edgeEmbeddedness: triangle plus pendant edge") {
    import spark.implicits._
    // triangle 1-2-3 plus edge 3-4: the three triangle edges have
    // embeddedness 1; 3-4 is in no triangle and never appears
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = operators.Triangles.edgeEmbeddedness(e, "src", "dst", topK = 10)
      .select("a", "b", "embeddedness").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r === Set((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L)))
  }

  test("pinballLoss: constant series forecasts itself with zero loss") {
    import spark.implicits._
    val df = (0 until 5).map(i => ("s", i * 86400L)).toDF("series", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = operators.TimeSeries.pinballLoss(df, "series", "ts")
      .select("n_days", "forecast", "loss_den").collect().head
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === 1L, "each day has exactly one event")
    assert(r.getLong(2) === 0L)
  }

  test("curriculumInterleave: two groups interleave positions") {
    import spark.implicits._
    // groups a(2 rows), b(1 row): positions a->1,3 b->2
    val df = Seq(("a", 1L, 5L), ("a", 2L, 9L), ("b", 3L, 7L))
      .toDF("g", "id", "d")
    val r = operators.Sampling.curriculumInterleave(df, "g", "id", col("d"))
      .select("g", "grp_index", "n_rows", "first_pos", "last_pos")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSet
    assert(r === Set(("a", 1L, 2L, 1L, 3L), ("b", 2L, 1L, 2L, 2L)))
  }

  test("linearLogLoss: a perfectly uninformative score is ln 2-ish") {
    import spark.implicits._
    // single score value -> p = 1/2 exactly -> every row costs ln 2
    val df = Seq((5L, true), (5L, false)).toDF("s", "y")
    val r = operators.Stats.linearLogLoss(df, col("s"), col("y"))
      .select("n", "loss_q", "mean_logloss").collect().head
    assert(r.getLong(0) === 2L)
    val ln2q = math.floor(-math.log(0.5) * 1048576).toLong
    assert(r.getLong(1) === 2L * ln2q)
    assert(math.abs(r.getDouble(2) - ln2q.toDouble / 1048576.0) < 1e-12)
  }
}
