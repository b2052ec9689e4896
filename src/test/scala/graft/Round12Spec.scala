package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Discovery, GraphMetrics, Similarity, Stats, TimeSeries}

/** Round-12 operators: closed-form pinned cases per operator — each
  * test derives the expected output by hand, not by re-running the
  * engine's own arithmetic.
  */
class Round12Spec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- Spearman -------------------------------------------------------

  test("spearman: perfect monotone nonlinear relation scores rho = 1") {
    import spark.implicits._
    // y = x^3 is monotone but nonlinear: Pearson < 1, Spearman = 1
    val df = Seq((1L, 1L), (2L, 8L), (3L, 27L), (4L, 64L), (5L, 125L))
      .toDF("x", "y")
    val r = Stats.spearmanMatrix(df, Seq("a" -> col("x"), "b" -> col("y")))
      .collect()(0)
    assert(r.getLong(2) === 5L, "n")
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12, s"rho: ${r.getDouble(3)}")
  }

  test("spearman: ties get averaged ranks (doubled-rank formula)") {
    import spark.implicits._
    // x = (1,2,2,3), y = (10,20,30,40): x ranks (doubled) = 2,5,5,8
    // Pearson((2,5,5,8),(2,4,6,8)) = cov/sqrt(vx*vy) by hand:
    // n=4 sx=20 sy=20 qx=118 qy=120 pxy=118
    // num = 4*118-400 = 72; vx = 4*118-400 = 72; vy = 4*120-400 = 80
    val df = Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 40L)).toDF("x", "y")
    val r = Stats.spearmanMatrix(df, Seq("a" -> col("x"), "b" -> col("y")))
      .collect()(0)
    val want = 72.0 / (math.sqrt(72.0) * math.sqrt(80.0))
    assert(math.abs(r.getDouble(3) - want) < 1e-12, s"rho: ${r.getDouble(3)} vs $want")
  }

  test("spearman: constant column yields NULL rho, null rows excluded") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)]((1L, 7L), (2L, 7L),
      (3L, 7L), (null, 9L)).toDF("x", "y")
    val r = Stats.spearmanMatrix(df, Seq("a" -> col("x"), "b" -> col("y")))
      .collect()(0)
    assert(r.getLong(2) === 3L, "null row excluded from n")
    assert(r.isNullAt(3), "zero variance -> NULL rho")
  }

  // ---- Cramér's V -----------------------------------------------------

  test("cramers v: perfect association = 1, independence ~ 0") {
    import spark.implicits._
    // perfect: a determines b, 2x2, 8 rows
    val perfect = Seq(("x", "p"), ("x", "p"), ("x", "p"), ("x", "p"),
      ("y", "q"), ("y", "q"), ("y", "q"), ("y", "q")).toDF("a", "b")
    val rp = Stats.cramersV(perfect, col("a"), col("b")).collect()(0)
    assert(rp.getLong(0) === 8L && rp.getLong(1) === 2L && rp.getLong(2) === 2L)
    // chi2 = n = 8 exactly; quantization floors each of 4 cells' 2.0
    assert(math.abs(rp.getDouble(4) - 1.0) < 1e-5, s"V: ${rp.getDouble(4)}")
    // independent uniform 2x2: chi2 = 0 -> V = 0
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val ri = Stats.cramersV(indep, col("a"), col("b")).collect()(0)
    assert(math.abs(ri.getDouble(4)) < 1e-5, s"V: ${ri.getDouble(4)}")
  }

  test("cramers v: single-level margin yields NULL") {
    import spark.implicits._
    val df = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val r = Stats.cramersV(df, col("a"), col("b")).collect()(0)
    assert(r.isNullAt(4), "min(r,c) = 1 -> undefined V")
  }

  // ---- JS divergence --------------------------------------------------

  test("js divergence: identical distributions score ~0, js >= 0, bounded by ln2") {
    import spark.implicits._
    val df = Seq(("s1", "a b c d"), ("s2", "a b c d"), ("s3", "w w w w"))
      .toDF("source", "text")
    val out = Analytics.jsDivergence(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    // s1 and s2 are the SAME distribution but differ from the corpus
    // (which contains w-mass): 0 <= js < ln2 scaled
    val ln2q = 726817L
    out.values.foreach { js =>
      assert(js >= 0L && js <= ln2q, s"js in [0, ln2]: $js")
    }
    assert(out("s1") === out("s2"), "identical sources score identically")
    assert(out("s3") > out("s1"), "the divergent source scores higher")
  }

  // ---- retrieval eval -------------------------------------------------

  test("retrieval eval: mrr/p@k/r@k on a hand-built neighborhood") {
    import spark.implicits._
    // 1-D embeddings: cosine of positive scalars is 1 — ranking falls
    // to the id tiebreak. Query 0 (label A): neighbors 1..4 in id
    // order; labels: 1->B, 2->A, 3->B, 4->A. first hit rank 2.
    val emb = Seq(
      (0L, Array(1.0f), "A"), (1L, Array(1.0f), "B"), (2L, Array(1.0f), "A"),
      (3L, Array(1.0f), "B"), (4L, Array(1.0f), "A"))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.retrievalEval(emb, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", "label", k = 4).collect()(0)
    assert(r.getLong(2) === 2L, "n_rel: vecs 2 and 4")
    assert(r.getLong(3) === 2L, "first relevant at rank 2")
    assert(r.getLong(4) === 500000L, "rr_micro = 10^6 div 2")
    assert(r.getLong(5) === 2L, "hits in top 4")
    assert(math.abs(r.getDouble(6) - 0.5) < 1e-12, "precision 2/4")
    assert(math.abs(r.getDouble(7) - 1.0) < 1e-12, "recall 2/2")
  }

  test("retrieval eval: no relevant docs -> rr 0, recall NULL") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f), "A"), (1L, Array(1.0f), "B"), (2L, Array(1.0f), "B"))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.retrievalEval(emb, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", "label", k = 2).collect()(0)
    assert(r.getLong(2) === 0L && r.isNullAt(3) && r.getLong(4) === 0L)
    assert(r.isNullAt(7), "recall undefined with n_rel = 0")
  }

  // ---- EWMA -----------------------------------------------------------

  test("ewma: integer alpha=1/2 fold, seeded with first observation") {
    import spark.implicits._
    // x = 8, 0, 0 (milli: 8000, 0, 0): s0=8000, s1=4000, s2=2000
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, 8.0),
      (1L, ts("2024-01-01 00:01:00"), 11L, 0.0),
      (1L, ts("2024-01-01 00:02:00"), 12L, 0.0),
      (2L, ts("2024-01-01 00:00:00"), 20L, 5.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.ewmaSmooth(df, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) === 3L, "n_obs")
    assert(r1.getLong(2) === 0L, "last")
    assert(r1.getLong(3) === 2000L, "ewma fold")
    assert(r1.getLong(4) === -2000L, "deviation")
    assert(!r1.getBoolean(5), "|dev| 2000 is not > ewma 2000 (strict)")
  }

  test("ewma: single observation returns itself, negative values abs'd") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L, -3.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = TimeSeries.ewmaSmooth(df, "user_id", "ts", "value").collect()(0)
    assert(r.getLong(3) === 3000L, "abs(-3)*1000, seed returned as-is")
    assert(r.getLong(4) === 0L && !r.getBoolean(5))
  }

  // ---- SAX ------------------------------------------------------------

  test("sax: rising series maps to 'abcd' frames, flat series to all-c") {
    import spark.implicits._
    val rising = (0 until 8).map(i =>
      (1L, ts(f"2024-01-01 00:0$i:00"), i.toLong, i * 10.0))
    val flat = (0 until 4).map(i =>
      (2L, ts(f"2024-01-01 00:0$i:00"), (100 + i).toLong, 7.0))
    val df = (rising ++ flat).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.saxSymbols(df, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L)._1 === 8L)
    assert(out(1L)._2 === "abcd", s"monotone ramp spans the alphabet: ${out(1L)._2}")
    assert(out(2L) === ((4L, "cccc")), "zero variance -> all 'c'")
  }

  test("sax: short series uses only the frames its indexes reach") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 0.0),
      (1L, ts("2024-01-01 00:01:00"), 2L, 10.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = TimeSeries.saxSymbols(df, "user_id", "ts", "value").collect()(0)
    // n=2: frames 0*4//2=0 and 1*4//2=2 -> two symbols
    assert(r.getString(2).length === 2, s"word: ${r.getString(2)}")
    assert(r.getString(2) === "ad", "below-mean then above-mean at z=±1")
  }

  // ---- assortativity --------------------------------------------------

  test("assortativity: star graph is maximally disassortative (r = -1)") {
    import spark.implicits._
    // K1,3 star: center 0, leaves 1..3 — degrees (3,1): r = -1
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = GraphMetrics.assortativity(e, "src", "dst").collect()(0)
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L && r.getLong(2) === 6L)
    assert(math.abs(r.getDouble(6) + 1.0) < 1e-12, s"r: ${r.getDouble(6)}")
  }

  test("assortativity: regular graph (cycle) has zero degree variance -> NULL") {
    import spark.implicits._
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val r = GraphMetrics.assortativity(e, "src", "dst").collect()(0)
    assert(r.isNullAt(6), "2-regular cycle: no degree variance")
    // duplicate + self-loop edges are cleaned before counting
    val dirty = Seq((0L, 1L), (1L, 0L), (0L, 0L), (0L, 1L), (1L, 2L), (2L, 0L))
      .toDF("src", "dst")
    val rd = GraphMetrics.assortativity(dirty, "src", "dst").collect()(0)
    assert(rd.getLong(1) === 3L, "self-loop dropped, dup pair united")
  }

  // ---- Poisson bootstrap ----------------------------------------------

  test("poisson bootstrap: deterministic weights, exact replicate sums") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, i * 100)).toDF("id", "cents")
    val out = Stats.poissonBootstrap(df, col("id"), col("cents"), replicates = 8)
    val rows = out.collect()
    assert(rows.length === 8, "one row per replicate")
    assert(rows.map(_.getLong(4)).sorted.toSeq === (1L to 8L), "rank is a permutation")
    // determinism: re-running yields the identical table
    val again = Stats.poissonBootstrap(df, col("id"), col("cents"), replicates = 8)
      .collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    // n_eff ~ Poisson(200): all replicates in a sane band around n
    rows.foreach { r =>
      assert(r.getLong(1) > 120 && r.getLong(1) < 280, s"n_eff: ${r.getLong(1)}")
      assert(math.abs(r.getDouble(3) - 10050.0) < 3000.0, "mean near true 10050")
    }
  }

  test("poisson bootstrap: weight inversion matches the CDF thresholds") {
    import spark.implicits._
    // one known row x replicate: weight = #thresholds below u
    val df = Seq((42L, 100L)).toDF("id", "cents")
    val r = Stats.poissonBootstrap(df, col("id"), col("cents"), replicates = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // recompute the expected weights by hand from md5
    def weight(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md.substring(0, 5), 16)
      val cum = Seq(385749L, 771498L, 964372L, 1028664L, 1044738L,
        1047952L, 1048488L, 1048565L, 1048574L)
      cum.indexWhere(u < _) match { case -1 => 9L; case k => k.toLong }
    }
    assert(r(0L) === weight("42:0") && r(1L) === weight("42:1"))
  }

  // ---- Kaplan-Meier ---------------------------------------------------

  test("kaplan-meier: textbook product-limit fold in micro-units") {
    import spark.implicits._
    // lifetimes: users A,B at t=0 (churned), C at t=2 (churned),
    // D at t=2 (censored: still active near corpus end)
    // Use day-scale stamps: corpus max day = D's last day.
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")), // A: single event, t=0, ld day 0
      (2L, ts("2024-01-02 00:00:00")), // B: t=0, ld day 1
      (3L, ts("2024-01-01 00:00:00")), (3L, ts("2024-01-03 00:00:00")), // C: t=2
      (4L, ts("2024-01-18 00:00:00")), (4L, ts("2024-01-20 00:00:00"))) // D: t=2, ld = maxd
      .toDF("user_id", "ts")
    val out = Analytics.kaplanMeier(df, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> r).toMap
    // t=0: n=4, d=2 -> S = 1048576*2 div 4 = 524288
    val t0 = out(0L)
    assert((t0.getLong(1), t0.getLong(2), t0.getLong(3)) === ((4L, 2L, 0L)))
    assert(t0.getLong(4) === 524288L)
    // t=2: n=2, d=1, c=1 -> S = 524288*1 div 2 = 262144
    val t2 = out(2L)
    assert((t2.getLong(1), t2.getLong(2), t2.getLong(3)) === ((2L, 1L, 1L)))
    assert(t2.getLong(4) === 262144L)
  }

  // ---- key discovery --------------------------------------------------

  test("key discovery: uniques, minimality pruning, null as value") {
    import spark.implicits._
    val df = Seq(
      (1L, "x", "p"), (2L, "x", "q"), (3L, "y", "p"), (4L, "y", "q"))
      .toDF("id", "a", "b")
    val out = Discovery.keyDiscovery(df, Seq("id", "a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(out("id") === ((4L, true, true)), "id is a minimal key")
    assert(out("a") === ((2L, false, false)))
    assert(out("a+b") === ((4L, true, true)), "(a,b) unique, neither member is")
    assert(out("id+a") === ((4L, true, false)), "superset of a key is NOT minimal")
    // null participates as a value: (null,"x") vs (1,"x") stay distinct
    val dfn = Seq[(java.lang.Long, String)]((null, "x"), (1L, "x"), (1L, "y"))
      .toDF("k", "v")
    val on = Discovery.keyDiscovery(dfn, Seq("k", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(on("k") === 2L, "null is one value")
    assert(on("k+v") === 3L, "pair with null row still counted")
  }

  // ---- HHI ------------------------------------------------------------

  test("hhi: monopoly = 10^8, equal split = 2*5000^2; negatives excluded") {
    import spark.implicits._
    val df = Seq(
      ("mono", 1L, 500L),
      ("duo", 1L, 300L), ("duo", 2L, 300L),
      ("neg", 1L, 400L), ("neg", 2L, -100L))
      .toDF("mkt", "ent", "cents")
    val out = Analytics.hhiConcentration(df, col("mkt"), col("ent"), col("cents"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("mono").getLong(3) === 100000000L, "monopoly HHI = 10000^2")
    assert(out("duo").getLong(3) === 50000000L, "two equal firms: 2*5000^2")
    assert(out("neg").getLong(1) === 1L, "negative-revenue entity dropped")
    assert(out("neg").getLong(3) === 100000000L, "survivor holds the whole market")
  }

  // ---- cross-correlation ----------------------------------------------

  test("cross-correlation: y lags x by exactly 2 days -> xcorr(2) = 1") {
    import spark.implicits._
    // x pattern on days 0..5: 1,2,3,1,2,3 (purchases); y = same shifted +2
    val xs = Seq(0 -> 1, 1 -> 2, 2 -> 3, 3 -> 1, 4 -> 2, 5 -> 3)
    val ys = xs.map { case (d, c) => (d + 2) -> c }.filter(_._1 <= 7)
    var id = 0L
    val rows = xs.flatMap { case (d, c) => (1 to c).map { _ =>
      id += 1; (id, new Timestamp(86400000L * d), "purchase")
    } } ++ ys.flatMap { case (d, c) => (1 to c).map { _ =>
      id += 1; (id, new Timestamp(86400000L * d), "error")
    } }
    val df = rows.toDF("event_id", "ts", "event_type")
    val out = TimeSeries.crossCorrelation(df, "ts", "event_type",
      "purchase", "error", 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(math.abs(out(2L).getDouble(5) - 1.0) < 1e-12,
      s"lag-2 alignment: ${out(2L).getDouble(5)}")
    assert(out(0L).getDouble(5) < 1.0 - 1e-9, "lag-0 is not the alignment")
    assert(out(2L).getLong(1) === 6L, "lag-2 pairs: days 0..5")
  }

  // ---- RFM ------------------------------------------------------------

  // ---- one-way ANOVA ---------------------------------------------------

  test("anova: textbook decomposition on a hand case, flat groups F near 0") {
    import spark.implicits._
    // groups: a = (1,2,3), b = (7,8,9): S_a=6 S_b=24 q=1+4+9+49+64+81=208
    // terms: 36 div 3 = 12, 576 div 3 = 192 -> tsum 204
    // ssb = 204 - 900 div 6 = 54; ssw = 208 - 204 = 4
    // F = (54/1)/(4/4) = 54
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 7L), ("b", 8L), ("b", 9L))
      .toDF("g", "x")
    val r = Stats.oneWayAnova(df, col("g"), col("x")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 6L, 54L, 4L)))
    assert(math.abs(r.getDouble(6) - 54.0) < 1e-12, s"F: ${r.getDouble(6)}")
    // one group only -> F undefined
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "x")
    assert(Stats.oneWayAnova(one, col("g"), col("x")).collect()(0).isNullAt(6))
  }

  // ---- Cohen's kappa ---------------------------------------------------

  test("cohens kappa: perfect = 1, chance-level ~ 0, exact formula") {
    import spark.implicits._
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b")).toDF("r1", "r2")
    val rp = Stats.cohensKappa(perfect, col("r1"), col("r2")).collect()(0)
    assert(math.abs(rp.getDouble(3) - 1.0) < 1e-12)
    // hand case: n=10, agree=7, marginals r1: a=6 b=4; r2: a=5 b=5
    // pe_q = 6*5 + 4*5 = 50; kappa = (70-50)/(100-50) = 0.4
    val mixed = (Seq.fill(4)(("a", "a")) ++ Seq.fill(2)(("a", "b")) ++
      Seq.fill(1)(("b", "a")) ++ Seq.fill(3)(("b", "b"))).toDF("r1", "r2")
    val rm = Stats.cohensKappa(mixed, col("r1"), col("r2")).collect()(0)
    assert((rm.getLong(0), rm.getLong(1), rm.getLong(2)) === ((10L, 7L, 50L)))
    assert(math.abs(rm.getDouble(3) - 0.4) < 1e-12, s"kappa: ${rm.getDouble(3)}")
  }

  // ---- power / MDE ------------------------------------------------------

  test("power analysis: literal formula over exact moments") {
    import spark.implicits._
    val units = Seq(100L, 200L, 300L, 400L).toDF("v")
    val r = Stats.powerSampleSize(units, col("v")).collect()(0)
    val mean = 250.0
    val varv = (4.0 * (100.0 * 100 + 200.0 * 200 + 300.0 * 300 + 400.0 * 400) -
      1000.0 * 1000.0) / 16.0
    val mde = mean * 0.05
    val want = math.ceil((1.959964 + 0.841621) * (1.959964 + 0.841621) *
      2.0 * varv / (mde * mde))
    assert(math.abs(r.getDouble(3) - mean) < 1e-12)
    assert(math.abs(r.getDouble(4) - varv) < 1e-9)
    assert(r.getLong(6) === want.toLong, s"n_req: ${r.getLong(6)} vs $want")
  }

  // ---- partial correlation ----------------------------------------------

  test("partial correlation: removing the confounder kills a spurious r") {
    import spark.implicits._
    // x and y both equal z plus tiny independent wiggles: r_xy high,
    // but partial r_xy.z collapses toward the wiggle correlation
    val rows = (1 to 40).map { i =>
      val z = i.toLong
      (z * 10 + (i % 3), z * 10 + ((i + 1) % 3), z)
    }
    val df = rows.toDF("x", "y", "z")
    val r = Stats.partialCorrelation(df,
      "x" -> col("x"), "y" -> col("y"), "z" -> col("z")).collect()(0)
    assert(r.getDouble(1) > 0.99, s"raw r_xy: ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(4)) < 0.7,
      s"partial collapses: ${r.getDouble(4)}")
  }

  // ---- 1-D EMD -----------------------------------------------------------

  test("emd: point masses one unit apart have emd = 1, identical = 0") {
    import spark.implicits._
    // grp a: all at 0; grp b: all at 2. corpus CDF at 0 is 1/2.
    // For a: |F_a - F_corp| = 1/2 on [0,2) -> emd = 1.0. Same for b.
    val df = (1 to 5).map(_ => ("a", 0.0)) ++ (1 to 5).map(_ => ("b", 2.0))
    val out = Stats.emd1d(df.toDF("g", "v").withColumn("vv", round(col("v"))),
      "g", "vv").collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(out("a") - 1.0) < 1e-12, s"emd a: ${out("a")}")
    assert(math.abs(out("b") - 1.0) < 1e-12)
    // a group that IS the corpus distribution scores 0
    val same = ((1 to 4).map(_ => ("a", 1.0)) ++ (1 to 4).map(_ => ("b", 1.0)))
      .toDF("g", "v").withColumn("vv", round(col("v")))
    val s0 = Stats.emd1d(same, "g", "vv").collect()
    s0.foreach(r => assert(r.getLong(3) === 0L, "identical dists: emd_num 0"))
  }

  // ---- Lorenz ------------------------------------------------------------

  test("lorenz: uniform values give linear shares; zero/negative excluded") {
    import spark.implicits._
    val df = ((1 to 20).map(i => (i.toLong, 100L)) :+ (99L, -5L) :+ (98L, 0L))
      .toDF("ent", "cents")
    val out = Analytics.lorenzCurve(df, col("ent"), col("cents"))
      .collect().sortBy(_.getLong(0))
    assert(out.length === 10 && out.map(_.getLong(1)).sum === 20L,
      "nonpositive entities excluded")
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(4) === (i + 1) * 100000L,
        s"decile ${i + 1} share: ${r.getLong(4)}")
    }
  }

  // ---- decay popularity ---------------------------------------------------

  test("decay popularity: one halving per half-life, rank by score then item") {
    import spark.implicits._
    // items: 1 fresh (age 0) x1, 2 stale (age 28d) x2 -> scores 1e6 vs 2*5e5
    val now = 86400000L * 1000
    val df = Seq(
      (1L, new Timestamp(now)),
      (2L, new Timestamp(now - 28L * 86400000L)),
      (2L, new Timestamp(now - 28L * 86400000L)))
      .toDF("item", "ts")
    val out = Analytics.decayPopularity(df, col("item"), "ts", 28, 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((1000000L, 1L)), "fresh event: full score, tie-rank 1")
    assert(out(2L) === ((1000000L, 2L)), "two half-decayed events tie the score")
  }

  // ---- Holt forecast -------------------------------------------------------

  test("holt: level and trend track a pure ramp, forecast extrapolates") {
    import spark.implicits._
    // x (milli): 0, 2000, 4000, ..., 16000 (step 2000)
    val df = (0 until 9).map(i =>
      (1L, ts(f"2024-01-01 00:0$i:00"), i.toLong, i * 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = TimeSeries.holtForecast(df, "user_id", "ts", "value").collect()(0)
    // floor-Holt on a ramp: level approaches x_last - lag, trend
    // approaches the step; assert the hand-folded exact values
    var l = 0L; var t = 0L
    (1 until 9).foreach { i =>
      val y = i * 2000L
      val l2 = (y + l + t) / 2 // all non-negative here: / == div
      t = {
        val num = l2 - l + t
        if (num >= 0) num / 2 else (num - 1) / 2 // floor, matching offset math
      }
      l = l2
    }
    assert(r.getLong(2) === l, s"level: ${r.getLong(2)} vs $l")
    assert(r.getLong(3) === t, s"trend: ${r.getLong(3)} vs $t")
    assert(r.getLong(4) === l + t && r.getLong(6) === l + 3 * t)
    // alpha=beta=1/2 Holt is underdamped: the trend OVERSHOOTS the
    // true 2000 step on a ramp transient before settling
    assert(t > 1500L && t < 2600L, s"trend near the 2000 step: $t")
  }

  test("holt: single observation = level itself, zero trend") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 5.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = TimeSeries.holtForecast(df, "user_id", "ts", "value").collect()(0)
    assert(r.getLong(2) === 5000L && r.getLong(3) === 0L)
    assert(r.getLong(4) === 5000L, "flat forecast")
  }

  // ---- burstiness -----------------------------------------------------------

  test("token burstiness: clumped token scores higher fano than spread token") {
    import spark.implicits._
    // 'spread' once in each of 8 docs; 'clump' 8 times in one doc
    val docs = (1 to 8).map { i =>
      (i.toLong, if (i == 1) "spread " + Seq.fill(8)("clump").mkString(" ")
      else "spread filler")
    }.toDF("doc_id", "text")
    val out = Analytics.tokenBurstiness(docs, "doc_id", "text", topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // spread: every doc has c=1 -> var 0 -> fano 0
    assert(out("spread") === 0L, s"uniform token fano: ${out("spread")}")
    // clump: D=8, tot=8, sumsq=64 -> (8*64-64)*1000 div 64 = 7000
    assert(out("clump") === 7000L, s"clumped fano: ${out("clump")}")
  }

  test("rfm: quintiles with key tiebreak, exact rollup") {
    import spark.implicits._
    // 10 customers, one order each on distinct days with rising value:
    // customer i ordered on day i with value 100*i.
    val df = (1 to 10).map(i =>
      (i.toLong, new Timestamp(86400000L * i), i * 100.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Analytics.rfmSegments(df, "o_custkey", "o_orderdate", "o_totalprice")
      .collect()
    // most recent + highest value customer (10) must land in (5, x, 5)
    val top = out.filter(r => r.getLong(0) === 5L && r.getLong(2) === 5L)
    assert(top.nonEmpty, "the newest/biggest customers score (r=5, m=5)")
    assert(out.map(_.getLong(3)).sum === 10L, "every customer lands in a cell")
    assert(out.map(_.getLong(4)).sum === 10L, "order counts conserved")
    assert(out.map(_.getLong(5)).sum === (1 to 10).map(_ * 10000L).sum,
      "cents conserved")
  }
}
