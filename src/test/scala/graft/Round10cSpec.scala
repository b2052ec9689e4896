package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LabelPropagation, Stats}

class Round10cSpec extends SparkSpecBase {

  test("ols: perfect line recovered exactly, degenerate groups go NULL by rule") {
    import spark.implicits._
    // A: y = 3x + 2 exactly -> slope 3, intercept 2, r2 1
    // B: constant x -> no fit (all three NULL)
    // C: constant y, varying x -> slope 0, intercept y, r2 NULL (0/0)
    val df = ((1L to 10L).map(x => ("A", x, 3 * x + 2)) ++
      Seq(("B", 5L, 1L), ("B", 5L, 9L)) ++
      Seq(("C", 1L, 7L), ("C", 2L, 7L), ("C", 3L, 7L)))
      .toDF("g", "x", "y")
    val out = Stats.olsPerGroup(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getDouble(7) === 3.0 && a.getDouble(8) === 2.0 && a.getDouble(9) === 1.0,
      s"exact line: slope=${a.get(7)} intercept=${a.get(8)} r2=${a.get(9)}")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((10L, 55L, 185L)),
      "n, sum_x, sum_y exact")
    val b = out("B")
    assert(b.isNullAt(7) && b.isNullAt(8) && b.isNullAt(9), "zero x-variance: no fit")
    val c = out("C")
    assert(c.getDouble(7) === 0.0 && c.getDouble(8) === 7.0 && c.isNullAt(9),
      "constant y: slope 0, intercept y, r2 NULL")
  }

  test("calibration: integer binning, bounds, and rates on a hand case") {
    import spark.implicits._
    // scores 0..99 (mn=0, mx=99, range 100) -> bin k = [10k, 10k+9];
    // label = score >= 50, so bins 0-4 have pos_rate 0, bins 5-9 rate 1
    val df = (0L to 99L).map(s => (s, s >= 50)).toDF("s", "lab")
    val out = Stats.calibrationBins(df, col("s"), col("lab"), 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 10)
    (0L to 9L).foreach { k =>
      val r = out(k)
      assert((r.getLong(1), r.getLong(2)) === ((10 * k, 10 * k + 9)), s"bin $k bounds")
      assert(r.getLong(3) === 10L, s"bin $k count")
      assert(r.getLong(4) === (if (k >= 5) 10L else 0L), s"bin $k positives")
      assert(r.getDouble(6) === (if (k >= 5) 1.0 else 0.0), s"bin $k pos_rate")
      assert(r.getDouble(7) === (10 * k + 4.5), s"bin $k mean score")
    }
    // degenerate single score -> bin 0 holds everything; the other
    // nine bins still emit, with zero counts and NULL rates
    val one = Stats.calibrationBins(Seq((7L, true), (7L, false)).toDF("s", "lab"),
      col("s"), col("lab"), 10).collect()
    assert(one.length === 10, "nBins rows always")
    val b0 = one.find(_.getLong(0) == 0L).get
    assert(b0.getLong(3) === 2L, "all-one-score input lands in bin 0")
    one.filter(_.getLong(0) > 0L).foreach { r =>
      assert(r.getLong(3) === 0L && r.isNullAt(6) && r.isNullAt(7),
        s"empty bin ${r.getLong(0)} carries zero count and NULL rates")
    }
    // empty input stays empty
    assert(Stats.calibrationBins(Seq.empty[(Long, Boolean)].toDF("s", "lab"),
      col("s"), col("lab"), 10).count() === 0L)
  }

  test("modularity: hand graph invariants and exact contributions") {
    import spark.implicits._
    // two triangles bridged by one edge: m = 7, every LPA community's
    // numbers are hand-checkable whatever partition 3 rounds land on
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val rows = LabelPropagation.modularity(edges, "src", "dst", rounds = 3).collect()
    val m = rows.head.getLong(4)
    assert(m === 7L, "distinct undirected edge count")
    assert(rows.map(_.getLong(3)).sum === 2 * m, "sum of degree sums = 2m")
    assert(rows.map(_.getLong(2)).sum <= m, "internal edges never exceed m")
    rows.foreach { r =>
      val (inE, dSum, contrib) = (r.getLong(2), r.getLong(3), r.getLong(5))
      assert(contrib === 4 * m * inE - dSum * dSum, "per-community numerator")
    }
    val q = rows.head.getDouble(6)
    assert(rows.forall(_.getDouble(6) === q), "global Q repeated per row")
    assert(q === rows.map(_.getLong(5)).sum.toDouble / (4.0 * m * m),
      "Q = one division of exact integers")
    // the bridged-triangles partition found by LPA must beat chance
    assert(q > 0.0, s"two-community structure has positive modularity, got $q")
  }

  test("minhash accuracy: identical docs estimate 8/8 with exact J 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta epsilon"),
      (4L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val out = Dedup.minhashAccuracy(docs, "doc_id", "text", bands = 2, rowsPerBand = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val full = out(8L)
    assert(full.getLong(1) >= 1L, "identical pair is a candidate at 8/8")
    assert(full.getDouble(4) === 1.0 || out(8L).getLong(2) < out(8L).getLong(3),
      "8/8 with only the identical pair gives micro_j 1.0")
    out.values.foreach { r =>
      assert(r.getDouble(5) === r.getLong(0).toDouble / 8.0, "est_j = n_match/8")
      assert(r.getLong(2) <= r.getLong(3), "inter <= union")
    }
  }

  test("lsh tuning curve: decile math and the S-curve orderings") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "a b c d e f g h i j"), (2L, "s", "a b c d e f g h i k"),
      (3L, "s", "a b c d e f q r s t"), (4L, "s", "x y z w v u t1 t2 t3 t4"))
      .toDF("doc_id", "source", "text")
    val rows = Dedup.lshTuningCurve(docs, "doc_id", "text", "source",
      num = 1, den = 2, grid = Seq((1, 8), (2, 4), (4, 2), (8, 1))).collect()
    // docs 1-2: J = 9/11 -> bucket 8; docs 1-3, 2-3: J = 6/14 < 1/2 out
    val buckets = rows.map(_.getLong(2)).distinct.sorted
    assert(buckets sameElements Array(8L), s"one observed decile: ${buckets.toList}")
    assert(rows.length === 4, "one row per grid config")
    val byCfg = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4)).toMap
    // at j=0.85: more rows per band = stricter; b=8,r=1 is the laxest
    assert(byCfg((1, 8)) > byCfg((2, 4)) && byCfg((2, 4)) > byCfg((4, 2)) &&
      byCfg((4, 2)) > byCfg((8, 1)), s"S-curve strictness order: $byCfg")
    val jm = 0.85
    val expect = 1.0 - math.pow(1.0 - math.pow(jm, 8.0), 1.0)
    assert(math.abs(byCfg((8, 1)) - expect) < 1e-12, "textbook formula at the midpoint")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(5) - r.getLong(3) * r.getDouble(4)) < 1e-12,
        "exp_caught = n_pairs * p_catch")
    }
  }
}
