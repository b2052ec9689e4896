package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sharding, Similarity, Stats}

class Round10dSpec extends SparkSpecBase {

  private def v(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("ndcg: perfect retrieval scores 1.0, a buried relevant scores g3/g1") {
    import spark.implicits._
    // q=0deg label 0; its only same-label mate sits at 80deg (cos .17)
    // behind two label-1 vectors at 10/20deg -> rank 3 -> dcg = g3,
    // idcg = cum[1] -> ndcg exactly 0.5
    val corpus = Seq(
      (0L, v(0), 0), (1L, v(80), 0), (2L, v(10), 1), (3L, v(20), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.ndcgAtK(corpus, corpus.filter(col("vec_id") === 0),
      "vec_id", "embedding", "label", k = 10).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(2) === 1L, "one true same-label row")
    assert(r.getLong(3) === 500000L && r.getLong(4) === 1000000L,
      s"dcg g3, idcg cum[1]: ${r.toSeq}")
    assert(r.getDouble(5) === 0.5, "ndcg exactly one division")

    // clean clusters: every same-label mate out-ranks cross-label ->
    // ndcg 1.0, with idcg truncated at n_rel (2 mates, k = 10)
    val clean = Seq(
      (0L, v(0), 0), (1L, v(3), 0), (2L, v(6), 0),
      (3L, v(90), 1), (4L, v(87), 1), (5L, v(84), 1), (6L, v(81), 1))
      .toDF("vec_id", "embedding", "label")
    val o2 = Similarity.ndcgAtK(clean, clean.filter(col("vec_id") < 2),
      "vec_id", "embedding", "label", k = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(o2(0L).getDouble(5) === 1.0 && o2(1L).getDouble(5) === 1.0,
      s"perfect per-class retrieval: ${o2.values.map(_.toSeq)}")
    assert(o2(0L).getLong(4) === 1630929L, "idcg = cum[2] for a 2-mate class")
  }

  test("cuped: theta and adjusted means match the literal formulas; E[adj] preserved") {
    import spark.implicits._
    // y = 3x + arm*5 + noise-free: covariate explains everything, so
    // the adjusted means collapse to the pure arm effect around E[Y]
    val units = (1L to 20L).map { i =>
      val arm = i % 2; val x = i; val y = 3 * x + 5 * arm
      (arm, x, y)
    }
    val df = units.toDF("arm", "x", "y")
    val out = Stats.cupedMeans(df, col("arm"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // literal doubles
    val n = units.size.toDouble
    val (sx, sy) = (units.map(_._2).sum.toDouble, units.map(_._3).sum.toDouble)
    val sxx = units.map(u => u._2 * u._2).sum.toDouble
    val sxy = units.map(u => u._2 * u._3).sum.toDouble
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    Seq(0L, 1L).foreach { a =>
      val grp = units.filter(_._1 == a)
      val (na, sxa, sya) = (grp.size.toDouble, grp.map(_._2).sum.toDouble,
        grp.map(_._3).sum.toDouble)
      val r = out(a)
      assert(r.getDouble(4) === theta, s"theta arm $a")
      assert(r.getDouble(6) === sya / na - theta * (sxa / na - sx / n),
        s"adjusted mean arm $a")
    }
    // adjustment preserves the overall mean: weighted avg of adj means
    val wavg = Seq(0L, 1L).map(a => out(a).getDouble(6) * out(a).getLong(1)).sum / n
    assert(math.abs(wavg - sy / n) < 1e-9, "E[adjusted Y] = E[Y]")
    // the arm gap sharpens toward the true effect 5 +- covariate gap
    val gapRaw = out(1L).getDouble(5) - out(0L).getDouble(5)
    val gapAdj = out(1L).getDouble(6) - out(0L).getDouble(6)
    assert(math.abs(gapAdj - 5.0) < math.abs(gapRaw - 5.0),
      s"CUPED moves the estimate toward the true effect: raw $gapRaw adj $gapAdj")
  }

  test("welch t: literal formula match and the two guards") {
    import spark.implicits._
    val a0 = Seq(10L, 12L, 14L, 16L); val a1 = Seq(20L, 25L, 30L)
    val df = (a0.map((0L, _)) ++ a1.map((1L, _))).toDF("arm", "y")
    val r = Stats.welchTTest(df, col("arm"), col("y")).collect()(0)
    def stats(ys: Seq[Long]) = {
      val n = ys.size.toDouble; val s = ys.sum.toDouble
      val q = ys.map(y => y * y).sum.toDouble
      (n, s, ((n * q - s * s) / (n * (n - 1.0))) / n)
    }
    val (n0, s0, v0) = stats(a0); val (n1, s1, v1) = stats(a1)
    val se2 = v1 + v0
    val t = (s1 / n1 - s0 / n0) / math.sqrt(se2)
    val dfw = se2 * se2 / (v1 * v1 / (n1 - 1.0) + v0 * v0 / (n0 - 1.0))
    assert(r.getLong(2) === 4L && r.getLong(3) === 3L, "arm sizes")
    assert(math.abs(r.getDouble(9) - t) < 1e-12, s"t: ${r.getDouble(9)} vs $t")
    assert(math.abs(r.getDouble(10) - dfw) < 1e-12, s"df: ${r.getDouble(10)} vs $dfw")
    intercept[IllegalArgumentException] {
      Stats.welchTTest(Seq((0L, 1L), (0L, 2L)).toDF("arm", "y"),
        col("arm"), col("y")).collect()
    }
    intercept[IllegalArgumentException] {
      Stats.welchTTest(Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("arm", "y"),
        col("arm"), col("y")).collect()
    }
  }

  test("rendezvous: movement goes only to the new shard, ~1/(k+1) of keys") {
    import spark.implicits._
    val keys = (1L to 2000L).toDF("doc_id")
    val rep = Sharding.rendezvousMovement(keys, "doc_id", k = 8).collect()
    rep.foreach { r =>
      assert(r.getLong(2) === r.getLong(3),
        s"every moved key lands on shard 8: ${r.toSeq}")
    }
    val moved = rep.map(_.getLong(2)).sum.toDouble
    val total = rep.map(_.getLong(1)).sum.toDouble
    assert(total === 2000.0, "every key assigned")
    assert(moved / total > 0.04 && moved / total < 0.25,
      s"expected ~1/9 movement, got ${moved / total}")
    // consistency with the assignment operator at both fleet sizes
    val a8 = Sharding.rendezvousAssign(keys, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a9 = Sharding.rendezvousAssign(keys, "doc_id", 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val movedKeys = a8.keys.filter(k => a8(k) != a9(k))
    assert(movedKeys.forall(k => a9(k) == 8L), "assign agrees: moves only to new")
    assert(movedKeys.size.toLong === rep.map(_.getLong(2)).sum, "report counts match")
  }
}
