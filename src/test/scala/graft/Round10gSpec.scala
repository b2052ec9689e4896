package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{FeaturePrep, Sessionize, Stats}

class Round10gSpec extends SparkSpecBase {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("burst dedup: chained gaps form one burst, first event + multiplicity kept") {
    import spark.implicits._
    // user 1 view: 0,3,6 chain (gaps 3,3 <= 5) then 100 -> two bursts
    // user 1 click at 4: separate key, own burst
    // user 2 view at 5: separate key
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "view", ts(3)), (1L, "view", ts(6)),
      (1L, "view", ts(100)), (1L, "click", ts(4)), (2L, "view", ts(5)))
      .toDF("user_id", "event_type", "ts")
    val out = Sessionize.burstDedup(ev, Seq("user_id", "event_type"), "ts", 5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out((1L, "view", 1L)) === ((0L, 3L)), "chained burst keeps t=0, n=3")
    assert(out((1L, "view", 2L)) === ((100L, 1L)), "gap starts a new burst")
    assert(out((1L, "click", 1L)) === ((4L, 1L)) && out((2L, "view", 1L)) === ((5L, 1L)),
      "keys never mix")
    assert(out.size === 4)
  }

  test("k-anonymity: at-risk flags and exposure totals") {
    import spark.implicits._
    // combo (1,1): 5 rows (safe at k=5); (1,2): 2 rows; (2,1): 1 row
    val df = (Seq.fill(5)((1L, 1L)) ++ Seq.fill(2)((1L, 2L)) :+ ((2L, 1L)))
      .toDF("a", "b")
    val out = Stats.kAnonymityAudit(df, Seq("a", "b"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(!out((1L, 1L)).getBoolean(3), "size-5 combo is k-anonymous at k=5")
    assert(out((1L, 2L)).getBoolean(3) && out((2L, 1L)).getBoolean(3))
    val any = out.values.head
    assert(any.getLong(4) === 2L && any.getLong(5) === 3L,
      s"2 exposed combos, 3 exposed records: ${any.toSeq}")
  }

  test("woe: literal formula, zero-cell finiteness, IV sign") {
    import spark.implicits._
    // catalog: A 3 pos / 1 neg, B 0 pos / 4 neg (zero cell), C 2/2
    val df = (Seq.fill(3)(("A", true)) ++ Seq.fill(1)(("A", false)) ++
      Seq.fill(4)(("B", false)) ++ Seq(("C", true), ("C", true), ("C", false), ("C", false)))
      .toDF("cat", "is_pos")
    val out = FeaturePrep.woeEncoding(df, "cat", "is_pos")
      .collect().map(r => r.getString(0) -> r).toMap
    val (pTot, nTot) = (5.0, 7.0)
    def woe(pos: Long, neg: Long) =
      math.log(((2 * pos + 1) * nTot.toLong).toDouble / ((2 * neg + 1) * pTot.toLong).toDouble)
    // Catalyst's log is StrictMath.log; scala math.log is the JVM
    // intrinsic — they may differ by 1 ulp, so compare within a few
    def close(a: Double, b: Double) = math.abs(a - b) <= 4 * math.ulp(math.abs(b).max(1e-300))
    Seq(("A", 3L, 1L), ("B", 0L, 4L), ("C", 2L, 2L)).foreach { case (c, p, n) =>
      val r = out(c)
      assert((r.getLong(1), r.getLong(2)) === ((p, n)), s"$c counts")
      assert(close(r.getDouble(5), woe(p, n)), s"$c woe literal: ${r.getDouble(5)}")
      assert(!r.getDouble(5).isInfinite, s"$c finite despite zero cells")
      val iv = ((2 * p + 1) / (2.0 * pTot) - (2 * n + 1) / (2.0 * nTot)) * woe(p, n)
      assert(close(r.getDouble(6), iv), s"$c iv contribution: ${r.getDouble(6)}")
      assert(r.getDouble(6) >= 0.0, s"$c IV contribution is non-negative by construction")
    }
    assert(out("A").getDouble(5) > 0 && out("B").getDouble(5) < 0,
      "signs follow the class balance")
  }

  test("lsh recall: identical docs are always caught; truth buckets partition") {
    import spark.implicits._
    import graft.operators.Dedup
    // identical pair (J=1, every band matches) + a J~0.5 pair the
    // 4-row bands may or may not catch + a below-threshold pair
    val docs = Seq(
      (1L, "s", "a b c d e f g h"), (2L, "s", "a b c d e f g h"),
      (3L, "s", "a b c d e f q r"), (4L, "s", "x y z w v u t q"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.lshRecall(docs, "doc_id", "text", "source",
      num = 1, den = 2, bands = 2, rowsPerBand = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val top = out(9L)
    assert(top._1 >= 1L && top._2 === top._1 && top._3 === 1.0,
      s"identical docs always collide in every band: $out")
    out.values.foreach { case (t, c, r) =>
      assert(c <= t && r >= 0.0 && r <= 1.0, "recall is a fraction of truth")
    }
  }
}
