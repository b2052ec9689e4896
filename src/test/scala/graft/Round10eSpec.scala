package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{FeaturePrep, Stats, TimeSeries}

class Round10eSpec extends SparkSpecBase {

  test("autocorrelation: perfect alternation is -1 at lag 1 and +1 at lag 2") {
    import spark.implicits._
    // series A: 1,5,1,5,... on consecutive days
    val ser = (0L to 19L).map(d => ("A", d, if (d % 2 == 0) 1L else 5L))
      .toDF("g", "d", "v")
    val out = TimeSeries.autocorrelation(ser, "g", "d", "v", Seq(1, 2))
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out(1L).getDouble(8) === -1.0, s"alternation lag1: ${out(1L).toSeq}")
    assert(out(2L).getDouble(8) === 1.0, s"alternation lag2: ${out(2L).toSeq}")
    assert(out(1L).getLong(2) === 19L && out(2L).getLong(2) === 18L,
      "pair counts = n - lag on a gap-free series")
    // calendar gaps pair nothing: days 0,1,10,11 at lag 1 -> 2 pairs
    val gappy = Seq(("B", 0L, 1L), ("B", 1L, 2L), ("B", 10L, 3L), ("B", 11L, 9L))
      .toDF("g", "d", "v")
    val g1 = TimeSeries.autocorrelation(gappy, "g", "d", "v", Seq(1)).collect()(0)
    assert(g1.getLong(2) === 2L, "only calendar-adjacent days pair")
    // constant series -> NULL acf
    val const = Seq(("C", 0L, 7L), ("C", 1L, 7L), ("C", 2L, 7L)).toDF("g", "d", "v")
    assert(TimeSeries.autocorrelation(const, "g", "d", "v", Seq(1))
      .collect()(0).isNullAt(8), "zero variance -> NULL")
  }

  test("soundex: textbook keys, run collapse, vowel separation, padding") {
    import spark.implicits._
    val in = Seq("Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister",
      "Honeyman", "BOB", "A", "123", null)
      .toDF("w")
    val out = in.select(TextFunctions.soundexKey(col("w")).as("k"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toList
    assert(out(0) === "R163" && out(1) === "R163", "Robert/Rupert agree")
    // vowel-separator variant (no H/W transparency): Ashcraft = A226
    assert(out(2) === "A226", s"Ashcraft: ${out(2)}")
    assert(out(3) === "T522", s"Tymczak: ${out(3)}")
    assert(out(4) === "P236", s"Pfister (PF collapses): ${out(4)}")
    assert(out(5) === "H555", s"Honeyman: ${out(5)}")
    assert(out(6) === "B100", "vowel keeps the repeat lane but zeros drop")
    assert(out(7) === "A000", "single letter pads")
    assert(out(8) === null && out(9) === null, "letterless and NULL -> NULL")
  }

  test("feature hash: signed collision cancellation and sparse shape") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta alpha"), (2L, "alpha"), (3L, "  "), (4L, null))
      .toDF("doc_id", "text")
    val out = FeaturePrep.featureHash(docs, "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1 has alpha twice: its bucket's |feat| = 2; beta contributes 1
    val d1 = out.filter(_._1._1 == 1L)
    assert(d1.values.map(math.abs).toList.sorted === List(1L, 2L),
      s"token multiplicity rides the sign sum: $d1")
    val d2 = out.filter(_._1._1 == 2L)
    assert(d2.size === 1 && math.abs(d2.values.head) === 1L)
    // same token -> same (bucket, sign) everywhere
    val alphaBucket = d2.keys.head._2
    assert(d1.contains((1L, alphaBucket)) && d1((1L, alphaBucket)) === 2 * d2.values.head,
      "alpha lands identically across docs")
    assert(!out.keys.exists(k => k._1 == 3L || k._1 == 4L),
      "blank/NULL docs emit nothing")
  }

  test("diff-in-diff: hand cells and the trend-cancellation property") {
    import spark.implicits._
    // control: pre 10, post 14 (trend +4); treated: pre 20, post 30
    // -> did = (30-20) - (14-10) = 6
    val units = Seq(
      (0L, false, 8L), (0L, false, 12L), (0L, true, 13L), (0L, true, 15L),
      (1L, false, 18L), (1L, false, 22L), (1L, true, 28L), (1L, true, 32L))
      .toDF("arm", "post", "y")
    val r = Stats.diffInDiff(units, col("arm"), col("post"), col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((0L, 1L)), "control = lower arm")
    assert(r.getDouble(10) === 10.0 && r.getDouble(11) === 14.0 &&
      r.getDouble(12) === 20.0 && r.getDouble(13) === 30.0, s"cell means: ${r.toSeq}")
    assert(r.getDouble(14) === 6.0, "did estimate")
    intercept[IllegalArgumentException] {
      Stats.diffInDiff(Seq((0L, false, 1L), (0L, true, 2L)).toDF("arm", "post", "y"),
        col("arm"), col("post"), col("y")).collect()
    }
    intercept[IllegalArgumentException] {
      Stats.diffInDiff(
        Seq((0L, false, 1L), (0L, true, 2L), (1L, true, 3L)).toDF("arm", "post", "y"),
        col("arm"), col("post"), col("y")).collect()
    }
  }
}
