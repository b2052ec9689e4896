package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ivm, Quantize, TimeSeries}

class Round10fSpec extends SparkSpecBase {

  test("trend decompose: hand window sums, gap-shrunk RANGE frame, exact micro") {
    import spark.implicits._
    // days 0..6 values 10..70 plus a gap: day 20 value 100
    val ser = ((0L to 6L).map(d => ("A", d, (d + 1) * 10)) :+ (("A", 20L, 100L)))
      .toDF("g", "d", "v")
    val out = TimeSeries.trendDecompose(ser, "g", "d", "v", radius = 3)
      .collect().map(r => r.getLong(1) -> r).toMap
    // day 3: full window 0..6 -> wn 7, wsum 280, trend 40e6, dev 0
    val d3 = out(3L)
    assert((d3.getLong(3), d3.getLong(4)) === ((7L, 280L)))
    assert(d3.getLong(5) === 40000000L && d3.getLong(6) === 0L)
    // day 0: window [−3,3] has days 0..3 -> wn 4, wsum 100, trend 25e6
    val d0 = out(0L)
    assert((d0.getLong(3), d0.getLong(4)) === ((4L, 100L)))
    assert(d0.getLong(5) === 25000000L && d0.getLong(6) === 10L * 1000000L - 25000000L)
    // the gapped day 20 sees ONLY itself (RANGE, not ROWS)
    val d20 = out(20L)
    assert(d20.getLong(3) === 1L && d20.getLong(5) === 100000000L && d20.getLong(6) === 0L,
      s"calendar gap isolates the point: ${d20.toSeq}")
  }

  test("embed dim stats: exact fixed-point moments per dimension") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(0.5f, -0.5f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Quantize.dimStats(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    val M = 1048576L
    val d0 = out(0L)
    assert((d0.getLong(1), d0.getLong(2)) === ((3L, M + M / 2)), "n, sum at dim0")
    assert((d0.getLong(4), d0.getLong(5)) === ((0L, M)), "min/max")
    val d2 = out(2L)
    assert(d2.getLong(2) === 0L && d2.getDouble(7) === 0.0,
      "dead dimension shows zero variance")
    val d1 = out(1L)
    assert(d1.getLong(4) === -M / 2 && d1.getLong(5) === M, "signed range at dim1")
    // variance matches the literal formula
    val qs = Seq(-M / 2, -M / 2, M).map(_.toDouble)
    val n = 3.0; val s = qs.sum; val q2 = qs.map(x => x * x).sum
    assert(d1.getDouble(7) === (n * q2 - s * s) / (n * (n - 1.0)), "unbiased variance")
  }

  test("topk IVM: insert/delete maintenance equals recompute until underflow flags") {
    import spark.implicits._
    val k = 2; val b = 2
    // base: group A values 50,40,30,20 (retained all 4 = k+b), B: 9,8
    val state = Seq(("A", 1L, 50L), ("A", 2L, 40L), ("A", 3L, 30L), ("A", 4L, 20L),
      ("B", 10L, 9L), ("B", 11L, 8L)).toDF("g", "id", "v")
    // insert a new top row into A; delete one mid row; B untouched
    val delta = Seq(("I", "A", 5L, 45L), ("D", "A", 3L, 30L))
      .toDF("op", "g", "id", "v")
    val out = Ivm.applyTopKDelta(state, delta, "op", "g", "id", "v", k, b)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    // A retained (k+b=4): 50,45,40,20 — no flag (still >= k after delete)
    assert(out(("A", 1L))._1 === 50L && out(("A", 5L))._1 === 45L &&
      out(("A", 2L))._1 === 40L && out(("A", 4L))._1 === 20L)
    assert(!out.exists { case ((g, _), (_, f)) => g == "A" && f }, "A not flagged")
    assert(out(("B", 10L))._1 === 9L && !out(("B", 10L))._2, "B untouched")
    assert(out.size === 6)

    // delete storm: kill 3 of A's 4 retained -> 1 < k -> flagged
    val storm = Seq(("D", "A", 1L, 50L), ("D", "A", 2L, 40L), ("D", "A", 4L, 20L))
      .toDF("op", "g", "id", "v")
    val st2 = Seq(("A", 1L, 50L), ("A", 2L, 40L), ("A", 3L, 30L), ("A", 4L, 20L))
      .toDF("g", "id", "v")
    val flagged = Ivm.applyTopKDelta(st2, storm, "op", "g", "id", "v", k, b).collect()
    assert(flagged.length === 1 && flagged(0).getLong(1) === 3L &&
      flagged(0).getBoolean(3), "survivor carries the recompute flag")

    // total wipe-out: the group may owe trimmed rows — NULL carrier row
    val wipe = Seq(("D", "A", 1L, 50L), ("D", "A", 2L, 40L), ("D", "A", 3L, 30L),
      ("D", "A", 4L, 20L)).toDF("op", "g", "id", "v")
    val gone = Ivm.applyTopKDelta(st2, wipe, "op", "g", "id", "v", k, b).collect()
    assert(gone.length === 1 && gone(0).isNullAt(1) && gone(0).getBoolean(3),
      "vanished group cannot disappear unflagged")

    // ADVICE r10 counterexample: inserts refilling the merged count
    // must NOT clear the underflow flag — k=2, b=0: state {10,9} with
    // 8 trimmed away earlier; delete 9, insert 1 → kept={10} < k, the
    // group owes the trimmed 8 even though merged count is back to 2
    val st3 = Seq(("A", 1L, 10L), ("A", 2L, 9L)).toDF("g", "id", "v")
    val refill = Seq(("D", "A", 2L, 9L), ("I", "A", 3L, 1L))
      .toDF("op", "g", "id", "v")
    val ref = Ivm.applyTopKDelta(st3, refill, "op", "g", "id", "v", 2, 0).collect()
    assert(ref.length === 2 && ref.forall(_.getBoolean(3)),
      s"post-delete count < k flags even when inserts refill to k: ${ref.toSeq}")

    // intra-batch I-then-D nets to a no-op
    val noop = Seq(("I", "A", 9L, 99L), ("D", "A", 9L, 99L)).toDF("op", "g", "id", "v")
    val same = Ivm.applyTopKDelta(st2, noop, "op", "g", "id", "v", k, b)
      .collect().map(r => r.getLong(1)).toSet
    assert(same === Set(1L, 2L, 3L, 4L), "netting discipline")
  }
}
