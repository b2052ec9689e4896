package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpecBase {

  private def sky(pts: Seq[(Long, Long)], nBuckets: Int = 4): Set[(Long, Long)] = {
    import spark.implicits._
    Skyline.skyline2D(pts.toDF("x", "y"), "x", "y", nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val d = pts.distinct
    d.filterNot { case (x, y) => d.exists { case (bx, by) =>
      bx >= x && by >= y && (bx > x || by > y) } }.toSet
  }

  test("skyline: staircase, dominated points, same-x and same-y ties, duplicates") {
    val pts = Seq[(Long, Long)](
      (1, 10), (2, 9), (3, 8),        // staircase: all skyline
      (1, 5), (2, 2),                 // dominated within-x and across
      (3, 8),                         // duplicate of a skyline point
      (0, 10),                        // same y as (1,10), lower x: dominated
      (3, 1))                         // same x as (3,8), lower y: dominated
    assert(sky(pts) === brute(pts))
    assert(sky(pts) === Set((1L, 10L), (2L, 9L), (3L, 8L)))
  }

  test("skyline: equals brute force on a pseudo-random cloud at several bucket counts") {
    val rng = new scala.util.Random(11)
    val pts = Seq.fill(400)((rng.nextInt(100).toLong, rng.nextInt(100).toLong))
    val want = brute(pts)
    for (b <- Seq(1, 3, 16, 64)) assert(sky(pts, b) === want, s"nBuckets=$b")
  }

  test("skyline: single point and totally-ordered chain") {
    assert(sky(Seq((5L, 5L))) === Set((5L, 5L)))
    // strictly increasing chain: only the top point survives
    assert(sky((1L to 10L).map(i => (i, i))) === Set((10L, 10L)))
  }
}
