package graft

import graft.operators.Triangles

class TrianglesSpec extends SparkSpecBase {

  private def tri(pairs: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    Triangles.triangleCount(pairs.toDF("src", "dst"), "src", "dst")
      .head.getAs[Long]("n_triangles")
  }

  test("triangles: K4 has 4; a path has none; dup/reversed/self edges are cleaned") {
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    assert(tri(k4) === 4L)
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === 0L)
    // one triangle, reported once despite duplicate/reversed/self edges
    assert(tri(Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 3L), (1L, 2L))) === 1L)
  }

  test("triangles: hub graph counts only closed wedges") {
    // star around 1 with one rim edge: exactly one triangle
    val star = (2L to 8L).map(i => (1L, i)) :+ (2L, 3L)
    assert(tri(star) === 1L)
  }

  test("triangles: salted hot path and tiny (high-fp) bloom replay the unsalted count") {
    import spark.implicits._
    // random-ish graph with a residual hub: node 50 connects to most
    // higher-id nodes, surviving orientation with a large out-degree
    val rnd = for (i <- 1L to 60L; j <- 1L to 60L
                   if i < j && (i * 31 + j * 17) % 5 == 0) yield (i, j)
    val hub = (51L to 60L).map(j => (50L, j))
    val edges = (rnd ++ hub).toDF("src", "dst")
    val base = Triangles.triangleCount(edges, "src", "dst")
      .head.getAs[Long]("n_triangles")
    // hotThreshold=0: EVERY apex goes through the salted join
    val salted = Triangles.triangleCount(edges, "src", "dst",
      saltFactor = 4, hotThreshold = 0).head.getAs[Long]("n_triangles")
    assert(salted === base, "selective salting must not change the count")
    // bloomWords=1: every wedge is a bloom false positive — the exact
    // confirm join must still kill non-edges
    val fp = Triangles.triangleCount(edges, "src", "dst", bloomWords = 1)
      .head.getAs[Long]("n_triangles")
    assert(fp === base, "a saturated bloom must degrade to pass-through, not wrong counts")
  }
}
