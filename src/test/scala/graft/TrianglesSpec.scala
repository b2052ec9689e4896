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
}
