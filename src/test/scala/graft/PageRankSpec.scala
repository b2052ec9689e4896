package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpecBase {

  private def edges(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  test("pagerank: two-node cycle is the uniform fixed point; mass conserved") {
    val out = PageRank.run(edges(Seq((1L, 2L), (2L, 1L))), "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 0.5) < 1e-12 && math.abs(out(2L) - 0.5) < 1e-12)
  }

  test("pagerank: dangling mass is redistributed, total rank stays 1") {
    // a -> b, b dangling: after one step pr(b) = 0.075 + 0.85*(0.5 + 0.25)
    val one = PageRank.run(edges(Seq((1L, 2L))), "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(one(1L) - 0.2875) < 1e-12)
    assert(math.abs(one(2L) - 0.7125) < 1e-12)
    val five = PageRank.run(edges(Seq((1L, 2L))), "src", "dst", iters = 5)
      .agg(sum("pr")).head.getDouble(0)
    assert(math.abs(five - 1.0) < 1e-9, s"rank mass leaked: $five")
  }

  test("pagerank: matches a reference power iteration on a small digraph") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    val iters = 4
    // reference: dense power iteration with dangling redistribution
    val nodesRef = g.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = nodesRef.size.toDouble
    val out = g.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var pr = nodesRef.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dm = nodesRef.filterNot(out.contains).map(pr).sum
      val contrib = nodesRef.map { v =>
        v -> nodesRef.filter(u => out.get(u).exists(_.contains(v)))
          .map(u => pr(u) / out(u).size).sum
      }.toMap
      pr = nodesRef.map(v => v -> ((1 - 0.85) / n + 0.85 * (contrib(v) + dm / n))).toMap
    }
    val got = PageRank.run(edges(g), "src", "dst", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    nodesRef.foreach { v =>
      assert(math.abs(got(v) - pr(v)) < 1e-12, s"node $v: ${got(v)} vs ${pr(v)}")
    }
  }
}
