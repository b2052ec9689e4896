package graft

import graft.operators.{Association, KCore, Retrieval, TimeSeries, Triangles}
import org.apache.spark.sql.functions._

/** Known-answer tests for the round-8 operator batch: association
  * rules, clustering coefficient, k-core, positional phrase search,
  * seasonal anomalies.
  */
class NewOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("basket rules: counts, confidence and lift on a hand-checked basket set") {
    // baskets: {1,2}, {1,2}, {1,2,3}, {1,3}, {2} → n=5
    val df = Seq(
      (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (12L, 3L),
      (13L, 1L), (13L, 3L),
      (14L, 2L)).toDF("basket", "item")
    val r = Association.basketRules(df, "basket", "item", minSupport = 2)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x)).toMap
    assert(r.keySet === Set((1L, 2L), (1L, 3L)))
    val p12 = r((1L, 2L))
    assert(p12.getLong(2) === 3L)            // pair_count
    assert(p12.getLong(3) === 4L)            // count(1)
    assert(p12.getLong(4) === 4L)            // count(2)
    assert(p12.getLong(5) === 5L)            // n_baskets
    assert(p12.getDouble(6) === 3.0 / 4)     // conf 1→2
    assert(p12.getDouble(8) === 3.0 * 5 / (4 * 4)) // lift
    val p13 = r((1L, 3L))
    assert(p13.getLong(2) === 2L && p13.getLong(4) === 2L)
    assert(p13.getDouble(7) === 1.0, "3 ⇒ 1 in every basket containing 3")
  }

  test("clustering coefficient: K4 nodes are fully clustered, a path is 0") {
    val k4 = (for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j))
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    val out = Triangles.nodeClusteringCoefficient((k4 ++ path).toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    (1L to 4L).foreach { v =>
      assert(out(v) === ((3L, 3L, 1.0)), s"K4 node $v: deg 3, 3 triangles, coeff 1")
    }
    Seq(11L, 12L).foreach { v =>
      assert(out(v) === ((2L, 0L, 0.0)), s"path node $v")
    }
    assert(!out.contains(10L), "degree-1 endpoints are excluded")
  }

  test("k-core: the 4-core of a K5 with pendant tails is exactly the K5") {
    val k5 = for (i <- 1L to 5L; j <- 1L to 5L if i < j) yield (i, j)
    val tails = Seq((1L, 10L), (2L, 11L), (10L, 11L)) // low-degree fringe
    val out = KCore.kCore((k5 ++ tails).toDF("src", "dst"), "src", "dst", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === (1L to 5L).toSet, "tails must peel away")
    assert(out.values.forall(_ === 4L), "inside the core every node keeps degree 4")
    // k larger than any degree → empty core, schema intact
    val empty = KCore.kCore(k5.toDF("src", "dst"), "src", "dst", k = 5)
    assert(empty.count() === 0L)
  }

  test("phrase search: positional intersection finds exact adjacent occurrences only") {
    val docs = Seq(
      (1L, "big data big data systems"),   // "big data" ×2
      (2L, "data big and big data"),       // "big data" ×1 (the first pair is reversed)
      (3L, "big model data"),              // non-adjacent: no hit
      (4L, "big data")).toDF("doc_id", "text")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text", nPhrases = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    // "big data" is the most frequent bigram (4 occurrences corpus-wide)
    assert(out === Map(
      ("big", "data", 1L) -> 2L,
      ("big", "data", 2L) -> 1L,
      ("big", "data", 4L) -> 1L))
  }

  test("seasonal anomalies: cross-multiplied integer comparison flags only true spikes") {
    val mk = (day: Int, hr: Int, v: Double) =>
      (java.sql.Timestamp.valueOf(f"2024-01-0$day $hr%02d:30:00"), v)
    // Sunday 2024-01-07 10:00 bucket: 20 × 1.0 plus one 30.0 spike →
    // n=21, sum_cents=5000; anomaly iff cents·21 > 5·5000, i.e.
    // v > 25000/2100 ≈ 11.9 → exactly the spike (which still pays its
    // own inflation of the bucket mean)
    val rows = Seq.fill(20)(mk(7, 10, 1.0)) ++ Seq(mk(7, 10, 30.0)) ++
      Seq(mk(6, 10, 3.0)) // saturday bucket: single event, never anomalous
    val out = TimeSeries.seasonalAnomalies(rows.toDF("ts", "value"), "ts", "value", factor = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1 -> 10) === ((21L, 5000L, 1L)), "sunday bucket: one spike")
    assert(out(7 -> 10) === ((1L, 300L, 0L)), "a lone event can never exceed 5x its own mean")
  }
}
