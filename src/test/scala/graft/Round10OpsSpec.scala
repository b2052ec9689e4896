package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.{Dedup, LinkPrediction, Quarantine}

class Round10OpsSpec extends SparkSpecBase {

  test("link prediction: wedge scores, novelty filter, degree cap, deterministic top-k") {
    import spark.implicits._
    // path graph 1-2-3 plus 3-4: predicted links are the 2-hop pairs
    //   (1,3) via 2; (2,4) via 3; (1,4) share no neighbor
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = LinkPrediction.predictLinks(edges, "src", "dst",
        maxDegree = 64, minCommon = 1, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // deg(2) = deg(3) = 2 → ra_q = 2^20 div 2 = 524288
    assert(out === Set(
      (1L, 3L, 1L, 524288L), (3L, 1L, 1L, 524288L),
      (2L, 4L, 1L, 524288L), (4L, 2L, 1L, 524288L)),
      s"2-hop pairs with RA = 2^20/deg(center): $out")
    // existing edges are never predicted
    assert(!out.exists { case (a, b, _, _) => Set((a, b)) == Set((1L, 2L)) })

    // a star center above maxDegree contributes no wedges: cap at 2
    // kills the hub (deg 3) and only the 1-2-3 / 3-4 wedges survive
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L)).toDF("src", "dst")
    val capped = LinkPrediction.predictLinks(star, "src", "dst",
      maxDegree = 2, minCommon = 1, topK = 5)
    assert(capped.isEmpty, "super-hub centers above maxDegree are excluded")
    val uncapped = LinkPrediction.predictLinks(star, "src", "dst",
      maxDegree = 64, minCommon = 1, topK = 5)
    assert(uncapped.count() === 6, "3 leaf pairs × 2 directions via the hub")
  }

  test("quarantine: parse errors and validator failures route with stable reasons; dead letters replay") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("k", LongType)))
    val rows = Seq(
      (1L, """{"k": 5}"""),        // valid
      (2L, """{"k": 99}"""),       // parses, out of range
      (3L, """not json at all"""), // parse error
      (4L, null: String),          // NULL payload → parse error
      (5L, """{"other": 1}"""))    // object-shaped, field missing → parse error
      .toDF("id", "props")
    val (valid, dead) = Quarantine.route(rows, "props", schema,
      Seq("k_out_of_range" -> col("k").between(0, 90)))
    val v = valid.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v === Map(1L -> 5L), s"only the in-range parse lands valid, typed: $v")
    assert(valid.columns.toSeq === Seq("id", "k"), "json column dropped, field appended")
    val d = dead.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(d === Map(2L -> "k_out_of_range", 3L -> "parse_error",
      4L -> "parse_error", 5L -> "parse_error"), s"stable reasons: $d")
    // replayability: the dead letter keeps the ORIGINAL payload column
    assert(dead.columns.toSeq === Seq("id", "props", "reason"))
    val replay = dead.filter(col("reason") === "k_out_of_range").drop("reason")
    val (v2, d2) = Quarantine.route(replay, "props", schema,
      Seq("k_loose" -> col("k").between(0, 100)))
    assert(v2.count() === 1 && d2.isEmpty,
      "a quarantined row replays through a fixed contract unchanged")
    // validator-NULL counts as failure, first declared reason wins
    val nullPred = Seq((9L, """{"k": 7}""")).toDF("id", "props")
    val (_, dn) = Quarantine.route(nullPred, "props", schema,
      Seq("a_null_contract" -> (col("k") > lit(null: String).cast("long")),
          "b_never" -> lit(false)))
    assert(dn.collect().head.getString(2) === "a_null_contract",
      "an unevaluable validator fails, and declaration order names the reason")
    // field-name collision is rejected up front
    val e = intercept[IllegalArgumentException] {
      Quarantine.route(Seq((1L, "{}")).toDF("k", "props"), "props", schema, Seq.empty)
    }
    assert(e.getMessage.contains("collide"))
  }

  test("dedup yield report: histogram of cluster sizes with droppable counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),  // exact copy of 1 → cluster of 2
      (3L, "completely different text here"),
      (4L, "another unrelated document entirely"),
      (5L, null: String))              // null-text singleton
      .toDF("doc_id", "text")
    val out = Dedup.yieldReport(docs, "doc_id", "text", bands = 2, rowsPerBand = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(2L) === ((1L, 1L)), s"one 2-cluster dropping 1 doc: $out")
    assert(out(1L) === ((3L, 0L)), s"three singletons dropping nothing: $out")
  }
}
