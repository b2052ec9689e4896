package graft

import graft.operators.{Analytics, Discovery, FeaturePrep, LabelPropagation, TfIdf, TimeSeries}
import org.apache.spark.sql.functions._

/** Known-answer tests for the round-9 operator batch: streaks, CUSUM
  * changepoints, ABC classes, window funnels, label-propagation
  * communities, keyword extraction, PMI collocations, inclusion-
  * dependency discovery, target encoding, and KS drift — each pinned
  * on a hand-computed corpus so the semantics (tie-breaks, class
  * boundaries, window bounds) are fixed independently of the DuckDB
  * oracle replay.
  */
class Round9OpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000L)

  test("activeDayStreaks: islands split on gap days and same-day events collapse") {
    val day = 86400L
    val events = Seq(
      // user a: days 1,2,3 then 5,6 — two streaks, longest 3
      ("a", ts(1 * day + 10)), ("a", ts(1 * day + 20)), // same day twice
      ("a", ts(2 * day)), ("a", ts(3 * day)),
      ("a", ts(5 * day)), ("a", ts(6 * day)),
      // user b: one lonely day
      ("b", ts(10 * day))).toDF("user_id", "ts")
    val out = Analytics.activeDayStreaks(events, "user_id", "ts")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") === ((2L, 5L, 3L)), "(n_streaks, n_active_days, longest)")
    assert(out("b") === ((1L, 1L, 1L)))
  }

  test("cusumChangepoint: integer curve and the argmax day on a planted level shift") {
    // one series, days 1..5 with counts 1,1,1,5,5 → m=5, T=13,
    // s_num = 5·prefix − 13·t = −8, −16, −24, −12, 0 → change at day 3
    val day = 86400L
    val events = (Seq.fill(1)(1L) ++ Seq.fill(1)(2L) ++ Seq.fill(1)(3L) ++
      Seq.fill(5)(4L) ++ Seq.fill(5)(5L))
      .zipWithIndex.map { case (d, i) => ("s", ts(d * day + i)) }
      .toDF("event_type", "ts")
    val out = TimeSeries.cusumChangepoint(events, "event_type", "ts")
      .collect().map(r => r.getLong(2) -> ((r.getLong(4), r.getBoolean(5)))).toMap // t -> (s_num, is_change)
    assert(out === Map(1L -> ((-8L, false)), 2L -> ((-16L, false)),
      3L -> ((-24L, true)), 4L -> ((-12L, false)), 5L -> ((0L, false))))
  }

  test("abcClassification: cross-multiplied class boundaries are inclusive and the order is total") {
    // one group, values 80/15/4/1 → cum shares 80, 95, 99, 100
    val facts = Seq((1L, 10L, 80L), (1L, 11L, 15L), (1L, 12L, 4L), (1L, 13L, 1L))
      .toDF("g", "u", "v")
    val out = Analytics.abcClassification(facts, "g", "u", "v")
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getString(4)))).toMap
    assert(out(10L) === ((80L, "A")), "cum·100 == tot·80 stays A")
    assert(out(11L) === ((95L, "B")), "cum·100 == tot·95 stays B")
    assert(out(12L) === ((99L, "C")))
    assert(out(13L) === ((100L, "C")))
    // equal values rank by unit ascending: 21 before 22
    val tied = Seq((2L, 22L, 5L), (2L, 21L, 5L)).toDF("g", "u", "v")
    val t = Analytics.abcClassification(tied, "g", "u", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(t(21L) === 5L && t(22L) === 10L)
  }

  test("windowFunnel: the in-window bound drops conversions sessionFunnel keeps") {
    val events = Seq(
      // u1: full chain within 900s
      ("u1", ts(1000), "view"), ("u1", ts(1100), "click"), ("u1", ts(1500), "purchase"),
      // u2: same session (gaps < 1800) but purchase lands 1500s after the view
      ("u2", ts(1000), "view"), ("u2", ts(1100), "click"), ("u2", ts(2500), "purchase"),
      // u3: click precedes view → not ordered, only step 0 counts
      ("u3", ts(1000), "click"), ("u3", ts(1010), "view")).toDF("user_id", "ts", "event_type")
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bounded = counts(Analytics.windowFunnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowSeconds = 900))
    assert(bounded === Map(0L -> 3L, 1L -> 2L, 2L -> 1L))
    val unbounded = counts(Analytics.sessionFunnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")))
    assert(unbounded(2L) === 2L, "without the bound u2's slow purchase converts")
  }

  test("ksDrift: integer deviations, argmax value tie-break, and the exact D ratio") {
    // g1 = {1,1,2}, g2 = {2,3,3} → corpus n=6, support {1,2,3}
    // g1 cum = 2,3,3; corpus cum = 2,4,6 → dev = |6c_s − 3c_g| = 6,6,0 → at_value 1 (tie)
    val df = Seq(("g1", 1L), ("g1", 1L), ("g1", 2L), ("g2", 2L), ("g2", 3L), ("g2", 3L))
      .toDF("src", "len")
    val out = Analytics.ksDrift(df, "src", "len")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out("g1") === ((3L, 6L, 6L, 1L, 6.0 / 18)))
    assert(out("g2") === ((3L, 6L, 6L, 1L, 6.0 / 18)), "g2 dev: |0−6|, |6−12|, 0 → max 6 at value 1")
  }

  test("label propagation: disconnected triangles collapse to their min label; ties go low") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L)).toDF("src", "dst")
    val out = LabelPropagation.communities(edges, "src", "dst", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
    // path 1-2-3 after ONE round: node 2 sees {1,3} once each → tie → 1
    val one = LabelPropagation.communities(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), "src", "dst", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(2L) === 1L, "equal neighbor counts break toward the smallest label")
    assert(one(1L) === 2L && one(3L) === 2L, "leaves adopt their only neighbor")
  }

  test("keywords: integer tf-idf ranking with ubiquitous tokens scored zero") {
    val docs = Seq((1L, "apple apple banana common"), (2L, "banana common"), (3L, "common"))
      .toDF("doc_id", "text")
    val out = TfIdf.keywords(docs, "doc_id", "text", topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(5)) -> ((r.getString(1), r.getLong(4))))
      .toMap
    val idf3 = math.floor(math.log(3.0) * 1048576).toLong
    val idf15 = math.floor(math.log(1.5) * 1048576).toLong
    assert(out((1L, 1L)) === (("apple", 2 * idf3)))
    assert(out((1L, 2L)) === (("banana", idf15)))
    assert(out((1L, 3L)) === (("common", 0L)), "df == N → idf 0, still ranked last")
    assert(out((2L, 1L)) === (("banana", idf15)))
  }

  test("pmiCollocations: support gate and the exact integer score") {
    // "new york" ×5 in separate docs (so no york→new bigram), plus
    // high-frequency filler pairs below the support threshold
    val docs = ((1 to 5).map(i => (i.toLong, "new york")) ++
      (6 to 9).map(i => (i.toLong, s"a b"))).toDF("doc_id", "text")
    val out = TfIdf.pmiCollocations(docs, "doc_id", "text", minCount = 5, topK = 20)
      .collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("new", "york")),
      "the ×4 filler pair stays under the ≥5 gate")
    val r = out.head
    // T_uni = 18, T_bi = 9, c_ab = c_a = c_b = 5
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((5L, 5L, 5L)))
    val expected = math.floor(math.log((5.0 * 18 / (9.0 * 5)) * (18.0 / 5)) * 1048576).toLong
    assert(r.getLong(5) === expected)
  }

  test("inclusionCandidates: planted subset, superset and disjoint columns") {
    val a = (1 to 10).map(_.toLong).toDF("v")
    val b = (1 to 100).map(_.toLong).toDF("v")
    val c = (200 to 205).map(_.toLong).toDF("v")
    val out = Discovery.inclusionCandidates(
      Seq(("a", a, "v"), ("b", b, "v"), ("c", c, "v")), k = 64, tauPct = 95)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(6)))).toMap
    assert(out(("a", "b")) === ((10L, 10L, 10L, true)), "A ⊆ B: full containment")
    val ba = out(("b", "a"))
    assert(ba._1 === 100L && ba._2 === 64L && !ba._4,
      "B's bottom-64 sample is mostly outside A")
    assert(ba._3 <= 10L, "hits cannot exceed |A|")
    assert(out(("a", "c")) === ((10L, 10L, 0L, false)), "disjoint → zero hits")
    assert(out(("c", "a"))._3 === 0L)
  }

  test("targetEncoding: exact integer numerators and the shrinkage direction") {
    val facts = Seq(("x", 10L), ("x", 20L), ("y", 40L)).toDF("cat", "t")
    val out = FeaturePrep.targetEncoding(facts, "cat", "t", m = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // G=70, N=3: x → (30·3 + 70)/(3·3) = 160/9, y → (40·3 + 70)/(3·2) = 190/6
    assert(out("x") === ((160L, 9L, 160.0 / 9)))
    assert(out("y") === ((190L, 6L, 190.0 / 6)))
    // shrinkage: x's raw mean 15 < enc < global mean 70/3; y's enc between global and raw 40
    assert(out("x")._3 > 15.0 && out("x")._3 < 70.0 / 3)
    assert(out("y")._3 < 40.0 && out("y")._3 > 70.0 / 3)
  }
}
