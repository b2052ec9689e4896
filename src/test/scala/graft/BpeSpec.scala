package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpecBase {

  test("bpe: learned merge sequence matches the hand-derived sequence on the classic corpus") {
    import spark.implicits._
    // Sennrich-style toy corpus: {low x5, lower x2, newest x6, widest x3}
    val docs = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val merges = Bpe.train(docs, "text", nMerges = 4).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // hand derivation: pairs weighted by word freq
    //  round 0: (e,s) 9  -> "es"    (newest 6 + widest 3)
    //  round 1: (es,t</w>) 9 -> "est</w>"
    //  round 2: (l,o) 7         (low 5 + lower 2)
    //  round 3: three-way tie at 6 — (e,w), (n,e), (w,est</w>) —
    //           lexicographic on (left, right) picks (e,w)
    assert(merges(0) === (("e", "s", 9L)))
    assert(merges(1) === (("es", "t</w>", 9L)))
    assert(merges(2) === (("l", "o", 7L)))
    assert(merges(3) === (("e", "w", 6L)))
  }

  test("bpe: ties break lexicographically and training stops when no pairs remain") {
    import spark.implicits._
    // "ab" and "cd" both freq 1: pairs (a,b</w>) and (c,d</w>) tie -> (a,b</w>) first
    val docs = Seq("ab cd").toDF("text")
    val merges = Bpe.train(docs, "text", nMerges = 10).collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    assert(merges.head === (("a", "b</w>")))
    assert(merges.toSeq === Seq(("a", "b</w>"), ("c", "d</w>")))
    // after both merges every word is a single symbol: training stopped at 2
  }

  test("bpe: encode replays merges in rank order; merged tokens shrink counts") {
    import spark.implicits._
    val docs = Seq((1L, "low low newest"), (2L, "wider")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "doc_id", "text",
        Seq(("l", "o"), ("lo", "w</w>"), ("e", "s"))).collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getInt(2))).toMap
    assert(out(1L)._1 === Seq("low</w>", "low</w>", "n", "e", "w", "es", "t</w>"))
    assert(out(1L)._2 === 7)
    // "wider" shares no merge: stays fully split
    assert(out(2L)._1 === Seq("w", "i", "d", "e", "r</w>"))
  }

  test("bpe: mergeOnce is left-to-right non-overlapping") {
    assert(Bpe.mergeOnce(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.toSymbols("ab") === Seq("a", "b</w>"))
    assert(Bpe.toSymbols("") === Seq.empty)
  }
}
