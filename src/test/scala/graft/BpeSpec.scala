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

  test("bpe: zero-token docs (NULL / whitespace-only text) emit (empty array, 0)") {
    import spark.implicits._
    val docs = Seq((1L, null: String), (2L, "   \t  "), (3L, "ok"))
      .toDF("doc_id", "text")
    val out = Bpe.encode(docs, "doc_id", "text", Seq(("o", "k</w>"))).collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getInt(2))).toMap
    assert(out(1L) === ((Seq.empty[String], 0)), "NULL text → empty encode")
    assert(out(2L) === ((Seq.empty[String], 0)), "whitespace-only text → empty encode")
    assert(out(3L) === ((Seq("ok</w>"), 1)))
  }

  test("bpe: wellFormed accepts trained-style tables, rejects orphan components and duplicates") {
    // the catalog table used by text_bpe_encode
    val catalog = Seq(("t", "a"), ("ta", "b"), ("l", "e</w>"), ("tab", "le</w>"),
      ("s", "c"), ("sc", "a"), ("sca", "n</w>"), ("r", "o"), ("ro", "w</w>"),
      ("t", "h"), ("th", "e</w>"))
    assert(Bpe.wellFormed(catalog))
    // "ab" is composite but no earlier rule produces it
    assert(!Bpe.wellFormed(Seq(("ab", "c</w>"), ("a", "b"))))
    // duplicate outputs break the unique-producer argument
    assert(!Bpe.wellFormed(Seq(("a", "b"), ("ab", "c"), ("a", "bc"))))
    assert(!Bpe.wellFormed(Seq(("a", "b"), ("a", "b"))))
  }

  test("bpe: malformed tables fall back to rank-order rescan semantics (no heap divergence)") {
    import spark.implicits._
    // lowest-rank-first WOULD produce "abc</w>" here (rule (a,b) fires,
    // manufacturing "ab" which rank-0 then consumes); rank-order replay
    // never applies rank 0 — the pinned semantics
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "doc_id", "text", Seq(("ab", "c</w>"), ("a", "b")))
      .collect().map(r => r.getSeq[String](1)).head
    assert(out === Seq("ab", "c</w>"),
      s"malformed table must replay in rank order: $out")
  }

  test("bpe: heap encode is bit-equal to the rescan reference on a trained table over real docs") {
    val docs = Tables.load(spark, sf(), "documents").select("doc_id", "text")
    val merges = Bpe.train(docs, "text", nMerges = 40).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    assert(Bpe.wellFormed(merges), "train output must always be well-formed")
    val fast = Bpe.encode(docs, "doc_id", "text", merges)
    val ref = Bpe.encode(docs, "doc_id", "text", merges, forceRescan = true)
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty,
      "heap encode must equal the rescan reference on every document")
  }

  test("bpe: heap == rescan on adversarial synthetic words (runs, ties, deep merge chains)") {
    import spark.implicits._
    // deep chain over a tiny alphabet: every output feeds later rules,
    // and words full of runs exercise the non-overlapping tie-breaks
    val merges = Seq(("a", "a"), ("aa", "a"), ("aa", "aa"), ("b", "a"),
      ("ba", "aa"), ("a", "b</w>"), ("aaa", "ab</w>"), ("aaaa", "baaa"))
    assert(Bpe.wellFormed(merges))
    val rnd = new scala.util.Random(7)
    val words = (0 until 500).map { i =>
      (0 until (1 + rnd.nextInt(12))).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString
    }
    val docs = words.grouped(25).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val fast = Bpe.encode(docs, "doc_id", "text", merges)
    val ref = Bpe.encode(docs, "doc_id", "text", merges, forceRescan = true)
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty,
      "heap encode must equal the rescan reference on run-heavy words")
  }
}
