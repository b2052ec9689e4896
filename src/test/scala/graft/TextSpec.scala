package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpecBase {

  private def one(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  private def evalInt(text: String, c: org.apache.spark.sql.Column): Int =
    one(text).select(c.cast("int")).head().getInt(0)

  test("token counts") {
    assert(evalInt("the quick  brown fox", tokenCount(col("text"))) === 4)
    assert(evalInt("hello, world! 42", bpeTokenCount(col("text"))) === 5)
    assert(evalInt("a.b,c", punctCount(col("text"))) === 2)
    assert(evalInt("x1y22", digitCount(col("text"))) === 3)
    assert(evalInt("the cat and the dog", stopwordCount(col("text"))) === 3)
  }

  test("langid heuristic picks dominant stopword family") {
    def lid(t: String) = one(t).select(langId(col("text"))).head().getString(0)
    assert(lid("the cat and the dog is here") === "en")
    assert(lid("el perro de la casa que ladra") === "es")
    assert(lid("你好世界") === "zh")
    assert(lid("xyzzy plugh") === "unknown")
  }

  test("fingerprint is invariant to case and whitespace runs") {
    def fp(t: String) = one(t).select(fingerprint(col("text"))).head().getString(0)
    assert(fp("Hello  World") === fp("hello world"))
    assert(fp("hello world") !== fp("hello worlds"))
  }

  test("pii scrub replaces emails, ips, and phone runs with typed tokens") {
    def scrub(t: String) = one(t).select(scrubPii(col("text"))).head().getString(0)
    assert(scrub("mail me at jane.doe+x@example.co.uk thanks")
      === "mail me at <EMAIL> thanks")
    assert(scrub("server 10.0.255.3 is down") === "server <IP> is down")
    assert(scrub("call +1 (555) 867-5309 now") === "call <PHONE>-5309 now"
      || scrub("call +1 (555) 867-5309 now") === "call <PHONE> now")
    assert(scrub("no pii here") === "no pii here")
    assert(evalInt("a@b.com and 1.2.3.4", piiCount(col("text"))) === 2)
  }

  test("winnowing: shared substrings share fingerprints, short docs degrade gracefully") {
    import graft.operators.Dedup
    import spark.implicits._
    def fps(t: String): Set[Long] =
      Dedup.winnowFingerprints(Seq((1L, t)).toDF("doc_id", "text"),
        "doc_id", "text", k = 5, window = 8)
        .collect().map(_.getLong(1)).toSet
    val base = "the quick brown fox jumps over the lazy dog tonight"
    // same long substring embedded in different contexts → overlap
    val shifted = "XXYYZZ " + base.drop(4)
    assert(fps(base).intersect(fps(shifted)).nonEmpty,
      "winnowing must fingerprint a long shared substring in both docs")
    assert(fps("entirely unrelated words appear within this one")
      .intersect(fps(base)).isEmpty, "unrelated docs should not collide")
    assert(fps("tiny").isEmpty, "below k chars -> no fingerprints")
    assert(fps("sixchars").size === 1, "below window -> global min only")
    // density: ~2/(w+1) of the gram positions, far smaller than the doc
    assert(fps(base).size < base.length / 3)
  }

  test("bigram LM: rare transitions score higher than rehearsed ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y x y x y"), // transitions x->y, y->x dominate the corpus
      (2L, "x p y q x r y s x t") // same unigrams present, unique transitions
    ).toDF("doc_id", "text")
    val r = graft.operators.TfIdf.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_bigrams"), x.getAs[Double]("avg_nll"))).toMap
    assert(r(1L)._1 === 9L && r(2L)._1 === 9L, "n_tokens - 1 bigrams each")
    assert(r(2L)._2 > r(1L)._2, "word-salad transitions must out-score rehearsed ones")
  }

  test("trigram LM: rehearsed 3-token contexts out-predict shuffled ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z x y z x y z x y z"), // the trigram (x,y,z) dominates
      (2L, "x p z y x q z y x r z y") // same unigrams, unique trigrams
    ).toDF("doc_id", "text")
    val r = graft.operators.TfIdf.trigramSurprisal(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_trigrams"), x.getAs[Double]("avg_nll"))).toMap
    assert(r(1L)._1 === 10L && r(2L)._1 === 10L, "n_tokens - 2 trigrams each")
    assert(r(2L)._2 > r(1L)._2, "unique transitions must out-score rehearsed ones")
  }

  test("vocabTopN ranks by count with cumulative coverage") {
    import spark.implicits._
    val docs = Seq((1L, "b a a a c b"), (2L, "a b c d")).toDF("doc_id", "text")
    val v = graft.operators.TfIdf.vocabTopN(docs, "text", topN = 3)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("token"),
        r.getAs[Long]("cnt"), r.getAs[Long]("cum_cnt")))
    assert(v.toSeq === Seq((1, "a", 4L, 4L), (2, "b", 3L, 7L), (3, "c", 2L, 9L)))
  }

  test("gopher rules: each rule fires on its designed violation; a clean doc passes") {
    def sig(t: String): Map[String, Any] = {
      val cols = gopherSignals(col("text")).map { case (n, c) => c.as(n) }
      val row = one(t).select(cols: _*).head()
      row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
    }
    // 60 words incl. >= 2 gopher stopwords, mean length in [3,10]
    val clean = (("the cat and dog walked over with that " * 7).trim + " home end").trim
    val c = sig(clean)
    assert(c("n_words") === 58 && c("gopher_pass") === true)
    // rule 1: too short
    assert(sig("the cat and dog have fun")("r_word_count") === false)
    // rule 2: mean word length < 3
    val shorty = Array.fill(60)("a b").mkString(" ")
    assert(sig(shorty)("r_word_length") === false)
    // rule 3: symbols — hashes outnumber 10% of words
    assert(sig("# # # the cat sat")("r_symbol_ratio") === false)
    // rule 4/5: bullets and ellipsis lines
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    assert(sig(bullets)("r_bullet_lines") === false)
    val ell = (1 to 10).map(i => s"line $i...").mkString("\n")
    assert(sig(ell)("r_ellipsis_lines") === false)
    assert(sig(clean)("r_bullet_lines") === true) // single line, 0 bullets
    // rule 6: numeric soup fails the alphabetic-word floor
    val nums = (1 to 100).map(_.toString).mkString(" ")
    assert(sig(nums)("r_alpha_words") === false)
    // rule 7: < 2 distinct gopher stopwords
    assert(sig("cat dog mouse bird fish")("r_stop_words") === false)
    assert(sig("the cat with dog")("r_stop_words") === true)
  }

  test("compression ratio: repetitive text deflates below diverse text; deterministic; edge rows dropped") {
    import graft.operators.CompressionSignal
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val docs = Seq(
      1L -> ("spam spam spam " * 50),                       // template repetition
      2L -> (1 to 200).map(_ => java.lang.Integer.toString(rng.nextInt(1 << 30), 32)).mkString(" "), // high entropy
      3L -> "",                                             // dropped: empty
      4L -> (null: String))                                 // dropped: null
      .toDF("doc_id", "text")
    val out = CompressionSignal.compressionRatio(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(out.keySet === Set(1L, 2L))
    val (raw1, defl1, pct1) = out(1L)
    val (_, _, pct2) = out(2L)
    assert(defl1 < raw1 / 5, "template spam must collapse under deflate")
    assert(pct1 < pct2, "repetitive text must out-compress high-entropy text")
    assert(pct2 > 40, "near-random text barely compresses")
    // determinism: identical invocation, identical byte counts
    val again = CompressionSignal.compressionRatio(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(again === out)
  }

  test("repetition signals count top-token and duplicate bigrams") {
    def sig(t: String): Map[String, Int] = {
      val cols = repetitionSignals(col("__toks")).map { case (n, c) => c.cast("int").as(n) }
      val row = one(t).withColumn("__toks", tokens(col("text"))).select(cols: _*).head()
      row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.getInt(i) }.toMap
    }
    val r = sig("buy now buy now buy gold")
    assert(r("n_tokens") === 6)
    assert(r("top_token_cnt") === 3)    // "buy" x3
    assert(r("dup_bigram_cnt") === 2)   // "buy now" and "now buy" repeat once each
    val clean = sig("all words here differ completely")
    assert(clean("top_token_cnt") === 1 && clean("dup_bigram_cnt") === 0)
    assert(sig("single")("dup_bigram_cnt") === 0)
  }
}
