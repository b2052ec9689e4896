package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test decontamination: flag training documents that share word
  * n-grams with a held-out evaluation set — the standard hygiene pass
  * before an LLM training run (the reference engine has no analogue;
  * this is part of the brief's training-data-pipeline surface).
  *
  * Scale shape: the evaluation side of this check is always tiny
  * (benchmark suites are megabytes) while the training side is the
  * 100-TB corpus, so the contaminated-gram set is DISTINCT-ed and
  * `broadcast()` — the training corpus is scanned ONCE, its exploded
  * n-grams hash-probe the broadcast in the same codegen stage, and the
  * per-doc tally is a map-side-combinable aggregate. No shuffle ever
  * carries the corpus-sized gram explosion.
  */
object Decontaminate {

  /** Distinct space-joined word `n`-grams of an ALREADY-MATERIALIZED
    * token-array column. Takes the array column (not the raw text):
    * a non-attribute expression captured inside the `transform` lambda
    * would re-evaluate per element — O(tokens²) splits per document.
    * Documents with fewer than `n` tokens (and NULL text, whose token
    * array is NULL) yield an empty array.
    */
  private[graft] def wordNgramsFromTokens(toks: org.apache.spark.sql.Column,
                                          n: Int): org.apache.spark.sql.Column =
    array_distinct(when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>")))

  private[graft] def docGrams(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(wordNgramsFromTokens(col("__toks"), n)).as("gram"))

  /** Per-doc contamination tally: `(doc_id, n_hit_grams)` for every
    * training document sharing at least one word `n`-gram with any
    * document in `test`; `n_hit_grams` counts its DISTINCT overlapping
    * grams. Training docs with no overlap are absent (the common case
    * at scale — join-then-aggregate never materializes them).
    */
  def ngramOverlap(train: DataFrame, test: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    val testGrams = docGrams(test, idCol, textCol, n)
      .select("gram").distinct()
    docGrams(Dedup.fanOut(train), idCol, textCol, n)
      .join(broadcast(testGrams), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_grams"))
  }

  /** [[ngramOverlap]] for evaluation sets too big to broadcast as raw
    * grams: a register-blocked Bloom prefilter (the Parquet/Impala
    * split-block design, simplified to one 64-bit block) compacts ANY
    * number of eval grams into a fixed ≤`words`-row (word_idx, bits)
    * frame — a few MB broadcast no matter the eval-set size. Each
    * gram maps to ONE word (h1 mod words) and k=4 bits within it
    * (6-bit chunks of h2), so membership is a single broadcast-join +
    * `(bits & mask) = mask` test in the corpus scan stage. Candidates
    * (true hits + false positives, ~(1-(1-k/64)^k·load)ᵏ of the
    * corpus grams) then pay the EXACT shuffle-join confirm against the
    * real gram set — only candidates move, and false positives die
    * there, so the output is bit-identical to [[ngramOverlap]] and
    * replays on the same oracle. Size `words` ≈ eval grams / 6 for a
    * ~1% fp rate (k=4 at ~9.6 bits/key).
    */
  def ngramOverlapBloom(train: DataFrame, test: DataFrame, idCol: String,
                        textCol: String, n: Int,
                        words: Int = 1 << 16): DataFrame = {
    require(words > 0, s"words must be positive, got $words")
    import graft.functions.HashFunctions
    def wordAndMask(df: DataFrame) = df
      .withColumn("__w", pmod(HashFunctions.seededHash56(1, col("gram")), lit(words)))
      .withColumn("__h2", HashFunctions.seededHash56(2, col("gram")))
      .withColumn("__m", expr((0 until 4).map(j =>
        s"shiftleft(1L, cast(shiftright(__h2, ${6 * j}) & 63L as int))")
        .mkString(" | ")))
    // pinned: the eval-gram set feeds BOTH the bloom build and the
    // exact confirm — without the pin the eval side's tokenize+explode
    // +distinct (the expensive part of a big eval set, the very case
    // this operator exists for) executes twice
    val testGrams = Dedup.registerPin(
      docGrams(test, idCol, textCol, n).select("gram").distinct())
    val bloom = wordAndMask(testGrams)
      .groupBy("__w").agg(expr("bit_or(__m)").as("__bits"))
    val candidates = wordAndMask(docGrams(Dedup.fanOut(train), idCol, textCol, n))
      .join(broadcast(bloom), "__w")
      .filter(col("__bits").bitwiseAND(col("__m")) === col("__m"))
      .select("doc_id", "gram")
    // exact confirm: candidates ⋈ real grams — shuffle carries only
    // prefilter survivors on the corpus side, never the full explosion
    candidates.join(testGrams, "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_grams"))
  }

  /** Streaming contamination audit: every (doc_id, gram) hit of a
    * document STREAM against the static eval-gram set — the quarantine
    * log a continuously-ingesting pipeline tails. Stateless
    * stream-static inner join (no watermark, no state store): each
    * micro-batch explodes its grams and hash-probes the broadcast eval
    * set in the same stage.
    */
  def contaminationAudit(stream: DataFrame, test: DataFrame, idCol: String,
                         textCol: String, n: Int): DataFrame =
    docGrams(stream, idCol, textCol, n)
      .join(broadcast(docGrams(test, idCol, textCol, n).select("gram").distinct()),
        "gram")
      .select("doc_id", "gram")

  /** Scrub variant: the training frame with contaminated docs REMOVED —
    * broadcast left-anti join on the flagged id set, single scan.
    */
  def removeContaminated(train: DataFrame, test: DataFrame, idCol: String,
                         textCol: String, n: Int): DataFrame = {
    // NO broadcast hint on the flagged set: unlike the eval-gram set
    // (bounded by the tiny benchmark suite), the flagged-doc set is
    // corpus-proportional on a heavily contaminated corpus — let AQE
    // pick broadcast when it measures small, shuffle when it doesn't
    val hits = ngramOverlap(train, test, idCol, textCol, n).select("doc_id")
    train.join(hits, train(idCol) === hits("doc_id"), "left_anti")
  }
}
