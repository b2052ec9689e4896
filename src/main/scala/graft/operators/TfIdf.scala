package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF weighting over a document corpus — the standard feature
  * transform feeding retrieval / quality scoring in a training-data
  * pipeline.
  *
  * Scale shape: one explode + two hash aggregations; the document
  * frequency table is vocabulary-sized, so it broadcasts back onto the
  * term-frequency table (no fact-side shuffle for the final join).
  */
object TfIdf {

  /** Per (doc, token): term count, document frequency, and
    * `tf * ln(N / df)`.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf_cnt"))
    val df = tok.groupBy("token").agg(countDistinct("doc_id").as("df_cnt"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token"), col("tf_cnt"), col("df_cnt"),
        (col("tf_cnt") * log(col("n_docs") / col("df_cnt"))).as("tfidf"))
  }

  /** Per-document keyword extraction: each document's top-`topK`
    * tokens by integer-scaled TF-IDF — the summarization/tagging
    * primitive on top of [[tfidf]]. The rank key is
    * `tf · floor(ln(N/df)·2^20)`: an exact integer (the surprisal
    * ladder's scaling pattern) so the (score desc, token asc) order is
    * total and both engines select identical keywords — a raw float
    * `tf·ln(N/df)` would tie-break on rounding noise.
    *
    * Scale shape is [[tfidf]]'s: one explode, a vocabulary-sized df
    * table broadcast back, then ONE window partitioned by doc over the
    * doc's own distinct tokens (document-bounded frames, never the
    * corpus). Output: (doc_id, token, tf_cnt, df_cnt, score_q,
    * kw_rank).
    */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
               topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf_cnt"))
    val dfT = tok.groupBy("token").agg(countDistinct("doc_id").as("df_cnt"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_q").desc, col("token"))
    tf.join(broadcast(dfT), "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_q", col("tf_cnt") *
        floor(log(col("n_docs").cast("double") / col("df_cnt")) * 1048576).cast("long"))
      .withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= topK)
      .select(col("doc_id"), col("token"), col("tf_cnt"), col("df_cnt"),
        col("score_q"), col("kw_rank").cast("long").as("kw_rank"))
  }

  /** Bigram collocations by pointwise mutual information: adjacent
    * token pairs occurring ≥ `minCount` times, scored
    * `PMI = ln(p(ab) / (p(a)·p(b)))` and returned as the top-`topK`
    * by (pmi desc, pair asc) — the multi-word-expression miner
    * ("new york", "machine learning") a tokenizer or phrase-aware
    * dedup wants as input.
    *
    * Exactness: PMI is computed as
    * `floor(ln((c_ab·T)/(T_b·c_a) · T/c_b) · 2^20)` — each factor ONE
    * double division of two exact long products, multiplied in fixed
    * order, so the integer score replays bit-for-bit (the [[
    * graft.operators.Analytics.klDrift]] pattern). Bound: c_ab·T needs
    * < 2^63 — holds to ~10^9-token corpora with 10^9-frequency pairs;
    * documented-ceiling convention.
    *
    * Scale shape: bigrams from the row-wise zip (no self-join); pair
    * and unigram counts combinable; the ≥minCount gate shrinks the
    * pair table BEFORE the unigram joins (vocabulary-keyed, AQE picks
    * broadcast while they fit); top-k compiles to TakeOrdered.
    * Output: (w1, w2, c_ab, c_a, c_b, pmi_q).
    */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Int = 5, topK: Int = 20): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .filter(length(col("w")) > 0)
    val uniCnt = uni.groupBy("w").agg(count(lit(1)).as("c_w"))
    val totals = uniCnt.agg(sum("c_w").as("t_uni")) // one row, broadcast
    val occ = toks.filter(col("toks").isNotNull && size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("z"))
      .select(col("z.w1").as("w1"), col("z.w2").as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
    val biCnt = occ.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val tBi = biCnt.agg(sum("c_ab").as("t_bi")) // one row, broadcast
    biCnt.filter(col("c_ab") >= minCount)
      .join(uniCnt.select(col("w").as("w1"), col("c_w").as("c_a")), "w1")
      .join(uniCnt.select(col("w").as("w2"), col("c_w").as("c_b")), "w2")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(tBi))
      .withColumn("pmi_q", floor(log(
        ((col("c_ab") * col("t_uni")).cast("double") /
          (col("t_bi") * col("c_a")).cast("double")) *
          (col("t_uni").cast("double") / col("c_b").cast("double"))) * 1048576)
        .cast("long"))
      .orderBy(col("pmi_q").desc, col("w1"), col("w2")).limit(topK)
      .select("w1", "w2", "c_ab", "c_a", "c_b", "pmi_q")
  }

  /** Unigram surprisal per document: `avg(-ln p(token))` under the
    * corpus's own unigram distribution — the cheap stand-in for the
    * LM-perplexity quality filter (CCNet-style): documents full of
    * rare tokens (noise, mojibake, code dumps) score high, fluent
    * common-word text scores low.
    *
    * Scale shape mirrors [[tfidf]]: one explode, one vocabulary-sized
    * frequency table broadcast back onto the token stream, one
    * map-side-combinable per-doc aggregation. No UDFs.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = freq.select(sum("cnt").as("total"))
    tok.join(broadcast(freq), "token")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        avg(-log(col("cnt") / col("total"))).as("avg_surprisal"))
  }

  /** Vocabulary induction: the `topN` corpus tokens by frequency with
    * cumulative-coverage counts — the first step of building a
    * tokenizer (pick a vocab, measure what fraction of the token
    * stream it covers; `cum_cnt / total` at rank r is the coverage of
    * a size-r vocab). Deterministic order: count desc, token asc.
    *
    * Shape: one map-side-combinable count aggregate, then
    * TakeOrdered for the top-N (never a global sort), then rank and
    * running sum over the N survivors — a single-partition window
    * BOUNDED BY topN, which is the one place a partition-less window
    * is the right tool.
    */
  def vocabTopN(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Deliberately unpartitioned: the frame is ≤topN rows after the
    // limit, so one partition is correct. Constant partition keys
    // (lit(0), cnt*0) do not survive the optimizer's foldable-partition
    // elimination, so the declared allowlist lives in PlanAuditSpec's
    // bounded-global-window assert instead.
    val w = Window.orderBy(col("cnt").desc, col("token"))
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topN)
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_cnt", sum("cnt").over(w))
  }

  /** Bigram LM surprisal per document: `avg(-ln p(w_i | w_{i-1}))`
    * under the corpus's own add-one-smoothed conditional bigram model
    * `p = (c(w1,w2) + 1) / (c(w1·) + |V|)` — one step closer to the
    * KenLM-perplexity quality filter than [[unigramSurprisal]]:
    * word-salad documents whose individual tokens are common but whose
    * TRANSITIONS are rare now score high.
    *
    * Scale shape: bigram occurrences come from a row-wise zip of the
    * token array with its own tail (no self-join, no window); the
    * count tables are aggregations of that same stream. Unlike the
    * unigram table, the bigram table is vocabulary² -bounded and on a
    * real corpus NOT broadcastable — the joins are left to AQE, which
    * broadcasts them while they fit and falls back to shuffle joins
    * (keyed by bigram, naturally spread) beyond that. The occurrence
    * lineage is scan + split + zip — narrow, no shuffle — so its three
    * consumers recompute it rather than pinning corpus-sized state.
    */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    // |V| over ALL tokens (single-token docs contribute vocabulary
    // even though they have no bigrams)
    val vocab = toks.select(explode(col("toks")).as("t"))
      .agg(countDistinct("t").as("vsz"))
    val occ = toks.filter(col("toks").isNotNull && size(col("toks")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("z"))
      .select(col("doc_id"), col("z.w1").as("w1"), col("z.w2").as("w2"))
    val c12 = occ.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // c(w1·) folds from the bigram table — vocabulary²-bounded — not by
    // re-aggregating the corpus-sized occurrence stream a third time
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    occ.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      // each occurrence's nll is floor-quantized at 2^20 and
      // INTEGER-summed (a raw float avg() is aggregation-order-
      // dependent — the r14 sf0.1 fuzz caught 1-ulp drift misaligning
      // the comparator's sorted rows); avg_nll is ONE final division
      .agg(count(lit(1)).as("n_bigrams"),
        sum(floor(-log((col("c12") + 1.0) / (col("c1") + col("vsz"))) * 1048576)
          .cast("long")).as("__nll_q"))
      .withColumn("avg_nll", col("__nll_q").cast("double") /
        (col("n_bigrams").cast("double") * 1048576.0))
      .drop("__nll_q")
  }

  /** Trigram LM surprisal: `avg(-ln p(w3 | w1 w2))` with add-one
    * smoothing `p = (c(w1w2w3) + 1) / (c(w1w2·) + |V|)` — the top of
    * the n-gram quality ladder (rows 87 → 101 → this). Same shape as
    * [[bigramSurprisal]]: row-wise zip against two shifted tails, the
    * context count folded from the trigram table, joins left to AQE.
    */
  def trigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val vocab = toks.select(explode(col("toks")).as("t"))
      .agg(countDistinct("t").as("vsz"))
    val n = size(col("toks"))
    val occ = toks.filter(col("toks").isNotNull && n >= 3)
      .select(col("doc_id"), explode(zip_with(
        zip_with(slice(col("toks"), lit(1), n - 2), slice(col("toks"), lit(2), n - 2),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        slice(col("toks"), lit(3), n - 2),
        (p, c) => struct(p.getField("w1").as("w1"), p.getField("w2").as("w2"), c.as("w3"))))
        .as("z"))
      .select(col("doc_id"), col("z.w1").as("w1"), col("z.w2").as("w2"), col("z.w3").as("w3"))
    val c123 = occ.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))
    val c12 = c123.groupBy("w1", "w2").agg(sum("c123").as("ctx"))
    occ.join(c123, Seq("w1", "w2", "w3")).join(c12, Seq("w1", "w2"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      // quantized order-free sum — the bigramSurprisal r14 contract
      .agg(count(lit(1)).as("n_trigrams"),
        sum(floor(-log((col("c123") + 1.0) / (col("ctx") + col("vsz"))) * 1048576)
          .cast("long")).as("__nll_q"))
      .withColumn("avg_nll", col("__nll_q").cast("double") /
        (col("n_trigrams").cast("double") * 1048576.0))
      .drop("__nll_q")
  }

  /** Zipf law fit per corpus slice: OLS of ln(freq) on ln(rank) over
    * the token frequency table (rank by count DESC, token ASC — the
    * [[vocabTopN]] total order), the standard "is this source natural
    * language or boilerplate" diagnostic (natural text ≈ slope −1;
    * templated spam decays much faster or flatter). Per-token logs
    * are floor-quantized at 2²⁰ (the entropy idiom) so Σx, Σy, Σxy,
    * Σx², Σy² are exact DECIMAL(38,0) aggregates — order-free — and
    * slope / intercept / r² are fixed double expressions over the
    * (double-cast) exact sums. Output per group: (grp, n_types,
    * slope, intercept_nats, r2) — NULL fit when n_types < 2 or the
    * rank variance is 0.
    *
    * Scale shape: one explode + one combinable (grp, token) count;
    * ranking is a window PARTITIONED by group over the
    * vocabulary-sized frame; the fit reduces per group.
    */
  def zipfFit(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cnt = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("grp", "w").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("c").desc, col("w"))
    val pts = cnt
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("x", floor(log(col("rk").cast("double")) * 1048576).cast("long"))
      .withColumn("y", floor(log(col("c").cast("double")) * 1048576).cast("long"))
    def dsum(c: org.apache.spark.sql.Column) =
      coalesce(sum(c.cast(dec)).cast(dec), lit(0).cast(dec)).cast(dec)
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    pts.groupBy(col("grp").as(groupCol))
      .agg(count(lit(1)).as("n_types"),
        dsum(col("x")).as("__sx"), dsum(col("y")).as("__sy"),
        dsum((col("x").cast(dec) * col("y")).cast(dec)).as("__sxy"),
        dsum((col("x").cast(dec) * col("x")).cast(dec)).as("__sxx"),
        dsum((col("y").cast(dec) * col("y")).cast(dec)).as("__syy"))
      .withColumn("__num", dd(col("n_types")) * dd(col("__sxy")) -
        dd(col("__sx")) * dd(col("__sy")))
      .withColumn("__dx", dd(col("n_types")) * dd(col("__sxx")) -
        dd(col("__sx")) * dd(col("__sx")))
      .withColumn("__dy", dd(col("n_types")) * dd(col("__syy")) -
        dd(col("__sy")) * dd(col("__sy")))
      .withColumn("slope", when(col("n_types") > 1 && col("__dx") > 0,
        col("__num") / col("__dx")))
      .withColumn("intercept_nats", when(col("slope").isNotNull,
        (dd(col("__sy")) - col("slope") * dd(col("__sx"))) /
          (dd(col("n_types")) * 1048576.0)))
      .withColumn("r2", when(col("slope").isNotNull && col("__dy") > 0,
        col("__num") * col("__num") / (col("__dx") * col("__dy"))))
      .select(col(groupCol), col("n_types"), col("slope"),
        col("intercept_nats"), col("r2"))
  }

  /** Gini–Simpson lexical diversity per corpus slice:
    * D = 1 − Σ n_i(n_i − 1) / (N(N − 1)) over token counts — the
    * probability two tokens drawn without replacement differ; the
    * collision-based companion to entropy (which weights rare types
    * log-much) and TTR (which ignores the distribution entirely).
    * Σ n(n−1) is DECIMAL(38,0) internal (a stop-word at n ≈ 3·10⁹
    * passes int64) emitted as a guarded BIGINT; D is one fixed double
    * over exact integers. Output per group: (grp, n_tokens, n_types,
    * coll_pairs2, simpson) — simpson NULL when N < 2.
    */
  def simpsonDiversity(df: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cnt = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("grp", "w").agg(count(lit(1)).as("c"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val maxLong = lit("9223372036854775807").cast(dec)
    cnt.groupBy(col("grp").as(groupCol))
      .agg(coalesce(sum("c"), lit(0L)).as("n_tokens"),
        count(lit(1)).as("n_types"),
        coalesce(sum((col("c").cast(dec) * (col("c") - 1).cast(dec)).cast(dec)),
          lit(0).cast(dec)).cast(dec).as("cp0"))
      .withColumn("coll_pairs2",
        when(col("cp0") > maxLong, raise_error(lit(
          "graft.simpsonDiversity: coll_pairs2 overflows BIGINT at this " +
            "scale — widen the emitted type")))
          .otherwise(col("cp0").cast("long")))
      .withColumn("simpson", when(col("n_tokens") > 1,
        lit(1.0) - dd(col("coll_pairs2")) /
          (dd(col("n_tokens")) * (dd(col("n_tokens")) - 1.0))))
      .select(col(groupCol), col("n_tokens"), col("n_types"),
        col("coll_pairs2"), col("simpson"))
  }

  /** Pairwise cosine similarity between per-group unigram COUNT
    * vectors — "which sources write alike": per-(group, token) counts
    * are exact int64, each unordered group pair's dot product and the
    * per-group squared norms are exact integer tallies, and the cosine
    * is one final float over their exact doubles. The pair join runs
    * on the token key (vocabulary-sized, groups² fan-out per token —
    * groups is small by contract); norms ride a broadcast.
    * Output per pair: (g1, g2, dot, norm1_sq, norm2_sq, cosine).
    */
  def groupCosine(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val toks = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val cnt = toks.groupBy("g", "w").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val norms = cnt.groupBy("g").agg(sum(col("c") * col("c")).as("norm_sq"))
    val pairs = cnt.as("a").join(cnt.as("b"),
        col("a.w") === col("b.w") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(sum(col("a.c") * col("b.c")).as("dot"))
    pairs
      .join(broadcast(norms.select(col("g").as("g1"), col("norm_sq").as("norm1_sq"))), "g1")
      .join(broadcast(norms.select(col("g").as("g2"), col("norm_sq").as("norm2_sq"))), "g2")
      .withColumn("cosine", when(col("norm1_sq") > 0 && col("norm2_sq") > 0,
        dd(col("dot")) / (sqrt(dd(col("norm1_sq"))) * sqrt(dd(col("norm2_sq"))))))
      .select(col("g1"), col("g2"), col("dot"), col("norm1_sq"), col("norm2_sq"),
        col("cosine"))
  }

  /** Per-group mean character-bigram Shannon entropy of documents —
    * the encoding/noise screen beside the deflate compression signal:
    * a doc's bigram entropy H = ln(n) − (Σ c·ln c)/n is computed with
    * the [[Analytics.groupEntropy]] integer-scaled contract
    * (floor-quantized ln at 2²⁰, integer division by n), then
    * averaged per group with ONE more integer division. Docs shorter
    * than 2 chars have no bigrams and are excluded (both engines).
    * Output: (group, n_docs, sum_h_q, mean_entropy).
    *
    * INPUT CONTRACT (r15, ADVICE): each input ROW is one document —
    * (groupCol, idCol) must not repeat. Since the r14 kernel rewrite,
    * entropy is a per-row function and `idCol` is only a NULL filter:
    * rows sharing an id are scored as independent documents, where
    * the replaced explode+groupBy pipeline (and the registered DuckDB
    * oracle, which groups bigrams by (source, doc_id)) would merge
    * their bigram multisets into one pseudo-document first. The
    * registry's documents table keys rows by doc_id so both shapes
    * agree there; Round15OptSpec pins the per-row semantics on a
    * duplicated id so the contract is visible. A true multiset merge
    * cannot be done post-kernel (entropy is not additive) — callers
    * with repeating ids must pre-merge their rows.
    */
  def charBigramEntropy(df: DataFrame, groupCol: String, idCol: String,
                        textCol: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    // per-doc entropy is a pure function of one row's text, so it runs
    // in the codegen CharBigramEntropyQ kernel (one pass per string,
    // bit-identical micro-nat value — see the kernel's doc) instead of
    // exploding ~(chars − 1) gram rows per document through two
    // exchanges; the only shuffle left is the per-source aggregation.
    // NULL h_q = no bigram (NULL/short text) — those documents never
    // produced a cell row in the exploded shape either.
    val perDoc = df.filter(col(groupCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).as("g"),
        graft.plans.CharBigramEntropyQ(col(textCol)).as("h_q"))
      .filter(col("h_q").isNotNull)
    perDoc.groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum("h_q").as("sum_h_q"))
      .withColumn("mean_entropy",
        dd(expr("sum_h_q div n_docs")) / 1048576.0)
  }


  /** Yule's characteristic K per group — the sample-size-robust
    * lexical-repetitiveness constant beside TTR (262), hapax (284),
    * and Gini–Simpson (325): K = 10⁴·(Σc² − N)/N² over the token
    * frequency spectrum — every term an exact integer, K one float.
    * Output: (group, n_tokens, n_types, sum_c2, yule_k).
    */
  def yuleK(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val cnt = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("g", "w").agg(count(lit(1)).as("c"))
    cnt.groupBy(col("g").as(groupCol))
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sum_c2"))
      .withColumn("yule_k", when(col("n_tokens") > 0,
        lit(10000.0) * (dd(col("sum_c2")) - dd(col("n_tokens"))) /
          (dd(col("n_tokens")) * dd(col("n_tokens")))))
  }

  /** Rank-biased overlap (p = 9/10) between two top-k document
    * rankings — "do two quality signals surface the same documents",
    * the top-weighted list-comparison eval (Webber et al. 2010)
    * beside the rank correlations (263/287): RBO@k =
    * (1−p)·Σ_{d≤k} p^{d−1}·|A_d ∩ B_d|/d, with every p-power an exact
    * 9^{d−1}/10^{d−1} rational — each depth term is ONE truncating
    * DECIMAL division (9^{d−1}·2²⁰·X_d div (10^{d−1}·d)) so the sum
    * is an exact integer and only the final (1−p) scaling is float.
    * Both top-k lists come from distributed TakeOrdered (never a
    * global window); the depth×member join is k² tiny.
    * Output one row: (k, x_k, rbo_q, rbo).
    */
  def rankBiasedOverlap(df: DataFrame, idCol: String,
                        scoreA: Column, scoreB: Column,
                        k: Int = 20): DataFrame = {
    require(k >= 1 && k <= 30, s"k must be in [1,30], got $k")
    val dec = "decimal(38,0)"
    def dd(c: Column) = c.cast("double")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("id"), scoreA.cast("long").as("sa"),
        scoreB.cast("long").as("sb"))
      .filter(col("id").isNotNull && col("sa").isNotNull && col("sb").isNotNull)
      .localCheckpoint(true)
    def topBy(s: String) = {
      val t = base.orderBy(col(s).desc, col("id")).limit(k)
      t.withColumn(s"r_$s", row_number().over(
        Window.orderBy(col(s).desc, col("id"))).cast("long"))
        .select(col("id"), col(s"r_$s"))
    }
    val joined = topBy("sa").join(topBy("sb"), Seq("id"), "full_outer")
    // 9^(d−1) / 10^(d−1) as EXACT driver-side BigInt literals — a
    // float pow loses exactness past 9^16 and would break the oracle's
    // HUGEINT doubling chain
    val spark0 = df.sparkSession
    import spark0.implicits._
    val depthDim = broadcast((1 to k).map(d0 => (d0.toLong,
        BigInt(9).pow(d0 - 1).toString, BigInt(10).pow(d0 - 1).toString))
      .toDF("d", "p9s", "p10s")
      .select(col("d"), col("p9s").cast(dec).as("p9"),
        col("p10s").cast(dec).as("p10")))
    val depths = joined.crossJoin(depthDim)
      .groupBy("d", "p9", "p10")
      .agg(sum(when(col("r_sa") <= col("d") && col("r_sb") <= col("d"), 1L)
        .otherwise(lit(0L))).as("x_d"))
    val terms = depths.withColumn("term_q",
      graft.functions.TimeFunctions.truncDiv(
        (col("p9") * lit(1048576L) * col("x_d")).cast(dec),
        (col("p10") * col("d")).cast(dec)))
    terms.agg(lit(k.toLong).as("k"),
        coalesce(max(when(col("d") === k, col("x_d"))), lit(0L)).as("x_k"),
        coalesce(sum("term_q"), lit(0L)).as("rbo_q"))
      .withColumn("rbo", dd(col("rbo_q")) / 1048576.0 / 10.0)
  }

}
