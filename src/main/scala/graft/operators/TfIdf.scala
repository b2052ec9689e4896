package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
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
      .agg(count(lit(1)).as("n_bigrams"),
        avg(-log((col("c12") + 1.0) / (col("c1") + col("vsz")))).as("avg_nll"))
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
      .agg(count(lit(1)).as("n_trigrams"),
        avg(-log((col("c123") + 1.0) / (col("ctx") + col("vsz")))).as("avg_nll"))
  }
}
