package graft.operators

import graft.functions.{HashFunctions, TextFunctions, TopKAgg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse (lexical) retrieval: Okapi BM25 scoring, the inverted index
  * that serves it, and reciprocal-rank fusion with a dense ANN ranking
  * — the keyword half of a hybrid search stack over a training corpus
  * (dense half: [[Similarity]]).
  *
  * Scale story: the only corpus-sized shuffle in any of these is the
  * one (doc, token) term-frequency aggregation (map-side combinable).
  * Document frequencies are vocabulary-sized and broadcast back; the
  * query set is broadcast; per-query top-k uses the map-side-
  * combinable [[TopKAgg]] so the shuffle after scoring carries
  * `queries * k` rows regardless of corpus size. Posting lists are
  * BLOCKED by a doc-id hash so one stop-word term can never produce an
  * unbounded row (the classic sharded-postings layout).
  *
  * Cross-engine determinism: per-term BM25 contributions are scaled to
  * integers (`floor(contrib * 2^40)`) before summation, so the
  * per-document score is an order-independent integer sum — two
  * documents with identical term statistics tie EXACTLY in both Spark
  * and the SQL oracle and fall through to the doc-id tie-break,
  * instead of diverging on floating-point summation order. 2^40
  * keeps the worst-case sum (idf ≤ ln(N), tens of query terms) far
  * inside the 2^53 exact-integer range of the double carried through
  * [[TopKAgg]].
  */
object Retrieval {

  private val SCALE = 1099511627776.0 // 2^40

  /** Okapi BM25 top-k documents per query.
    *
    * `queries` must have columns (query_id, qtext); duplicate query
    * terms score once (the standard set-of-terms form). Output:
    * (query_id, doc_id, rank, score), rank by score desc / doc_id asc.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val k1p1 = k1 + 1.0
    val omb = 1.0 - b
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    // dl rides the explode so the tf aggregation needs no doc-side join
    val tok = toks.select(col("doc_id"), size(col("toks")).as("dl"),
      explode(col("toks")).as("token"))
    val tf = tok.groupBy("doc_id", "token")
      .agg(max("dl").as("dl"), count(lit(1)).as("tf_cnt"))
    val df = tok.groupBy("token").agg(countDistinct("doc_id").as("df_cnt"))
    val glob = toks.agg(count(lit(1)).as("n_docs"), sum(size(col("toks"))).as("sum_dl"))
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(TextFunctions.tokens(col("qtext")))).as("token"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df_cnt") + lit(0.5)) / (col("df_cnt") + lit(0.5)))
    val norm = col("tf_cnt") + lit(k1) * (lit(omb) + lit(b) * col("dl") / (col("sum_dl") / col("n_docs")))
    val contrib = tf
      .join(broadcast(qterms), "token")
      .join(broadcast(df), "token")
      .crossJoin(broadcast(glob))
      .select(col("query_id"), col("doc_id"),
        floor(idf * (col("tf_cnt") * lit(k1p1)) / norm * lit(SCALE)).cast("long").as("cs"))
    val scores = contrib.groupBy("query_id", "doc_id").agg(sum("cs").as("sc"))
    val topk = scores.groupBy("query_id")
      .agg(TopKAgg.topK(k)(col("doc_id"), col("sc").cast("double")).as("arr"))
    topk.select(col("query_id"), posexplode(col("arr")))
      .select(col("query_id"), col("col._1").as("doc_id"),
        (col("pos") + 1).cast("long").as("rank"),
        (col("col._2") / lit(SCALE)).as("score"))
  }

  /** Blocked inverted index: per (token, block) the block-local
    * document frequency, collection frequency, and the posting list
    * serialized `"doc:tf doc:tf ..."` in doc-id order.
    *
    * `block = stableHash56(doc_id) % numBlocks` caps every posting row
    * at ~df/numBlocks entries — a stop word that appears in every
    * document becomes `numBlocks` bounded rows instead of one
    * collect_list the size of the corpus. At 100 TB, numBlocks scales
    * with corpus size so block rows stay O(MB); a term's blocks merge
    * at query time (they partition the doc-id space, any order works).
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    numBlocks: Int = 8): DataFrame = {
    // NULL-id docs excluded (fuzz r12): a posting "NULL:tf" is
    // unaddressable, and its hash block is engine-dependent
    val tok = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf_cnt"))
      .withColumn("block",
        pmod(HashFunctions.stableHash56(col("doc_id").cast("string")), lit(numBlocks.toLong)))
    tf.groupBy("token", "block")
      .agg(count(lit(1)).as("df_block"), sum("tf_cnt").as("cf_block"),
        array_sort(collect_list(struct(col("doc_id"), col("tf_cnt")))).as("ps"))
      .select(col("token"), col("block"), col("df_block"), col("cf_block"),
        array_join(transform(col("ps"),
          p => concat(p.getField("doc_id").cast("string"), lit(":"),
            p.getField("tf_cnt").cast("string"))), " ")
          .as("postings"))
  }

  /** Reciprocal-rank fusion of two per-query rankings (the standard
    * hybrid-search combiner): `score = Σ 1/(c + rank)` over the
    * systems that returned the document, missing-system terms
    * contribute 0. Both inputs are (query_id, doc_id, rank) with at
    * most `k_in` rows per query, so the fusion input is
    * `queries * k_in * 2` rows — driver-scale irrelevant, never
    * corpus-shaped. Scores are sums of two exact IEEE divisions in a
    * fixed written order, so they are bit-identical across engines and
    * exact ties (same rank pair) break on doc_id.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 10, c: Int = 60): DataFrame = {
    val fa = a.select(col("query_id"), col("doc_id"), col("rank").as("rank_a"))
    val fb = b.select(col("query_id"), col("doc_id"), col("rank").as("rank_b"))
    val fused = fa.join(fb, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("rank_a"), col("rank_b"),
        (when(col("rank_a").isNotNull, lit(1.0) / (lit(c) + col("rank_a"))).otherwise(lit(0.0)) +
          when(col("rank_b").isNotNull, lit(1.0) / (lit(c) + col("rank_b"))).otherwise(lit(0.0)))
          .as("rrf"))
    val topk = fused.groupBy("query_id")
      .agg(TopKAgg.topK(k)(col("doc_id"), col("rrf")).as("arr"))
    topk.select(col("query_id"), posexplode(col("arr")))
      .select(col("query_id"), col("col._1").as("doc_id"),
        (col("pos") + 1).cast("long").as("fused_rank"),
        col("col._2").as("rrf_score"))
  }

  /** Positional phrase search: exact two-word phrase occurrences via
    * POSITIONAL posting intersection — the machinery behind quoted
    * queries in any lexical engine. The query phrases here are the
    * corpus's own `nPhrases` most frequent bigrams (count desc, then
    * lexicographic — fully deterministic, so the oracle re-derives
    * them), but the search path is query-agnostic: it would run the
    * same with user phrases.
    *
    * Scale shape: bigram counting is array-local (zip of adjacent
    * tokens, no join) + one combinable aggregation; the phrase table
    * is `nPhrases` rows and BROADCASTS into both posting scans, so
    * only postings of phrase WORDS survive to the positional
    * intersection join — the corpus-sized posting set is filtered
    * map-side and never shuffles whole. The intersection itself joins
    * on (doc, position), the classic next-word check.
    *
    * Output: (w1, w2, doc_id, n_occ) — one row per document containing
    * the phrase, with its occurrence count.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   nPhrases: Int = 3): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val bigrams = toks
      .select(explode(expr(
        "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"))
        .as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    // pinned: the tiny phrase table broadcasts into BOTH posting scans;
    // without the pin each broadcast recomputes the corpus-wide bigram
    // count that derives it
    val phrases = Dedup.registerPin(bigrams
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(nPhrases)
      .select("w1", "w2"))
    val postings = toks.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("pos", "token")))
    val p1 = postings.join(broadcast(phrases), col("token") === col("w1"))
      .select(col("doc_id"), col("pos"), col("w1"), col("w2"))
    val p2 = postings.select(col("doc_id").as("doc_id2"), col("pos").as("pos2"),
      col("token").as("token2"))
      .join(broadcast(phrases.select(col("w2").as("token2")).distinct()), Seq("token2"))
    p1.join(p2,
        col("doc_id") === col("doc_id2") && col("pos2") === col("pos") + 1 &&
          col("token2") === col("w2"))
      .groupBy("w1", "w2", "doc_id").agg(count(lit(1)).as("n_occ"))
  }

  /** Proximity search: for every unordered pair of the corpus's
    * `nTerms` characteristic terms, the documents where both occur
    * within `window` token positions, with the count of qualifying
    * position pairs — the NEAR operator of lexical retrieval,
    * [[phraseSearch]]'s adjacency relaxed to a band. Characteristic
    * terms are chosen deterministically so the oracle re-derives
    * them: document frequency ≤ `maxDfFrac` of the corpus (drops
    * stopword-like tokens whose postings would dominate the
    * positional join for no signal), then top `nTerms` by total
    * count, ties lexicographic.
    *
    * Scale shape: term stats are two combinable aggregations over the
    * postings ((token, doc) term frequencies, then per-token totals —
    * df is a plain count of the tf rows, no count-distinct shuffle);
    * the term table (`nTerms` rows)
    * BROADCASTS into the posting scan so only selected-term postings
    * — bounded by nTerms·df ≤ nTerms·maxDfFrac·corpus — survive to
    * the per-document positional band join. That join is equi on
    * doc_id with the |Δpos| ≤ window band as residual: per-doc work
    * is tf_a·tf_b with df-capped terms, never corpus².
    *
    * Output: (w1, w2, doc_id, n_pairs), w1 < w2 lexicographically.
    */
  def proximitySearch(docs: DataFrame, idCol: String, textCol: String,
                      nTerms: Int = 4, window: Int = 5,
                      maxDfFrac: Double = 0.2): DataFrame = {
    require(nTerms >= 2, s"need at least two terms, got $nTerms")
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val postings = toks.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("pos", "token")))
    val nDocs = docs.select(count(col(idCol)).as("__nd"))
    // df without a count-distinct shuffle: the (token, doc) tf rows
    // are one per posting doc, so their count IS the df
    val stats = postings.groupBy("token", "doc_id")
      .agg(count(lit(1)).as("__tf"))
      .groupBy("token")
      .agg(sum("__tf").as("__cnt"), count(lit(1)).as("__df"))
    val terms = Dedup.registerPin(stats
      .crossJoin(broadcast(nDocs))
      .filter(col("__df") <= col("__nd") * maxDfFrac)
      .orderBy(col("__cnt").desc, col("token"))
      .limit(nTerms)
      .select("token"))
    val p = postings.join(broadcast(terms), "token")
    val a = p.select(col("doc_id"), col("token").as("w1"), col("pos").as("p1"))
    val b = p.select(col("doc_id").as("doc_id2"), col("token").as("w2"),
      col("pos").as("p2"))
    a.join(b,
        col("doc_id") === col("doc_id2") && col("w1") < col("w2") &&
          abs(col("p1") - col("p2")) <= window)
      .groupBy("w1", "w2", "doc_id").agg(count(lit(1)).as("n_pairs"))
  }

  /** Query-likelihood language-model retrieval with Dirichlet
    * smoothing (Zhai & Lafferty 2001) — the probabilistic alternative
    * to [[bm25TopK]] a hybrid stack A/B-tests against it. A document
    * scores ln Π_t p(t|d) with p(t|d) = (tf + μ·cf_t/|C|)/(dl + μ);
    * dropping the query-constant Σ ln(μ·cf_t/|C|) gives the standard
    * rank-equivalent decomposition score =
    * Σ_matched ln((tf + μp_t)/(μp_t)) − |q|·ln(dl + μ), which only
    * touches (doc, term) MATCHES plus one per-candidate length term —
    * so the candidate set is "docs sharing ≥ 1 query term" (the
    * inverted-index contract; a no-match doc's rank-by-shortness tail
    * is noise, not retrieval). Both pieces are floor-quantized at
    * 2⁴⁰ (the BM25 convention) so per-document scores are exact
    * int64 sums — ties replay identically in SQL. Scale shape mirrors
    * BM25: one (doc, token) tf aggregation, vocabulary-sized cf
    * broadcast, broadcast query terms, map-side-combinable
    * [[graft.functions.TopKAgg]] per query. Output:
    * (query_id, doc_id, rank, score_q) — score_q in 2⁻⁴⁰ log-units.
    */
  def queryLikelihoodTopK(docs: DataFrame, idCol: String, textCol: String,
                          queries: DataFrame, k: Int = 10,
                          mu: Double = 2000.0): DataFrame = {
    val toks = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
    val tok = toks.select(col("doc_id"), size(col("toks")).as("dl"),
      explode(col("toks")).as("token"))
    val tf = tok.groupBy("doc_id", "token")
      .agg(max("dl").as("dl"), count(lit(1)).as("tf_cnt"))
    val cf = tok.groupBy("token").agg(count(lit(1)).as("cf_cnt"))
    val glob = toks.agg(sum(size(col("toks"))).as("c_tokens"))
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(TextFunctions.tokens(col("qtext")))).as("token"))
    val qsize = qterms.groupBy("query_id").agg(count(lit(1)).as("n_terms"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    // μ·p_t with p_t = cf/|C| — every input an exact integer, one
    // fixed double expression per (doc, matched term)
    val mup = lit(mu) * dd(col("cf_cnt")) / dd(col("c_tokens"))
    val matched = tf
      .join(broadcast(qterms), "token")
      .join(broadcast(cf), "token")
      .crossJoin(broadcast(glob))
      .select(col("query_id"), col("doc_id"), col("dl"),
        floor(log((dd(col("tf_cnt")) + mup) / mup) * lit(SCALE)).cast("long")
          .as("cs"))
    val scores = matched.groupBy("query_id", "doc_id")
      .agg(sum("cs").as("m"), max("dl").as("dl"))
      .join(broadcast(qsize), "query_id")
      .withColumn("sc", col("m") -
        floor(dd(col("n_terms")) * log(dd(col("dl")) + lit(mu)) * lit(SCALE))
          .cast("long"))
    val topk = scores.groupBy("query_id")
      .agg(TopKAgg.topK(k)(col("doc_id"), col("sc").cast("double")).as("arr"))
    topk.select(col("query_id"), posexplode(col("arr")))
      .select(col("query_id"), col("col._1").as("doc_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col._2").cast("long").as("score_q"))
  }
}
