package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature engineering over categorical columns — the tabular-ML prep
  * step beside the text/embedding pipeline rows.
  */
object FeaturePrep {

  /** Weight-of-evidence encoding + information value — the
    * credit-scoring-lineage categorical encoder beside
    * [[targetEncoding]]: per category,
    * `woe = ln(((pos+0.5)/P) / ((neg+0.5)/N))` (the 0.5 Laplace term
    * keeps empty cells finite) and the category's IV contribution
    * `((pos+0.5)/P − (neg+0.5)/N) · woe`, whose sum is the classic
    * predictive-power screen (IV < 0.02 ≈ useless, > 0.5 ≈ suspect).
    *
    * Exactness: the half-counts are carried as INTEGERS
    * (`pos2 = 2·pos+1`), so the woe argument is the ratio of two exact
    * int64 products `pos2·N / neg2·P` — one IEEE division and one
    * `ln` (≤1 ulp on any libm, inside the oracle tolerance); both
    * exact products ride along as columns. Bound: pos2·N within int64
    * — holds to ~10⁹-row corpora with ~10⁹-row categories; shard past
    * it.
    *
    * Scale shape: one combinable (category, label) fold into category
    * rows; totals fold from that table and broadcast back — the
    * [[targetEncoding]] shape exactly.
    */
  def woeEncoding(facts: DataFrame, catCol: String, labelCol: String): DataFrame = {
    val base = facts.select(col(catCol).as("cat"),
        col(labelCol).cast("boolean").as("pos"))
      .filter(col("cat").isNotNull && col("pos").isNotNull)
    val cats = base.groupBy("cat").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("n_neg"))
      .localCheckpoint(true) // totals reuse it
    val tot = cats.agg(sum("n_pos").as("p_tot"), sum("n_neg").as("n_tot"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    cats.crossJoin(broadcast(tot))
      .withColumn("pos2", lit(2L) * col("n_pos") + 1L)
      .withColumn("neg2", lit(2L) * col("n_neg") + 1L)
      .withColumn("woe_num", col("pos2") * col("n_tot"))
      .withColumn("woe_den", col("neg2") * col("p_tot"))
      .withColumn("woe", log(d(col("woe_num")) / d(col("woe_den"))))
      .withColumn("iv_contrib",
        (d(col("pos2")) / (lit(2.0) * d(col("p_tot"))) -
          d(col("neg2")) / (lit(2.0) * d(col("n_tot")))) * col("woe"))
      .select("cat", "n_pos", "n_neg", "woe_num", "woe_den", "woe", "iv_contrib")
  }

  /** Smoothed target encoding (Micci-Barreca 2001): each category's
    * target mean shrunk toward the global mean with pseudo-count `m` —
    * `enc = (Σ_cat + m·μ) / (n_cat + m)` — the leakage-resistant
    * categorical encoding gradient-boosting pipelines use.
    *
    * Exactness: with μ = G/N a ratio of exact longs, the encoding is
    * algebraically `(Σ_cat·N + m·G) / (N·(n_cat + m))` — numerator and
    * denominator are exact integer products, carried as columns, with
    * ONE final IEEE division; no float mean is ever materialized (the
    * repo's cross-multiply convention). Bound: Σ_cat·N < 2^63 — holds
    * to ~10^9-row corpora of 10^9-cent targets with million-row
    * categories; documented-ceiling convention.
    *
    * Scale shape: one combinable (category) aggregation over the fact
    * stream; the global total folds from the category table (never a
    * second fact pass) and broadcasts as one row. Output is
    * category-cardinality: (category, n_rows, sum_target, enc_num,
    * enc_den, enc).
    */
  /** The hashing trick (Weinberger et al. 2009): tokens map into a
    * FIXED `dim`-bucket feature space by a stable hash, with a second
    * hash bit supplying the ±1 sign that makes collisions cancel in
    * expectation — how linear/GBM pipelines featurize unbounded
    * vocabularies without a fitted dictionary (nothing to train, ship,
    * or version; any engine reproduces the exact features from the
    * formula). Emits the SPARSE form (doc, bucket, Σsign) — zero
    * buckets never materialize, so output is bounded by tokens, not
    * docs×dim.
    *
    * Both hashes ride ONE md5 per token ([[graft.functions
    * .HashFunctions.stableHash56]]): bucket = h mod dim, sign from the
    * next bit (`h div dim` parity) — SQL-replayable and independent of
    * the bucket bits for any power-of-two-free dim too. Per-row
    * expressions + one combinable (doc, bucket) aggregation; nothing
    * else shuffles.
    */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
                  dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val toks = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    toks
      .withColumn("__h", graft.functions.HashFunctions.stableHash56(col("token")))
      .withColumn("bucket", pmod(col("__h"), lit(dim.toLong)))
      .withColumn("sign",
        when(pmod(expr(s"__h div $dim"), lit(2L)) === 0, 1L).otherwise(-1L))
      .groupBy("doc_id", "bucket")
      .agg(sum(col("sign")).as("feat"))
  }

  def targetEncoding(facts: DataFrame, catCol: String, targetCol: String,
                     m: Long = 100L): DataFrame = {
    require(m >= 0, s"smoothing pseudo-count must be >= 0, got $m")
    val per = facts.filter(col(catCol).isNotNull && col(targetCol).isNotNull)
      .groupBy(col(catCol).as("cat"))
      .agg(count(lit(1)).as("n_rows"), sum(col(targetCol)).as("sum_target"))
    val g = per.agg(sum("n_rows").as("g_n"), sum("sum_target").as("g_sum"))
    per.crossJoin(broadcast(g))
      .select(col("cat").as(catCol), col("n_rows"), col("sum_target"),
        (col("sum_target") * col("g_n") + lit(m) * col("g_sum")).as("enc_num"),
        (col("g_n") * (col("n_rows") + lit(m))).as("enc_den"))
      .withColumn("enc", col("enc_num").cast("double") / col("enc_den"))
  }
}
