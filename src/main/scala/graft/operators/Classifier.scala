package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based data selection: linear text-classifier inference
  * (the fastText architecture: hashed unigram+bigram features, a
  * broadcast weight vector, mean-pool, sigmoid) and DSIR-style hashed
  * n-gram importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling") — the two standard
  * model-scored selection passes of an LLM training-data pipeline.
  *
  * Scale story: both are one feature explode (narrow), one
  * vocabulary-bounded aggregation, a broadcast join of the bounded
  * weight/ratio table back onto the feature stream, and one map-side-
  * combinable per-doc aggregation. The corpus is never joined to
  * itself and never sorted.
  *
  * Cross-engine determinism: per-feature weights are INTEGERS (the
  * classifier's synthetic weights by construction; DSIR's log ratios
  * via floor(λ·2^20)), so per-doc scores are order-independent integer
  * sums — the keep/label decisions (`sum > 0`) are exact in both Spark
  * and the SQL oracle, and only the final reported probability /
  * average is floating-point (compared with tolerance).
  */
object Classifier {

  /** Hash buckets for unigram + bigram features of a token array —
    * the fastText `wordNgrams=2` feature map.
    */
  private def featureBuckets(toks: Column, numBuckets: Int): Column = {
    val unis = transform(toks, t =>
      pmod(HashFunctions.stableHash56(t), lit(numBuckets.toLong)))
    val bis = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => pmod(HashFunctions.stableHash56(concat(a, lit(" "), b)),
        lit(numBuckets.toLong)))
    concat(unis, bis)
  }

  /** Linear classifier inference over hashed unigram+bigram features:
    * per document the feature count, the exact integer weight sum, the
    * sigmoid probability of the mean-pooled logit, and the decision.
    *
    * `weights` is (bucket: long, w: long) — a trained model's
    * quantized weight row per feature bucket, broadcast to every
    * executor exactly like fastText's input matrix. `label = sum_w > 0`
    * is integer-exact; `prob` is the only floating-point output.
    */
  def linearScore(docs: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, numBuckets: Int,
                  logitScale: Double): DataFrame = {
    val feats = docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(featureBuckets(col("toks"), numBuckets)).as("bucket"))
    feats.join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("w").as("sum_w"))
      .select(col("doc_id"), col("n_feats"), col("sum_w"),
        (lit(1.0) / (lit(1.0) + exp(-(col("sum_w") / (lit(logitScale) * col("n_feats"))))))
          .as("prob"),
        (col("sum_w") > 0).as("label"))
  }

  /** The deterministic stand-in weight table used by the catalog query
    * (production loads trained weights): `w(b) = (b·2654435761) mod 2^20
    * − 2^19`, a Knuth-hash spread over ±2^19 that any SQL engine
    * reproduces exactly.
    */
  def syntheticWeights(spark: org.apache.spark.sql.SparkSession, numBuckets: Int): DataFrame =
    spark.range(numBuckets).select(col("id").as("bucket"),
      (pmod(col("id") * lit(2654435761L), lit(1048576L)) - lit(524288L)).as("w"))

  /** DSIR importance weighting: each document's mean log importance
    * ratio `λ(b) = ln p_target(b)/p_raw(b)` over its hashed bigram
    * features, with add-one-smoothed bucket distributions estimated
    * from the corpus itself (`targetFilter` marks the target domain).
    * Documents with fewer than two tokens have no bigram features and
    * are not scored.
    *
    * Output: (doc_id, n_feats, sum_lr, avg_logratio, is_targetlike).
    * `sum_lr` is the exact integer sum of `floor(λ·2^20)` per feature
    * — order-independent, so `is_targetlike = sum_lr > 0` replays
    * exactly — and `avg_logratio` is `sum_lr / (2^20 · n_feats)`.
    * Importance RESAMPLING composes with the existing samplers: e.g.
    * `hashBucketSample` gated on `is_targetlike`, or `q_quantile_cut`
    * on `avg_logratio`.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetFilter: Column, numBuckets: Int = 65536): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"), targetFilter.as("is_target"))
    val feats = base.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("is_target"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => pmod(HashFunctions.stableHash56(concat(a, lit(" "), b)),
            lit(numBuckets.toLong)))).as("bucket"))
    // one vocabulary-bounded pass: raw + target counts per bucket
    val counts = feats.groupBy("bucket")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    val lam = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(log(((col("ct") + lit(1.0)) / (col("tt") + lit(numBuckets.toDouble))) /
          ((col("cr") + lit(1.0)) / (col("tr") + lit(numBuckets.toDouble)))) * lit(1048576.0))
          .cast("long").as("lam"))
    feats.join(broadcast(lam), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("lam").as("sum_lr"))
      .select(col("doc_id"), col("n_feats"), col("sum_lr"),
        (col("sum_lr") / (lit(1048576.0) * col("n_feats"))).as("avg_logratio"),
        (col("sum_lr") > 0).as("is_targetlike"))
  }
}
