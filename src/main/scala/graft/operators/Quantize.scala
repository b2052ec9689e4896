package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression: per-vector symmetric int8 scalar
  * quantization — 4 bytes/dim float32 down to 1 byte/dim plus one
  * scale per vector, the standard memory lever for corpus-scale ANN
  * (a 100-TB embedding store becomes ~25 TB with ~1% cosine error).
  *
  * Every step is deterministic IEEE double arithmetic (widen, scale,
  * `floor(x + 0.5)`, clamp) with no ties-dependent rounding mode, so
  * an external SQL engine replays codes bit-for-bit — the quantizer
  * itself is oracle-checkable, not just spec-bounded.
  */
object Quantize {

  /** `(id, dim, code)` rows: code_i = clamp(floor(v_i * 127 / s + 0.5),
    * -127, 127) with s = max|v| per vector; zero vectors code to 0.
    * Row-wise, one projection — no shuffle at all.
    */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val withScale = df.select(col(idCol),
      array_max(transform(col(vecCol), x => abs(x))).cast("double").as("__s"),
      col(vecCol).as("__v"))
    withScale
      .select(col(idCol), col("__s"), posexplode(col("__v")).as(Seq("dim", "__x")))
      .select(col(idCol), col("dim"),
        when(col("__s") === 0.0, lit(0)).otherwise(
          greatest(lit(-127.0), least(lit(127.0),
            floor(col("__x").cast("double") * 127.0 / col("__s") + 0.5))))
          .cast("int").as("code"))
  }

  /** Packed form for storage/ANN: `(id, scale, codes array<int>)` —
    * one row per vector, ready for a cosine kernel over codes
    * (dot products in integer, one float multiply at the end).
    */
  def scalarQuantizePacked(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // the scale is MATERIALIZED in its own projection before the
    // transform references it: an expression captured inside a HOF
    // lambda re-evaluates per element (the O(dims²) trap), an
    // attribute does not
    val withS = df.select(col(idCol), col(vecCol).as("__v"),
      array_max(transform(col(vecCol), y => abs(y))).cast("double").as("__s"))
    withS.select(col(idCol), (col("__s") / 127.0).as("scale"),
      transform(col("__v"), x =>
        when(col("__s") === 0.0, lit(0))
          .otherwise(greatest(lit(-127.0), least(lit(127.0),
            floor(x.cast("double") * 127.0 / col("__s") + 0.5))))
          .cast("int")).as("codes"))
  }

  /** Reconstruction: v̂_i = code_i * scale. */
  def dequantize(packed: DataFrame, idCol: String): DataFrame =
    packed.select(col(idCol),
      transform(col("codes"), c => c.cast("double") * col("scale")).as("vec"))

  /** Per-dimension health profile of an embedding column — the
    * feature-QA table an embedding pipeline monitors (a dead/constant
    * dimension, an exploding one, or a mean drift all show up here
    * before they silently degrade retrieval). Values fixed-point at
    * 2^20 (`q = round(x·2^20)` — float→double widening and the
    * power-of-two multiply are both EXACT, so q is the same integer on
    * any engine), then per dimension the exact int64 (n, Σq, Σq²,
    * min, max) plus mean/variance as fixed double expressions (n·Σ
    * products in double — the moment-sum discipline).
    *
    * Scale shape: one posexplode (rows × dim) feeding ONE combinable
    * aggregation into dim rows; nothing else shuffles. Overflow: q² ≤
    * 2^40+ per element keeps Σq² inside 2^63 through ~10⁹ vectors per
    * dimension for unit-scale embeddings.
    */
  def dimStats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ex = df.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        round(col("x").cast("double") * 1048576).cast("long").as("q"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val m = ex.groupBy("dim").agg(count(lit(1)).as("n"),
      sum("q").as("sum_q"), sum(col("q") * col("q")).as("sumsq_q"),
      min("q").as("min_q"), max("q").as("max_q"))
    m.withColumn("mean_q", d(col("sum_q")) / d(col("n")))
      .withColumn("var_q", when(col("n") > 1,
        (d(col("n")) * d(col("sumsq_q")) - d(col("sum_q")) * d(col("sum_q"))) /
          (d(col("n")) * (d(col("n")) - lit(1.0)))))
      .select("dim", "n", "sum_q", "sumsq_q", "min_q", "max_q", "mean_q", "var_q")
  }
}
