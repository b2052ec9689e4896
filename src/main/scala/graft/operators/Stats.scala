package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact hypothesis-test statistics over grouped fact data — the
  * experiment-analysis workload (A/B cohort independence, ranking
  * quality) built the repo way: every count and cross-product is exact
  * 64-bit integer arithmetic, and a float appears only as ONE IEEE
  * division (or multiply-then-divide) of exact integers at the very
  * end, so an external SQL engine replays every row bit-for-bit. A
  * textbook float implementation (running Σ(o−e)²/e, averaged ranks)
  * would drift with summation order across engines and partitionings.
  */
object Stats {

  /** Chi-square-of-independence decomposition for two categorical
    * columns: one output row per contingency cell carrying the
    * observed count, marginals, grand total, the expected count in
    * exact micro-units (`rt·ct·10⁶ div n` — integer floor division),
    * and the cell's χ² contribution `(o·n − rt·ct)² / (n·rt·ct)` as a
    * double produced by one multiply and one divide of exactly-
    * representable integers. Emitting per-cell rows (cells =
    * |A|·|B|, tiny) instead of Σ keeps the statistic order-free and
    * replayable; the caller sums `contrib` knowing its float caveat.
    *
    * Scale shape: the only fact-sized work is the combinable
    * (a, b) count; marginals reduce the cell table (broadcast-sized)
    * and join back broadcast. Exactness bound: |o·n − rt·ct| ≤ n² must
    * stay within 2^53 for the double path and `rt·ct·10⁶` within
    * int64 — holds through n ≈ 3·10⁶ rows per test, far past any
    * per-experiment cohort; shard bigger tests by experiment id.
    */
  def chiSquareCells(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("a").agg(sum("o").as("rt"))
    val colTot = cells.groupBy("b").agg(sum("o").as("ct"))
    val grand = cells.agg(sum("o").as("n"))
    val d = col("o") * col("n") - col("rt") * col("ct")
    cells.join(broadcast(rowTot), "a")
      .join(broadcast(colTot), "b")
      .crossJoin(broadcast(grand))
      .withColumn("e_micro", expr("rt * ct * 1000000L div n"))
      .withColumn("contrib",
        (d.cast("double") * d.cast("double")) /
          (col("n") * col("rt") * col("ct")).cast("double"))
      .select("a", "b", "o", "rt", "ct", "n", "e_micro", "contrib")
  }

  /** Exact ROC-AUC of a score against a boolean label via the
    * Mann–Whitney U statistic, tie-corrected. Computed from the
    * per-DISTINCT-SCORE (pos, neg) table: with `below` = negatives
    * strictly below a score value, `2U = Σ_v pos_v · (2·below_v +
    * neg_v)` — ties contribute the conventional half credit without
    * any fractional rank. Output is one row: (n_pos, n_neg, u2, auc)
    * where `auc = u2 / (2·n_pos·n_neg)` is the single IEEE division.
    *
    * Scale shape: the fact table is reduced by ONE combinable
    * group-by on the score value; the window (cumulative negatives)
    * runs over DISTINCT score values only — score cardinality, not row
    * count — so a billion-row corpus with a bounded score domain never
    * funnels through one task. NULL scores and NULL labels are
    * excluded (they rank nowhere).
    */
  def rocAuc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val g = df.select(scoreCol.as("s"), labelCol.as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s").agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("neg"))
    val byScore = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("below", coalesce(sum("neg").over(byScore), lit(0L)))
      .agg(
        sum("pos").as("n_pos"),
        sum("neg").as("n_neg"),
        sum(col("pos") * (lit(2) * col("below") + col("neg"))).as("u2"))
      .withColumn("auc",
        col("u2").cast("double") / (lit(2) * col("n_pos") * col("n_neg")).cast("double"))
  }
}
