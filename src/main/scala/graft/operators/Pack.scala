package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: assign whole
  * documents to fixed token-budget batches (the pre-tokenization
  * analogue of sequence packing — batches feed a trainer that packs
  * or pads within the budget).
  *
  * Contract: within each `groupCol` partition, documents are ordered
  * (token count DESC, id ASC — length-sorted so a batch holds
  * similarly-sized documents, the standard padding-efficiency trick)
  * and `batch_id = floor(exclusive_running_sum / budget)`. Every
  * document stays whole; a batch's token total can exceed the budget
  * by at most its last document (offset packing — the deterministic,
  * one-shuffle form; exact greedy reset-on-overflow packing is a
  * sequential scan that cannot parallelize or replay).
  *
  * Scale shape: ONE shuffle (the window partition by group), batches
  * assigned with a running sum inside each partition — no driver
  * involvement, no iteration. Groups are the parallelism unit; a
  * groupless corpus can pass a hash-derived shard column.
  */
object Pack {

  def packByTokenBudget(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy(groupCol)
      .orderBy(col("n_tokens").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // NULL text counts as 0 tokens (not NULL): engines disagree on
    // NULL placement in DESC ordering, and a packing assignment must
    // be deterministic and replayable. NULL ids/groups are excluded
    // for the same reason (r14 sf0.1 fuzz: a NULL id in the ORDER BY
    // tiebreak swapped batch assignments between engines — Spark
    // sorts NULLS FIRST ascending, DuckDB NULLS LAST).
    df.filter(col(idCol).isNotNull && col(groupCol).isNotNull)
      .select(col(idCol), col(groupCol),
        coalesce(TextFunctions.tokenCount(col(textCol)), lit(0)).as("n_tokens"))
      .withColumn("__prev", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("batch_id", expr(s"__prev DIV $budget"))
      .drop("__prev")
  }

  /** Sliding-window token chunking — context-window preparation (RAG
    * indexing, long-document training): each document's token sequence
    * is cut into windows of `windowTokens` tokens starting every
    * `strideTokens` (stride < window ⇒ overlapping windows, the
    * standard boundary-context trick). Windows cover every token: the
    * last window starts at the last stride boundary before the end and
    * may be short. Output (doc_id, window_no, n_tokens, chunk); NULL
    * text cannot be chunked and is absent (the
    * [[graft.operators.Dedup.chunkDedup]] contract).
    *
    * Scale shape: pure per-row codegen'd expressions (split /
    * sequence / slice / posexplode) — no shuffle, no UDF, no state;
    * output size is corpus tokens × window/stride, which is the
    * caller's overlap budget, not a plan property.
    */
  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
                     windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens >= 1 && strideTokens >= 1,
      s"window/stride must be >= 1, got $windowTokens/$strideTokens")
    require(strideTokens <= windowTokens,
      s"stride > window would skip tokens: $strideTokens > $windowTokens")
    df.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(col("toks").isNotNull)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0),
            ((size(col("toks")) - 1) / strideTokens).cast("int")),
          i => struct(
            size(slice(col("toks"), i * strideTokens + 1, lit(windowTokens)))
              .as("n"),
            array_join(slice(col("toks"), i * strideTokens + 1,
              lit(windowTokens)), " ").as("c"))))
        .as(Seq("window_no", "w")))
      .select(col("doc_id"), col("window_no"), col("w.n").as("n_tokens"),
        col("w.c").as("chunk"))
  }

  /** Per-batch summary — the number a capacity planner wants: batch
    * sizes and token totals (total <= budget + the batch's largest
    * doc, by the packing contract).
    */
  def batchStats(packed: DataFrame, groupCol: String): DataFrame =
    packed.groupBy(col(groupCol), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
        max("n_tokens").as("max_doc_tokens"))
}
