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
    // be deterministic and replayable
    df.select(col(idCol), col(groupCol),
        coalesce(TextFunctions.tokenCount(col(textCol)), lit(0)).as("n_tokens"))
      .withColumn("__prev", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("batch_id", expr(s"__prev DIV $budget"))
      .drop("__prev")
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
