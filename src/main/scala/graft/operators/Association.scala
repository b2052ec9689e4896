package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (support / confidence / lift) —
  * the co-occurrence analytics a commerce deployment of the reference
  * would run on its order streams (the reference's aggregation QPUs
  * compute the per-key counts; rule mining is their composition).
  *
  * Scale shape: pair generation is a SELF-JOIN CO-PARTITIONED ON THE
  * BASKET KEY — each basket contributes C(|basket|, 2) pairs, bounded
  * by the max basket size (TPC-H orders: ≤7 items), never a global
  * item×item cross. The pair aggregation is map-side combinable; the
  * per-item counts frame is item-cardinality and joins by AQE's
  * choice (broadcast when the vocabulary measures small, shuffle when
  * it doesn't — at 100 TB an item vocabulary can be anything). The
  * basket total rides in as a one-row broadcast.
  *
  * Confidence and lift are IEEE divisions of EXACT integer counts in
  * a fixed expression order, so they replay bit-identically in any
  * engine (the q_funnel conv_pct precedent).
  */
object Association {

  /** Rules over unordered item pairs: one row per co-occurring pair
    * `(item_a < item_b)` with `pair_count >= minSupport`, carrying
    * both items' basket counts, the basket total, both directed
    * confidences, and the (symmetric) lift.
    */
  def basketRules(df: DataFrame, basketCol: String, itemCol: String,
                  minSupport: Long = 3): DataFrame = {
    val items = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minSupport)
    val counts = items.groupBy("item").agg(count(lit(1)).as("cnt"))
    val total = items.agg(count_distinct(col("basket")).as("n_baskets"))
    pairs
      .join(counts.select(col("item").as("item_a"), col("cnt").as("count_a")), "item_a")
      .join(counts.select(col("item").as("item_b"), col("cnt").as("count_b")), "item_b")
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("pair_count"),
        col("count_a"), col("count_b"), col("n_baskets"),
        (col("pair_count").cast("double") / col("count_a")).as("conf_a_to_b"),
        (col("pair_count").cast("double") / col("count_b")).as("conf_b_to_a"),
        (col("pair_count").cast("double") * col("n_baskets") /
          (col("count_a") * col("count_b"))).as("lift"))
  }
}
