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
    // NOT pinned: the self-join's two sides already share one exchange
    // (ReusedExchange), and recomputing the distinct for the counts /
    // total branches measured CHEAPER than materializing it to cache
    // at every tested scale (pin variant: +0.5s at sf0.1)
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
        // denominator product in double (lift is IEEE anyway): a
        // long-by-long count_a * count_b would wrap silently past
        // ~3e9 x 3e9 while the oracle engine raises — same-answer
        // guarantee requires the cast, not a documented ceiling
        (col("pair_count").cast("double") * col("n_baskets") /
          (col("count_a").cast("double") * col("count_b"))).as("lift"))
  }

  /** Item-item collaborative-filtering similarity: for every item, its
    * `topK` most similar items by co-occurrence cosine — the classic
    * "customers also bought" kernel. The score is the SQUARED cosine
    * in fixed point, `score_q = cooc^2 * 2^20 / (count_a * count_b)`,
    * computed entirely in exact integer arithmetic (monotone in the
    * cosine, so the ranking is identical) — replayable bit-for-bit
    * where a float sqrt never is. Bounds: cooc < 2^21 keeps the
    * numerator inside a long; per-item counts bound cooc, so this
    * holds until a single item PAIR co-occurs in >2M baskets (raise
    * the scale shift if that day comes).
    *
    * Scale shape: identical to [[basketRules]] (co-partitioned pair
    * generation) plus a per-item top-k window over the pair-sized
    * frame — partitioned by item, never global.
    */
  def itemSimilarity(df: DataFrame, basketCol: String, itemCol: String,
                     minCooc: Long = 3, topK: Int = 5): DataFrame = {
    val items = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    // pinned: the directed union reads the pair aggregation TWICE and
    // Spark does not share subplans across union branches — at corpus
    // scale the pair self-join is the whole job, so one pin beats two
    // computations (items stays unpinned per basketRules' measurement)
    val pairs = Dedup.registerPin(items.as("a")
      .join(items.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= minCooc))
    val directed = pairs.select(col("item_a").as("item"), col("item_b").as("neighbor"), col("cooc"))
      .union(pairs.select(col("item_b").as("item"), col("item_a").as("neighbor"), col("cooc")))
    val counts = items.groupBy("item").agg(count(lit(1)).as("cnt"))
    val scored = directed
      .join(counts.select(col("item"), col("cnt").as("count_item")), "item")
      .join(counts.select(col("item").as("neighbor"), col("cnt").as("count_neighbor")), "neighbor")
      // `div`, not `/`: Column./ on longs is DOUBLE division; the fixed
      // point score must stay an exact integer
      .withColumn("score_q",
        expr("cooc * cooc * 1048576L div (count_item * count_neighbor)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("item").orderBy(col("score_q").desc, col("cooc").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("item", "neighbor", "cooc", "count_item", "count_neighbor", "score_q", "rank")
  }

  /** Slope One collaborative filtering — the pairwise rating
    * deviation matrix dev(i, j) = Σ_u (r_ui − r_uj) / n_ij over users
    * who rated both items ([[itemSimilarity]] ranks by co-occurrence;
    * Slope One carries MAGNITUDE, the "item i runs 4.2 units hotter
    * than item j" model that predicts r̂_ui = avg_j (r_uj + dev(i,
    * j))). Ratings are exact int64 intensities; duplicate (user,
    * item) observations sum first (total-intensity rating — the only
    * deterministic collapse). dev is the single fixed double division
    * of exact integers. Output per ordered pair (i ≠ j): (item_i,
    * item_j, n_common, dev_num, dev).
    *
    * Scale shape: the pair join is SELF-JOIN CO-PARTITIONED ON THE
    * USER KEY — each user contributes ≤ |items-rated|² pairs, bounded
    * by the per-user catalog slice, never a global item×item cross;
    * the pair aggregation is map-side combinable.
    */
  def slopeOne(ratings: DataFrame, userCol: org.apache.spark.sql.Column,
               itemCol: org.apache.spark.sql.Column,
               ratingCol: org.apache.spark.sql.Column): DataFrame = {
    val ui = ratings.select(userCol.as("u"), itemCol.cast("string").as("i"),
        ratingCol.cast("long").as("r"))
      .filter(col("u").isNotNull && col("i").isNotNull && col("r").isNotNull)
      .groupBy("u", "i").agg(sum("r").as("r"))
      .localCheckpoint(true)
    ui.as("a").join(ui.as("b"),
        col("a.u") === col("b.u") && col("a.i") =!= col("b.i"))
      .groupBy(col("a.i").as("item_i"), col("b.i").as("item_j"))
      .agg(count(lit(1)).as("n_common"),
        coalesce(sum(col("a.r") - col("b.r")), lit(0L)).as("dev_num"))
      .withColumn("dev",
        col("dev_num").cast("double") / col("n_common").cast("double"))
  }
}
