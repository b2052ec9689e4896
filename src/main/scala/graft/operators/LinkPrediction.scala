package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over an undirected edge list: for every node, the
  * top-k NON-neighbors it is most likely to connect to, scored by
  * common-neighbor count with a resource-allocation (RA, Zhou et al.
  * 2009) tie-refiner — the "people/products you may know" kernel a
  * commerce deployment of the reference would run beside the
  * co-purchase analytics (rows 149–152, 168–169, 174).
  *
  * Scoring is EXACT integer arithmetic end to end: a wedge through
  * center z contributes 1 to the pair's common-neighbor count and
  * `2^20 div deg(z)` to its RA score (integer division — the
  * fixed-point convention of q_item_sim/q_entropy), so the ranking
  * replays bit-identically in any engine where a float 1/ln(deg)
  * Adamic-Adar would drift at floor boundaries.
  *
  * Scale shape: wedge generation is a self-join of the neighbor list
  * CO-PARTITIONED ON THE CENTER — C(deg(z), 2) pairs per center,
  * explicitly bounded by `maxDegree` (centers above it are EXCLUDED:
  * a super-hub's wedges are quadratic to enumerate and its RA weight
  * `2^20/deg` is ~0 by construction, so dropping them changes cost by
  * orders of magnitude and scores by almost nothing — the documented
  * trade every production link predictor makes). Candidate pairs then
  * flow through one combinable aggregation, an anti join against the
  * existing edge set, and a per-node top-k window — partitioned by
  * node, never global.
  */
object LinkPrediction {

  /** (node_id, candidate_id, common_neighbors, ra_q, rank): per node
    * the `topK` strongest predicted links, strongest first —
    * candidates share >= `minCommon` neighbors with the node and are
    * not already neighbors. Ties break (common desc, ra_q desc,
    * candidate asc) — total, so the output is a pure function of the
    * edge list.
    */
  def predictLinks(edges: DataFrame, srcCol: String, dstCol: String,
                   maxDegree: Int = 64, minCommon: Long = 2,
                   topK: Int = 5): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val und = Dedup.registerPin(
      e.unionByName(e.select(col("b").as("a"), col("a").as("b"))).distinct())
    val deg = und.groupBy(col("a").as("z")).agg(count(lit(1)).as("d"))
    // neighbor lists of admissible centers (2 <= deg <= maxDegree)
    val ctr = und.select(col("a").as("z"), col("b").as("n"))
      .join(deg.filter(col("d") >= 2 && col("d") <= maxDegree), "z")
    val wedges = ctr.as("x").join(ctr.as("y"),
        col("x.z") === col("y.z") && col("x.n") < col("y.n"))
      .select(col("x.n").as("u"), col("y.n").as("v"), col("x.d").as("d"))
    val scored = wedges.groupBy("u", "v")
      .agg(count(lit(1)).as("cn"), sum(expr("1048576L div d")).as("ra_q"))
      .filter(col("cn") >= minCommon)
    // drop pairs that are already edges (u < v matches und's (a, b) form)
    val novel = scored.join(und,
      col("u") === col("a") && col("v") === col("b"), "left_anti")
    val directed = novel.select(col("u").as("node_id"), col("v").as("candidate_id"),
        col("cn"), col("ra_q"))
      .unionByName(novel.select(col("v").as("node_id"), col("u").as("candidate_id"),
        col("cn"), col("ra_q")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("node_id")
      .orderBy(col("cn").desc, col("ra_q").desc, col("candidate_id"))
    directed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("node_id"), col("candidate_id"),
        col("cn").as("common_neighbors"), col("ra_q"), col("rank"))
  }

  /** Adamic–Adar link scores (Adamic & Adar 2003) — the textbook
    * log-discounted common-neighbor measure beside [[predictLinks]]'
    * RA refiner: a wedge through center z contributes
    * floor(2²⁰ / ln(deg(z))) (deg ≥ 2 always holds for a wedge
    * center), so rare shared neighbors weigh more and the score is an
    * order-free int64 sum that replays exactly in SQL (the raw float
    * Σ 1/ln(deg) would drift with aggregation order). Same wedge
    * generation, same `maxDegree` hub exclusion, same anti-join
    * against existing edges, same per-node top-k — only the weight
    * differs. Output: (node_id, candidate_id, common_neighbors,
    * aa_q, rank).
    */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 maxDegree: Int = 64, minCommon: Long = 2,
                 topK: Int = 5): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val und = Dedup.registerPin(
      e.unionByName(e.select(col("b").as("a"), col("a").as("b"))).distinct())
    val deg = und.groupBy(col("a").as("z")).agg(count(lit(1)).as("d"))
    val ctr = und.select(col("a").as("z"), col("b").as("n"))
      .join(deg.filter(col("d") >= 2 && col("d") <= maxDegree), "z")
    val wedges = ctr.as("x").join(ctr.as("y"),
        col("x.z") === col("y.z") && col("x.n") < col("y.n"))
      .select(col("x.n").as("u"), col("y.n").as("v"), col("x.d").as("d"))
    val scored = wedges.groupBy("u", "v")
      .agg(count(lit(1)).as("cn"),
        sum(floor(lit(1048576.0) / log(col("d").cast("double"))).cast("long"))
          .as("aa_q"))
      .filter(col("cn") >= minCommon)
    val novel = scored.join(und,
      col("u") === col("a") && col("v") === col("b"), "left_anti")
    val directed = novel.select(col("u").as("node_id"), col("v").as("candidate_id"),
        col("cn"), col("aa_q"))
      .unionByName(novel.select(col("v").as("node_id"), col("u").as("candidate_id"),
        col("cn"), col("aa_q")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("node_id")
      .orderBy(col("cn").desc, col("aa_q").desc, col("candidate_id"))
    directed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("node_id"), col("candidate_id"),
        col("cn").as("common_neighbors"), col("aa_q"), col("rank"))
  }
}
