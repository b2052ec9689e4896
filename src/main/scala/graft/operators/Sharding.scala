package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — the stable placement
  * scheme a long-lived corpus store needs: each key's shard is
  * `argmax over shards of hash(key, shard)`, so growing the fleet from
  * k to k+1 shards moves ONLY the keys whose new-shard weight wins
  * (an expected 1/(k+1) of the corpus), and every moved key moves TO
  * the new shard — no reshuffling between existing shards, unlike
  * `hash(key) % k` where almost every key moves. (Thaler & Ravishankar
  * 1998; the scheme behind most production cache/object placement.)
  *
  * Weights are [[HashFunctions.stableHash56]] over `key || '#' || s`
  * (md5-derived), so an external SQL engine replays every placement
  * decision exactly; argmax ties are impossible in practice (two
  * 56-bit hashes of distinct strings colliding) and any collision
  * would fail the oracle loudly rather than silently diverge.
  */
object Sharding {

  // greatest() needs >= 2 args; a 1-shard fleet has exactly one weight
  private def hrwPick(ws: Seq[Column]): Column =
    (if (ws.size == 1) ws.head else greatest(ws: _*)).getField("s")

  /** (key, shard) assignment under `numShards` rendezvous shards.
    * Per-row work is `numShards` md5 hashes + one argmax — map-side
    * only, zero shuffle; at a production shard count the per-key cost
    * is the hash fan-out, the price of stability (consistent-hash
    * rings trade accuracy of balance for O(log k); HRW at corpus scale
    * stays embarrassingly parallel).
    */
  def rendezvousAssign(df: DataFrame, keyCol: String,
                       numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val weights = (0 until numShards).map { s =>
      struct(HashFunctions.stableHash56(
        concat(col(keyCol).cast("string"), lit(s"#$s"))).as("w"),
        lit(s.toLong).as("s"))
    }
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol), hrwPick(weights).as("shard"))
  }

  /** Fleet-growth movement report: assignments under `k` and `k + 1`
    * shards side by side, reduced per old shard to (n_keys, n_moved) —
    * the number that tells an operator what a scale-out actually
    * costs. The rendezvous invariant (every moved key lands on the NEW
    * shard `k`) is part of the output contract: `n_moved` counts
    * exactly the keys whose new assignment is shard k, and the global
    * expected movement is n/(k+1). One projection computes both
    * assignments row-wise (the k+1 weights are a superset of the k
    * weights), one combinable aggregation reduces.
    */
  def rendezvousMovement(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val weights = (0 to k).map { s =>
      struct(HashFunctions.stableHash56(
        concat(col(keyCol).cast("string"), lit(s"#$s"))).as("w"),
        lit(s.toLong).as("s"))
    }
    val oldShard = hrwPick(weights.take(k))
    val newShard = hrwPick(weights)
    df.filter(col(keyCol).isNotNull)
      .select(oldShard.as("shard_before"), newShard.as("shard_after"))
      .groupBy("shard_before")
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("shard_after") =!= col("shard_before"), 1L)
          .otherwise(0L)).as("n_moved"),
        sum(when(col("shard_after") === lit(k.toLong), 1L)
          .otherwise(0L)).as("n_to_new"))
      .withColumn("moved_frac",
        col("n_moved").cast("double") / col("n_keys").cast("double"))
  }
}
