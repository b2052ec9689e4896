package graft.streaming

import graft.functions.KMinAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming sketches over unbounded inputs — state bounded by the
  * sketch size, never by the stream's cardinality.
  */
object StreamingSketch {

  /** Continuous per-group distinct-count estimation: the KMV bottom-k
    * sketch maintained as `mapGroupsWithState` state. Each micro-batch
    * folds its md5-derived 56-bit value hashes into the group's k
    * sorted minima (the SAME [[KMinAgg.insert]]/[[KMinAgg.estimate]]
    * kernel as the batch aggregator, so a streaming estimate equals
    * the batch estimate over the same prefix of the stream) and emits
    * the updated estimate.
    *
    * State per group is k longs — a few hundred bytes however many
    * distinct values flow past, which is the whole point: exact
    * streaming distinct needs unbounded state and a blocking output
    * mode, the sketch needs neither. Run with output mode `update`.
    */
  def streamingKmvDistinct(stream: DataFrame, groupCol: String,
                           valueCol: String, k: Int = 64): DataFrame = {
    require(k >= 2 && k <= 128, s"kmv k must be in [2, 128], got $k")
    val spark = stream.sparkSession
    import spark.implicits._
    // the state key rides as a string (one concrete encoder for any
    // group type); cast back to the input column's type on the way
    // out so the streaming schema matches batch kmvDistinct's — a
    // caller unioning the two must not hit a long-vs-string mismatch
    val groupType = stream.schema(groupCol).dataType
    stream
      .filter(col(valueCol).isNotNull) // NULLs carry no cardinality signal
      .select(col(groupCol).cast("string").as("g"),
        conv(substring(md5(col(valueCol).cast("string")), 1, 14), 16, 10)
          .cast("long").as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[Long], (String, Long)](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val merged = rows.foldLeft(state.getOption.getOrElse(Seq.empty[Long])) {
            (buf, r) => KMinAgg.insert(buf, r._2, k)
          }
          state.update(merged)
          (key, KMinAgg.estimate(merged, k))
      }
      .toDF(groupCol, "est_distinct")
      .withColumn(groupCol, col(groupCol).cast(groupType))
  }

  /** Continuous per-group median estimation: the bottom-k-by-hash
    * uniform sample ([[graft.operators.Sketches.sampledMedian]]'s
    * principle) maintained as `mapGroupsWithState` state. Selection
    * order is (52-bit id hash, value) ascending — identical to the
    * batch aggregator's (score desc, id asc) with score = -hash — so
    * the streaming estimate EQUALS the batch estimate over the same
    * prefix of the stream (spec-pinned). State per group is k
    * (hash, value) pairs however long the stream runs; output stays
    * integral (`med2` = twice the median). Run with output mode
    * `update`.
    */
  def streamingSampledMedian(stream: DataFrame, groupCol: String,
                             idCol: String, valueCol: String,
                             k: Int = 64): DataFrame = {
    require(k >= 1, s"sample size must be positive, got $k")
    val spark = stream.sparkSession
    import spark.implicits._
    val groupType = stream.schema(groupCol).dataType
    val ord = implicitly[Ordering[(Long, Long)]]
    def insert(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
      if (buf.size >= k && ord.lteq(buf.last, x)) buf
      else {
        val (pre, post) = buf.span(ord.lteq(_, x))
        (pre ++ (x +: post)).take(k)
      }
    stream
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        graft.functions.HashFunctions.stableHash52(col(idCol).cast("string")).as("h"),
        col(valueCol).cast("long").as("v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[(Long, Long)], (String, Int, Long)](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val merged = rows.foldLeft(state.getOption.getOrElse(Seq.empty[(Long, Long)])) {
            (buf, r) => insert(buf, (r._2, r._3))
          }
          state.update(merged)
          val s = merged.map(_._2).sorted
          val n = s.length
          (key, n, s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1))
      }
      .toDF(groupCol, "n_sample", "med2")
      .withColumn(groupCol, col(groupCol).cast(groupType))
  }

  /** Continuous stratified exact-k sample: per group, the k smallest
    * seeded id hashes — [[graft.operators.Sampling.exactKSample]]'s
    * selection rule held as `flatMapGroupsWithState` state over an
    * unbounded stream. Every batch that touches a group re-emits the
    * group's FULL current membership (run with output mode `update`;
    * the latest emission per group IS the sample), so a downstream
    * sink always has a count-exact uniform sample of everything seen
    * so far, per stratum, in k·groups state however long the stream
    * runs. The hash family is identical to the batch sampler's
    * (`seededHash56(seed, id)`), so the streaming membership EQUALS
    * batch `exactKSample` run per group on the same prefix —
    * spec-pinned, including across-batch state merging and eviction
    * of previously-sampled ids by later smaller hashes.
    */
  /** Continuous heavy hitters: per-BUCKET Misra-Gries summaries held
    * as `mapGroupsWithState` state (bucket = item-hash mod `buckets`).
    * Every occurrence of an item lands in ONE bucket, so an item
    * globally heavier than n/(k+1) is heavier than n_bucket/(k+1) in
    * its own bucket and the per-bucket MG guarantee keeps it — the
    * union of bucket candidates therefore contains every global heavy
    * hitter, while state stays `buckets * k` counters and the hot-key
    * work spreads over `buckets` state partitions instead of one
    * global summary task. Emits one row per candidate per update:
    * (bucket, token, mg_count). Run with output mode `update`;
    * confirm candidates against exact counts downstream exactly as
    * the batch text_heavy_hitters row does.
    */
  def streamingHeavyHitters(stream: DataFrame, itemCol: String,
                            k: Int = 48, buckets: Int = 8): DataFrame = {
    require(k >= 1 && buckets >= 1, s"need k >= 1 and buckets >= 1, got $k/$buckets")
    val spark = stream.sparkSession
    import spark.implicits._
    val mg = new graft.functions.HeavyHittersAgg(k)
    stream
      .filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string").as("t"),
        pmod(graft.functions.HashFunctions.stableHash56(col(itemCol).cast("string")),
          lit(buckets.toLong)).cast("int").as("b"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Map[String, Long], (Int, String, Long)](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        case (bucket, rows, state) =>
          val merged = rows.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) {
            (buf, r) => mg.reduce(buf, r._1)
          }
          state.update(merged)
          merged.iterator.map { case (t, c) => (bucket, t, c) }
      }
      .toDF("bucket", "token", "mg_count")
  }

  def streamingExactKSample(stream: DataFrame, groupCol: String,
                            idCol: String, k: Int, seed: Int = 0): DataFrame = {
    require(k >= 1, s"sample size must be positive, got $k")
    val spark = stream.sparkSession
    import spark.implicits._
    val groupType = stream.schema(groupCol).dataType
    val idType = stream.schema(idCol).dataType
    val ord = implicitly[Ordering[(Long, String)]]
    def insert(buf: Seq[(Long, String)], x: (Long, String)): Seq[(Long, String)] =
      if (buf.size >= k && ord.lteq(buf.last, x)) buf
      else if (buf.contains(x)) buf // at-least-once replays must not duplicate
      else {
        val (pre, post) = buf.span(ord.lteq(_, x))
        (pre ++ (x +: post)).take(k)
      }
    stream
      .filter(col(idCol).isNotNull) // batch sampler's NULL-id contract
      .select(col(groupCol).cast("string").as("g"),
        graft.functions.HashFunctions
          .seededHash56(seed, col(idCol).cast("string")).as("h"),
        col(idCol).cast("string").as("id"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, String)], (String, String, Long)](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val merged = rows.foldLeft(state.getOption.getOrElse(Seq.empty[(Long, String)])) {
            (buf, r) => insert(buf, (r._2, r._3))
          }
          state.update(merged)
          merged.iterator.map { case (h, id) => (key, id, h) }
      }
      .toDF(groupCol, idCol, "sample_hash")
      .withColumn(groupCol, col(groupCol).cast(groupType))
      .withColumn(idCol, col(idCol).cast(idType))
  }
}
