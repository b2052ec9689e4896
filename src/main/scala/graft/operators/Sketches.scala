package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Sketch-based approximate aggregations for corpus-scale profiling —
  * the answers a 100-TB pipeline wants without a full groupBy shuffle
  * of every distinct key:
  *
  * - HLL++ distinct counts are already first class
  *   (`approx_count_distinct`, SURVEY row 46).
  * - Count-min sketches estimate per-key frequencies in ONE pass and
  *   sublinear memory: the aggregation is map-side-combinable (Spark's
  *   `count_min_sketch` merges sketches associatively), the result is
  *   a few KB regardless of cardinality, and lookups never
  *   underestimate (est >= true; est <= true + eps*N with probability
  *   >= confidence).
  */
object Sketches {

  /** Build a count-min sketch of `keyCol` in one distributed pass. */
  def countMin(df: DataFrame, keyCol: Column,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): CountMinSketch = {
    val bytes = df.select(
      count_min_sketch(keyCol, lit(eps), lit(confidence), lit(seed)).as("cms"))
      .head().getAs[Array[Byte]]("cms")
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Estimated frequencies for a bounded probe set — e.g. the heavy
    * hitters surfaced by a coarse sample — without any per-key shuffle.
    */
  def estimateAll(sketch: CountMinSketch, probes: Seq[Any]): Map[Any, Long] =
    probes.map(p => p -> sketch.estimateCount(p)).toMap

  /** KMV (k-minimum-values) distinct-count estimate per group: hash
    * each value to 56 md5 bits, keep the k smallest distinct hashes
    * per group ([[graft.functions.KMinAgg]] — partial-aggregated, the
    * shuffle carries `groups * k` longs however large the corpus), and
    * estimate cardinality as `(k-1) * 2^56 / h_(k)` — the classic
    * bottom-k estimator (Bar-Yossef et al.; relative error
    * ~1/sqrt(k-2)). Groups with fewer than k distinct values are
    * EXACT (the buffer holds every hash).
    *
    * Unlike HLL++ (row 46), whose register layout is engine-private,
    * every step here is md5-portable — an external SQL engine replays
    * the identical estimate, so approx-distinct gets a full oracle.
    * Integer math throughout: `(k-1) * 2^56` fits a signed long for
    * k <= 128, and the division is integer `DIV` on both engines.
    */
  /** The md5-portable 56-bit hash every KMV consumer replays in SQL
    * (`('0x' || substring(md5(v), 1, 14))::bigint` on the oracle side)
    * — shared so an estimator or hash-width change cannot
    * desynchronize one call site from its oracle.
    */
  private[graft] def kmvHash(valueCol: Column): Column =
    conv(substring(md5(valueCol.cast("string")), 1, 14), 16, 10).cast("long")

  /** The KMV estimator over a k-min array column named `minsCol`:
    * exact count below k distinct hashes, else the integer
    * `(k-1)*2^56 DIV h_(k)` bottom-k estimate.
    */
  private[graft] def kmvEstimate(minsCol: String, k: Int): Column =
    when(size(col(minsCol)) < k, size(col(minsCol)).cast("long"))
      .otherwise(expr(s"${(k - 1).toLong * (1L << 56)}L DIV element_at($minsCol, $k)"))

  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2 && k <= 128, s"kmv k must be in [2, 128], got $k")
    // NULL values carry no cardinality signal and their NULL hash would
    // reach the aggregator as a spurious zero — drop them (the SQL
    // replay filters identically)
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KMinAgg.kMin(k)(kmvHash(col(valueCol))).as("__mins"))
      .select(groupCols.map(col) :+
        kmvEstimate("__mins", k).as("est_distinct"): _*)
  }

  /** Sketch REAGGREGATION — the property that makes KMV the 100 TB
    * materialized-rollup sketch: per (group, sub-bucket) k-min arrays
    * are themselves mergeable, and merging them yields EXACTLY the
    * sketch a direct pass over the union would build (bottom-k of a
    * union = bottom-k of the per-part bottom-k's, since any global
    * minimum survives its part's top-k cut). So a pipeline can
    * materialize fine-grained sketches once (per day, per shard, per
    * ingest batch) and answer every coarser rollup by merging
    * `buckets * k` longs — never rescanning the fact table. HLL has
    * the same closure but an engine-private register layout; KMV's
    * merge is replayable row-for-row by an external SQL oracle.
    *
    * Output: one row per `groupCols` with `n_buckets` (sub-sketches
    * merged) and `est_distinct` — identical, by the argument above,
    * to `kmvDistinct(df, groupCols, valueCol, k)` (KmvReaggSpec pins
    * the equality; the oracle replays the two-level construction).
    *
    * Scale shape: stage 1 is [[kmvDistinct]]'s partial-aggregated
    * groupBy at (group, bucket) grain; stage 2 explodes the arrays —
    * `buckets * k` rows total, sketch-sized not corpus-sized — and
    * re-runs the same combinable k-min aggregator at group grain.
    * [[graft.functions.KMinAgg.insert]] keeps minima DISTINCT, so a
    * hash present in several sub-buckets merges idempotently.
    */
  /** Sketch-estimated JOIN CARDINALITY: `|A ∩ B|` from two KMV
    * sketches without running the join — the planner-side estimate
    * that decides broadcast-vs-shuffle or short-circuits an empty
    * intersection at 100 TB. The standard bottom-k intersection
    * estimator: merge the two k-min arrays, keep the bottom k of the
    * UNION; with τ = the k-th union minimum,
    * `|A∪B| ≈ (k−1)·2^56 DIV τ` (the usual KMV estimate) and the
    * fraction ρ/k of union minima present in BOTH sketches scales it
    * to the intersection: `est = ρ · ((k−1)·2^56 DIV τ) DIV k` — all
    * integer arithmetic, replayable. When the union carries fewer
    * than k distinct hashes both sketches are COMPLETE and ρ IS the
    * exact intersection.
    *
    * Each side reduces to ONE k-array row (combinable aggregation);
    * the estimate is array arithmetic on a broadcast one-row cross
    * join. The exact referee (distinct-join count) rides along for
    * the accuracy-contract column, like q_approx_users — at 100 TB
    * you would sample-audit it instead.
    *
    * Output (one row): (est_intersect, exact_intersect, n_a, n_b, ok)
    * with `ok = |est − exact| <= relTol·exact + absTol`.
    */
  def kmvJoinCardinality(dfA: DataFrame, aCol: String,
                         dfB: DataFrame, bCol: String,
                         k: Int = 128, relTol: Double = 0.35,
                         absTol: Long = 8): DataFrame = {
    require(k >= 2 && k <= 128, s"kmv k must be in [2, 128], got $k")
    val sa = dfA.filter(col(aCol).isNotNull)
      .agg(graft.functions.KMinAgg.kMin(k)(kmvHash(col(aCol))).as("mins_a"),
        countDistinct(col(aCol)).as("n_a"))
    val sb = dfB.filter(col(bCol).isNotNull)
      .agg(graft.functions.KMinAgg.kMin(k)(kmvHash(col(bCol))).as("mins_b"),
        countDistinct(col(bCol)).as("n_b"))
    val exact = dfA.select(col(aCol).as("__k")).distinct()
      .join(dfB.select(col(bCol).as("__k")).distinct(), "__k")
      .agg(count(lit(1)).as("exact_intersect"))
    sa.crossJoin(broadcast(sb)).crossJoin(broadcast(exact))
      .withColumn("__union", expr(s"slice(array_sort(array_union(mins_a, mins_b)), 1, $k)"))
      .withColumn("__rho", expr(
        "size(filter(__union, h -> array_contains(mins_a, h) AND array_contains(mins_b, h)))").cast("long"))
      .withColumn("est_intersect",
        when(size(col("__union")) < k, col("__rho"))
          .otherwise(expr(
            s"__rho * (${(k - 1).toLong * (1L << 56)}L DIV element_at(__union, $k)) DIV ${k}L")))
      .select(col("est_intersect"), col("exact_intersect"), col("n_a"), col("n_b"),
        (abs(col("est_intersect") - col("exact_intersect")) <=
          lit(relTol) * col("exact_intersect") + lit(absTol)).as("ok"))
  }

  def kmvReaggregate(df: DataFrame, groupCols: Seq[String],
                     bucketCol: Column, valueCol: String,
                     k: Int = 64): DataFrame = {
    require(k >= 2 && k <= 128, s"kmv k must be in [2, 128], got $k")
    val gc = groupCols.map(col)
    // NULL group/bucket rows excluded (fuzz r12): a sketch bucket keyed
    // by NULL can't be joined back by an external consumer (SQL
    // equi-joins drop NULL keys), so the rollup would be
    // engine-dependent; dirty rows belong in the quarantine path
    val daily = df.filter((col(valueCol).isNotNull +:
        bucketCol.isNotNull +: gc.map(_.isNotNull)).reduce(_ && _))
      .groupBy(gc :+ bucketCol.as("__bucket"): _*)
      .agg(graft.functions.KMinAgg.kMin(k)(kmvHash(col(valueCol))).as("__mins"))
    daily
      .select(gc :+ col("__bucket") :+ explode(col("__mins")).as("__hv"): _*)
      .groupBy(gc: _*)
      .agg(countDistinct(col("__bucket")).as("n_buckets"),
        graft.functions.KMinAgg.kMin(k)(col("__hv")).as("__mins"))
      .select(gc ++ Seq(col("n_buckets"),
        kmvEstimate("__mins", k).as("est_distinct")): _*)
  }

  /** Mergeable sampled-median sketch: per group, the rows whose stable
    * 52-bit id hash is among the `k` smallest form a UNIFORM sample of
    * the group (bottom-k sampling — the same principle as
    * [[kmvDistinct]], keeping values instead of counting hashes), and
    * the median estimate is the exact median of that sample. Groups
    * with <= k rows are EXACT. State is k (value, hash) pairs per
    * group however large the group — the bounded-memory alternative to
    * a full per-group sort, and unlike `approx_percentile` every step
    * (hash selection AND median arithmetic) replays in an external SQL
    * engine.
    *
    * Output stays integral: `med2` = s(⌊(n+1)/2⌋) + s(⌈(n+1)/2⌉) over
    * the ascending sample — twice the median, no float interpolation.
    * Selection reuses [[graft.functions.TopKAgg]] on the negated hash
    * (map-side-combinable; 52-bit hash exact in its double score).
    */
  def sampledMedian(df: DataFrame, groupCol: String, idCol: String,
                    valueCol: String, k: Int = 64): DataFrame = {
    val h52 = graft.functions.HashFunctions.stableHash52(col(idCol).cast("string"))
    val vals = array_sort(transform(col("__top"), t => t.getField("_1")))
    val n = size(col("__vals"))
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCol)
      .agg(graft.functions.TopKAgg.topK(k)(
        col(valueCol).cast("long"), -h52.cast("double")).as("__top"))
      .withColumn("__vals", vals)
      .select(col(groupCol), n.as("n_sample"),
        (element_at(col("__vals"), ((n + 1) / 2).cast("int")) +
          element_at(col("__vals"), ((n + 2) / 2).cast("int"))).as("med2"))
  }

  /** [[sampledMedian]]'s rollup form — the quantile counterpart of
    * [[kmvReaggregate]]: per-(group, sub-bucket) bottom-k (value,
    * hash-score) samples merge into EXACTLY the sample a direct pass
    * over the group would keep, because [[graft.functions.TopKAgg]]'s
    * selection order (score desc, value asc) is TOTAL — any globally
    * selected row survives its own bucket's cut, ties included. So
    * per-shard median sketches materialize once and every coarser
    * rollup merges `buckets * k` rows, never rescanning the corpus;
    * SketchesSpec-style equality with the direct sketch is pinned in
    * KmvReaggSpec and the oracle replays the two-level construction.
    */
  def sampledMedianReaggregate(df: DataFrame, groupCol: String,
                               bucketCol: Column, idCol: String,
                               valueCol: String, k: Int = 64): DataFrame = {
    val h52 = graft.functions.HashFunctions.stableHash52(col(idCol).cast("string"))
    val stage1 = df.filter(col(valueCol).isNotNull &&
        col(groupCol).isNotNull && bucketCol.isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol), bucketCol.as("__bucket"))
      .agg(graft.functions.TopKAgg.topK(k)(
        col(valueCol).cast("long"), -h52.cast("double")).as("__top"))
    val vals = array_sort(transform(col("__top"), t => t.getField("_1")))
    val n = size(col("__vals"))
    stage1
      .select(col(groupCol), col("__bucket"), explode(col("__top")).as("p"))
      .groupBy(groupCol)
      .agg(countDistinct(col("__bucket")).as("n_buckets"),
        graft.functions.TopKAgg.topK(k)(
          col("p._1"), col("p._2")).as("__top"))
      .withColumn("__vals", vals)
      .select(col(groupCol), col("n_buckets"), n.as("n_sample"),
        (element_at(col("__vals"), ((n + 1) / 2).cast("int")) +
          element_at(col("__vals"), ((n + 2) / 2).cast("int"))).as("med2"))
  }

  /** Per-group equi-width histogram of an integer column: `bins`
    * buckets spanning the GLOBAL [min, max] (edges from a one-row
    * broadcast aggregate — no driver action, no second shuffle of the
    * data), bucket index by integer-exact arithmetic
    * `min(bins-1, (x - lo) * bins / (hi - lo + 1))`, counts map-side
    * combinable. The distribution-profiling complement to q_profile's
    * scalar stats.
    *
    * The division is double-precision but exact for any realistic
    * integer column ((x-lo)*bins far below 2^53, and a 1-ulp quotient
    * error cannot cross an integer boundary at these magnitudes), so
    * an external engine's integer `//` computes identical buckets.
    */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
                bins: Int): DataFrame = {
    // NULL values must be dropped, not binned: the bucket expression is
    // NULL for them, and least() in both Spark and DuckDB SKIPS null
    // arguments, so least(bins-1, NULL) = bins-1 would silently count
    // every NULL row in the TOP bin (min/max already ignore nulls)
    val nn = df.filter(col(valueCol).isNotNull)
    val mm = nn.agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    nn.crossJoin(broadcast(mm))
      .select(col(groupCol),
        least(lit(bins - 1), ((col(valueCol) - col("__lo")) * bins /
          (col("__hi") - col("__lo") + 1)).cast("long")).as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Robust per-group outlier detection on MEDIAN/MAD — the
    * heavy-tail-safe alternative to mean/stddev z-scores (one giant
    * document moves a mean arbitrarily; it moves a median not at all).
    * Estimators come from the mergeable bottom-k hash sample
    * ([[sampledMedian]], exact for groups <= k), then outliers are
    * counted over the FULL group.
    *
    * Integer-exact throughout — the classic 1.4826·MAD consistency
    * scaling is applied as a cross-multiplied integer comparison, so
    * no float ever decides membership: with med2 = 2·median(x) and
    * madd2 = 2·median(2·|x − med|) = 4·MAD, the rule
    * |x − med| > 3·1.4826·MAD becomes
    * 20000·|2x − med2| > 3·14826·madd2.
    *
    * Scale shape: two bottom-k sample aggregations (map-side
    * combinable, k-bounded state) + one counting aggregation, with the
    * group-cardinality estimate tables broadcast back — the corpus is
    * never shuffled on anything but the group key.
    */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, k: Int = 64): DataFrame = {
    val nn = df.filter(col(valueCol).isNotNull)
    val med = sampledMedian(nn, groupCol, idCol, valueCol, k)
      .select(col(groupCol), col("med2"))
    val withDev = nn.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(lit(2) * col(valueCol).cast("long") - col("med2")))
    val mad = sampledMedian(withDev, groupCol, idCol, "__dev", k)
      .select(col(groupCol), col("med2").as("madd2"))
    withDev.join(broadcast(mad), Seq(groupCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        first(col("med2")).as("med2"),
        first(col("madd2")).as("madd2"),
        sum(when(col("__dev") * 20000L > lit(44478L) * col("madd2"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Cross-group content-overlap matrix via KMV set sketches: for every
    * group pair, the bottom-k Jaccard estimate between their word
    * n-gram SETS — the corpus diagnostic that answers "which sources
    * feed me the same content" without comparing any documents (the
    * precursor that tells you WHERE to point the pairwise dedup rows).
    *
    * Estimator (Broder): each group keeps its k smallest distinct gram
    * hashes ([[graft.functions.KMinAgg]]); for a pair, the k smallest
    * of the merged arrays ARE the bottom-k of the set union (any
    * global minimum survives its own group's cut — the row-153 merge
    * argument), and X∩S_a∩S_b / |X| estimates the Jaccard with error
    * ~1/√k. Every step is md5-portable integer/array arithmetic, so
    * the oracle replays the matrix exactly — no float accumulation
    * anywhere except the single final division.
    *
    * Scale shape: ONE corpus-sized gram explode feeding a combinable
    * bottom-k (the shuffle is groups×k longs); the pair stage is a
    * broadcast self-join over GROUP-cardinality sketch rows — sources
    * are bounded (tens to thousands), so groups² tiny array ops never
    * touch the corpus again.
    *
    * Output: (src_a, src_b, n_union, n_inter, jaccard), src_a < src_b.
    */
  def sourceOverlap(df: DataFrame, groupCol: String, textCol: String,
                    n: Int = 3, k: Int = 128): DataFrame = {
    require(k >= 2, s"sourceOverlap k must be >= 2, got $k")
    val grams = Decontaminate.docGrams(
        df.filter(col(groupCol).isNotNull && col(textCol).isNotNull),
        groupCol, textCol, n)
      .select(col("doc_id").as("grp"), col("gram")).distinct()
    val sketches = grams.groupBy("grp")
      .agg(graft.functions.KMinAgg.kMin(k)(kmvHash(col("gram"))).as("mins"))
    val a = sketches.select(col("grp").as("src_a"), col("mins").as("ma"))
    val b = sketches.select(col("grp").as("src_b"), col("mins").as("mb"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("x", slice(array_sort(array_union(col("ma"), col("mb"))), 1, k))
      .select(col("src_a"), col("src_b"),
        size(col("x")).cast("long").as("n_union"),
        size(array_intersect(col("x"), array_intersect(col("ma"), col("mb"))))
          .cast("long").as("n_inter"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
  }
}
