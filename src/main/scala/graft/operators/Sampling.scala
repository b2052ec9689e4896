package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling — the way a training
  * pipeline must split data: membership depends only on the row's id
  * (md5-derived), so the same row lands in the same split on every
  * run, every engine, every cluster size; splits are disjoint and
  * exhaustive by construction. `df.sample()` (seeded per-partition
  * RNG) cannot give any of those guarantees under repartitioning.
  */
object Sampling {

  /** Rows whose stable hash lands in [lo, hi) of `den` buckets. */
  def hashBucketSample(df: DataFrame, idCol: String,
                       lo: Int, hi: Int, den: Int = 100): DataFrame =
    df.filter(bucket(idCol, den) >= lo && bucket(idCol, den) < hi)

  /** (train, test) split with `testPct`% in test — disjoint, stable. */
  def trainTestSplit(df: DataFrame, idCol: String,
                     testPct: Int): (DataFrame, DataFrame) = {
    require(testPct > 0 && testPct < 100)
    (hashBucketSample(df, idCol, testPct, 100),
      hashBucketSample(df, idCol, 0, testPct))
  }

  /** Stratified (per-group) deterministic sampling — domain mixing for
    * a training corpus: each group keeps `rates(group)` percent of its
    * rows (groups absent from `rates` keep `defaultPct`). Membership
    * is the same stable id hash as [[hashBucketSample]], so re-runs,
    * engines, and cluster sizes all agree, and a row's fate never
    * depends on which other rows exist. Pure map-side filter — no
    * shuffle, no per-group count pass.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, groupCol: String,
                           rates: Map[String, Int],
                           defaultPct: Int = 0): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (g, p)) =>
      when(col(groupCol) === lit(g), lit(p)).otherwise(acc)
    }
    df.filter(bucket(idCol, 100) < pct)
  }

  /** Per-group CAP (domain balancing): keep at most `cap` rows per
    * group — the "no domain may exceed N documents" rule of corpus
    * mixing — selecting the rows with the smallest stable id hashes,
    * so the kept subset is deterministic, engine-portable, and stable
    * under corpus growth (a group's survivors only change when a new
    * row hashes below its current cap-th hash).
    *
    * Scale shape: selection is the map-side-combinable bottom-k
    * aggregator ([[graft.functions.TopKAgg]] on the negated hash), NOT
    * a `row_number` window — a hot domain with billions of rows
    * reduces to `cap` rows per partition before the shuffle instead of
    * sorting the whole domain in one task. The hash is truncated to 52
    * bits so its double representation in the aggregator is EXACT
    * (56-bit values round in a 53-bit mantissa, which could reorder
    * near-equal hashes vs. the integer-ordering oracle).
    *
    * Output: (group, id, rank) with rank 1..cap by (hash, id).
    */
  def perGroupCap(df: DataFrame, groupCol: String, idCol: String,
                  cap: Int): DataFrame = {
    val h52 = HashFunctions.stableHash52(col(idCol).cast("string"))
    df.select(col(groupCol), col(idCol), h52.as("__h"))
      .groupBy(groupCol)
      .agg(graft.functions.TopKAgg.topK(cap)(col(idCol), -col("__h").cast("double"))
        .as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "nb")))
      .select(col(groupCol), col("nb._1").as(idCol), (col("pos") + 1).as("rank"))
  }

  /** Leakage-free train/test split: membership is decided by the
    * stable hash of each document's NEAR-DUP CLUSTER id
    * ([[Dedup.minhashClusters]]), not its own id — so a near-duplicate
    * pair can never straddle the split and leak training text into
    * evaluation (the failure mode of any per-row split on a
    * deduplicated-in-name-only corpus). Split fractions hold in
    * expectation over clusters; big clusters move as units, which is
    * the point.
    *
    * The no-straddle guarantee requires CONVERGED labels, so the
    * default runs label propagation to fixpoint — a component deeper
    * than the bounded hop+jump rounds would otherwise carry two
    * labels, which can hash to opposite sides. `toFixpoint = false`
    * trades that worst-case-depth guarantee for round-for-round SQL
    * replayability (the oracled query's form; equivalent wherever the
    * bounded rounds converge, which DedupSpec pins on the test
    * corpora).
    */
  def clusterAwareSplit(df: DataFrame, idCol: String, textCol: String,
                        testPct: Int, bands: Int = 2, rowsPerBand: Int = 4,
                        iterations: Int = 3,
                        toFixpoint: Boolean = true): DataFrame = {
    require(testPct > 0 && testPct < 100)
    Dedup.minhashClusters(df, idCol, textCol, bands, rowsPerBand, iterations,
      toFixpoint = toFixpoint)
      .select(col("doc_id"), col("cluster_id"),
        (HashFunctions.stableHash56(col("cluster_id").cast("string")) % 100 < testPct)
          .as("is_test"))
  }

  /** Temperature-scaled mixture sampling — the multilingual /
    * multi-domain data-mixing recipe (alpha = 0.5, i.e. square-root
    * scaling as in mBERT/XLM-R): each group's keep probability is
    * proportional to `sqrt(n_g) / n_g`, so head groups are downsampled
    * and tail groups boosted, normalized so the OVERALL expected keep
    * fraction is `num/den`. A group whose boosted probability exceeds
    * 1 keeps everything (no upsampling — this is a filter).
    *
    * Engine-portable determinism: per-row membership is the stable
    * 52-bit id hash against a per-group threshold, and the threshold
    * chain is built from exactly-agreed integers — weights are
    * `floor(sqrt(n) * 2^20)` BIGINTs (sqrt is correctly-rounded IEEE
    * in both engines, the 2^20 scale is an exact power-of-two
    * multiply), so their sums are order-independent, and the one
    * double division happens on identical operands in an identical
    * expression tree. NULL groups are real groups (null-safe join).
    *
    * Scale shape: one map-side-combinable count over the corpus, a
    * group-cardinality-sized probability frame BROADCAST back, one
    * filtered scan. No corpus shuffle at all.
    */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
                     num: Int, den: Int): DataFrame =
    df.join(broadcast(mixProbabilities(df, groupCol, num, den)),
        col(groupCol) <=> col("__g"))
      .filter(mixKeep(idCol, col("__p")))
      .drop("__g", "__p")

  /** The (group, keep-probability) frame behind [[temperatureMix]] —
    * group-cardinality-sized, broadcastable.
    */
  private def mixProbabilities(df: DataFrame, groupCol: String,
                               num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"fraction must be in (0,1]: $num/$den")
    val counts = df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double")) * lit(1048576.0)).cast("long"))
    // totals via an unpartitioned window over the group-cardinality
    // frame (bounded by construction) — a separate .agg would re-run
    // the corpus count scan a second time. Integer sums, so the
    // window's evaluation order cannot perturb them. (Constant
    // partition keys are stripped by the optimizer; the bounded-frame
    // allowlist is asserted in PlanAuditSpec.)
    val totWin = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    // identical expression tree to the oracle SQL:
    // least(1.0, ((num/den) * tn * w) / (tw * n))
    counts
      .withColumn("__tw", sum("__w").over(totWin))
      .withColumn("__tn", sum("__n").over(totWin))
      .select(col("__g"), least(lit(1.0),
        ((lit(num.toDouble) / lit(den.toDouble)) *
          col("__tn").cast("double") * col("__w").cast("double")) /
          (col("__tw").cast("double") * col("__n").cast("double"))).as("__p"))
  }

  private def mixKeep(idCol: String, p: Column): Column =
    HashFunctions.stableHash52(col(idCol).cast("string")).cast("double") <
      p * lit(4503599627370496.0) // 2^52: exact power-of-two scale

  /** Continuous-ingestion form of [[temperatureMix]]: the REFERENCE
    * corpus fixes the per-group keep thresholds, and each micro-batch
    * row is flagged against them — a stateless stream-static broadcast
    * join + per-row hash compare, so it runs under Structured Streaming
    * append mode with no state store at all (the same probe contract as
    * [[Dedup.streamingNearDupProbe]] / streamingChunkProbe: emit a
    * flag, let the sink decide). A group the reference has never seen
    * carries keep probability 1 — brand-new domains are all tail by
    * definition. Batch == streaming on the same prefix because
    * membership is a pure function of (id, reference counts);
    * StreamingSpec pins it.
    */
  def streamingMixProbe(stream: DataFrame, ref: DataFrame,
                        idCol: String, groupCol: String,
                        num: Int, den: Int): DataFrame = {
    // stream pin (NOT the batch LRU — four later batch registrations
    // would unpersist a live stream's static frame): the static side
    // of a stream-static join re-evaluates per trigger, so pinned the
    // reference count scan runs once instead of once per micro-batch
    // (the frame itself is group-cardinality-sized)
    val probs = Dedup.registerStreamPin(mixProbabilities(ref, groupCol, num, den))
    stream.join(broadcast(probs), col(groupCol) <=> col("__g"), "left")
      .select(col(idCol), col(groupCol),
        mixKeep(idCol, coalesce(col("__p"), lit(1.0))).as("is_kept"))
  }

  /** Token-budget corpus selection: walk the corpus in descending
    * (score, id) order and keep documents while the running token sum
    * stays within `budget` — "the best N tokens", the standard
    * quality-ranked cut for assembling a fixed-size training mix.
    * Greedy-prefix semantics: the first document that would overflow
    * the budget stops the cut (later smaller documents are NOT
    * back-filled — deterministic and engine-replayable, unlike
    * knapsack). Rows with NULL score or NULL tokens are not
    * selectable.
    *
    * Scale shape: a global sort is never materialized. Scores are
    * range-bucketed (`floor(score * buckets)`, an exact power-of-two
    * multiply at the default 1024), per-bucket token sums — one
    * map-side-combinable aggregate — give a buckets-sized cumulative
    * frame on which the budget boundary lands in EXACTLY ONE bucket
    * (the desc-cumulative intervals partition the token line): every
    * higher bucket is kept outright by a broadcast-join filter, every
    * lower bucket dropped, and only the one boundary bucket (≈1/buckets
    * of the corpus) pays a within-bucket running-sum window. The
    * window over the tiny bucket frame itself is single-partition by
    * construction (≤ `buckets` rows).
    *
    * Equivalence to the naive global window (`sum(tokens) OVER (ORDER
    * BY score DESC, id)`) holds because bucketing is monotone in
    * score; PipelineOpsSpec pins the two shapes equal row-for-row.
    * NaN scores are NOT selectable (filtered with NULLs): the global
    * window would rank NaN first — engines disagree on little else as
    * reliably as NaN — so the contract excludes it rather than
    * spending budget on unorderable rows.
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                        tokensCol: String, budget: Long,
                        buckets: Int = 1024): DataFrame = {
    require(budget >= 0 && buckets >= 1)
    import org.apache.spark.sql.expressions.Window
    // pinned: the scored frame feeds the per-bucket aggregate, the
    // fully-kept join side, and the boundary window — unpinned, the
    // (potentially regex-heavy) scoring lineage would run three times.
    // The clamp runs BEFORE the int cast: floor(score*buckets) on an
    // unbounded score (raw perplexity, token counts) overflows the int
    // narrowing and would wrap the BEST rows into bucket 0.
    val base = Dedup.registerPin(
      df.filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)) &&
          col(tokensCol).isNotNull)
        .select(col(idCol).as("__id"), col(scoreCol).as("__s"),
          col(tokensCol).cast("long").as("__t"))
        .withColumn("__b", least(lit(buckets - 1).cast("double"),
          greatest(lit(0.0), floor(col("__s") * lit(buckets)))).cast("int")))
    val perBucket = base.groupBy("__b").agg(sum("__t").as("__btoks"))
    // tokens in all STRICTLY HIGHER buckets — a ≤buckets-row frame;
    // the unpartitioned window is bounded by construction (allowlisted
    // in PlanAuditSpec's bounded-global-window assert)
    val above = perBucket.withColumn("__above",
      coalesce(sum(col("__btoks")).over(
        Window.orderBy(col("__b").desc).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val withCum = base.join(broadcast(above), "__b")
    val fullyKept = withCum.filter(col("__above") + col("__btoks") <= budget)
      .select(col("__id"), col("__t"))
    // exactly one bucket straddles the budget; only its docs pay the
    // within-bucket ordering
    val boundary = withCum
      .filter(col("__above") <= budget && col("__above") + col("__btoks") > budget)
      .withColumn("__cum", col("__above") + sum(col("__t")).over(
        Window.partitionBy("__b").orderBy(col("__s").desc, col("__id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__cum") <= budget)
      .select(col("__id"), col("__t"))
    fullyKept.unionByName(boundary)
      .select(col("__id").as(idCol), col("__t").as("n_tokens"))
  }

  /** Deterministic epoch shuffle — the training-ORDER operator: a
    * reproducible pseudo-random permutation of the corpus per epoch,
    * materialized as (shard, position) so a trainer streams shard
    * files in position order and two runs of the same epoch read
    * identical sequences. The permutation key is the seeded stable
    * hash `h = md5(seed:id)`, so changing the seed reshuffles
    * everything and changing nothing reshuffles nothing —
    * `df.orderBy(rand())` can guarantee neither.
    *
    * Scale shape: a GLOBAL shuffle order is exactly one distributed
    * sort, and this runs it as such — shard assignment is a map-side
    * `h % numShards`, and only the within-shard (h, id) sort pays a
    * shuffle, each shard sorting independently. Size `numShards` so a
    * shard fits a task (corpus/numShards rows); no global ordering is
    * ever materialized on one node.
    */
  def epochShuffle(df: DataFrame, idCol: String, seed: Int,
                   numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    import org.apache.spark.sql.expressions.Window
    df.select(col(idCol),
        HashFunctions.seededHash56(seed, col(idCol).cast("string")).as("__h"))
      .withColumn("shard", (col("__h") % numShards).cast("int"))
      .withColumn("position", row_number().over(
        Window.partitionBy("shard").orderBy(col("__h"), col(idCol))))
      .drop("__h")
  }

  /** Per-group quantile cut: keep each group's top `num/den` fraction
    * of rows by score — "the best 30% of every domain", the
    * group-relative form of [[tokenBudgetSelect]]'s global cut. Keep
    * count is `floor(n_g * num / den)` (exact integers, so both
    * engines agree on every group's cutoff), rank is (score DESC, id)
    * within the group. NULL/NaN scores are not selectable; a NULL
    * group is a real group.
    *
    * Scale shape: the same window-free bucketed selection as
    * [[tokenBudgetSelect]], generalized per group — per-(group,
    * score-bucket) counts (one map-side-combinable aggregate), a
    * groups×buckets cumulative frame broadcast back, and only each
    * group's single boundary bucket pays a within-bucket rank. A hot
    * domain with billions of rows never sorts: ~1/buckets of it ranks.
    * Equivalence to the per-group global window holds because
    * bucketing is monotone in score and the (score DESC, id)
    * tie-break is identical inside a bucket; PipelineOpsSpec pins the
    * shapes equal.
    */
  def quantileCut(df: DataFrame, idCol: String, scoreCol: String,
                  groupCol: String, num: Int, den: Int,
                  buckets: Int = 1024): DataFrame =
    quantileCutScored(df, idCol, scoreCol, groupCol, num, den, buckets)
      .select(col("__id").as(idCol), col("__g").as(groupCol))

  /** [[quantileCut]] with the score retained — (__id, __g, __s) — for
    * consumers that need the kept rows' scores (e.g. the per-group
    * threshold frame behind [[streamingQualityProbe]]).
    */
  private def quantileCutScored(df: DataFrame, idCol: String, scoreCol: String,
                                groupCol: String, num: Int, den: Int,
                                buckets: Int = 1024): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"fraction must be in (0,1]: $num/$den")
    import org.apache.spark.sql.expressions.Window
    // clamp BEFORE the int cast, as tokenBudgetSelect: an unbounded
    // score would overflow the narrowing and wrap the best rows down
    val base = Dedup.registerPin(
      df.filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)))
        .select(col(idCol).as("__id"), col(groupCol).as("__g"),
          col(scoreCol).as("__s"))
        .withColumn("__b", least(lit(buckets - 1).cast("double"),
          greatest(lit(0.0), floor(col("__s") * lit(buckets)))).cast("int")))
    val perBucket = base.groupBy("__g", "__b").agg(count(lit(1)).as("__c"))
      // rows in strictly higher buckets of the same group, and the
      // group's keep count — both over the groups×buckets frame
      // (bounded by construction), not the corpus
      .withColumn("__above", coalesce(sum(col("__c")).over(
        Window.partitionBy("__g").orderBy(col("__b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum(col("__c")).over(
        Window.partitionBy("__g").rowsBetween(Long.MinValue, Long.MaxValue)))
      .withColumn("__k", expr(s"(__tot * $num) DIV $den"))
    val joined = base.join(broadcast(perBucket.select(col("__g").as("__pg"),
        col("__b").as("__pb"), col("__c"), col("__above"), col("__k"))),
      col("__g") <=> col("__pg") && col("__b") === col("__pb"))
    val fullyKept = joined.filter(col("__above") + col("__c") <= col("__k"))
      .select(col("__id"), col("__g"), col("__s"))
    // exactly one bucket per group straddles its cutoff; only its rows
    // pay the within-bucket ordering
    val boundary = joined
      .filter(col("__above") < col("__k") && col("__above") + col("__c") > col("__k"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__g", "__b").orderBy(col("__s").desc, col("__id"))))
      .filter(col("__above") + col("__rk") <= col("__k"))
      .select(col("__id"), col("__g"), col("__s"))
    fullyKept.unionByName(boundary)
  }

  /** Exact-k deterministic uniform sample: the k rows with the
    * smallest seeded id hashes — "give me exactly 10k eval documents",
    * reproducible across engines, re-runs and cluster sizes, and
    * stable under corpus growth (a sampled row leaves only when a new
    * row hashes below the current k-th smallest hash). The same
    * membership family as [[hashBucketSample]], but COUNT-exact
    * instead of fraction-in-expectation — the difference that matters
    * when the deliverable is "exactly k", not "about 1%".
    *
    * Scale shape: the window-free bucketed selection of
    * [[quantileCut]], globalized. Hashes are uniform, so fixed-width
    * hash buckets are balanced: per-bucket counts (one combinable
    * aggregate producing ≤`buckets` rows), the cumulative frame
    * broadcast back, and ONLY the single bucket straddling the k-th
    * hash pays a within-bucket rank (~1/buckets of the corpus). Every
    * other row is a map-side keep/drop. No global sort, and no
    * TopKAgg buffer — its O(k) insert is for per-group caps, not a
    * k-in-the-millions global sample.
    *
    * NULL ids are excluded (a row the id hash cannot identify cannot
    * be deterministically sampled); ids are assumed unique — duplicate
    * ids share a hash, so a boundary falling between two copies would
    * be engine-order-dependent. k ≥ corpus keeps every row.
    */
  def exactKSample(df: DataFrame, idCol: String, k: Long,
                   seed: Int = 0, buckets: Int = 1024): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(buckets > 1, s"buckets must exceed 1, got $buckets")
    import org.apache.spark.sql.expressions.Window
    // integer DIV: 56-bit hashes exceed a double's 53-bit mantissa, so
    // float division could misbucket near-boundary hashes vs the oracle
    val width = (1L << 56) / buckets
    val base = Dedup.registerPin(
      df.filter(col(idCol).isNotNull)
        .select(col(idCol).as("__id"),
          HashFunctions.seededHash56(seed, col(idCol).cast("string")).as("__h"))
        .withColumn("__b",
          least(lit(buckets - 1L), expr(s"__h DIV $width")).cast("int")))
    val frame = base.groupBy("__b").agg(count(lit(1)).as("__c"))
      // the cumulative runs over the ≤buckets-row frame, not the corpus
      .withColumn("__above", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val joined = base.join(broadcast(frame.select(col("__b").as("__fb"),
        col("__c"), col("__above"))), col("__b") === col("__fb"))
    val fullyKept = joined.filter(col("__above") + col("__c") <= k)
      .select("__id")
    // at most one bucket straddles the k-th hash; only its rows rank
    val boundary = joined
      .filter(col("__above") < k && col("__above") + col("__c") > k)
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__b").orderBy(col("__h"), col("__id"))))
      .filter(col("__above") + col("__rk") <= k)
      .select("__id")
    fullyKept.unionByName(boundary).select(col("__id").as(idCol))
  }

  /** Continuous-ingestion form of [[quantileCut]]: the REFERENCE
    * corpus fixes each group's quality bar — the LOWEST score its
    * quantile cut keeps — and each micro-batch row is flagged against
    * it by a stateless stream-static broadcast join (the
    * [[streamingMixProbe]] contract: no state store, emit a flag, let
    * the sink decide). THRESHOLD semantics, deliberately: a new row
    * tying the reference boundary is kept, because a rank inside the
    * reference corpus is meaningless for a row that isn't in it.
    * Groups the reference never saw — or whose cut kept nothing
    * (floor(n·num/den) = 0) — have no defined bar and keep everything
    * with a valid score; NULL/NaN scores are never kept
    * ([[quantileCut]]'s unselectable contract).
    */
  def streamingQualityProbe(stream: DataFrame, ref: DataFrame,
                            idCol: String, scoreCol: String, groupCol: String,
                            num: Int, den: Int): DataFrame = {
    // stream pin (NOT the batch LRU — see streamingMixProbe): the
    // static side re-evaluates per trigger; the threshold frame is
    // group-cardinality-sized
    val thr = Dedup.registerStreamPin(
      quantileCutScored(ref, idCol, scoreCol, groupCol, num, den)
        .groupBy(col("__g")).agg(min(col("__s")).as("__thr")))
    stream.join(broadcast(thr), col(groupCol) <=> col("__g"), "left")
      .select(col(idCol), col(groupCol),
        (col(scoreCol).isNotNull && !isnan(col(scoreCol)) &&
          coalesce(col(scoreCol) >= col("__thr"), lit(true))).as("is_kept"))
  }

  /** Repetition-based upsampling mix — the other half of corpus
    * balancing: [[temperatureMix]] can only FILTER (downsample); a
    * training mix that wants tail domains seen as often as the head
    * REPEATS them. Each group's rows are emitted `rep_g =
    * min(maxRepeat, ceil(max_n / n_g))` times (head group once, a
    * group 1/3 the size three times), tagged (id, group, rep_no) so
    * the trainer can salt each repetition's shuffle position. Exact
    * integer arithmetic throughout — both engines agree on every
    * factor. `maxRepeat` caps tiny groups: repeating a 40-row domain
    * 10⁶× is a bug, not balance.
    *
    * Scale shape: one map-side-combinable count, a group-cardinality
    * factor frame broadcast back, and a map-side `explode(sequence)`
    * — zero corpus shuffle, like [[temperatureMix]].
    */
  def upsampleMix(df: DataFrame, idCol: String, groupCol: String,
                  maxRepeat: Int): DataFrame = {
    require(maxRepeat >= 1, s"maxRepeat must be >= 1, got $maxRepeat")
    import org.apache.spark.sql.expressions.Window
    val totWin = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    // max over the group-cardinality frame via window, not a second
    // agg — the corpus count scan must run once (temperatureMix rule)
    val factors = df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__mx", max(col("__n")).over(totWin))
      .select(col("__g"),
        expr(s"cast(least($maxRepeat, (__mx + __n - 1) DIV __n) as int)").as("__rep"))
    df.join(broadcast(factors), col(groupCol) <=> col("__g"))
      .select(col(idCol), col(groupCol),
        explode(sequence(lit(0), col("__rep") - 1)).as("rep_no"))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * the k rows with the largest key u^(1/w) — equivalently the
    * largest ln(u)/w — where u is the row's stable 52-bit id hash
    * mapped to (0, 1] and w the weight column. Inclusion probability
    * is proportional to weight, membership depends only on the row id
    * (deterministic, engine-portable), and the k winners are a single
    * pass — the weighted complement of [[hashBucketSample]].
    *
    * Determinism note: the key itself involves ln(), whose last ulp
    * may differ between libm implementations — but md5-derived keys of
    * distinct rows are separated by far more than a ulp (expected
    * nearest-key gap ~1/n² of the key range vs ~1e-16 relative libm
    * spread), and the order is tie-broken by id, so the selected SET
    * is stable across engines. The emitted columns (id, weight, u) are
    * all exact — no float from the key ever reaches the output.
    *
    * Scale shape: top-k by sort key is TakeOrderedAndProject — a
    * map-side partial top-k per partition, combinable, never a global
    * sort.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val h = HashFunctions.stableHash52(col(idCol).cast("string"))
    val u = (h.cast("double") + 1.0) / 4503599627370496.0 // 2^52, exact
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__u", u)
      .withColumn("__key", log(col("__u")) / col(weightCol))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col(weightCol).as("weight"), col("__u").as("u"))
  }

  private def bucket(idCol: String, den: Int) =
    HashFunctions.stableHash56(col(idCol).cast("string")) % den

  /** Quota rebalancing to EQUAL group shares — the "flatten the
    * source mix" selector beside [[temperatureMix]] (which reweights
    * smoothly) and [[perGroupCap]] (which caps absolutely): each
    * group's quota is its equal share of the total,
    * floor(N / k_groups), clipped to what the group actually has;
    * within a group the quota's seeded-hash-smallest ids win (the
    * [[exactKSample]] selection rule, so membership is a pure
    * function of (seed, id) and adding a NEW group never reshuffles
    * an old group's kept set beyond the quota change). Groups smaller
    * than the quota keep everything — the deterministic
    * reproducible-corpus contract. Output per group:
    * (g, n_before, quota, n_kept).
    */
  def quotaRebalance(df: DataFrame, groupCol: String, idCol: String,
                     seed: Int): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).as("g"), col(idCol).as("id"))
    val sizes = base.groupBy("g").agg(count(lit(1)).as("n_before"))
    val quota = sizes.agg(count(lit(1)).as("k_groups"), sum("n_before").as("n"))
      .select(graft.functions.TimeFunctions.truncDiv(col("n"), col("k_groups"))
        .as("quota"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("__h").asc, col("id").asc)
    val kept = base
      .withColumn("__h", HashFunctions.stableHash52(
        concat(lit(s"quota:$seed:"), col("id").cast("string"))))
      .withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(quota))
      .filter(col("__rn") <= col("quota"))
      // the id sum pins WHICH rows were kept, not just how many — a
      // selection-rule regression cannot hide behind a correct count
      .groupBy("g").agg(count(lit(1)).as("n_kept"),
        sum(col("id").cast("long")).as("kept_id_sum"))
    sizes.join(kept, Seq("g"), "left")
      .na.fill(0L, Seq("n_kept", "kept_id_sum"))
      .crossJoin(broadcast(quota))
      .select(col("g"), col("n_before"), col("quota"), col("n_kept"),
        col("kept_id_sum"))
  }

  /** Curriculum interleave — a deterministic global training ORDER
    * that is (a) sorted easy→hard WITHIN each group and (b)
    * round-robin ACROSS groups, without ever running a global sort:
    * position = (rank_g − 1)·n_groups + index_g, where rank_g is the
    * within-group rank by (difficulty ASC, id ASC) (one group-keyed
    * window) and index_g is the group's position in the sorted group
    * list (a broadcast dim). Emits the per-group summary with a
    * position⊗id checksum that pins the WHOLE assignment (the
    * quotaRebalance kept-id-sum convention) — any swap anywhere
    * changes it. Output: (group, grp_index, n_rows, first_pos,
    * last_pos, pos_id_checksum).
    */
  def curriculumInterleave(df: DataFrame, groupCol: String, idCol: String,
                           difficultyCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
        difficultyCol.cast("long").as("d"))
      .filter(col("g").isNotNull && col("id").isNotNull && col("d").isNotNull)
    val dims = base.select("g").distinct()
      .withColumn("grp_index", row_number().over(
        Window.orderBy("g")).cast("long"))
    val nG = dims.agg(count(lit(1)).as("n_groups"))
    val ranked = base.withColumn("rank_g", row_number().over(
        Window.partitionBy("g").orderBy(col("d"), col("id"))).cast("long"))
      .join(broadcast(dims), "g")
      .crossJoin(broadcast(nG))
      .withColumn("position",
        (col("rank_g") - 1) * col("n_groups") + col("grp_index"))
    ranked.groupBy(col("g").as(groupCol))
      .agg(max("grp_index").as("grp_index"), count(lit(1)).as("n_rows"),
        min("position").as("first_pos"), max("position").as("last_pos"),
        coalesce(sum((col("position").cast(dec) * pmod(col("id"), lit(1000003L)))
          .cast(dec)), lit(0).cast(dec)).cast(dec).as("__ck"))
      .select(col(groupCol), col("grp_index"), col("n_rows"), col("first_pos"),
        col("last_pos"),
        graft.operators.Stats.guardedLong("__ck", "curriculumInterleave")
          .as("pos_id_checksum"))
  }

}
