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
    * The cell spine is the FULL marginal cross product, so an
    * unobserved (a, b) combination still emits its row with o = 0 —
    * its contribution (0−e)²/e = e is part of the statistic, and
    * dropping it would underestimate χ² on sparse tables.
    *
    * Scale shape: the only fact-sized work is the combinable
    * (a, b) count; marginals reduce the cell table (broadcast-sized)
    * and the |A|·|B| spine is a broadcast nested-loop of two
    * broadcast-sized marginal tables. Exactness bound: |o·n − rt·ct|
    * ≤ n² must stay within 2^53 for the double path and `rt·ct·10⁶`
    * within int64 — holds through n ≈ 3·10⁶ rows per test, far past
    * any per-experiment cohort; shard bigger tests by experiment id.
    * The denominator n·rt·ct is formed in DOUBLE (each factor ≤ n is
    * exactly representable; the int64 product would wrap at skewed
    * marginals long before the double path loses anything).
    */
  def chiSquareCells(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("a").agg(sum("o").as("rt"))
    val colTot = cells.groupBy("b").agg(sum("o").as("ct"))
    val grand = cells.agg(sum("o").as("n"))
    val d = col("o") * col("n") - col("rt") * col("ct")
    def dd(c: Column) = c.cast("double")
    rowTot.crossJoin(broadcast(colTot))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(grand))
      .withColumn("e_micro", expr("rt * ct * 1000000L div n"))
      .withColumn("contrib",
        (d.cast("double") * d.cast("double")) /
          (dd(col("n")) * dd(col("rt")) * dd(col("ct"))))
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

  /** Exact Pearson correlation matrix over k integer-valued columns in
    * ONE fact scan: every Σx, Σx² and pairwise Σxy is an exact int64
    * sum from a single combinable global aggregation (k²/2 + 2k sums,
    * map-side partial), and the correlation itself is the textbook
    *   (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))
    * evaluated as a FIXED double expression over those exact integers
    * — IEEE multiply/divide/sqrt are correctly rounded, so identical
    * integer inputs give bit-identical doubles on any engine; only
    * float SUMMATION order drifts, and no float is ever summed here.
    *
    * Rows with a NULL in ANY listed column are dropped (complete-case
    * — one shared n keeps the matrix positive-semidefinite). Output:
    * one row per unordered pair in input order, carrying the shared n,
    * both moment sums, Σxy, and `corr` (NULL when a side is constant —
    * zero variance has no correlation, not a 0.0 one).
    *
    * Exactness bound (documented, same discipline as
    * [[chiSquareCells]]): each int64 SUM must stay ≤ 2^53 so its
    * double conversion is exact — values scaled to ≤10⁴ hold through
    * ~9·10⁷ rows per scan (Σx² ≤ n·v² ≤ 2^53); rescale coarser or
    * shard wider scans. The n·Σ products round in double on both engines
    * identically, so they carry no cross-engine bound.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.map(_._1).distinct.size == cols.size, "duplicate column name")
    val named = df.select(cols.map { case (n, c) => c.cast("long").as(n) }: _*)
      .na.drop("any")
    val aggs =
      cols.map { case (n, _) => sum(col(n)).as(s"__s_$n") } ++
      cols.map { case (n, _) => sum(col(n) * col(n)).as(s"__q_$n") } ++
      cols.combinations(2).map { case Seq((a, _), (b, _)) =>
        sum(col(a) * col(b)).as(s"__p_${a}_$b") }.toSeq
    // one row; eagerly materialized so the per-pair projections below
    // share ONE fact scan instead of re-deriving the aggregation each
    val m = named.agg(count(lit(1)).as("n"), aggs: _*).localCheckpoint(true)
    // n·Σ products can exceed int64 — they are formed in DOUBLE from
    // the exact int64 sums (correctly-rounded multiply: deterministic
    // on any engine; an int64 product would overflow differently per
    // engine — DuckDB throws, Spark wraps)
    def d(c: Column) = c.cast("double")
    cols.combinations(2).map { case Seq((a, _), (b, _)) =>
      val va = d(col("n")) * d(col(s"__q_$a")) - d(col(s"__s_$a")) * d(col(s"__s_$a"))
      val vb = d(col("n")) * d(col(s"__q_$b")) - d(col(s"__s_$b")) * d(col(s"__s_$b"))
      val cov = d(col("n")) * d(col(s"__p_${a}_$b")) - d(col(s"__s_$a")) * d(col(s"__s_$b"))
      m.select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
        col(s"__s_$a").as("sum_a"), col(s"__s_$b").as("sum_b"),
        col(s"__q_$a").as("sumsq_a"), col(s"__q_$b").as("sumsq_b"),
        col(s"__p_${a}_$b").as("sum_ab"),
        when(va > 0 && vb > 0, cov / (sqrt(va) * sqrt(vb))).as("corr"))
    }.reduce(_.unionByName(_))
  }

  /** Benford first-significant-digit audit: the observed count of each
    * leading digit 1–9 against the Benford expectation — the classic
    * fabricated-numbers screen for financial and measurement columns.
    * The expectation log₁₀(1+1/d) is irrational, so it ships as NINE
    * INTEGER CONSTANTS in micro-units (they sum to exactly 10⁶),
    * making every output column exact integer arithmetic: expected
    * counts in micro-row units (`n·C_d`) and the signed deviation
    * `n_d·10⁶ − n·C_d` — no engine-side log, no float anywhere.
    *
    * Scale shape: leading-digit extraction is per-row arithmetic
    * (repeated div-by-10 via floor(log10) would need a float — instead
    * the digit comes from string truncation of the integer part, exact
    * for any magnitude) and the reduction is one combinable 9-group
    * count. Values < 1 or NULL are excluded (no leading digit). Output
    * is always all NINE digits (a digit nobody used carries n_d = 0
    * and its full negative deviation), except on empty input → empty.
    * Exactness bound: n·10⁶ within int64 → n ≤ 9·10¹². */
  def benfordDigits(df: DataFrame, valueCol: Column): DataFrame = {
    val micro = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    val expect = map(micro.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(i + 1L), lit(c)) }: _*)
    // ≤9 rows, eagerly materialized: the grand total below reuses it
    // instead of re-deriving the digit counts (a second fact scan)
    val d = df.select(floor(valueCol).cast("long").as("v"))
      .filter(col("v") >= 1)
      .select(substring(col("v").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_d"))
      .localCheckpoint(true)
    // full 1..9 spine: a digit with ZERO observations still owes its
    // row — its deviation −n·C_d is evidence, not absence (empty
    // input stays empty: the NULL-total filter drops the spine)
    val spine = d.agg(sum("n_d").as("n"))
      .filter(col("n").isNotNull)
      .select(explode(sequence(lit(1L), lit(9L))).as("digit"), col("n"))
    spine.join(d, Seq("digit"), "left")
      .withColumn("n_d", coalesce(col("n_d"), lit(0L)))
      .withColumn("expected_micro", col("n") * expect(col("digit")))
      .withColumn("dev_micro", col("n_d") * lit(1000000L) - col("expected_micro"))
      .select("digit", "n_d", "n", "expected_micro", "dev_micro")
  }

  /** k-anonymity audit over a quasi-identifier column set — the
    * privacy/data-governance gate before a dataset ships: every
    * distinct quasi-identifier combination with its group size, an
    * `at_risk` flag for combinations smaller than `k` (those records
    * are re-identifiable by the quasi-identifiers alone), and the
    * global exposure totals (distinct at-risk combinations, records
    * inside them) repeated from a one-row broadcast so the report is
    * self-contained. NULL quasi-values form their own group (SQL GROUP
    * BY semantics on both engines) — absent is itself an identifier.
    *
    * Scale shape: ONE combinable aggregation over the facts into
    * combination-cardinality rows; the exposure totals fold from that
    * table (never a second fact pass) and broadcast back.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, s"need quasi columns and k >= 2, got $k")
    val combos = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
      .localCheckpoint(true) // the exposure totals reuse it
    val tot = combos.agg(
      sum(when(col("at_risk"), 1L).otherwise(0L)).as("combos_at_risk"),
      sum(when(col("at_risk"), col("n")).otherwise(0L)).as("records_at_risk"))
    combos.crossJoin(broadcast(tot))
  }

  /** CUPED variance-reduced A/B means (Deng et al. 2013, "Improving
    * the Sensitivity of Online Controlled Experiments"): each unit's
    * metric Y is adjusted by its PRE-EXPERIMENT covariate X,
    * `Ŷ = Y − θ·(X − E[X])` with `θ = cov(X,Y)/var(X)` pooled across
    * arms — the industry-standard way to shrink experiment confidence
    * intervals without touching the treatment effect (E[Ŷ] = E[Y]
    * because θ·E[X − E[X]] = 0).
    *
    * Exactness: unit-level (x, y) must be integers; θ and the adjusted
    * means are fixed double expressions over the exact pooled int64
    * moments (n·Σ products formed in double — the
    * [[correlationMatrix]] overflow rule). Per arm the output carries
    * the exact n/Σx/Σy plus raw_mean, and
    * `adj_mean = raw_mean − θ·(mean_x − grand_mean_x)` with every
    * operand deterministic. Zero covariate variance → θ undefined →
    * adj_mean NULL (a constant covariate cannot adjust anything).
    *
    * Scale shape: one combinable unit-level aggregation (the caller
    * builds units), one one-row pooled-moment aggregate broadcast
    * back, one arm-level combinable aggregation. Nothing fact-sized
    * shuffles twice.
    */
  def cupedMeans(units: DataFrame, armCol: Column, xCol: Column,
                 yCol: Column): DataFrame = {
    val base = units.select(armCol.as("arm"), xCol.cast("long").as("x"),
        yCol.cast("long").as("y"))
      .filter(col("arm").isNotNull && col("x").isNotNull && col("y").isNotNull)
      .localCheckpoint(true) // pooled and per-arm aggs share one pass
    def d(c: Column) = c.cast("double")
    val pooled = base.agg(count(lit(1)).as("np"), sum("x").as("sxp"),
      sum("y").as("syp"), sum(col("x") * col("x")).as("sxxp"),
      sum(col("x") * col("y")).as("sxyp"))
    val arms = base.groupBy("arm").agg(count(lit(1)).as("n"),
      sum("x").as("sum_x"), sum("y").as("sum_y"))
    val vx = d(col("np")) * d(col("sxxp")) - d(col("sxp")) * d(col("sxp"))
    val cov = d(col("np")) * d(col("sxyp")) - d(col("sxp")) * d(col("syp"))
    arms.crossJoin(broadcast(pooled))
      .withColumn("theta", when(vx > 0, cov / vx))
      .withColumn("raw_mean", d(col("sum_y")) / d(col("n")))
      .withColumn("adj_mean", col("raw_mean") -
        col("theta") * (d(col("sum_x")) / d(col("n")) - d(col("sxp")) / d(col("np"))))
      .select("arm", "n", "sum_x", "sum_y", "theta", "raw_mean", "adj_mean")
  }

  /** Welch's unequal-variance two-sample t statistic over unit-level
    * integer metrics — the A/B significance primitive: per arm the
    * exact int64 (n, Σy, Σy²), then
    *
    *   t  = (m₁ − m₀) / √(v₁/n₁ + v₀/n₀)
    *   df = (v₁/n₁ + v₀/n₀)² / ((v₁/n₁)²/(n₁−1) + (v₀/n₀)²/(n₀−1))
    *
    * with vᵢ the unbiased sample variance `(nΣy² − (Σy)²)/(n(n−1))` —
    * every float a fixed expression over exact integers. Output is ONE
    * row carrying both arms' exact moments beside t and df, so a
    * downstream consumer re-derives anything (CIs, p-values against
    * its own t-table) from the integers. Arms are the two DISTINCT
    * values of `armCol` ordered ascending (arm₀ = lower); requires
    * exactly 2 arms with ≥2 units each, else a named error.
    *
    * Scale shape: one combinable unit aggregation into two rows, then
    * a two-row pivot — nothing else touches the units.
    */
  def welchTTest(units: DataFrame, armCol: Column, yCol: Column): DataFrame = {
    val base = units.select(armCol.as("arm"), yCol.cast("long").as("y"))
      .filter(col("arm").isNotNull && col("y").isNotNull)
    val arms = base.groupBy("arm").agg(count(lit(1)).as("n"),
      sum("y").as("s"), sum(col("y") * col("y")).as("q"))
      .localCheckpoint(true) // tiny; guards + pivot reuse it
    val got = arms.count()
    require(got == 2, s"welchTTest needs exactly 2 arms, got $got")
    require(arms.filter(col("n") < 2).isEmpty,
      "welchTTest needs >= 2 units per arm")
    def d(c: Column) = c.cast("double")
    // two-row pivot via conditional aggregation against the min arm
    val piv = arms.crossJoin(broadcast(arms.agg(min(col("arm")).as("__lo"))))
      .groupBy()
      .agg(
        max(when(col("arm") === col("__lo"), col("arm"))).as("arm0"),
        max(when(col("arm") =!= col("__lo"), col("arm"))).as("arm1"),
        max(when(col("arm") === col("__lo"), col("n"))).as("n0"),
        max(when(col("arm") =!= col("__lo"), col("n"))).as("n1"),
        max(when(col("arm") === col("__lo"), col("s"))).as("sum0"),
        max(when(col("arm") =!= col("__lo"), col("s"))).as("sum1"),
        max(when(col("arm") === col("__lo"), col("q"))).as("sumsq0"),
        max(when(col("arm") =!= col("__lo"), col("q"))).as("sumsq1"))
    def v(n: Column, s: Column, q: Column) =
      (d(n) * d(q) - d(s) * d(s)) / (d(n) * (d(n) - lit(1.0)))
    val v0 = v(col("n0"), col("sum0"), col("sumsq0")) / d(col("n0"))
    val v1 = v(col("n1"), col("sum1"), col("sumsq1")) / d(col("n1"))
    piv
      .withColumn("mean_diff", d(col("sum1")) / d(col("n1")) - d(col("sum0")) / d(col("n0")))
      .withColumn("se2", v1 + v0)
      .withColumn("t_stat", when(col("se2") > 0, col("mean_diff") / sqrt(col("se2"))))
      .withColumn("welch_df", when(col("se2") > 0,
        col("se2") * col("se2") /
          (v1 * v1 / (d(col("n1")) - lit(1.0)) + v0 * v0 / (d(col("n0")) - lit(1.0)))))
      .select("arm0", "arm1", "n0", "n1", "sum0", "sum1", "sumsq0", "sumsq1",
        "mean_diff", "t_stat", "welch_df")
  }

  /** Two-proportion z-test — the conversion-rate significance
    * primitive ([[welchTTest]] covers means; rates get the pooled
    * z): per arm the exact (n, conversions), then
    *
    *   z = (p₁ − p₀) / √(p̂(1−p̂)(1/n₀ + 1/n₁)),  p̂ pooled
    *
    * every float a fixed expression over exact int64s, the one output
    * row carrying the integers so a consumer re-derives CIs itself.
    * Degenerate pools (p̂ of 0 or 1 — zero variance) report NULL z.
    * Requires exactly 2 arms with ≥1 unit each, else a named error.
    * Scale shape: one combinable unit aggregation into two rows, then
    * the two-row pivot.
    */
  def propZTest(units: DataFrame, armCol: Column, convCol: Column): DataFrame = {
    val base = units.select(armCol.as("arm"), convCol.cast("boolean").as("c"))
      .filter(col("arm").isNotNull && col("c").isNotNull)
    val arms = base.groupBy("arm").agg(count(lit(1)).as("n"),
      sum(when(col("c"), 1L).otherwise(0L)).as("conv"))
      .localCheckpoint(true)
    val got = arms.count()
    require(got == 2, s"propZTest needs exactly 2 arms, got $got")
    def d(c: Column) = c.cast("double")
    val piv = arms.crossJoin(broadcast(arms.agg(min(col("arm")).as("__lo"))))
      .groupBy()
      .agg(
        max(when(col("arm") === col("__lo"), col("arm"))).as("arm0"),
        max(when(col("arm") =!= col("__lo"), col("arm"))).as("arm1"),
        max(when(col("arm") === col("__lo"), col("n"))).as("n0"),
        max(when(col("arm") =!= col("__lo"), col("n"))).as("n1"),
        max(when(col("arm") === col("__lo"), col("conv"))).as("conv0"),
        max(when(col("arm") =!= col("__lo"), col("conv"))).as("conv1"))
    val p0 = d(col("conv0")) / d(col("n0"))
    val p1 = d(col("conv1")) / d(col("n1"))
    val phat = d(col("conv0") + col("conv1")) / d(col("n0") + col("n1"))
    val se2 = phat * (lit(1.0) - phat) * (lit(1.0) / d(col("n0")) + lit(1.0) / d(col("n1")))
    piv
      .withColumn("rate0", p0).withColumn("rate1", p1)
      .withColumn("rate_diff", p1 - p0)
      .withColumn("z", when(se2 > 0, (p1 - p0) / sqrt(se2)))
      .select("arm0", "arm1", "n0", "n1", "conv0", "conv1",
        "rate0", "rate1", "rate_diff", "z")
  }

  /** Difference-in-differences estimator over unit-period integer
    * metrics — the quasi-experimental effect size when treatment
    * wasn't randomized: with arms t (treated = the HIGHER arm value)
    * and c, `did = (m_t_post − m_t_pre) − (m_c_post − m_c_pre)`, which
    * cancels both the arms' level difference and the common time
    * trend. One output row carries all four cells' exact int64
    * (n, Σy) beside the four means and the estimate — every float a
    * fixed expression over exact integers. Requires exactly 2 arms and
    * at least one unit in each (arm, period) cell, else a named error.
    *
    * Scale shape: one combinable (arm, post) aggregation into four
    * rows, then a four-row pivot; nothing else touches units.
    */
  def diffInDiff(units: DataFrame, armCol: Column, postCol: Column,
                 yCol: Column): DataFrame = {
    val base = units.select(armCol.as("arm"), postCol.cast("boolean").as("post"),
        yCol.cast("long").as("y"))
      .filter(col("arm").isNotNull && col("post").isNotNull && col("y").isNotNull)
    val cells = base.groupBy("arm", "post")
      .agg(count(lit(1)).as("n"), sum("y").as("s"))
      .localCheckpoint(true) // four rows; guard + pivot reuse
    val arms = cells.select("arm").distinct().count()
    require(arms == 2, s"diffInDiff needs exactly 2 arms, got $arms")
    require(cells.count() == 4, "diffInDiff needs units in all four (arm, period) cells")
    def d(c: Column) = c.cast("double")
    def cell(treated: Boolean, post: Boolean, c: String) = {
      val armPick = if (treated) col("arm") =!= col("__lo") else col("arm") === col("__lo")
      max(when(armPick && col("post") === post, col(c)))
    }
    val piv = cells.crossJoin(broadcast(cells.agg(min(col("arm")).as("__lo"))))
      .groupBy()
      .agg(
        max(when(col("arm") === col("__lo"), col("arm"))).as("arm_c"),
        max(when(col("arm") =!= col("__lo"), col("arm"))).as("arm_t"),
        cell(false, false, "n").as("n_c_pre"), cell(false, false, "s").as("sum_c_pre"),
        cell(false, true, "n").as("n_c_post"), cell(false, true, "s").as("sum_c_post"),
        cell(true, false, "n").as("n_t_pre"), cell(true, false, "s").as("sum_t_pre"),
        cell(true, true, "n").as("n_t_post"), cell(true, true, "s").as("sum_t_post"))
    def m(s: String, n: String) = d(col(s)) / d(col(n))
    piv
      .withColumn("m_c_pre", m("sum_c_pre", "n_c_pre"))
      .withColumn("m_c_post", m("sum_c_post", "n_c_post"))
      .withColumn("m_t_pre", m("sum_t_pre", "n_t_pre"))
      .withColumn("m_t_post", m("sum_t_post", "n_t_post"))
      .withColumn("did", (col("m_t_post") - col("m_t_pre")) -
        (col("m_c_post") - col("m_c_pre")))
      .select("arm_c", "arm_t", "n_c_pre", "n_c_post", "n_t_pre", "n_t_post",
        "sum_c_pre", "sum_c_post", "sum_t_pre", "sum_t_post",
        "m_c_pre", "m_c_post", "m_t_pre", "m_t_post", "did")
  }

  /** Per-group simple ordinary-least-squares fit y ~ a + b·x from
    * EXACT int64 moment sums — the per-segment trend/elasticity
    * estimator, computed the [[correlationMatrix]] way: one combinable
    * fact aggregation produces (n, Σx, Σy, Σx², Σxy, Σy²) exactly;
    * slope, intercept and R² are fixed double expressions over those
    * integers (correctly-rounded IEEE multiply/divide — bit-identical
    * on any engine), with the n·Σ cross-products formed in DOUBLE
    * because an int64 product would overflow differently per engine.
    *
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n
    *   r2 = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    *
    * Zero-variance x → NULL slope/intercept/r2 (no fit exists);
    * zero-variance y with varying x → slope 0, r2 NULL (convention:
    * 0/0). Complete-case rows only. Exactness bound as
    * [[correlationMatrix]]: values ≤10⁴ keep every Σ within 2^53
    * through ~9·10⁷ rows PER GROUP.
    */
  def olsPerGroup(df: DataFrame, groupCol: Column, xCol: Column,
                  yCol: Column): DataFrame = {
    val base = df.select(groupCol.as("g"), xCol.cast("long").as("x"),
        yCol.cast("long").as("y"))
      .filter(col("g").isNotNull && col("x").isNotNull && col("y").isNotNull)
    val m = base.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum("x").as("sum_x"), sum("y").as("sum_y"),
      sum(col("x") * col("x")).as("sum_xx"),
      sum(col("x") * col("y")).as("sum_xy"),
      sum(col("y") * col("y")).as("sum_yy"))
    def d(c: Column) = c.cast("double")
    val vx = d(col("n")) * d(col("sum_xx")) - d(col("sum_x")) * d(col("sum_x"))
    val vy = d(col("n")) * d(col("sum_yy")) - d(col("sum_y")) * d(col("sum_y"))
    val cov = d(col("n")) * d(col("sum_xy")) - d(col("sum_x")) * d(col("sum_y"))
    m.withColumn("slope", when(vx > 0, cov / vx))
      .withColumn("intercept",
        when(vx > 0, (d(col("sum_y")) - col("slope") * d(col("sum_x"))) / d(col("n"))))
      .withColumn("r2", when(vx > 0 && vy > 0, (cov / vx) * (cov / vy)))
      .select("g", "n", "sum_x", "sum_y", "sum_xx", "sum_xy", "sum_yy",
        "slope", "intercept", "r2")
  }

  /** Calibration / reliability table of an INTEGER score against a
    * boolean label: equal-width bins over the observed [min, max]
    * assigned by pure int64 arithmetic
    * `bin = min(nBins−1, (s − mn)·nBins div (mx − mn + 1))` — no float
    * ever decides membership, so binning replays exactly on any
    * engine (the classic float-binning failure is a boundary score
    * landing in different bins per engine). Per bin: row count,
    * positive count, exact score sum, the bin's value bounds, and the
    * two diagnostic rates (observed positive rate, mean score) as one
    * IEEE division each — what a reliability diagram plots to decide
    * whether a quality classifier's scores can be thresholded as
    * probabilities.
    *
    * Scale shape: ONE combinable fact aggregation keyed by the bin id
    * after a broadcast join of the one-row (mn, mx) bounds; output is
    * exactly nBins rows — an empty bin (including bins structurally
    * unreachable when the value range spans fewer than nBins integers)
    * carries zero counts and NULL rates instead of vanishing from the
    * reliability table. Empty input → empty output. Degenerate
    * all-one-score input lands in bin 0.
    */
  def calibrationBins(df: DataFrame, scoreCol: Column, labelCol: Column,
                      nBins: Int): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    val base = df.select(scoreCol.cast("long").as("s"),
        labelCol.cast("boolean").as("pos"))
      .filter(col("s").isNotNull && col("pos").isNotNull)
    val bounds = base.agg(min("s").as("mn"), max("s").as("mx"))
    val agg = base.crossJoin(broadcast(bounds))
      .withColumn("bin", least(lit(nBins - 1L),
        expr(s"(s - mn) * $nBins div (mx - mn + 1)")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("s")).as("sum_score"))
    val spine = bounds.filter(col("mn").isNotNull)
      .select(explode(sequence(lit(0L), lit(nBins - 1L))).as("bin"),
        col("mn"), col("mx"))
    spine.join(agg, Seq("bin"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("n_pos", coalesce(col("n_pos"), lit(0L)))
      .withColumn("sum_score", coalesce(col("sum_score"), lit(0L)))
      .withColumn("bin_lo", col("mn") + expr(s"bin * (mx - mn + 1) div $nBins"))
      .withColumn("bin_hi", col("mn") + expr(s"(bin + 1) * (mx - mn + 1) div $nBins") - 1)
      .withColumn("pos_rate", when(col("n") > 0,
        col("n_pos").cast("double") / col("n").cast("double")))
      .withColumn("mean_score", when(col("n") > 0,
        col("sum_score").cast("double") / col("n").cast("double")))
      .select("bin", "bin_lo", "bin_hi", "n", "n_pos", "sum_score",
        "pos_rate", "mean_score")
  }

  /** Per-group winsorized AND trimmed robust statistics over an
    * integer measure, exactly — the outlier-taming prep step
    * (clip-at-percentile) for training targets and metrics. Bounds
    * are the DISCRETE percentiles (k-th smallest member value,
    * k = ceil(p·n) — an actual member, never an interpolated float),
    * so clipping stays in int64 and both means are one exact sum into
    * one final IEEE division. The percentiles arrive as RATIONALS
    * (pLoNum/pDen, pHiNum/pDen) and k is the integer ceiling division
    * `(pNum·n + pDen − 1) div pDen` — a float ceil(p·n) can land one
    * rank past the exact cutoff when the double product rounds just
    * above an integer (0.07·100 → 7.000000000000001 → ceil 8), so no
    * float ever decides a rank. Ties need no tiebreak: the k-th
    * smallest VALUE of a multiset and the sum over sorted positions
    * [kLo, kHi] are deterministic however equal values are ordered.
    *
    * One pass, no clip-join: the winsorized sum has the closed form
    *   trim_sum + (kLo−1)·lo + (n−kHi)·hi
    * (every value below position kLo clips to lo, above kHi to hi),
    * so ONE per-group window (row_number + count on the same
    * partition) and ONE combinable aggregation produce everything —
    * no second fact scan to apply the bounds.
    *
    * Scale shape: the window partitions by group and orders one
    * group's rows (the [[Analytics]] per-group discipline, never a
    * global sort); everything after is hash aggregation. Output:
    * (group, n, lo, hi, trim_n, trim_sum, wins_sum, trim_mean,
    * wins_mean).
    */
  def winsorizedStats(df: DataFrame, groupCol: Column, valueCol: Column,
                      pLoNum: Int, pHiNum: Int, pDen: Int): DataFrame = {
    require(pDen >= 1 && 0 <= pLoNum && pLoNum < pHiNum && pHiNum <= pDen,
      s"need 0 <= pLoNum < pHiNum <= pDen >= 1, got ($pLoNum, $pHiNum, $pDen)")
    val base = df.select(groupCol.as("g"), valueCol.cast("long").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)
    val byV = Window.partitionBy("g").orderBy("v")
    val whole = Window.partitionBy("g")
    val t = base
      .withColumn("rnk", row_number().over(byV))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("kLo", greatest(lit(1L), expr(
        s"($pLoNum * n + ${pDen - 1}) div $pDen")))
      .withColumn("kHi", expr(s"($pHiNum * n + ${pDen - 1}) div $pDen"))
    t.groupBy(col("g"))
      .agg(
        max(col("n")).as("n"),
        max(col("kLo")).as("__kLo"),
        max(col("kHi")).as("__kHi"),
        max(when(col("rnk") === col("kLo"), col("v"))).as("lo"),
        max(when(col("rnk") === col("kHi"), col("v"))).as("hi"),
        sum(when(col("rnk").between(col("kLo"), col("kHi")), 1L)).as("trim_n"),
        sum(when(col("rnk").between(col("kLo"), col("kHi")), col("v"))).as("trim_sum"))
      .withColumn("wins_sum", col("trim_sum") +
        (col("__kLo") - 1) * col("lo") + (col("n") - col("__kHi")) * col("hi"))
      .withColumn("trim_mean",
        col("trim_sum").cast("double") / col("trim_n").cast("double"))
      .withColumn("wins_mean",
        col("wins_sum").cast("double") / col("n").cast("double"))
      .select("g", "n", "lo", "hi", "trim_n", "trim_sum", "wins_sum",
        "trim_mean", "wins_mean")
  }

  /** Spearman rank-correlation matrix: Pearson over tie-averaged ranks,
    * the distribution-free complement to [[correlationMatrix]] (a
    * monotone-but-nonlinear relationship Pearson underreports scores
    * |ρ| → 1 here). Exactness: ranks are DOUBLED average ranks — for a
    * run of `cnt` equal values ending at cumulative position `w`, the
    * averaged rank (w−cnt+1+w)/2 doubles to the integer `2w−cnt+1` —
    * so every Σr/Σr²/Σr_ar_b is an exact integer (DECIMAL(38,0) sums:
    * doubled ranks are O(n), their squares O(n²), and int64 would wrap
    * past n ≈ 1.3M rows; decimal128 holds to n ≈ 10¹²), and ρ is the
    * one fixed double formula over those exact sums.
    *
    * Scale shape: per column, the rank map is built on the DISTINCT-
    * value table (groupBy value, then a cumulative window over values
    * — value-cardinality, not row-cardinality) and hash-joined back;
    * the pair sums are one combinable aggregation. Rows with a NULL in
    * ANY column are excluded first so all columns rank the same row
    * set.
    */
  def spearmanMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    val names = cols.map(_._1)
    var rows = df.select(cols.map { case (n, c) => c.cast("long").as(n) }: _*)
      .filter(names.map(col(_).isNotNull).reduce(_ && _))
    for (n <- names) {
      val ranks = rows.groupBy(col(n).as("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("__w", sum("__cnt").over(
          Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("__v").as(n), (lit(2) * col("__w") - col("__cnt") + 1).as(s"__r_$n"))
      rows = rows.join(ranks, n)
    }
    def dec(c: Column) = c.cast("decimal(18,0)")
    val sums = names.flatMap { n =>
      Seq(sum(dec(col(s"__r_$n"))).as(s"s_$n"),
        sum(dec(col(s"__r_$n")) * dec(col(s"__r_$n"))).as(s"q_$n"))
    } ++ names.combinations(2).map { case Seq(a, b) =>
      sum(dec(col(s"__r_$a")) * dec(col(s"__r_$b"))).as(s"p_${a}_$b")
    }
    val allAggs = count(lit(1)).as("n") +: sums
    val m = rows.agg(allAggs.head, allAggs.tail: _*)
    def dd(c: Column) = c.cast("double")
    val pairs = names.combinations(2).map { case Seq(a, b) =>
      val va = dd(col("n")) * dd(col(s"q_$a")) - dd(col(s"s_$a")) * dd(col(s"s_$a"))
      val vb = dd(col("n")) * dd(col(s"q_$b")) - dd(col(s"s_$b")) * dd(col(s"s_$b"))
      val cv = dd(col("n")) * dd(col(s"p_${a}_$b")) - dd(col(s"s_$a")) * dd(col(s"s_$b"))
      m.select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
        when(va > 0 && vb > 0, cv / (sqrt(va) * sqrt(vb))).as("rho"))
    }
    pairs.reduce(_.unionByName(_))
  }

  /** Cramér's V association strength for two categorical columns: the
    * [0,1]-normalized chi-square `V = √(χ² / (n·(min(r,c)−1)))` — the
    * "is this association big, not just significant" companion to
    * [[chiSquareCells]], which supplies the per-cell decomposition
    * (full marginal spine, zero-observed cells included). χ² is
    * summed in integer micro-units — each cell's deterministic double
    * contribution floored at 2²⁰ then integer-summed, so the total is
    * order-free (a straight float Σ would drift with partitioning).
    * Output is one row: (n, r_levels, c_levels, chi2_q, cramers_v);
    * a 1-level margin (min(r,c) = 1) yields NULL V.
    */
  def cramersV(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = chiSquareCells(df, aCol, bCol)
      .withColumn("__q", floor(col("contrib") * (1L << 20)).cast("long"))
    cells.agg(min("n").as("n"),
        countDistinct(col("a")).as("r_levels"),
        countDistinct(col("b")).as("c_levels"),
        sum("__q").as("chi2_q"))
      .withColumn("__k",
        least(col("r_levels"), col("c_levels")).cast("long") - 1)
      .withColumn("cramers_v", when(col("__k") > 0,
        sqrt(col("chi2_q").cast("double") / (1L << 20).toDouble /
          (col("n").cast("double") * col("__k").cast("double")))))
      .select("n", "r_levels", "c_levels", "chi2_q", "cramers_v")
  }

  /** Poisson-bootstrap confidence interval for a mean (Chamandy et al.
    * 2012, "Estimating Uncertainty for Massive Data Streams" — the
    * resampling scheme built FOR this execution model): classic
    * bootstrap resampling needs n draws per replicate coordinated
    * across the cluster; the Poisson approximation gives every row an
    * iid Poisson(1) multiplicity per replicate, so B replicates are
    * ONE stateless map (row → B weighted copies) + ONE combinable
    * aggregation — no global coordination, no second scan.
    *
    * Determinism: the replicate-b weight of row `id` inverts the
    * Poisson(1) CDF at a 20-bit uniform carved from
    * `md5(id:b)` (the repo's portable-hash idiom), thresholds
    * pre-scaled to 2²⁰ integers — both engines draw the identical
    * weight. Replicate sums are exact int64; each mean is one IEEE
    * division; `rank_asc` orders the B means (ties by replicate id)
    * so the 2.5%/97.5% CI reads off ranks 1 and B directly.
    * Output: one row per replicate — (replicate, n_eff, sum_cents,
    * mean_cents, rank_asc).
    */
  def poissonBootstrap(df: DataFrame, idCol: Column, centsCol: Column,
                       replicates: Int = 32): DataFrame = {
    require(replicates >= 2 && replicates <= 256,
      s"replicates must be in [2, 256], got $replicates")
    // P(X <= k) for X ~ Poisson(1), scaled to 2^20 and floored
    val cum = Seq(385749L, 771498L, 964372L, 1028664L, 1044738L,
      1047952L, 1048488L, 1048565L, 1048574L)
    val rows = df.select(idCol.cast("string").as("id"), centsCol.cast("long").as("x"))
      .filter(col("id").isNotNull && col("x").isNotNull)
      .withColumn("b", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("u", conv(substring(
        md5(concat(col("id"), lit(":"), col("b").cast("string"))), 1, 5), 16, 10)
        .cast("long"))
    val weight = cum.zipWithIndex.foldRight(lit(cum.length.toLong): Column) {
      case ((thr, k), rest) => when(col("u") < thr, k.toLong).otherwise(rest)
    }
    val reps = rows.withColumn("w", weight)
      .groupBy(col("b").cast("long").as("replicate"))
      .agg(sum("w").as("n_eff"), sum(col("w") * col("x")).as("sum_cents"))
      .withColumn("mean_cents", when(col("n_eff") > 0,
        col("sum_cents").cast("double") / col("n_eff").cast("double")))
    reps.withColumn("rank_asc", row_number().over(
        Window.orderBy(col("mean_cents").asc_nulls_last, col("replicate"))).cast("long"))
      .select("replicate", "n_eff", "sum_cents", "mean_cents", "rank_asc")
  }

  /** One-way ANOVA F-statistic — "do the group means differ more than
    * chance": between/within sum-of-squares decomposition over exact
    * integer moments. Cross-engine exactness needs ORDER-FREE sums, so
    * the per-group rational S_g²/n_g is floor-quantized to the integer
    * `S_g² div n_g` BEFORE summation (the documented contract —
    * truncation error ≤ k units against sums of ~N·var, invisible at
    * any real effect size): `ssb_q = Σ_g(S_g² div n_g) − S² div N`,
    * `ssw_q = ΣX² − Σ_g(S_g² div n_g)`, F one double expression.
    * Bound: S_g² must stay in int64 → Σ_g x ≲ 3·10⁹ per group (shard
    * by a secondary key past that). Degenerate inputs (k < 2 or
    * ssw_q ≤ 0) report NULL F. Output one row:
    * (k_groups, n, ssb_q, ssw_q, df_between, df_within, f_stat).
    * Scale shape: one combinable per-group aggregation, one k-row
    * reduction — nothing else.
    */
  def oneWayAnova(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val g = df.select(groupCol.as("g"), valueCol.cast("long").as("x"))
      .filter(col("g").isNotNull && col("x").isNotNull)
      .groupBy("g")
      .agg(count(lit(1)).as("n_g"), sum("x").as("s_g"),
        sum(col("x") * col("x")).as("q_g"))
      .withColumn("term", expr("s_g * s_g div n_g"))
    def dd(c: Column) = c.cast("double")
    g.agg(count(lit(1)).as("k_groups"), sum("n_g").as("n"),
        sum("s_g").as("s"), sum("q_g").as("q"), sum("term").as("tsum"))
      .withColumn("ssb_q", col("tsum") - expr("s * s div n"))
      .withColumn("ssw_q", col("q") - col("tsum"))
      .withColumn("df_between", col("k_groups") - 1)
      .withColumn("df_within", col("n") - col("k_groups"))
      .withColumn("f_stat", when(
        col("df_between") > 0 && col("df_within") > 0 && col("ssw_q") > 0,
        (dd(col("ssb_q")) / dd(col("df_between"))) /
          (dd(col("ssw_q")) / dd(col("df_within")))))
      .select("k_groups", "n", "ssb_q", "ssw_q", "df_between", "df_within",
        "f_stat")
  }

  /** Cohen's kappa — inter-rater agreement corrected for chance (the
    * classifier-vs-ground-truth QA number a labeling pipeline
    * reports). From exact integer counts only:
    * `κ = (agree·n − Σ_c m1_c·m2_c) / (n² − Σ_c m1_c·m2_c)` — the
    * n-scaled form of (p_o − p_e)/(1 − p_e), one IEEE division at the
    * end. NULL ratings are excluded pairwise (a rating of NULL is "no
    * rating", not a category). Perfect chance agreement (pe = n²)
    * reports NULL. Bound: n² in int64 → n ≲ 3·10⁹ pairs.
    * Output one row: (n, agree, pe_q, kappa).
    */
  def cohensKappa(df: DataFrame, rater1: Column, rater2: Column): DataFrame = {
    val pairs = df.select(rater1.as("r1"), rater2.as("r2"))
      .filter(col("r1").isNotNull && col("r2").isNotNull)
    val agree = pairs.agg(count(lit(1)).as("n"),
      sum(when(col("r1") === col("r2"), 1L).otherwise(0L)).as("agree"))
    val m1 = pairs.groupBy(col("r1").as("c")).agg(count(lit(1)).as("m1"))
    val m2 = pairs.groupBy(col("r2").as("c")).agg(count(lit(1)).as("m2"))
    val pe = m1.join(m2, "c")
      .agg(coalesce(sum(col("m1") * col("m2")), lit(0L)).as("pe_q"))
    agree.crossJoin(broadcast(pe))
      .withColumn("kappa", when(col("n") * col("n") =!= col("pe_q"),
        (col("agree") * col("n") - col("pe_q")).cast("double") /
          (col("n") * col("n") - col("pe_q")).cast("double")))
      .select("n", "agree", "pe_q", "kappa")
  }

  /** A/B power analysis — the required per-arm sample size to detect a
    * `mdePct`% lift on a unit-level metric at α = 0.05 (two-sided) /
    * 80% power: `n = ⌈(z_{α/2} + z_β)² · 2σ² / δ²⌉` with
    * z constants as literals (1.959964 + 0.841621, squared in-engine
    * so both sides run the identical double ops). μ and σ² come from
    * exact integer moments over the unit metric (one combinable
    * aggregation); δ = mdePct% of μ. Degenerate inputs (μ ≤ 0 or zero
    * variance) report NULL. Output one row:
    * (n_units, sum_v, sumsq_v, mean_v, var_v, mde_v, n_required).
    */
  def powerSampleSize(units: DataFrame, valueCol: Column,
                      mdePct: Int = 5): DataFrame = {
    require(mdePct >= 1 && mdePct <= 100, s"mdePct in [1,100], got $mdePct")
    def dd(c: Column) = c.cast("double")
    units.select(valueCol.cast("long").as("v")).filter(col("v").isNotNull)
      .agg(count(lit(1)).as("n_units"), sum("v").as("sum_v"),
        sum(col("v") * col("v")).as("sumsq_v"))
      .withColumn("mean_v", dd(col("sum_v")) / dd(col("n_units")))
      .withColumn("var_v",
        (dd(col("n_units")) * dd(col("sumsq_v")) - dd(col("sum_v")) * dd(col("sum_v"))) /
          (dd(col("n_units")) * dd(col("n_units"))))
      .withColumn("mde_v", col("mean_v") * lit(mdePct / 100.0))
      .withColumn("n_required", when(col("mean_v") > 0 && col("var_v") > 0,
        ceil(lit(1.959964 + 0.841621) * lit(1.959964 + 0.841621) *
          lit(2.0) * col("var_v") / (col("mde_v") * col("mde_v")))))
      .select("n_units", "sum_v", "sumsq_v", "mean_v", "var_v", "mde_v",
        "n_required")
  }

  /** First-order partial correlation ρ_xy·z — the association of x and
    * y with z "held constant", the confounder screen:
    * `(ρxy − ρxz·ρyz) / √((1−ρxz²)(1−ρyz²))` over the three pairwise
    * Pearsons, each the fixed double formula over exact int64 moments
    * from ONE fact scan (the [[correlationMatrix]] discipline). NULL
    * when any marginal variance is zero or a denominator term
    * vanishes. Output one row: (n, r_xy, r_xz, r_yz, partial_r).
    */
  def partialCorrelation(df: DataFrame, xCol: (String, Column),
                         yCol: (String, Column), zCol: (String, Column)): DataFrame = {
    val base = df.select(xCol._2.cast("long").as("x"), yCol._2.cast("long").as("y"),
        zCol._2.cast("long").as("z"))
      .filter(col("x").isNotNull && col("y").isNotNull && col("z").isNotNull)
    val m = base.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
      sum(col("x") * col("x")).as("qx"), sum(col("y") * col("y")).as("qy"),
      sum(col("z") * col("z")).as("qz"),
      sum(col("x") * col("y")).as("pxy"), sum(col("x") * col("z")).as("pxz"),
      sum(col("y") * col("z")).as("pyz"))
    def dd(c: Column) = c.cast("double")
    def r(p: Column, sa: Column, sb: Column, qa: Column, qb: Column) = {
      val va = dd(col("n")) * dd(qa) - dd(sa) * dd(sa)
      val vb = dd(col("n")) * dd(qb) - dd(sb) * dd(sb)
      when(va > 0 && vb > 0,
        (dd(col("n")) * dd(p) - dd(sa) * dd(sb)) / (sqrt(va) * sqrt(vb)))
    }
    m.withColumn("r_xy", r(col("pxy"), col("sx"), col("sy"), col("qx"), col("qy")))
      .withColumn("r_xz", r(col("pxz"), col("sx"), col("sz"), col("qx"), col("qz")))
      .withColumn("r_yz", r(col("pyz"), col("sy"), col("sz"), col("qy"), col("qz")))
      .withColumn("partial_r", when(
        col("r_xy").isNotNull && col("r_xz").isNotNull && col("r_yz").isNotNull &&
          (lit(1.0) - col("r_xz") * col("r_xz")) * (lit(1.0) - col("r_yz") * col("r_yz")) > 0,
        (col("r_xy") - col("r_xz") * col("r_yz")) /
          sqrt((lit(1.0) - col("r_xz") * col("r_xz")) *
            (lit(1.0) - col("r_yz") * col("r_yz")))))
      .select("n", "r_xy", "r_xz", "r_yz", "partial_r")
  }

  /** Exact 1-D earth mover's distance per group vs the whole corpus —
    * the INTEGRAL companion to [[Analytics.ksDrift]]'s max-deviation
    * (KS is blind to how long a small CDF gap persists; EMD = ∫|F_g −
    * F_corpus| dv charges for it). Same cross-multiplied-rational
    * discipline as ksDrift: at each support value,
    * dev = |n_corp·cum_g − n_g·cum_corp| (exact int), weighted by the
    * gap to the NEXT support value (both CDFs are flat between support
    * points, and both reach 1 after the last — the last point carries
    * no gap), `emd_num = Σ dev·gap` exact, emd = one division by
    * n_corp·n_g. Output per group: (group, n_group, n_total, emd_num,
    * emd). Bound: dev ≤ n_corp·n_g and Σgap = range, so emd_num ≤
    * n_corp·n_g·range — int64-safe for value ranges ≲ 10⁴ at 10⁷ rows;
    * quantize wider domains first.
    * Scale shape: ksDrift's — per-(group, value) combinable counts,
    * a support×groups cumulative window (value-cardinality), one
    * group-keyed reduction.
    */
  def emd1d(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val vals = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
    val sCounts = vals.groupBy("grp", "v").agg(count(lit(1)).as("n_sv"))
    val groups = vals.groupBy("grp").agg(count(lit(1)).as("n_s"))
    val support = vals.select("v").distinct()
    val total = vals.agg(count(lit(1)).as("n_g")) // one row, broadcast
    val run = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nxt = Window.partitionBy("grp").orderBy("v")
    val cum = groups.crossJoin(broadcast(support))
      .join(sCounts, Seq("grp", "v"), "left")
      .withColumn("cum_s", sum(coalesce(col("n_sv"), lit(0L))).over(run))
      .withColumn("gap", coalesce(lead(col("v"), 1).over(nxt) - col("v"), lit(0L)))
    val gcum = cum.groupBy("v").agg(sum("cum_s").as("cum_g"))
    cum.join(gcum, "v").crossJoin(broadcast(total))
      .withColumn("dev", abs(col("n_g") * col("cum_s") - col("n_s") * col("cum_g")))
      .groupBy(col("grp").as(groupCol))
      .agg(min("n_s").as("n_group"), min("n_g").as("n_total"),
        sum(col("dev") * col("gap")).as("emd_num"))
      .withColumn("emd", col("emd_num").cast("double") /
        (col("n_total") * col("n_group")).cast("double"))
  }

  /** Kruskal–Wallis H — the rank-based one-way ANOVA ("do the group
    * DISTRIBUTIONS differ", robust to non-normal values): tie-averaged
    * ranks via the value-cardinality rank table ([[spearmanMatrix]]'s
    * cumulative-count construction — never a row window), per-group
    * double-rank sums S_g exact int64, Σ S_g²/n_g floor-quantized per
    * group in DECIMAL(38,0) before the integer sum (order-free; the
    * ≤k-units truncation is invisible at any real H), and the tie
    * correction Σ(t³−t) summed in decimal. H and the tie-adjusted
    * H/C are fixed double expressions over those exact integers
    * (the N³-scale internals stay decimal and are NOT emitted — the
    * registry-wide no-decimal-in-the-emitted-row convention).
    * Output one row: (n, k_groups, h_stat, h_adj).
    * Scale shape: one combinable (group, value) count, a
    * value-cardinality rank table, k-row reductions — no row windows.
    */
  def kruskalWallis(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val rows = df.select(groupCol.as("g"), round(valueCol).cast("long").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)
    val cells = rows.groupBy("g", "v").agg(count(lit(1)).as("m"))
    val perValue = cells.groupBy("v").agg(sum("m").as("t"))
    // double-rank dr(v) = 2·avgrank = 2w − t + 1 over the value table
    val ranked = perValue
      .withColumn("w", sum("t").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("v"), (lit(2) * col("w") - col("t") + 1).as("dr"))
    val perGroup = cells.join(ranked, "v")
      .groupBy("g")
      .agg(sum("m").as("n_g"), sum(col("m") * col("dr")).as("s_g"))
    val tieSum = perValue.agg(
      coalesce(sum((col("t").cast(dec) * col("t") * col("t") - col("t"))
        .cast(dec)), lit(0).cast(dec)).cast(dec).as("tie_cub"))
    def dd(c: Column) = c.cast("double")
    perGroup.agg(
        sum("n_g").as("n"), count(lit(1)).as("k_groups"),
        // floor(S_g²/n_g) per group, integer-summed — order-free
        sum(org.apache.spark.sql.graftbridge.Bridge.column(
          new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.graftbridge.Bridge.expression(
              (col("s_g").cast(dec) * col("s_g").cast(dec)).cast(dec)),
            org.apache.spark.sql.graftbridge.Bridge.expression(
              col("n_g").cast(dec)))).cast(dec)).cast(dec).as("rank_t"))
      .crossJoin(broadcast(tieSum))
      .withColumn("h_stat", when(col("n") > 1,
        lit(3.0) * dd(col("rank_t")) / (dd(col("n")) * (dd(col("n")) + 1.0)) -
          lit(3.0) * (dd(col("n")) + 1.0)))
      .withColumn("h_adj", when(col("n") > 2 &&
          dd(col("tie_cub")) < dd(col("n")) * dd(col("n")) * dd(col("n")) - dd(col("n")),
        col("h_stat") / (lit(1.0) - dd(col("tie_cub")) /
          (dd(col("n")) * dd(col("n")) * dd(col("n")) - dd(col("n"))))))
      .select(col("n"), col("k_groups"), col("h_stat"), col("h_adj"))
  }

  /** McNemar's test for paired binary outcomes ("did the treatment
    * flip answers asymmetrically"): the discordant-pair counts b (yes
    * under A only) and c (yes under B only) are exact int64 sums; the
    * continuity-corrected statistic (|b−c|−1)²/(b+c) is one fixed
    * double expression. Output one row: (n_pairs, b_only, c_only,
    * chi2) — chi2 NULL when b+c = 0 (no discordance, nothing to test).
    * Scale shape: one combinable aggregation over the unit frame.
    */
  def mcnemar(units: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val u = units.select(aCol.cast("boolean").as("a"), bCol.cast("boolean").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    u.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("b_only"),
        sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("c_only"))
      .withColumn("chi2", when(col("b_only") + col("c_only") > 0,
        (abs(col("b_only") - col("c_only")) - lit(1)).cast("double") *
          (abs(col("b_only") - col("c_only")) - lit(1)).cast("double") /
          (col("b_only") + col("c_only")).cast("double")))
  }

  /** Murphy decomposition of the Brier score — reliability −
    * resolution + uncertainty, the "is the forecast sharp AND
    * calibrated" companion to [[calibrationBins]] (same min-max
    * integer binning over the score column). Every term is a fixed
    * double expression over exact per-bin integers: with the score
    * normalized to p = (s−mn)/(mx−mn+1−1)… kept as the bin's exact
    * mean score over the integer score domain, reliability =
    * Σ n_b(p̄_b − ȳ_b)²/N, resolution = Σ n_b(ȳ_b − ȳ)²/N,
    * uncertainty = ȳ(1−ȳ). Per-bin doubles are floor-quantized at
    * 2²⁰ and integer-summed, so the totals are order-free. Output one
    * row: (n, n_bins_used, rel_q, res_q, reliability, resolution,
    * uncertainty, brier).
    */
  def brierDecomposition(df: DataFrame, scoreCol: Column, labelCol: Column,
                         nBins: Int): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    val base = df.select(scoreCol.cast("long").as("s"),
        labelCol.cast("boolean").as("pos"))
      .filter(col("s").isNotNull && col("pos").isNotNull)
    val bounds = base.agg(min("s").as("mn"), max("s").as("mx"))
    def dd(c: Column) = c.cast("double")
    val binned = base.crossJoin(broadcast(bounds))
      .withColumn("bin", least(lit(nBins - 1L),
        org.apache.spark.sql.graftbridge.Bridge.column(
          new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.graftbridge.Bridge.expression(
              (col("s") - col("mn")) * nBins),
            org.apache.spark.sql.graftbridge.Bridge.expression(
              col("mx") - col("mn") + 1)))))
      // p = score scaled into [0,1] over the integer domain
      .withColumn("p", (col("s") - col("mn")).cast("double") /
        (col("mx") - col("mn") + 1).cast("double"))
    val bins = binned.groupBy("bin")
      .agg(count(lit(1)).as("n_b"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("pos_b"),
        sum((col("s") - col("mn"))).as("ss_b"))
    val tot = bins.agg(sum("n_b").as("n"), sum("pos_b").as("n_pos"),
      count(lit(1)).as("n_bins_used"))
    val span = bounds.select((col("mx") - col("mn") + 1).cast("double").as("dspan"))
    val terms = bins.crossJoin(broadcast(tot)).crossJoin(broadcast(span))
      .withColumn("pbar", dd(col("ss_b")) / (dd(col("n_b")) * col("dspan")))
      .withColumn("ybar_b", dd(col("pos_b")) / dd(col("n_b")))
      .withColumn("ybar", dd(col("n_pos")) / dd(col("n")))
      // per-bin floor-quantized contributions — order-free int sums
      .withColumn("rel_t", floor(dd(col("n_b")) *
        (col("pbar") - col("ybar_b")) * (col("pbar") - col("ybar_b")) *
        1048576.0).cast("long"))
      .withColumn("res_t", floor(dd(col("n_b")) *
        (col("ybar_b") - col("ybar")) * (col("ybar_b") - col("ybar")) *
        1048576.0).cast("long"))
    terms.agg(min("n").as("n"), min("n_bins_used").as("n_bins_used"),
        min("n_pos").as("n_pos"),
        sum("rel_t").as("rel_q"), sum("res_t").as("res_q"))
      .withColumn("reliability", dd(col("rel_q")) / (dd(col("n")) * 1048576.0))
      .withColumn("resolution", dd(col("res_q")) / (dd(col("n")) * 1048576.0))
      .withColumn("uncertainty", dd(col("n_pos")) / dd(col("n")) *
        (lit(1.0) - dd(col("n_pos")) / dd(col("n"))))
      .withColumn("brier",
        col("reliability") - col("resolution") + col("uncertainty"))
      .select("n", "n_bins_used", "n_pos", "rel_q", "res_q",
        "reliability", "resolution", "uncertainty", "brier")
  }

  /** Mutual information between two categorical columns in integer
    * micro-nats — the dependence-strength companion to
    * [[chiSquareCells]]/[[cramersV]] that answers "how many nats does
    * knowing A tell you about B". Exactness contract =
    * `groupEntropy`'s: each CELL's ln term is floor-quantized at 2²⁰
    * (a deterministic double per cell), weighted by the exact cell
    * count and integer-summed — order-free; `mi_q = Σ n_ab ·
    * floor(ln(n_ab·N/(n_a·n_b))·2²⁰) div N` (micro-nat-ish 2⁻²⁰ nat
    * units). Bound: n_a·n_b ≤ N² must stay double-exact → N ≤ ~9·10⁷
    * per scan (shard past that). Output one row:
    * (n, a_levels, b_levels, mi_q).
    */
  def mutualInformation(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val base = df.select(aCol.as("a"), bCol.as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val cells = base.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val ma = cells.groupBy("a").agg(sum("n_ab").as("n_a"))
    val mb = cells.groupBy("b").agg(sum("n_ab").as("n_b"))
    val nn = cells.agg(sum("n_ab").as("n"),
      countDistinct("a").as("a_levels"), countDistinct("b").as("b_levels"))
    def dd(c: Column) = c.cast("double")
    cells.join(broadcast(ma), "a").join(broadcast(mb), "b")
      .crossJoin(broadcast(nn))
      .withColumn("term", col("n_ab") *
        floor(log(dd(col("n_ab")) * dd(col("n")) /
          (dd(col("n_a")) * dd(col("n_b")))) * 1048576).cast("long"))
      .agg(min("n").as("n"), min("a_levels").as("a_levels"),
        min("b_levels").as("b_levels"),
        expr("sum(term) div min(n)").as("mi_q"))
  }

  /** Kendall's τ-b rank correlation (r12) — the third correlation
    * beside Pearson (correlationMatrix) and Spearman (spearmanMatrix),
    * the one that stays meaningful under heavy ties. Computed EXACTLY
    * over the joint frequency table: with V distinct (x, y) cells the
    * concordant/discordant/tie pair counts come from a V² cell
    * self-join, never an n² row join — V is domain-bounded (quantity ×
    * discount is ≤ 50·11 cells at any corpus size), so the plan is one
    * combinable count + a broadcast-sized join however large the fact
    * table. Pair counts are DECIMAL(38,0) INTERNALLY (n(n−1)/2
    * overflows int64 past ~4.3e9 rows, the same bound Spearman's rank
    * squares hit) but EMITTED as BIGINT behind a named overflow guard —
    * the registry-wide convention is no decimal in the emitted row (the
    * r12 gate proved the driver's hash canonicalization diverges on
    * DECIMAL columns even when values are bit-exact), and int64 pair
    * counts hold to ~4.3e9 input rows, beyond any verify/bench scale.
    *
    * τ-b = (C − D) / √((n0 − n1)(n0 − n2)), n0 = n(n−1)/2, n1/n2 the
    * tie-pair counts per x / per y — one fixed double expression over
    * the exact decimals; NULL when either margin is fully tied.
    */
  def kendallTau(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    // round before the long cast: a raw fractional column (e.g. an
    // un-scaled l_discount) must not silently truncate toward zero and
    // collapse its domain — match the oracle's round(...)::BIGINT.
    val cells = df.filter(xCol.isNotNull && yCol.isNotNull)
      .groupBy(round(xCol).cast("long").as("x"),
        round(yCol).cast("long").as("y"))
      .agg(count(lit(1)).as("m"))
    // every unordered cell pair once: (a.x, a.y) < (b.x, b.y) lexicographic
    val pairs = cells.as("a").join(cells.as("b"),
      col("a.x") < col("b.x") ||
        (col("a.x") === col("b.x") && col("a.y") < col("b.y")))
    val prod = (col("a.m").cast(dec) * col("b.m").cast(dec))
    val pairAgg = pairs.agg(
      coalesce(sum(when((col("b.x") - col("a.x")) * (col("b.y") - col("a.y")) > 0, prod)
        .otherwise(lit(0).cast(dec))), lit(0).cast(dec)).cast(dec).as("c_pairs"),
      coalesce(sum(when((col("b.x") - col("a.x")) * (col("b.y") - col("a.y")) < 0, prod)
        .otherwise(lit(0).cast(dec))), lit(0).cast(dec)).cast(dec).as("d_pairs"))
    // t(t−1) is always even, so the /2 is exact in decimal
    def tiePairs(k: String, out: String) = cells.groupBy(col(k))
      .agg(sum("m").as("t"))
      .agg(sum((col("t").cast(dec) * (col("t") - 1).cast(dec) / 2).cast(dec))
        .cast(dec).as(out))
    val margins = df.filter(xCol.isNotNull && yCol.isNotNull)
      .agg(count(lit(1)).as("n"))
      .withColumn("n0",
        (col("n").cast(dec) * (col("n") - 1).cast(dec) / 2).cast(dec))
    val txDf = tiePairs("x", "ties_x")
    val tyDf = tiePairs("y", "ties_y")
    // tau is computed over the exact decimals; the pair counts are
    // then narrowed to BIGINT behind a named guard (they fit int64
    // whenever n < ~4.3e9 — the guard names the operator so an
    // overflow at extreme scale fails loudly, never wraps).
    val maxLong = lit("9223372036854775807").cast(dec)
    def asLong(name: String): Column =
      when(col(name) > maxLong, raise_error(concat(
        lit(s"graft.kendallTau: $name overflows BIGINT at this scale ("),
        col(name).cast("string"), lit(") — widen the emitted type"))))
        .otherwise(col(name).cast("long")).as(name)
    margins.crossJoin(pairAgg).crossJoin(broadcast(txDf)).crossJoin(broadcast(tyDf))
      .withColumn("tau",
        when((col("n0") > col("ties_x")) && (col("n0") > col("ties_y")),
          (col("c_pairs") - col("d_pairs")).cast("double") /
            sqrt((col("n0") - col("ties_x")).cast("double") *
              (col("n0") - col("ties_y")).cast("double"))))
      .select(col("n"), asLong("c_pairs"), asLong("d_pairs"),
        asLong("ties_x"), asLong("ties_y"), col("tau"))
  }
}
