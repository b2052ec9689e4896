package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed calendar grid with forward fill — the gap-filling step that
  * turns raw event logs into the aligned per-entity series a feature
  * pipeline or forecasting job consumes.
  *
  * Scale story: the day-end value per (entity, day) is a map-side-
  * combinable `max(struct(ts, id, value))` aggregate (never a window
  * over raw events); the grid explode is `span × days` rows — output-
  * sized, not event-sized; and the only window is the forward-fill
  * `last(ignoreNulls)` PARTITIONED BY entity over its grid rows, a
  * keyed frame that shuffles grid rows once. Nothing global, nothing
  * event-quadratic.
  *
  * Determinism: the day-end value rides a struct ordered by (ts,
  * event_id) — event ids are unique, so ties in ts cannot make the
  * selected value engine-dependent, and the value itself is copied,
  * never recomputed.
  */
object TimeSeries {

  /** One row per (entity, day) from each entity's first to last active
    * day: `day_no` (days since `epochDay`), `value_ffill` (the
    * day-end value, forward-filled across gap days), and `is_gap`
    * (no event that day).
    */
  def resampleDailyFfill(events: DataFrame, entityCol: String, tsCol: String,
                         idCol: String, valueCol: String,
                         epochDay: String = "2024-01-01"): DataFrame = {
    val daily = events.groupBy(col(entityCol).as("entity_id"),
        to_date(col(tsCol)).as("day"))
      .agg(max(struct(col(tsCol), col(idCol), col(valueCol).as("v"))).as("m"))
      .select(col("entity_id"), col("day"), col("m.v").as("day_value"))
    val grid = daily.groupBy("entity_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("entity_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("entity_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("entity_id", "day"), "left")
      .select(col("entity_id"),
        datediff(col("day"), lit(epochDay).cast("date")).as("day_no"),
        last("day_value", ignoreNulls = true).over(w).as("value_ffill"),
        col("day_value").isNull.as("is_gap"))
  }

  /** Seasonal-baseline anomaly tally: events are bucketed by
    * hour-of-week (dow, hr) and counted against their bucket's mean —
    * an event is anomalous when `value > factor × bucket mean`. All
    * arithmetic is EXACT integers: values become cents once
    * (`round(v·100)` — both engines round the same IEEE double), the
    * bucket mean is never materialized as a float, and the comparison
    * cross-multiplies (`cents·n > factor·sum_cents`) so the whole
    * result is hash-exact.
    *
    * Scale shape: one combinable aggregation to the ≤168-row bucket
    * frame, broadcast back over the event scan, one more combinable
    * aggregation. The fact table is scanned twice but never shuffled
    * row-wise.
    *
    * Output: (dow, hr, n_events, sum_cents, n_anomalies). `dow`
    * follows Spark's dayofweek (1=Sunday); the oracle maps DuckDB's
    * 0-based dayofweek with +1.
    */
  def seasonalAnomalies(events: DataFrame, tsCol: String, valCol: String,
                        factor: Int = 5): DataFrame = {
    val e = events.filter(col(valCol).isNotNull)
      .select(dayofweek(col(tsCol)).as("dow"), hour(col(tsCol)).as("hr"),
        round(col(valCol) * 100).cast("long").as("cents"))
    val buckets = e.groupBy("dow", "hr")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
    e.join(broadcast(buckets), Seq("dow", "hr"))
      .groupBy("dow", "hr")
      .agg(min("n_events").as("n_events"), min("sum_cents").as("sum_cents"),
        sum(when(col("cents") * col("n_events") > lit(factor.toLong) * col("sum_cents"), 1L)
          .otherwise(0L)).as("n_anomalies"))
  }
  /** Daily OHLC (open/high/low/close) bars per series key — the
    * canonical time-series downsample. Open/close are `min_by` /
    * `max_by` with a ZERO-PADDED STRING ordering key
    * `printf("%020d|%010d", epoch_micros, event_id)`: lexicographic =
    * numeric order, totally ordered (the id breaks same-microsecond
    * ties), and — unlike a struct ordering — supported identically by
    * Spark's min_by and DuckDB's arg_min, so the bars replay exactly.
    * Values are exact integer cents. One combinable aggregation, one
    * shuffle on (key, day).
    */
  def dailyOhlc(events: DataFrame, keyCol: String, tsCol: String,
                valCol: String, idCol: String = "event_id",
                epochDay: String = "2024-01-01"): DataFrame = {
    // NULL ts/id excluded (fuzz r12): the open/close total order is
    // (epoch, id) — a row missing either can't be ordered, and engines
    // disagree on NULL arg_min/max keys (DuckDB skips, Spark ranks)
    val e = events.filter(col(valCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(keyCol).as("series"),
        datediff(to_date(col(tsCol)), lit(epochDay).cast("date")).as("day_no"),
        round(col(valCol) * 100).cast("long").as("cents"),
        format_string("%020d|%010d", unix_micros(col(tsCol).cast("timestamp")), col(idCol)).as("__ord"))
    e.groupBy("series", "day_no")
      .agg(count(lit(1)).as("n_events"),
        // key nulled when cents is null: DuckDB arg_min/arg_max skip
        // null-arg rows, Spark min_by/max_by return them (r13 fuzz)
        min_by(col("cents"), when(col("cents").isNotNull, col("__ord")))
          .as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max_by(col("cents"), when(col("cents").isNotNull, col("__ord")))
          .as("close_cents"))
  }

  /** CUSUM changepoint curve per series: daily event counts reduced to
    * the cumulative deviation from the series mean, ENTIRELY in
    * integers — with m days and total T, the textbook
    * `S_t = Σ_{i≤t}(x_i − T/m)` is scaled by m to
    * `s_num = m·prefix_t − t·T`, which is exact where the float mean
    * never is. The changepoint is the day with the maximum |s_num|
    * (ties to the earliest day), flagged on the curve — the "when did
    * this feed's volume regime shift" monitor that pairs with
    * [[Analytics.klDrift]]'s content drift.
    *
    * Scale shape: one combinable (series, day) count is the only
    * fact-sized aggregation; all three windows partition by series
    * over its day-sized curve (≤ a few thousand rows per series at any
    * corpus size). Bound: `m·prefix ≤ m·T` — inside a long to ~10^14
    * daily events over 30 years; documented-ceiling convention.
    * Output: (series, day, t, n_events, s_num, is_change).
    */
  def cusumChangepoint(events: DataFrame, seriesCol: String,
                       tsCol: String): DataFrame = {
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val byDay = Window.partitionBy("series").orderBy("day")
    val run = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("series")
    val curve = daily
      .withColumn("t", row_number().over(byDay).cast("long"))
      .withColumn("__prefix", sum("n_events").over(run))
      .withColumn("__m", count(lit(1)).over(all))
      .withColumn("__tot", sum("n_events").over(all))
      .withColumn("s_num", col("__m") * col("__prefix") - col("t") * col("__tot"))
    val peak = Window.partitionBy("series").orderBy(abs(col("s_num")).desc, col("day"))
    curve
      .withColumn("is_change", row_number().over(peak) === 1)
      .select("series", "day", "t", "n_events", "s_num", "is_change")
  }

  /** Zero-clamped running balance per series — the inventory / queue /
    * credit-balance recursion S_t = max(0, S_{t−1} + x_t), which looks
    * inherently sequential (each step consults the clamp) but has the
    * Lindley-recursion closed form S_t = P_t − min(0, min_{i≤t} P_i)
    * over the plain prefix sums P: two running windows on the SAME
    * partition-and-order spec, evaluated in one window exec, no
    * stateful scan, no mapGroups. Per-series reduction then reports
    * the move count, the PEAK clamped balance, the final clamped
    * balance (= Σdelta − min(0, min P): the last row's running min is
    * the global min), and how much demand the clamp discarded
    * (`lost = −min(0, min P)` — the stockout units a naive unclamped
    * sum would silently go negative by).
    *
    * Scale shape: one shuffle on the series key; windows order one
    * series' moves, never the global stream. The order columns must
    * totally order each series or the recursion itself is ill-defined
    * — ties are the CALLER's modeling bug, so pass tie-breakers.
    */
  def clampedBalance(moves0: DataFrame, seriesCol: String, deltaCol: String,
                     orderCols: Seq[String]): DataFrame = {
    // a row with a NULL order column can't be placed in the recursion
    // (and engines NULL-sort differently); a NULL delta isn't a move.
    // Both excluded (fuzz r12) — quarantine is the dirty-row path.
    val moves = moves0.filter(
      (orderCols :+ deltaCol).map(col(_).isNotNull).reduce(_ && _))
    val w = Window.partitionBy(seriesCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bal = moves
      .withColumn("__p", sum(col(deltaCol)).over(w))
      // same spec: the second window reuses the first's shuffle + sort
      .withColumn("__floor", least(lit(0L), min(col("__p")).over(w)))
      .withColumn("__bal", col("__p") - col("__floor"))
    // the final row's running min IS the global min and its prefix IS
    // the total, so final balance = Σdelta − min(0, min P): plain
    // aggregates, no last-row selection needed
    val gmin = least(lit(0L), min(col("__p")))
    bal.groupBy(col(seriesCol))
      .agg(count(lit(1)).as("n_moves"),
        max(col("__bal")).as("peak_balance"),
        (sum(col(deltaCol)) - gmin).as("final_balance"),
        (-gmin).as("lost_units"))
  }

  /** Per-series calendar-lag autocorrelation — the seasonality
    * detector (lag 7 on a daily series ≫ lag 1 says "weekly"). For
    * each lag k, pairs (x_t, x_{t−k}) align by EXACT calendar distance
    * (an equi-join of the series on `day = day + k`; missing days
    * simply contribute no pair — no imputation is invented), and the
    * Pearson r over the pairs comes from exact int64 moment sums the
    * [[Stats.correlationMatrix]] way: one combinable aggregation per
    * lag, r a fixed double expression, n·Σ products formed in double.
    * Constant series (either leg) → NULL r.
    *
    * Scale shape: the series table materializes once
    * (localCheckpoint) and each lag is one self-equi-join on
    * (series, day) — shuffle keyed by the series+day pair, never a
    * window over the global history — plus a combinable per-series
    * aggregation. Output: (series, lag, n_pairs, exact sums, acf).
    */
  /** Trend/residual decomposition by centered moving average — the
    * classical-decomposition first step, exact: per (series, day) the
    * trend is the mean over the CALENDAR window [day−r, day+r] (a
    * RANGE frame on the day value, so calendar gaps shrink the window
    * instead of silently widening it the way a ROWS frame would),
    * carried as `trend_micro = wsum·10⁶ div wn` — integer floor
    * division of exact int64s, no float mean — and the residual as
    * `dev_micro = v·10⁶ − trend_micro`. The window row count `wn`
    * rides along so a consumer can discard edge rows with partial
    * windows by its own policy instead of the operator inventing one.
    *
    * Scale shape: ONE window spec per series ordered by day (sum and
    * count share the shuffle+sort), partitioned by series — never a
    * global sort. Non-negative day spans only constrain the caller's
    * epoch-day encoding, not the math (sums may be negative; division
    * semantics require wsum·10⁶ ≥ 0 OR a floor-consistent engine —
    * Spark `div` truncates, DuckDB `//` floors, so negative trend
    * sums would diverge: rejected up front with a named error column
    * guard at the caller's option; the catalog query uses
    * non-negative quantities).
    */
  def trendDecompose(series: DataFrame, seriesCol: String, dayCol: String,
                     valCol: String, radius: Int): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val w = Window.partitionBy(col("g")).orderBy(col("d"))
      .rangeBetween(-radius.toLong, radius.toLong)
    series.select(col(seriesCol).as("g"), col(dayCol).cast("long").as("d"),
        col(valCol).cast("long").as("v"))
      .filter(col("g").isNotNull && col("d").isNotNull && col("v").isNotNull)
      .withColumn("wn", count(lit(1)).over(w))
      .withColumn("wsum", sum(col("v")).over(w))
      .withColumn("trend_micro", expr("wsum * 1000000L div wn"))
      .withColumn("dev_micro", col("v") * lit(1000000L) - col("trend_micro"))
      .select("g", "d", "v", "wn", "wsum", "trend_micro", "dev_micro")
  }

  def autocorrelation(series: DataFrame, seriesCol: String, dayCol: String,
                      valCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), "lags must be >= 1")
    val base = series.select(col(seriesCol).as("g"), col(dayCol).cast("long").as("d"),
        col(valCol).cast("long").as("v"))
      .filter(col("g").isNotNull && col("d").isNotNull && col("v").isNotNull)
      .localCheckpoint(true)
    def dd(c: Column) = c.cast("double")
    lags.map { k =>
      val m = base.as("a").join(base.as("b"),
          col("a.g") === col("b.g") && col("a.d") === col("b.d") + lit(k.toLong))
        .select(col("a.g").as("g"), col("a.v").as("x"), col("b.v").as("y"))
        .groupBy("g")
        .agg(count(lit(1)).as("n_pairs"),
          sum("x").as("sum_x"), sum("y").as("sum_y"),
          sum(col("x") * col("x")).as("sum_xx"),
          sum(col("y") * col("y")).as("sum_yy"),
          sum(col("x") * col("y")).as("sum_xy"))
      val vx = dd(col("n_pairs")) * dd(col("sum_xx")) - dd(col("sum_x")) * dd(col("sum_x"))
      val vy = dd(col("n_pairs")) * dd(col("sum_yy")) - dd(col("sum_y")) * dd(col("sum_y"))
      val cov = dd(col("n_pairs")) * dd(col("sum_xy")) - dd(col("sum_x")) * dd(col("sum_y"))
      m.withColumn("lag", lit(k.toLong))
        .withColumn("acf", when(vx > 0 && vy > 0, cov / (sqrt(vx) * sqrt(vy))))
        .select("g", "lag", "n_pairs", "sum_x", "sum_y", "sum_xx", "sum_yy",
          "sum_xy", "acf")
    }.reduce(_.unionByName(_))
  }

  /** Integer EWMA smoothing per series, α = 1/2: the classic
    * exponentially-weighted level filter made hash-exact by folding in
    * INTEGER milli-units — `s ← (s + x) div 2` left-folded over the
    * series in (ts, id) order, seeded with the FIRST observation (the
    * standard warm start; a zero seed would bias every short series
    * toward 0). α = 1/2 keeps the recurrence a single integer add +
    * shift, so both engines (Spark `aggregate`, DuckDB `list_reduce`)
    * land on the identical int64 at every step — no float-summation
    * order anywhere. Values enter as `round(abs(value)·1000)`: the
    * abs keeps the fold domain non-negative, where Spark's truncating
    * `div` and the oracle's flooring `//` agree.
    *
    * Scale shape: one shuffle on the series key; per-key state is the
    * series' own observation list (the same per-entity bound every
    * series operator here carries — events per user, not events
    * total). The fold is O(len) per key, codegen'd higher-order
    * `aggregate`, no window over raw events, no driver collect.
    * Output: (key, n_obs, last_milli, ewma_milli, dev_milli,
    * is_anomaly = |dev| > ewma).
    */
  def ewmaSmooth(events: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, idCol: String = "event_id"): DataFrame = {
    val rows = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull && col(valCol).isNotNull)
      .select(col(keyCol).as("k"),
        struct(unix_micros(col(tsCol).cast("timestamp")).as("ts"),
          col(idCol).as("id"),
          round(abs(col(valCol)) * 1000).cast("long").as("x")).as("ob"))
    rows.groupBy("k")
      .agg(sort_array(collect_list(col("ob"))).as("obs"))
      .withColumn("xs", expr("transform(obs, o -> o.x)"))
      .withColumn("n_obs", size(col("xs")).cast("long"))
      .withColumn("last_milli", expr("element_at(xs, -1)"))
      .withColumn("ewma_milli",
        expr("aggregate(slice(xs, 2, size(xs) - 1), xs[0], (acc, x) -> (acc + x) div 2L)"))
      .withColumn("dev_milli", col("last_milli") - col("ewma_milli"))
      .withColumn("is_anomaly", abs(col("dev_milli")) > col("ewma_milli"))
      .select(col("k").as(keyCol), col("n_obs"), col("last_milli"),
        col("ewma_milli"), col("dev_milli"), col("is_anomaly"))
  }

  /** SAX symbolization (Lin et al. 2003, "A Symbolic Representation of
    * Time Series"): each series is PAA-reduced to `frames` equal-count
    * frames (frame of the i-th observation = `i·frames div n` — the
    * deterministic integer split), each frame mean z-scored against
    * the series' own mean/std and binned into the 4-letter alphabet at
    * the standard N(0,1) quartile breakpoints ±0.6745 and 0. Every
    * mean/variance input is an exact int64 sum of milli-scaled values;
    * z is a fixed double expression over those integers, so the
    * breakpoint comparisons see bit-identical doubles on both engines.
    * A flat series (n·Σx² = (Σx)², exact integer test) maps to 'c'
    * (z = 0 falls in [0, 0.6745)). Output: one row per series —
    * (key, n_obs, sax_word).
    *
    * Scale shape: two keyed aggregations (per-frame, then per-series
    * pivot through `sort_array(collect_list)` over ≤ `frames`
    * elements) — no window over raw observations, state per key is
    * `frames` structs.
    */
  def saxSymbols(events: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, idCol: String = "event_id",
                 frames: Int = 4): DataFrame = {
    require(frames >= 1, s"frames must be >= 1, got $frames")
    val w = Window.partitionBy("k")
      .orderBy(col("ts"), col("id"))
    val rows = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull && col(valCol).isNotNull)
      .select(col(keyCol).as("k"),
        unix_micros(col(tsCol).cast("timestamp")).as("ts"), col(idCol).as("id"),
        round(col(valCol) * 1000).cast("long").as("x"))
      .withColumn("idx", row_number().over(w).cast("long") - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("k")))
      .withColumn("frame", expr(s"idx * ${frames}L div n"))
    val perFrame = rows.groupBy("k", "frame")
      .agg(count(lit(1)).as("cf"), sum("x").as("sf"),
        first(col("n")).as("n"))
    val perKey = perFrame.groupBy("k")
      .agg(first(col("n")).as("n"), sum("sf").as("s"),
        sort_array(collect_list(struct(col("frame"), col("cf"), col("sf")))).as("fs"))
    // Σx² must come from the row table (frame sums lose it)
    val sq = rows.groupBy("k").agg(sum(col("x") * col("x")).as("q"))
    def dd(c: Column) = c.cast("double")
    perKey.join(sq, "k")
      .withColumn("var_num", col("n") * col("q") - col("s") * col("s"))
      .withColumn("sax_word", expr(
        """concat_ws('', transform(fs, f ->
          |  CASE WHEN var_num = 0L THEN 'c'
          |    ELSE CASE
          |      WHEN (CAST(f.sf AS DOUBLE) / CAST(f.cf AS DOUBLE)
          |            - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |           * CAST(n AS DOUBLE) / SQRT(CAST(var_num AS DOUBLE)) < -0.6745D THEN 'a'
          |      WHEN (CAST(f.sf AS DOUBLE) / CAST(f.cf AS DOUBLE)
          |            - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |           * CAST(n AS DOUBLE) / SQRT(CAST(var_num AS DOUBLE)) < 0.0D THEN 'b'
          |      WHEN (CAST(f.sf AS DOUBLE) / CAST(f.cf AS DOUBLE)
          |            - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |           * CAST(n AS DOUBLE) / SQRT(CAST(var_num AS DOUBLE)) < 0.6745D THEN 'c'
          |      ELSE 'd' END END))""".stripMargin))
      .select(col("k").as(keyCol), col("n").as("n_obs"), col("sax_word"))
  }

  /** Lead-lag cross-correlation between two daily count series: for
    * each lag L in [0, maxLag], Pearson correlation of (x_d, y_{d+L})
    * over the shared day spine d ∈ [d0, d1−L] — the does-x-precede-y
    * diagnostic (errors after deploys, purchases after campaigns).
    * Both series are zero-filled over the FULL [d0, d1] spine first —
    * skipping absent days would silently correlate only co-active
    * days and flip signs on sparse series. Counts are exact int64;
    * each lag's Σx/Σy/Σxy/Σx²/Σy² are exact integer sums over the
    * spine join, and the correlation is the one fixed double formula.
    *
    * Scale shape: the fact scan reduces to per-day counts (combinable,
    * day-cardinality output); everything after — spine, per-lag joins
    * — is day-spine-sized (years, not rows). maxLag+1 spine self-joins
    * on consecutive integers, each broadcast-sized.
    */
  def crossCorrelation(events: DataFrame, tsCol: String, typeCol: String,
                       xType: String, yType: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val days = events.filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(expr(s"floor(unix_micros(CAST($tsCol AS TIMESTAMP)) / 1000000L) div 86400L").as("d"),
        col(typeCol).as("t"))
      .groupBy("d")
      .agg(sum(when(col("t") === xType, 1L).otherwise(0L)).as("x"),
        sum(when(col("t") === yType, 1L).otherwise(0L)).as("y"))
    val bounds = days.agg(min("d").as("d0"), max("d").as("d1"))
    val spine = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .join(days, Seq("d"), "left")
      .na.fill(0L, Seq("x", "y"))
    def dd(c: Column) = c.cast("double")
    (0 to maxLag).map { lagK =>
      val m = spine.as("a").join(spine.as("b"),
          col("b.d") === col("a.d") + lit(lagK.toLong))
        .select(col("a.x").as("x"), col("b.y").as("y"))
        .agg(count(lit(1)).as("n_days"),
          sum("x").as("sum_x"), sum("y").as("sum_y"),
          sum(col("x") * col("x")).as("sum_xx"),
          sum(col("y") * col("y")).as("sum_yy"),
          sum(col("x") * col("y")).as("sum_xy"))
      val vx = dd(col("n_days")) * dd(col("sum_xx")) - dd(col("sum_x")) * dd(col("sum_x"))
      val vy = dd(col("n_days")) * dd(col("sum_yy")) - dd(col("sum_y")) * dd(col("sum_y"))
      val cov = dd(col("n_days")) * dd(col("sum_xy")) - dd(col("sum_x")) * dd(col("sum_y"))
      m.withColumn("lag", lit(lagK.toLong))
        .withColumn("xcorr", when(vx > 0 && vy > 0, cov / (sqrt(vx) * sqrt(vy))))
        // an ungrouped agg yields its count-0 row even when the lag
        // exceeds the day span; a lag with no pairs must be ABSENT
        .filter(col("n_days") > 0)
        .select("lag", "n_days", "sum_x", "sum_y", "sum_xy", "xcorr")
    }.reduce(_.unionByName(_))
  }

  /** Holt double-exponential (level + trend) forecast per series,
    * α = β = 1/2 — [[ewmaSmooth]]'s big sibling: EWMA flattens a
    * trending series into permanent lag; Holt carries an explicit
    * trend state and extrapolates it. Both states ride ONE packed
    * int64 accumulator through the same fold machinery (Spark
    * `aggregate` ↔ DuckDB `list_reduce`):
    *
    *   acc = λ·2³² + (t + 2³¹)
    *   λ' = (y + λ + t) div 2          (floor-Holt level update)
    *   t' = (λ' − λ + t) div 2         (floor-Holt trend update)
    *
    * where y = x_milli + 2³⁰ is the OFFSET observation: the level then
    * orbits 2³⁰, keeping every div operand strictly positive — the
    * domain where Spark's truncating `div` and the oracle's flooring
    * `//` are the same function (the trend update adds its offset
    * inside the numerator for the same reason: `(λ'−λ+u+2³¹) div 2`
    * with u = t+2³¹ is exactly floor((λ'−λ+t)/2)+2³¹ because the
    * shifted operand is positive). Quantization error vs real-valued
    * Holt is < 1 milli-unit per step, by the floor contract.
    * Seed: λ₀ = y₀, t₀ = 0 (the standard cold start).
    * Forecast_h = level + h·trend, exact integers.
    * Output per series: (key, n_obs, level_milli, trend_milli,
    * forecast_1, forecast_2, forecast_3).
    * Bound: |x| ≤ 2²⁹ milli-units (~5·10⁸) keeps the pack in int64.
    */
  def holtForecast(events: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, idCol: String = "event_id"): DataFrame = {
    val C = 1L << 30 // level-domain offset
    val P = 1L << 32 // pack base
    val H = 1L << 31 // trend offset inside the pack
    val rows = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull && col(valCol).isNotNull)
      .select(col(keyCol).as("k"),
        struct(unix_micros(col(tsCol).cast("timestamp")).as("ts"),
          col(idCol).as("id"),
          (round(abs(col(valCol)) * 1000).cast("long") + lit(C)).as("y")).as("ob"))
    rows.groupBy("k")
      .agg(sort_array(collect_list(col("ob"))).as("obs"))
      .withColumn("ys", expr("transform(obs, o -> o.y)"))
      .withColumn("n_obs", size(col("ys")).cast("long"))
      // trend repack: stored u' = (λ'−λ+u+H) div 2 where u = t+H, so
      // the operand is λ'−λ+t+2H — positive, and dividing the 2H by 2
      // leaves exactly the +H offset the unpack below removes
      .withColumn("acc", expr(
        s"""aggregate(slice(ys, 2, size(ys) - 1), ys[0] * ${P}L + ${H}L,
           |  (acc, y) -> ((y + (acc div ${P}L) + ((acc % ${P}L) - ${H}L)) div 2L) * ${P}L
           |    + ((((y + (acc div ${P}L) + ((acc % ${P}L) - ${H}L)) div 2L)
           |        - (acc div ${P}L) + (acc % ${P}L) + ${H}L) div 2L))""".stripMargin))
      .withColumn("level_milli", expr(s"acc div ${P}L - ${C}L"))
      .withColumn("trend_milli", expr(s"acc % ${P}L - ${H}L"))
      .withColumn("forecast_1", col("level_milli") + col("trend_milli"))
      .withColumn("forecast_2", col("level_milli") + lit(2L) * col("trend_milli"))
      .withColumn("forecast_3", col("level_milli") + lit(3L) * col("trend_milli"))
      .select(col("k").as(keyCol), col("n_obs"), col("level_milli"),
        col("trend_milli"), col("forecast_1"), col("forecast_2"), col("forecast_3"))
  }

  /** Mann–Kendall trend test per series (r12) — the distribution-free
    * "is this series trending" monitor beside [[cusumChangepoint]]'s
    * regime-shift flag: S = Σ_{i<j} sign(x_j − x_i) over the series'
    * daily values in day order, with the tie-adjusted variance
    * var = (m(m−1)(2m+5) − Σ_t t(t−1)(2t+5)) / 18 and the
    * continuity-corrected z = (S − sign(S)) / √var.
    *
    * Everything except the final z is EXACT int64: S from a per-series
    * day-pair self-join (series are day-curves, ≤ a few thousand rows
    * each at any corpus size — the pair join is per-series quadratic
    * in DAYS, never in events), var18 (the ×18-scaled variance) from
    * per-value tie counts. Output: (series, m_days, s_stat, var18, z);
    * z NULL for constant series (var18 = 0) or m < 2.
    */
  def mannKendall(events: DataFrame, seriesCol: String,
                  tsCol: String): DataFrame = {
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .agg(count(lit(1)).as("x"))
    val s = daily.as("a").join(daily.as("b"),
        col("a.series") === col("b.series") && col("a.day") < col("b.day"))
      .groupBy(col("a.series").as("series"))
      .agg(sum(signum(col("b.x") - col("a.x")).cast("long")).as("s_stat"))
    val ties = daily.groupBy(col("series"), col("x"))
      .agg(count(lit(1)).as("t"))
      .groupBy("series")
      .agg(count(lit(1)).as("n_vals"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie18"))
    val m = daily.groupBy("series").agg(count(lit(1)).as("m_days"))
    m.join(s, Seq("series"), "left").join(ties, Seq("series"))
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("var18",
        col("m_days") * (col("m_days") - 1) * (col("m_days") * 2 + 5) - col("tie18"))
      .withColumn("z",
        when(col("var18") > 0,
          (col("s_stat") - signum(col("s_stat")).cast("long")).cast("double") /
            sqrt(col("var18").cast("double") / 18.0)))
      .select("series", "m_days", "s_stat", "var18", "z")
  }

  /** Theil–Sen robust trend slope per series — the median of all
    * pairwise day-curve slopes, the estimator that shrugs off the
    * outlier days that wreck an OLS fit. Slopes are exact integers in
    * milli-units: `1000·(x_b − x_a) div (day_b − day_a)` (truncating ÷
    * pairs with the oracle's `//`), the median is the LOWER median
    * (element ⌈n/2⌉ by slope order — value-deterministic under ties),
    * and the pair set is the DAY-CURVE self-join (≤ span² pairs per
    * series, never event-sized — the mannKendall shape). Output per
    * series: (series, m_days, n_pairs, slope_milli).
    */
  def theilSen(events: DataFrame, seriesCol: String, tsCol: String): DataFrame = {
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .agg(count(lit(1)).as("x"))
    val slopes = daily.as("a").join(daily.as("b"),
        col("a.series") === col("b.series") && col("a.day") < col("b.day"))
      .select(col("a.series").as("series"),
        ((col("b.x") - col("a.x")) * 1000L).as("__num"),
        (col("b.day") - col("a.day")).as("__den"))
      .select(col("series"),
        graft.functions.TimeFunctions.truncDiv(col("__num"), col("__den"))
          .as("slope_milli"))
    val w = Window.partitionBy("series").orderBy("slope_milli")
    val ranked = slopes
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__np", count(lit(1)).over(Window.partitionBy("series")))
    val m = daily.groupBy("series").agg(count(lit(1)).as("m_days"))
    ranked.filter(col("__rn") ===
        graft.functions.TimeFunctions.truncDiv(col("__np") + 1, lit(2L)))
      .select(col("series"), col("__np").as("n_pairs"), col("slope_milli"))
      .join(m, "series")
      .select("series", "m_days", "n_pairs", "slope_milli")
  }

  /** MASE-style forecastability diagnostic per series: the seasonal
    * (calendar lag-7) naive forecast's summed absolute error against
    * the successive-observed-day naive's — "is there weekly structure
    * worth modeling". Both error sums are exact int64 (absolute count
    * differences over the day curve); `mase` is one IEEE division.
    * The lag-1 pairing is between successive OBSERVED days (row
    * order), the lag-7 pairing is exact calendar day−7 (missing days
    * skip the pair) — both deterministic. Output per series:
    * (series, n1_pairs, sae1, n7_pairs, sae7, mase) — mase NULL when
    * either pair set is empty or the lag-1 error sum is zero.
    */
  def maseDiagnostic(events: DataFrame, seriesCol: String,
                     tsCol: String): DataFrame = {
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .agg(count(lit(1)).as("x"))
    val byDay = Window.partitionBy("series").orderBy("day")
    val lag1 = daily
      .withColumn("__px", lag(col("x"), 1).over(byDay))
      .filter(col("__px").isNotNull)
      .groupBy("series")
      .agg(count(lit(1)).as("n1_pairs"), sum(abs(col("x") - col("__px"))).as("sae1"))
    val lag7 = daily.as("c").join(daily.as("p"),
        col("c.series") === col("p.series") && col("p.day") === col("c.day") - 7)
      .groupBy(col("c.series").as("series"))
      .agg(count(lit(1)).as("n7_pairs"),
        sum(abs(col("c.x") - col("p.x"))).as("sae7"))
    lag1.join(lag7, Seq("series"), "left")
      .na.fill(0L, Seq("n7_pairs", "sae7"))
      .withColumn("mase", when(col("n1_pairs") > 0 && col("n7_pairs") > 0 &&
          col("sae1") > 0,
        (col("sae7").cast("double") / col("n7_pairs").cast("double")) /
          (col("sae1").cast("double") / col("n1_pairs").cast("double"))))
      .select("series", "n1_pairs", "sae1", "n7_pairs", "sae7", "mase")
  }

  /** Wald–Wolfowitz runs test per series (r12) — "is the sequence of
    * above/below-median days random, or does it cluster" (sticky
    * regimes give FEW runs; oscillation gives many). The series median
    * is exact (`2·median` as the sum of the two middle order
    * statistics — the sampled-median convention, but over the FULL
    * day curve, which is bounded by the calendar); days equal to the
    * median are dropped (the textbook rule), runs counted by one lag
    * window in day order, and z = (R − μ) / σ with
    * μ = 2·n1·n2/(n1+n2) + 1 computed as one double expression over
    * exact integer counts.
    *
    * Scale shape: one combinable (series, day) count, two per-series
    * windows over day-curve-sized frames, one combinable reduction.
    * Output: (series, n_above, n_below, runs, z); z NULL when either
    * side is empty or n < 2.
    */
  def runsTest(events: DataFrame, seriesCol: String,
               tsCol: String): DataFrame = {
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .agg(count(lit(1)).as("x"))
    val byVal = Window.partitionBy("series").orderBy(col("x"), col("day"))
    val per = Window.partitionBy("series")
    val med = daily
      .withColumn("rn", row_number().over(byVal).cast("long"))
      .withColumn("m", count(lit(1)).over(per))
      // integer div, NOT Column `/` (which is double division and
      // never equals rn when m is even)
      .withColumn("lo", when(col("rn") === expr("(m + 1) div 2"), col("x")))
      .withColumn("hi", when(col("rn") === expr("(m + 2) div 2"), col("x")))
      .groupBy("series")
      .agg((max("lo") + max("hi")).as("med2"))
    val signed = daily.join(med, "series")
      .filter(col("x") * 2 =!= col("med2"))
      .withColumn("sgn", when(col("x") * 2 > col("med2"), 1).otherwise(-1))
    val byDay = Window.partitionBy("series").orderBy("day")
    signed
      .withColumn("chg",
        when(lag(col("sgn"), 1).over(byDay).isNull ||
          lag(col("sgn"), 1).over(byDay) =!= col("sgn"), 1L).otherwise(0L))
      .groupBy("series")
      .agg(sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_below"),
        sum("chg").as("runs"))
      .withColumn("z", {
        val n1 = col("n_above").cast("double"); val n2 = col("n_below").cast("double")
        val n = n1 + n2
        val mu = lit(2.0) * n1 * n2 / n + lit(1.0)
        val sig2 = (lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n)) / (n * n * (n - lit(1.0)))
        when(col("n_above") > 0 && col("n_below") > 0 &&
          (col("n_above") + col("n_below")) > 1 && sig2 > 0,
          (col("runs").cast("double") - mu) / sqrt(sig2))
      })
      .select("series", "n_above", "n_below", "runs", "z")
  }

  /** Turning-points test of serial randomness per series ([[runsTest]]'s
    * shape-sensitive sibling): over the daily-count series, count
    * interior days that are a STRICT local max or min of their
    * (prev, cur, next) triple — ties produce no turning point, the
    * convention that keeps both engines exact — then the normal
    * approximation z = (T − 2(n−2)/3) / √((16n−29)/90). Counts exact
    * int64 via a PARTITIONED lag/lead window over per-(series, day)
    * aggregates; z one fixed double expression. Output per series:
    * (series, n_days, t_points, z) — z NULL when n < 4 (no variance).
    */
  def turningPoints(events: DataFrame, seriesCol: String,
                    tsCol: String): DataFrame = {
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .agg(count(lit(1)).as("x"))
    val byDay = Window.partitionBy("series").orderBy("day")
    val flagged = daily
      .withColumn("__pv", lag(col("x"), 1).over(byDay))
      .withColumn("__nx", lead(col("x"), 1).over(byDay))
      .withColumn("__tp", when(col("__pv").isNotNull && col("__nx").isNotNull &&
        ((col("x") > col("__pv") && col("x") > col("__nx")) ||
          (col("x") < col("__pv") && col("x") < col("__nx"))), 1L).otherwise(0L))
    def dd(c: Column) = c.cast("double")
    flagged.groupBy("series")
      .agg(count(lit(1)).as("n_days"), sum("__tp").as("t_points"))
      .withColumn("z", when(col("n_days") >= 4,
        (dd(col("t_points")) - lit(2.0) * (dd(col("n_days")) - 2.0) / 3.0) /
          sqrt((lit(16.0) * dd(col("n_days")) - 29.0) / 90.0)))
      .select("series", "n_days", "t_points", "z")
  }

  /** Durbin–Watson autocorrelation test on per-series OLS trend
    * residuals — "after removing the linear trend, do adjacent days
    * still co-move" (DW ≈ 2 none, → 0 positive, → 4 negative):
    * per-series slope/intercept from exact int64 sums over
    * (day − min_day, count) points (the [[Stats.olsPerGroup]]
    * algebra), residuals e_t fixed double expressions of exact
    * integers, and both DW sums per-term floor-quantized at 2²⁰ and
    * integer-summed (order-free) — dw = num_q / den_q one division.
    * Lag runs under a PARTITIONED window over the day curve. Output
    * per series: (series, n_days, num_q, den_q, dw) — NULL when the
    * trend is undefined (constant day span) or den_q = 0 (perfect
    * fit). Exactness bound: e² · 2²⁰ per term within int64 through
    * |e| ≈ 9·10⁴ daily-count units.
    */
  def durbinWatson(events: DataFrame, seriesCol: String,
                   tsCol: String): DataFrame = {
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .agg(count(lit(1)).as("y"))
    val based = daily
      .withColumn("x", col("day") - min("day").over(Window.partitionBy("series")))
    def dd(c: Column) = c.cast("double")
    val m = based.groupBy("series").agg(count(lit(1)).as("n_days"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    val vx = dd(col("n_days")) * dd(col("sxx")) - dd(col("sx")) * dd(col("sx"))
    val fit = m
      .withColumn("slope", when(vx > 0,
        (dd(col("n_days")) * dd(col("sxy")) - dd(col("sx")) * dd(col("sy"))) / vx))
      .withColumn("icept",
        (dd(col("sy")) - col("slope") * dd(col("sx"))) / dd(col("n_days")))
      .select("series", "n_days", "slope", "icept")
    val byDay = Window.partitionBy("series").orderBy("day")
    based.join(fit, "series")
      .withColumn("e", dd(col("y")) - col("icept") - col("slope") * dd(col("x")))
      .withColumn("__pe", lag(col("e"), 1).over(byDay))
      .withColumn("__num_t", when(col("__pe").isNotNull,
        floor((col("e") - col("__pe")) * (col("e") - col("__pe")) * 1048576.0)
          .cast("long")).otherwise(0L))
      .withColumn("__den_t", floor(col("e") * col("e") * 1048576.0).cast("long"))
      .groupBy("series")
      .agg(min("n_days").as("n_days"),
        coalesce(sum("__num_t"), lit(0L)).as("num_q"),
        coalesce(sum("__den_t"), lit(0L)).as("den_q"))
      .withColumn("dw", when(col("den_q") > 0,
        dd(col("num_q")) / dd(col("den_q"))))
      .select("series", "n_days", "num_q", "den_q", "dw")
  }

  /** Seasonal strength of the weekly cycle per series:
    * F = max(0, 1 − SS_within-day-of-week / SS_total) over the daily
    * count curve — 0 means day-of-week explains nothing, → 1 means
    * the weekly profile IS the series; the variance-decomposition
    * companion to [[maseDiagnostic]]'s error-ratio view. Per-dow
    * sum-of-squares terms are fixed double expressions of exact int64
    * sums, floor-quantized at 2²⁰ and integer-summed over the ≤7-row
    * dow table (order-free); SST is one fixed expression. Day-of-week
    * is pmod(day, 7) — an arbitrary but engine-identical anchoring.
    * Output per series: (series, n_days, ssw_q, strength) — NULL when
    * SST = 0 (constant series).
    */
  def seasonalStrength(events: DataFrame, seriesCol: String,
                       tsCol: String): DataFrame = {
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("dow", pmod(col("day"), lit(7L)))
    def dd(c: Column) = c.cast("double")
    val perDow = daily.groupBy("series", "dow").agg(count(lit(1)).as("n_d"),
        sum("y").as("s_d"), sum(col("y") * col("y")).as("q_d"))
      .withColumn("__ssw_t", floor((dd(col("q_d")) -
        dd(col("s_d")) * dd(col("s_d")) / dd(col("n_d"))) * 1048576.0)
        .cast("long"))
    val tot = daily.groupBy("series").agg(count(lit(1)).as("n_days"),
      sum("y").as("s"), sum(col("y") * col("y")).as("q"))
    perDow.groupBy("series")
      .agg(coalesce(sum("__ssw_t"), lit(0L)).as("ssw_q"))
      .join(tot, "series")
      .withColumn("__sst", dd(col("q")) - dd(col("s")) * dd(col("s")) / dd(col("n_days")))
      .withColumn("strength", when(col("__sst") > 0,
        greatest(lit(0.0), lit(1.0) - dd(col("ssw_q")) / (col("__sst") * 1048576.0))))
      .select("series", "n_days", "ssw_q", "strength")
  }

  /** Single changepoint per series by binary segmentation — WHERE did
    * the level shift, where [[cusumCurve]] only says THAT it drifts:
    * for every split position i of the daily curve, the variance
    * reduction gain(i) = SST − [SSE(1..i) + SSE(i+1..n)] from
    * partitioned prefix sums (exact int64); per-candidate gains are
    * floor-quantized at 2²⁰ and the argmax ties break to the EARLIEST
    * day — engine-deterministic. Output per series: (series, n_days,
    * split_day, gain_q, gain_frac) — the split is the last day of the
    * LEFT segment; series with n < 2 emit no row, gain_frac NULL when
    * SST = 0 (constant series).
    *
    * Scale shape: one combinable daily reduction; prefix sums and the
    * argmax are windows PARTITIONED by series over day-curve frames.
    */
  def changepointBinary(events: DataFrame, seriesCol: String,
                        tsCol: String): DataFrame = {
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .agg(count(lit(1)).as("y"))
    val byDay = Window.partitionBy("series").orderBy("day")
    val cum = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val per = Window.partitionBy("series")
    def dd(c: Column) = c.cast("double")
    val pre = daily
      .withColumn("i", row_number().over(byDay).cast("long"))
      .withColumn("cs", sum("y").over(cum))
      .withColumn("cq", sum(col("y") * col("y")).over(cum))
      .withColumn("n", count(lit(1)).over(per))
      .withColumn("s", sum("y").over(per))
      .withColumn("q", sum(col("y") * col("y")).over(per))
      .filter(col("i") < col("n")) // split after i leaves a non-empty right
      .withColumn("__sst", dd(col("q")) - dd(col("s")) * dd(col("s")) / dd(col("n")))
      .withColumn("__sse",
        (dd(col("cq")) - dd(col("cs")) * dd(col("cs")) / dd(col("i"))) +
          (dd(col("q")) - dd(col("cq")) -
            (dd(col("s")) - dd(col("cs"))) * (dd(col("s")) - dd(col("cs"))) /
              (dd(col("n")) - dd(col("i")))))
      .withColumn("gain_q",
        floor((col("__sst") - col("__sse")) * 1048576.0).cast("long"))
    val best = Window.partitionBy("series")
      .orderBy(col("gain_q").desc, col("day").asc)
    pre.withColumn("__rk", row_number().over(best)).filter(col("__rk") === 1)
      .withColumn("gain_frac", when(col("__sst") > 0,
        dd(col("gain_q")) / (col("__sst") * 1048576.0)))
      .select(col("series"), col("n").as("n_days"), col("day").as("split_day"),
        col("gain_q"), col("gain_frac"))
  }

  /** Portmanteau whiteness diagnostic in the Ljung–Box form over the
    * daily-count series: Q = n(n+2)·Σ_{k=1..m} r_k²/(n_k) — "is there
    * ANY autocorrelation left across the first m lags" (the
    * one-number residual-whiteness gate beside the per-lag
    * [[autocorrelation]] rows and [[durbinWatson]]'s lag-1 view).
    * r_k is the lag-k pairwise-complete Pearson the autocorrelation
    * kernel already defines (exact int64 moment sums; robust to
    * calendar gaps, documented in place of the textbook fixed-mean
    * acf), n_k its pair count. Each lag's term
    * floor(r_k²·2⁴⁰ / n_k) is an exact int64, so the Σ over lags is
    * order-free; Q is the one final double. Output per series:
    * (series, n_days, m_lags, lb_q, q_stat).
    */
  def ljungBox(events: DataFrame, seriesCol: String, tsCol: String,
               maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 28, s"maxLag must be in [1, 28], got $maxLag")
    def dd(c: Column) = c.cast("double")
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("g"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("d"))
      .agg(count(lit(1)).as("v"))
    val acf = autocorrelation(daily, "g", "d", "v", (1 to maxLag))
      .withColumn("__tq", when(col("acf").isNotNull && col("n_pairs") > 0,
        floor(col("acf") * col("acf") * lit(1099511627776.0) /
          dd(col("n_pairs"))).cast("long")).otherwise(lit(0L)))
    val terms = acf.groupBy("g")
      .agg(coalesce(sum("__tq"), lit(0L)).as("lb_q"))
    val len = daily.groupBy("g").agg(count(lit(1)).as("n_days"))
    len.join(terms, Seq("g"), "left")
      .na.fill(0L, Seq("lb_q"))
      .withColumn("q_stat",
        dd(col("n_days")) * (dd(col("n_days")) + lit(2.0)) *
          dd(col("lb_q")) / lit(1099511627776.0))
      .select(col("g").as("series"), col("n_days"),
        lit(maxLag.toLong).as("m_lags"), col("lb_q"), col("q_stat"))
  }

  /** sMAPE of the weekly seasonal-naive forecast per series — the
    * scale-free companion to [[maseDiagnostic]] (same lag-7 naive
    * baseline, symmetric-percentage units): over days with a
    * observation 7 days earlier, smape_micro =
    * 2·10⁶·Σ|y_d − y_{d−7}| div Σ(y_d + y_{d−7}). Counts are
    * integers so both sums are exact; the one division is integer
    * micro-units. Output per series:
    * (series, n_pairs, abs_err_sum, scale_sum, smape_micro).
    */
  def smapeSeasonal(events: DataFrame, seriesCol: String, tsCol: String,
                    season: Int = 7): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("g"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("d"))
      .agg(count(lit(1)).as("v"))
      .localCheckpoint(true)
    daily.as("a").join(daily.as("b"),
        col("a.g") === col("b.g") && col("a.d") === col("b.d") + lit(season.toLong))
      .select(col("a.g").as("g"), col("a.v").as("y"), col("b.v").as("y7"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_pairs"),
        sum(abs(col("y") - col("y7"))).as("abs_err_sum"),
        sum(col("y") + col("y7")).as("scale_sum"))
      .withColumn("smape_micro", when(col("scale_sum") > 0,
        graft.functions.TimeFunctions.truncDiv(
          lit(2000000L) * col("abs_err_sum"), col("scale_sum"))))
      .select(col("g").as("series"), col("n_pairs"), col("abs_err_sum"),
        col("scale_sum"), col("smape_micro"))
  }

  /** Gumbel extreme-value fit per series by weekly block maxima — the
    * capacity-planning tail estimate ("what daily peak should we
    * provision for once a year") beside the central-tendency
    * forecasts: weekly maxima m_w of the daily counts, method-of-
    * moments Gumbel parameters β = s·√6/π and μ = m̄ − γ·β
    * (Euler–Mascheroni γ), and the T-block return level
    * R_T = μ − β·ln(−ln(1 − 1/T)) at T = 52 (the once-a-year peak
    * from weekly blocks). Block maxima and their moment sums are
    * exact int64; β/μ/R are fixed double expressions over them.
    * Output per series: (series, n_blocks, sum_m, sumsq_m, beta, mu,
    * r52) — NULL fit when fewer than 2 blocks or zero variance.
    */
  def gumbelBlockMaxima(events: DataFrame, seriesCol: String,
                        tsCol: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("g"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("d"))
      .agg(count(lit(1)).as("y"))
    val blocks = daily
      .groupBy(col("g"), graft.functions.TimeFunctions.floorDiv(col("d"), 7L)
        .as("w"))
      .agg(max("y").as("m"))
    blocks.groupBy("g")
      .agg(count(lit(1)).as("n_blocks"), sum("m").as("sum_m"),
        sum(col("m") * col("m")).as("sumsq_m"))
      .withColumn("__var", when(col("n_blocks") >= 2,
        (dd(col("n_blocks")) * dd(col("sumsq_m")) -
          dd(col("sum_m")) * dd(col("sum_m"))) /
          (dd(col("n_blocks")) * (dd(col("n_blocks")) - 1.0))))
      // sqrt(6)/π is computed in-engine on BOTH sides (sqrt and the
      // pi() literal are IEEE-identical), not as a hand-written
      // decimal literal that could miss the exact double
      .withColumn("beta", when(col("__var") > 0,
        sqrt(col("__var")) * (sqrt(lit(6.0)) / lit(math.Pi))))
      .withColumn("mu", when(col("beta").isNotNull,
        dd(col("sum_m")) / dd(col("n_blocks")) -
          lit(0.5772156649015329) * col("beta")))
      .withColumn("r52", when(col("beta").isNotNull,
        col("mu") - col("beta") * log(-log(lit(1.0) - lit(1.0) / lit(52.0)))))
      .select(col("g").as("series"), col("n_blocks"), col("sum_m"),
        col("sumsq_m"), col("beta"), col("mu"), col("r52"))
  }

  /** Rolling z-score anomaly tally per series — the fixed-window
    * sibling of [[ewmaSmooth]]'s adaptive flag and the per-day form
    * of the seasonal-baseline tally: over the trailing `w`-day ROWS
    * frame (full windows only), a day is anomalous when
    * |y − μ| > 2σ, tested ENTIRELY in integers:
    * (w·y − S)²·(w−1) > 4·w·(w·Q − S²) — both sides exact int64
    * (bound: w³·y² < 2⁶³ → daily counts to ~10⁸ at w = 7). Output
    * per series: (series, n_days, n_windows, n_anomalies,
    * first_anomaly_day, last_anomaly_day).
    */
  def rollingZscoreAnomalies(events: DataFrame, seriesCol: String,
                             tsCol: String, w: Int = 7): DataFrame = {
    require(w >= 2 && w <= 60, s"w must be in [2, 60], got $w")
    val daily = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(seriesCol).as("g"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("d"))
      .agg(count(lit(1)).as("y"))
    val win = Window.partitionBy("g").orderBy("d")
      .rowsBetween(-(w - 1), Window.currentRow)
    val scored = daily
      .withColumn("k", count(lit(1)).over(win))
      .withColumn("s", sum("y").over(win))
      .withColumn("q", sum(col("y") * col("y")).over(win))
      .filter(col("k") === w)
      .withColumn("anom",
        (lit(w.toLong) * col("y") - col("s")) *
          (lit(w.toLong) * col("y") - col("s")) * lit((w - 1).toLong) >
        lit(4L) * lit(w.toLong) *
          (lit(w.toLong) * col("q") - col("s") * col("s")))
    val n = daily.groupBy("g").agg(count(lit(1)).as("n_days"))
    scored.groupBy("g")
      .agg(count(lit(1)).as("n_windows"),
        coalesce(sum(when(col("anom"), 1L).otherwise(0L)), lit(0L)).as("n_anomalies"),
        min(when(col("anom"), col("d"))).as("first_anomaly_day"),
        max(when(col("anom"), col("d"))).as("last_anomaly_day"))
      .join(n, "g")
      .select(col("g").as("series"), col("n_days"), col("n_windows"),
        col("n_anomalies"), col("first_anomaly_day"), col("last_anomaly_day"))
  }
  // ===== round 14 wave 2 (TimeSeries) =====

  /** Theil's U2 forecast-accuracy ratio per series — "does the
    * seasonal model beat the naive walk": daily count series, model =
    * calendar lag-7 (the [[maseDiagnostic]] seasonal convention),
    * naive = calendar lag-1, both as existing-day joins; the two
    * squared-error sums run over the COMMON support (days having both
    * lags — asymmetric support would bias the ratio) in exact int64,
    * U2 = √(SSE_model/SSE_naive) one final float. U2 < 1 ⇒ the
    * seasonal forecast adds value over persistence.
    */
  def theilU(events: DataFrame, seriesCol: String, tsCol: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val d = events.select(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .filter(col("series").isNotNull && col("day").isNotNull)
      .groupBy("series", "day").agg(count(lit(1)).as("x"))
    val l1 = d.select(col("series"), (col("day") + 1).as("day"), col("x").as("x1"))
    val l7 = d.select(col("series"), (col("day") + 7).as("day"), col("x").as("x7"))
    d.join(l1, Seq("series", "day")).join(l7, Seq("series", "day"))
      .groupBy("series")
      .agg(count(lit(1)).as("n_common"),
        sum((col("x") - col("x7")) * (col("x") - col("x7"))).as("sse_model"),
        sum((col("x") - col("x1")) * (col("x") - col("x1"))).as("sse_naive"))
      .withColumn("u2", when(col("sse_naive") > 0,
        sqrt(dd(col("sse_model")) / dd(col("sse_naive")))))
  }

  /** Pinball (quantile) loss of the per-series empirical τ = num/den
    * quantile used as a constant forecast — the eval number behind
    * quantile forecasting and SLA sizing ("how costly is calling the
    * p90 level"): the forecast per series is the LOWER empirical
    * quantile (smallest daily count with cum-count ≥ ⌈n·num/den⌉,
    * pure integer selection both engines agree on), and the loss is
    * kept in den-ths — L·den = Σ num·(y−f)⁺ + (den−num)·(f−y)⁺ —
    * exact int64 end to end; mean is one final division.
    */
  def pinballLoss(events: DataFrame, seriesCol: String, tsCol: String,
                  num: Int = 9, den: Int = 10): DataFrame = {
    require(num > 0 && num < den, s"need 0 < num < den, got $num/$den")
    def dd(c: Column) = c.cast("double")
    val d = events.select(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .filter(col("series").isNotNull && col("day").isNotNull)
      .groupBy("series", "day").agg(count(lit(1)).as("y"))
      .localCheckpoint(true)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("series").orderBy(col("y"), col("day"))
    val sz = d.groupBy("series").agg(count(lit(1)).as("n_days"))
    // target rank ⌈n·num/den⌉ = (n·num + den − 1) div den
    val f = d.withColumn("rk", row_number().over(w))
      .join(sz, "series")
      .filter(col("rk") === expr(s"(n_days * $num + ${den - 1}) div $den"))
      .select(col("series"), col("y").as("f"))
    d.join(f, "series")
      .groupBy("series")
      .agg(count(lit(1)).as("n_days"), max("f").as("forecast"),
        sum(when(col("y") >= col("f"), lit(num.toLong) * (col("y") - col("f")))
          .otherwise(lit((den - num).toLong) * (col("f") - col("y")))).as("loss_den"))
      .withColumn("mean_pinball", when(col("n_days") > 0,
        dd(col("loss_den")) / dd(col("n_days")) / lit(den.toDouble)))
  }

  /** Maximum drawdown per series over the daily cumulative value
    * curve — the risk/health number behind "how far below its peak
    * did the cumulative metric fall": cum = running Σ of exact daily
    * cents, runmax = running max, drawdown = runmax − cum; emits the
    * max drawdown with its peak and trough days (earliest-day
    * tie-break via min_by over the packed (−drawdown, day) order —
    * all integer). Two windows over one day-keyed shuffle; the curve
    * itself is never materialized driver-side.
    */
  def maxDrawdown(events: DataFrame, seriesCol: String, tsCol: String,
                  valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = events.select(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"),
        valueCol.cast("long").as("v"))
      .filter(col("series").isNotNull && col("day").isNotNull && col("v").isNotNull)
      .groupBy("series", "day").agg(sum("v").as("dv"))
    val w = Window.partitionBy("series").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = d.withColumn("cum", sum("dv").over(w))
      .withColumn("runmax", max("cum").over(w))
      .withColumn("dd_c", col("runmax") - col("cum"))
      .withColumn("__mx", max("dd_c").over(Window.partitionBy("series")))
    curve.groupBy("series")
      .agg(count(lit(1)).as("n_days"), max("cum").as("peak_cum"),
        max("dd_c").as("max_drawdown"),
        min(when(col("dd_c") === col("__mx"), col("day"))).as("trough_day"))
  }

  /** Bartels' rank version of the von Neumann ratio — the
    * distribution-free serial-RANDOMNESS test per series (beside
    * [[runsTest]]'s sign form and [[turningPoints]]' local form,
    * sensitive to slow drifts both miss): daily counts get
    * tie-averaged DOUBLED ranks (the Friedman 2·cum−t+1 integer
    * construction, so no half ever exists), RVN = Σ(R_i−R_{i+1})² /
    * Σ(R_i−R̄)² computes on the doubled ranks where the 4's cancel and
    * 2R̄ = n+1 is integer — both sums exact int64 — and the
    * asymptotic z uses Var[RVN] = 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²).
    * Output per series: (series, n_days, nm2, dn2, rvn, z_stat).
    */
  def bartelsRankTest(events: DataFrame, seriesCol: String,
                      tsCol: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val d = events.select(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .filter(col("series").isNotNull && col("day").isNotNull)
      .groupBy("series", "day").agg(count(lit(1)).as("x"))
      .localCheckpoint(true)
    val vc = d.groupBy("series", "x").agg(count(lit(1)).as("t"))
    val wv = Window.partitionBy("series").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dr = vc.withColumn("dr", lit(2) * sum("t").over(wv) - col("t") + 1)
      .select(col("series"), col("x"), col("dr"))
    val wd = Window.partitionBy("series").orderBy("day")
    val l = d.join(dr, Seq("series", "x"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy("series")))
      .withColumn("nxt", lead("dr", 1).over(wd))
    def varRvn(n: Column): Column =
      lit(4.0) * (dd(n) - 2.0) *
        (lit(5.0) * dd(n) * dd(n) - lit(2.0) * dd(n) - 9.0) /
        (lit(5.0) * dd(n) * (dd(n) + 1.0) * (dd(n) - 1.0) * (dd(n) - 1.0))
    l.groupBy("series")
      .agg(max("nn").as("n_days"),
        coalesce(sum(when(col("nxt").isNotNull,
          (col("dr") - col("nxt")) * (col("dr") - col("nxt")))
          .otherwise(lit(0L))), lit(0L)).as("nm2"),
        coalesce(sum((col("dr") - (col("nn") + 1)) *
          (col("dr") - (col("nn") + 1))), lit(0L)).as("dn2"))
      .withColumn("rvn", when(col("dn2") > 0, dd(col("nm2")) / dd(col("dn2"))))
      .withColumn("z_stat", when(col("dn2") > 0 && col("n_days") >= 3 &&
          varRvn(col("n_days")) > 0,
        (dd(col("nm2")) / dd(col("dn2")) - 2.0) / sqrt(varRvn(col("n_days")))))
  }


  /** Pettitt changepoint test per series — the rank-based (level-shift)
    * companion to the binary-segmentation mean split (328) and CUSUM
    * (210): with doubled tie-averaged ranks dr ([[bartelsRankTest]]'s
    * integer construction), U2_t = Σ_{i≤t} dr_i − t·(n+1) is EXACTLY
    * 2·U_t — pure int64 — K2 = max|U2_t| with the earliest attaining
    * day as the changepoint estimate, and the classic approximation
    * p ≈ 2·exp(−1.5·K2²/(n³+n²)) is one fixed float.
    * Output per series: (series, n_days, k2_stat, t_star_day, p_approx).
    */
  def pettittTest(events: DataFrame, seriesCol: String,
                  tsCol: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val d = events.select(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.floorDiv(
          graft.functions.TimeFunctions.epochSec(col(tsCol)), 86400L).as("day"))
      .filter(col("series").isNotNull && col("day").isNotNull)
      .groupBy("series", "day").agg(count(lit(1)).as("x"))
      .localCheckpoint(true)
    val vc = d.groupBy("series", "x").agg(count(lit(1)).as("t"))
    val wv = Window.partitionBy("series").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dr = vc.withColumn("dr", lit(2) * sum("t").over(wv) - col("t") + 1)
      .select(col("series"), col("x"), col("dr"))
    val wd = Window.partitionBy("series").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = d.join(dr, Seq("series", "x"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy("series")))
      .withColumn("tix", count(lit(1)).over(wd))
      .withColumn("u2", sum("dr").over(wd) - col("tix") * (col("nn") + 1))
      .withColumn("au2", abs(col("u2")))
      .withColumn("mx", max(abs(col("u2"))).over(Window.partitionBy("series")))
    u.groupBy("series")
      .agg(max("nn").as("n_days"), max("au2").as("k2_stat"),
        min(when(col("au2") === col("mx"), col("day"))).as("t_star_day"))
      .withColumn("p_approx", when(col("n_days") > 1,
        lit(2.0) * exp(lit(-1.5) * dd(col("k2_stat")) * dd(col("k2_stat")) /
          (dd(col("n_days")) * dd(col("n_days")) * dd(col("n_days")) +
            dd(col("n_days")) * dd(col("n_days"))))))
  }

  /** Inter-event gap memory coefficient per series — the Goh–Barabási
    * companion to the gap burstiness profile (331): Pearson r between
    * consecutive gaps (τ_i, τ_{i+1}) over the (epoch, id)-totally-
    * ordered stream, all moments exact integers in DECIMAL, r one
    * fixed float. Positive memory = long gaps follow long gaps
    * (sessions); ~0 = memoryless arrivals.
    * Output per series: (series, n_pairs, gap_sum, r_memory).
    */
  def gapMemory(events: DataFrame, seriesCol: String, tsCol: String,
                idCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    def dd(c: Column) = c.cast("double")
    val e = events.filter(col(seriesCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(seriesCol).as("series"),
        graft.functions.TimeFunctions.epochSec(col(tsCol)).as("ep"),
        col(idCol).as("eid"))
    val w = Window.partitionBy("series").orderBy(col("ep"), col("eid"))
    val gaps = e.withColumn("nxt", lead("ep", 1).over(w))
      .filter(col("nxt").isNotNull)
      .withColumn("tau", col("nxt") - col("ep"))
      .withColumn("tau2", lead("tau", 1).over(w))
      .filter(col("tau2").isNotNull)
    def s2(a: String, b: String) = coalesce(
      sum((col(a).cast(dec) * col(b)).cast(dec)), lit(0).cast(dec)).cast(dec)
    gaps.groupBy("series")
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum("tau"), lit(0L)).as("sx"),
        coalesce(sum("tau2"), lit(0L)).as("sy"),
        s2("tau", "tau").as("sxx"), s2("tau2", "tau2").as("syy"),
        s2("tau", "tau2").as("sxy"))
      .withColumn("gap_sum", col("sx"))
      .withColumn("r_memory", when(col("n_pairs") > 1 &&
          (dd(col("n_pairs")) * dd(col("sxx")) - dd(col("sx")) * dd(col("sx"))) > 0 &&
          (dd(col("n_pairs")) * dd(col("syy")) - dd(col("sy")) * dd(col("sy"))) > 0,
        (dd(col("n_pairs")) * dd(col("sxy")) - dd(col("sx")) * dd(col("sy"))) /
          (sqrt(dd(col("n_pairs")) * dd(col("sxx")) - dd(col("sx")) * dd(col("sx"))) *
            sqrt(dd(col("n_pairs")) * dd(col("syy")) - dd(col("sy")) * dd(col("sy"))))))
      .select(col("series"), col("n_pairs"), col("gap_sum"), col("r_memory"))
  }

}
