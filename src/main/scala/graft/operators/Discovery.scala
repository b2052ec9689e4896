package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema discovery over a lake: which column pairs look like foreign
  * keys? For every ordered column pair (A, B) the operator estimates
  * the CONTAINMENT of A's distinct values in B's — `|A ∩ B| / |A|` —
  * the inclusion-dependency coefficient FK detection is built on
  * (Bauckmann et al.'s SPIDER / Zhu et al.'s LSH Ensemble problem),
  * without ever joining two fact tables against each other.
  *
  * The estimator is the KMV bottom-k trick the [[Sketches]] family
  * uses: A's k smallest md5-56 value hashes are a uniform sample of
  * A's distinct values, so the fraction of them present in B's
  * distinct-hash set is an unbiased containment estimate with error
  * O(1/√k) — and because the hashes are md5-portable, an external SQL
  * engine replays sketch AND hits row-for-row (the repo-wide
  * exactness contract; a random-sample profiler could not be
  * hash-checked).
  *
  * Scale shape: each column contributes ONE distinct aggregation
  * (combinable) of its own table scan — the only fact-sized work; the
  * per-column bottom-k rides the combinable [[graft.functions
  * .KMinAgg]] (never a window over a column's distincts, which would
  * funnel a billion-distinct column through one task); the probe join
  * is hash-keyed, (columns·k) × matching-distincts sized, with the
  * exploded sketch side broadcast. The pair matrix itself is
  * columns²-sized — metadata, not data. Values hash via their
  * canonical string form, so cross-TYPE candidates (an INT key in a
  * VARCHAR column) still match.
  */
object Discovery {

  /** Inclusion-dependency candidates over `cols` = (label, frame,
    * column) triples. Output one row per ordered pair (col_a ≠
    * col_b): the sketch size actually used (`k_eff` = min(k, A's
    * distinct count)), the hit count, the containment estimate, and
    * the `fk_candidate` flag — containment ≥ tauPct% by integer
    * cross-multiply, so the flag is never decided by a float.
    * Output: (col_a, col_b, n_distinct_a, k_eff, n_hit, containment,
    * fk_candidate).
    */
  def inclusionCandidates(cols: Seq[(String, DataFrame, String)],
                          k: Int = 128, tauPct: Int = 95): DataFrame = {
    require(cols.size >= 2, "need at least two columns to compare")
    require(k >= 2 && k <= 128, s"kmv k must be in [2, 128], got $k")
    // ONE scan + ONE distinct per TABLE, not per column (guide §1.2 /
    // §6): columns sharing a source frame explode into (col_name,
    // value) rows in the same pass, and distinct-per-(col_name, value)
    // is exactly the union of the per-column distincts — same dv set,
    // m-columns-per-table fewer scans and exchanges.
    // NOTE (r15, ADVICE): grouping keys on DataFrame REFERENCE
    // identity (Dataset equality is Object equality), so the same
    // logical table passed as two separate DataFrame instances falls
    // back to one scan per instance — results stay correct, only the
    // one-scan-per-table fusion degrades. Callers (fkDiscoveryReport
    // builds each table's frame once and reuses it) must pass the
    // SAME instance for columns meant to share a scan.
    val byDf: Seq[(DataFrame, Seq[(String, String)])] = {
      val buf = scala.collection.mutable.LinkedHashMap
        .empty[DataFrame, scala.collection.mutable.ArrayBuffer[(String, String)]]
      cols.foreach { case (label, df, c) =>
        buf.getOrElseUpdate(df, scala.collection.mutable.ArrayBuffer.empty)
          .append((label, c))
      }
      buf.toSeq.map { case (df, lcs) => (df, lcs.toSeq) }
    }
    val dv = byDf.map { case (df, lcs) =>
      df.select(explode(array(lcs.map { case (label, c) =>
          struct(lit(label).as("col_name"), col(c).cast("string").as("v"))
        }: _*)).as("e"))
        .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
        .filter(col("v").isNotNull).distinct()
        .select(col("col_name"),
          graft.functions.HashFunctions.stableHash56(col("v")).as("hv"))
    }.reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // distinct count and bottom-k sketch in ONE aggregation pass over
    // the pinned dv (they used to be two scans + two shuffles)
    val ndSk = dv.groupBy("col_name")
      .agg(count(lit(1)).as("n_distinct"),
        graft.functions.KMinAgg.kMin(k)(col("hv")).as("__mins"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nd = ndSk.select(col("col_name"), col("n_distinct"))
    val sk = ndSk.select(col("col_name").as("col_a"),
      explode(col("__mins")).as("hv"))
    val hits = broadcast(sk)
      .join(dv.select(col("col_name").as("col_b"), col("hv")), "hv")
      .filter(col("col_a") =!= col("col_b"))
      .groupBy("col_a", "col_b").agg(count(lit(1)).as("n_hit"))
    val out = nd.select(col("col_name").as("col_a"),
        col("n_distinct").as("n_distinct_a"))
      .crossJoin(broadcast(nd.select(col("col_name").as("col_b"))))
      .filter(col("col_a") =!= col("col_b"))
      .join(hits, Seq("col_a", "col_b"), "left")
      .withColumn("k_eff", least(lit(k.toLong), col("n_distinct_a")))
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("containment", col("n_hit").cast("double") / col("k_eff"))
      .withColumn("fk_candidate", col("n_hit") * 100 >= col("k_eff") * tauPct)
      .select("col_a", "col_b", "n_distinct_a", "k_eff", "n_hit",
        "containment", "fk_candidate")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    dv.unpersist()
    ndSk.unpersist()
    out
  }

  /** Exact functional-dependency discovery over one table: for every
    * ordered pair (A → B) of `cols`, does each A value map to at most
    * one B value? The classic profiling primitive behind key
    * detection and normalization advice (TANE's stripped-partition
    * test, done here as plain aggregation). Output one row per pair:
    * the LHS group count, how many LHS groups map to >1 distinct B,
    * and the `holds` verdict — all exact counts, no floats at all.
    *
    * Scale shape: ONE combinable group-by per LHS column computes
    * `count(distinct B)` for every RHS at once (partial aggregation
    * map-side), so k columns cost k fact scans — not k·(k−1) — and
    * the per-pair violation count is a second combinable aggregate
    * over the grouped (distinct-A-sized) table. NULL LHS values form
    * their own group and NULL Bs don't count as a value, matching SQL
    * GROUP BY / count(DISTINCT) semantics on both engines.
    */
  def functionalDependencies(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "duplicate column in list")
    cols.map { a =>
      val rhs = cols.filterNot(_ == a)
      val aggs = rhs.map(b => countDistinct(col(b)).as(s"__d_$b"))
      val g = df.groupBy(col(a).as("__lhs"))
        .agg(aggs.head, aggs.tail: _*)
      val pairs = rhs.flatMap(b => Seq(lit(b), col(s"__d_$b")))
      g.select(explode(map(pairs: _*)).as(Seq("rhs", "__nd")))
        .groupBy("rhs")
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(a).as("lhs"), col("rhs"), col("n_lhs"),
          col("n_violating"), (col("n_violating") === 0).as("holds"))
    }.reduce(_.unionByName(_))
  }

  /** Candidate-key discovery (the UNIQUE-constraint half of schema
    * discovery, beside [[functionalDependencies]] and
    * [[inclusionCandidates]]): exact distinct counts for every single
    * column and every column pair, flagged `is_unique` when the count
    * reaches the row count and `is_minimal_key` when additionally no
    * proper subset is already unique (the TANE/HyUCC minimality
    * pruning, applied at emit — a pair whose member is a key is
    * redundant, not a discovery). NULLs: engines disagree on
    * multi-column COUNT(DISTINCT ...) null handling, so every column
    * is coalesced to a reserved sentinel and the combination packed
    * into ONE string key — NULL participates as a value (a column with
    * NULLs can still be declared unique-as-observed; the consumer adds
    * NOT NULL separately).
    *
    * Scale shape: all 𝑘 + C(𝑘,2) distinct counts ride ONE aggregation
    * (Catalyst plans multi-distinct via Expand — (combos+1)× the scan
    * width, one shuffle); the combo table is unpivoted from the
    * single result row, never collected.
    */
  def keyDiscovery(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "duplicate column in list")
    def sent(c: String) = coalesce(col(c).cast("string"), lit("␀NULL"))
    def key(cs: Seq[String]) = concat_ws("\u0001", cs.map(sent): _*)
    val combos = cols.map(Seq(_)) ++ cols.combinations(2).toSeq
    def nm(cs: Seq[String]) = cs.mkString("+")
    val aggs = combos.map(cs => countDistinct(key(cs)).as(s"__d_${nm(cs)}")) :+
      count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = combos.map { cs =>
      val uniq = col(s"__d_${nm(cs)}") === col("__n")
      val minimal =
        if (cs.size == 1) uniq
        else uniq && cs.map(c => col(s"__d_$c") =!= col("__n")).reduce(_ && _)
      struct(lit(nm(cs)).as("combo"), lit(cs.size.toLong).as("n_cols"),
        col(s"__d_${nm(cs)}").as("n_distinct"), col("__n").as("n_rows"),
        uniq.as("is_unique"), minimal.as("is_minimal_key"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select("r.combo", "r.n_cols", "r.n_distinct", "r.n_rows",
        "r.is_unique", "r.is_minimal_key")
  }
}
