package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto-maximal vectors, Börzsönyi et al. 2001): the
  * points no other point dominates, where `b` dominates `a` iff
  * b.x >= a.x ∧ b.y >= a.y with at least one strict. The classic
  * "best price-for-quantity" OLAP query that windowed SQL answers
  * with a GLOBAL sort — banned here by the window-hygiene rule — and
  * a naive NOT EXISTS answers quadratically.
  *
  * Scale shape (no global sort, no all-pairs):
  *  1. `distinct (x, y)` then per-x max y — both map-side combinable;
  *     only the x-domain survives (for discrete dimensions like
  *     quantity this is tiny; for continuous ones it is bounded by
  *     the distinct-value count, still corpus-reduced).
  *  2. x is range-bucketed on broadcast global [min, max] (the
  *     histogram row's integer-exact bucket arithmetic); the
  *     B-row bucket-max table self-joins (B² — constant) into a
  *     strictly-higher-bucket suffix max, broadcast back.
  *  3. Per-x rows dominated by a higher BUCKET are dropped map-side
  *     (mc <= suffix ⇒ some strictly-greater x has y >= mc).
  *     Survivors are a skyline superset bounded by B × per-bucket
  *     frontier; the exact finish is an anti-join of that small
  *     candidate set against itself (b.x > a.x ∧ b.y >= a.y).
  *
  * Output: the skyline points (x, y), exactly the NOT EXISTS
  * definition the oracle replays (per-x max + suffix-max form).
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val pts = df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("x").agg(max("y").as("y")) // per-x frontier; same-x dominated rows gone
    val edges = pts.agg(min("x").as("lo"), max("x").as("hi"))
    // Bucket index over the broadcast global range. Divide in DOUBLE
    // after a double multiply: (x-lo)*nBuckets as a LONG product wraps
    // for wide domains (|hi-lo| > 2^63/nBuckets — epoch-nanos or hash
    // ids), silently breaking bucket monotonicity and letting the
    // suffix-max prune drop true skyline points. The double form loses
    // low bits for huge spans but stays MONOTONE in x, which is the
    // only property the prune needs (bucket boundaries may shift by a
    // point; correctness comes from the exact anti-join finish).
    val bucketed = pts.crossJoin(broadcast(edges))
      .withColumn("__b", least(lit(nBuckets - 1),
        ((col("x") - col("lo")).cast("double") * nBuckets /
          (col("hi") - col("lo") + 1).cast("double")).cast("long")).cast("int"))
    val bmax = bucketed.groupBy("__b").agg(max("y").as("bm"))
    val suffix = bmax.as("a").join(bmax.as("b"), col("b.__b") > col("a.__b"), "left")
      .groupBy(col("a.__b").as("__b")).agg(max(col("b.bm")).as("__suffix"))
    val candidates = bucketed.join(broadcast(suffix), Seq("__b"))
      .filter(col("__suffix").isNull || col("y") > col("__suffix"))
      .select("x", "y")
    candidates.as("a").join(candidates.as("b"),
        col("b.x") > col("a.x") && col("b.y") >= col("a.y"), "left_anti")
      .select(col("a.x").as(xCol), col("a.y").as(yCol))
  }
}
