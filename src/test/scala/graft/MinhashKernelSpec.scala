package graft

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.functions._

/** The native MinhashSig / Md5Hash56Array kernels must be BIT-IDENTICAL
  * to the interpreted HOF chains they replace — every DuckDB oracle
  * replays the chain's md5 arithmetic, so any divergence is a red
  * correctness row, not just a perf bug.
  */
class MinhashKernelSpec extends SparkSpecBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, ""), // empty text → single empty-string token
      (4L, null.asInstanceOf[String]), // NULL text → NULL token array
      (5L, "unicode tökens żółć 中文 test")
    ).toDF("id", "text")
  }

  test("MinhashSig == transform(kmHashPair) + array_min chain, incl null/empty") {
    val numHashes = 8
    val toks = corpus.select(col("id"), TextFunctions.tokenSet(col("text")).as("toks"))
    val chain = {
      val withPairs = toks.withColumn("__hs",
        transform(col("toks"), w => HashFunctions.kmHashPair(w)))
      val sig = (0 until numHashes).map { i =>
        array_min(transform(col("__hs"), h => HashFunctions.kmHash(h, i))).as(s"m$i")
      }
      withPairs.select(col("id") +: sig: _*)
    }
    val kernel = toks.withColumn("__sig", graft.plans.MinhashSig(col("toks"), numHashes))
      .select(col("id") +:
        (0 until numHashes).map(i => element_at(col("__sig"), i + 1).as(s"m$i")): _*)
    assert(kernel.exceptAll(chain).isEmpty && chain.exceptAll(kernel).isEmpty,
      s"kernel:\n${kernel.collect().mkString("\n")}\nchain:\n${chain.collect().mkString("\n")}")
  }

  test("every native kernel is callable from pure SQL after registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT minhash_sig(array('a','b'), 4) AS sig,
        |  simhash56(md5_hash56_array(array('a','b'), '0:')) AS sh,
        |  sorted_intersect_count(array(1L, 2L, 3L), array(1L, 2L, 3L)) AS ic,
        |  cosine_sim(array(cast(1.0 AS float), cast(0.0 AS float)),
        |             array(cast(1.0 AS float), cast(0.0 AS float))) AS cs,
        |  hyperplane_buckets(array(cast(1.0 AS float), cast(-0.5 AS float)),
        |                     2, 4, 2) AS hb,
        |  int_dot_q20(array(cast(1.0 AS float), cast(0.5 AS float)),
        |              array(cast(2.0 AS float), cast(-1.0 AS float))) AS idot""".stripMargin)
      .collect()(0)
    assert(r.getSeq[Long](0).length === 4)
    assert(r.getInt(2) === 3)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
    assert(r.getSeq[Long](4).length === 2, "one bucket per hash table")
    // q(1)*q(2) + q(0.5)*q(-1) = 2^20*2^21 + 2^19*(-2^20)
    assert(r.getLong(5) === (1048576L * 2097152L) + (524288L * -1048576L))
  }

  test("IntDotQ20 == the round/transform/zip_with HOF chain, incl nulls/ragged/half-rounding") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, Array(0.25f, -0.75f, 1.0f), Array(0.5f, 0.5f, -1.0f)),
      // exact negative halves: round half AWAY FROM ZERO must match SQL round
      (2L, Array(-2.5f / 1048576.0f * 1048576.0f).map(_ => -2.5f / 1048576f),
        Array(1.0f)),
      (3L, Array(1.0f, 2.0f), Array(1.0f))) // ragged → null
      .toDF("id", "a", "b")
    val chain = rows.withColumn("d", expr(
      "aggregate(zip_with(transform(a, v -> cast(round(cast(v as double) * 1048576) as bigint)), " +
        "transform(b, v -> cast(round(cast(v as double) * 1048576) as bigint)), " +
        "(x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
    // zip_with pads the short side with null → null product → null sum?
    // zip_with on ragged arrays pads with null and x*y propagates null,
    // and aggregate's sum with a null element yields null — matching the
    // kernel's ragged → null (checked below per row where defined)
    val kernel = rows.withColumn("d",
      org.apache.spark.sql.graftbridge.Bridge.column(graft.plans.IntDotQ20(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("a")),
        org.apache.spark.sql.graftbridge.Bridge.expression(col("b")))))
    val c = chain.select("id", "d").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val k = kernel.select("id", "d").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(k === c, s"kernel $k vs chain $c")
    assert(k(3L).isEmpty, "ragged pair must be null")
  }

  test("hyperplane_buckets: null element -> null output (no silent zero-read)") {
    // ArrayData.getFloat reads a null element as 0.0 — the kernel must
    // null out instead (the family contract every r4-reviewed kernel
    // follows), so corrupt rows fall to the singleton branch of
    // nearDupClusters rather than bucketing as if zero-padded
    val r = spark.sql(
      """SELECT hyperplane_buckets(array(cast(1.0 AS float), cast(NULL AS float)),
        |                          2, 4, 2) AS hb,
        |       hyperplane_buckets(cast(NULL AS array<float>), 2, 4, 2) AS hbn
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0), "null element must produce a NULL bucket array")
    assert(r.isNullAt(1), "null input must produce a NULL bucket array")
  }

  test("Md5Hash56Array == transform(seededHash56(0, _)) chain, incl null/empty") {
    val toks = corpus.select(col("id"), TextFunctions.tokenSet(col("text")).as("toks"))
    val chain = toks.select(col("id"),
      transform(col("toks"), w => HashFunctions.seededHash56(0, w)).as("hs"))
    val kernel = toks.select(col("id"),
      graft.plans.Md5Hash56Array(col("toks"), "0:").as("hs"))
    assert(kernel.exceptAll(chain).isEmpty && chain.exceptAll(kernel).isEmpty,
      s"kernel:\n${kernel.collect().mkString("\n")}\nchain:\n${chain.collect().mkString("\n")}")
  }
}
