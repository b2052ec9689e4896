package graft

import org.apache.spark.sql.functions._

import graft.operators.Ivm

/** Batch incremental view maintenance: every refresh path is pinned
  * EQUAL to full recompute — the defining contract of IVM.
  */
class IvmSpec extends SparkSpecBase {

  private def ordersCents = Tables.load(spark, sf(), "orders")
    .select(col("o_orderkey"), col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))

  test("group-by-sum delta refresh equals full recompute (inserts, deletes, vanishing + new groups)") {
    val ord = ordersCents
    // state over the "yesterday" snapshot; delta = today's CDC extract
    val state = Ivm.groupState(ord.filter(col("o_orderkey") % 10 =!= 0),
      Seq("o_custkey"), "cents")
    val ins = ord.filter(col("o_orderkey") % 10 === 0).withColumn("__op", lit("I"))
    val del = ord.filter(col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 7 === 0)
      .withColumn("__op", lit("D"))
    val refreshed = Ivm.applyGroupDelta(state, ins.unionByName(del), "__op",
      Seq("o_custkey"), "cents")
    val recomputed = Ivm.groupState(
      ord.filter(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 7 =!= 0),
      Seq("o_custkey"), "cents")
    assert(refreshed.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(refreshed).isEmpty,
      "incremental refresh must equal recompute from scratch")
  }

  test("group-by-sum delta: a group deleted to zero vanishes; a brand-new key appears") {
    import spark.implicits._
    val base = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val state = Ivm.groupState(base, Seq("k"), "v")
    val delta = Seq(("D", 2L, 5L), ("I", 3L, 7L)).toDF("__op", "k", "v")
    val out = Ivm.applyGroupDelta(state, delta, "__op", Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(1L -> (30L, 2L), 3L -> (7L, 1L)),
      s"group 2 must vanish, group 3 must appear: $out")
  }

  test("group-by-sum delta: corrupt feeds fail loudly") {
    import spark.implicits._
    val state = Ivm.groupState(Seq((1L, 10L)).toDF("k", "v"), Seq("k"), "v")
    // deleting a row the state never had drives the count negative
    val badDelete = Seq(("D", 9L, 1L), ("D", 9L, 2L)).toDF("__op", "k", "v")
    val e1 = intercept[Exception] {
      Ivm.applyGroupDelta(state, badDelete, "__op", Seq("k"), "v").collect()
    }
    assert(e1.getMessage.contains("negative") || e1.getCause != null)
    // an op outside {I, D} is rejected, not silently dropped
    val badOp = Seq(("U", 1L, 1L)).toDF("__op", "k", "v")
    val e2 = intercept[Exception] {
      Ivm.applyGroupDelta(state, badOp, "__op", Seq("k"), "v").collect()
    }
    assert(e2.getMessage.contains("I or D") ||
      String.valueOf(e2.getCause).contains("I or D"))
  }

  test("materialized-join delta refresh equals full recompute (ΔR ⋈ S, never R)") {
    val ord = ordersCents
    val cust = Tables.load(spark, sf(), "customer").select("c_custkey", "c_nationkey")
    val oldR = ord.filter(col("o_orderkey") % 10 =!= 0)
    val mat = oldR.join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "cents", "c_custkey", "c_nationkey")
    val delta = ord.filter(col("o_orderkey") % 10 === 0).withColumn("__op", lit("I"))
      .unionByName(ord.filter(col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 7 === 0)
        .withColumn("__op", lit("D")))
    // join the DELTA against the dimension; the old fact side is not re-read
    val refreshed = Ivm.applyJoinDelta(mat, delta, "__op", "o_orderkey",
      cust.withColumnRenamed("c_custkey", "o_custkey")
        .withColumn("c_custkey", col("o_custkey")), "o_custkey")
    val recomputed = ord.filter(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 7 =!= 0)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "cents", "c_custkey", "c_nationkey")
    assert(refreshed.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(refreshed).isEmpty,
      "join IVM must equal the recomputed join")
  }

  test("parquet-backed refresh rewrites ONLY touched partitions and drops vanished ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivm").toString
    val path = s"$dir/state"
    // initial state across 4 partitions of key-bucket `pb`
    val base = Seq(
      (0L, 1L, 10L), (0L, 2L, 20L), // pb 0
      (1L, 11L, 30L),               // pb 1
      (2L, 21L, 40L),               // pb 2
      (3L, 31L, 50L))               // pb 3
      .toDF("pb", "k", "v")
    Ivm.groupState(base, Seq("pb", "k"), "v")
      .write.partitionBy("pb").parquet(path)
    def files(): Map[String, Long] = {
      val fs = new java.io.File(path)
      fs.listFiles().filter(_.getName.startsWith("pb=")).flatMap { d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> f.lastModified())
      }.toMap
    }
    val before = files()
    // delta: touch pb 0 (update), empty out pb 2 entirely, leave 1 and 3 alone
    val delta = Seq(("I", 0L, 1L, 5L), ("D", 2L, 21L, 40L))
      .toDF("__op", "pb", "k", "v")
    Ivm.refreshGroupBySumTable(path, delta, "__op", Seq("pb", "k"), "v", "pb")
    val after = files()
    // untouched partitions: identical files, untouched on disk
    Seq("pb=1", "pb=3").foreach { p =>
      val b = before.filter(_._1.startsWith(p)); val a = after.filter(_._1.startsWith(p))
      assert(a === b, s"$p must not be rewritten: before=$b after=$a")
    }
    assert(!after.keys.exists(_.startsWith("pb=2")),
      "a partition whose groups all vanished must be dropped from disk")
    // and the table equals full recompute over the post-delta base
    val expect = Ivm.groupState(
      base.filter(col("pb") =!= 2L).unionByName(Seq((0L, 1L, 5L)).toDF("pb", "k", "v")),
      Seq("pb", "k"), "v")
    // schema pinned: partition-dir inference would retype pb LONG → INT
    val got = spark.read.schema(expect.schema).parquet(path)
      .select("pb", "k", "sum_v", "n_rows")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "refreshed table must equal recompute")
  }
}
