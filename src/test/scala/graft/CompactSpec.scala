package graft

import graft.operators.Compact
import java.nio.file.Files

class CompactSpec extends SparkSpecBase {

  test("shardedWrite: identical shard content AND order on every rebuild") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, sf(), "documents").select("doc_id", "source", "n_chars")
    val p1 = Files.createTempDirectory("graft-shard1").toString
    val p2 = Files.createTempDirectory("graft-shard2").toString
    Compact.shardedWrite(docs, p1, "doc_id", numShards = 4, sortCols = Seq("doc_id"))
    // second build from a differently-partitioned input
    Compact.shardedWrite(docs.repartition(13), p2, "doc_id", numShards = 4,
      sortCols = Seq("doc_id"))
    var total = 0L
    (0 until 4).foreach { k =>
      val a = spark.read.parquet(s"$p1/__shard=$k").collect().map(_.toSeq).toSeq
      val b = spark.read.parquet(s"$p2/__shard=$k").collect().map(_.toSeq).toSeq
      assert(a === b, s"shard $k differs between rebuilds")
      assert(a.map(_.head.asInstanceOf[Long]).sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
        s"shard $k rows not in doc_id order")
      total += a.size
    }
    assert(total === docs.count(), "shards must partition the corpus exactly")
  }

  test("shardedWrite: null ids get a deterministic shard; __shard collision rejected") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val in = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "c"))
      .toDF("doc_id", "payload")
    val p = Files.createTempDirectory("graft-shard-null").toString
    Compact.shardedWrite(in, p, "doc_id", numShards = 2, sortCols = Seq("payload"))
    val back = spark.read.parquet(p)
    assert(back.count() === 3, "the null-id row must not be lost")
    assert(!new java.io.File(p).list().exists(_.contains("HIVE_DEFAULT")),
      "null id must hash via the sentinel, not the default partition")
    val clash = in.withColumnRenamed("payload", "__shard")
    intercept[IllegalArgumentException] {
      Compact.shardedWrite(clash, p, "doc_id", 2, Nil)
    }
  }

  test("writeSized bounds rows per file and clusters on the sort column") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    val li = Tables.load(spark, sf(), "lineitem") // ~6k rows at sf0.001
    Compact.writeSized(li, s"$tmp/out", rowsPerFile = 1000, sortCols = Seq("l_orderkey"))
    val files = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 6, s"expected ~rows/1000 files, got ${files.length}")
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() === li.count())
    // each file covers a narrow key range → min/max pruning works
    val one = spark.read.parquet(files.head.getAbsolutePath)
      .agg(org.apache.spark.sql.functions.countDistinct("l_orderkey")).head().getLong(0)
    val all = li.agg(org.apache.spark.sql.functions.countDistinct("l_orderkey")).head().getLong(0)
    assert(one < all, "a single file must not span the whole key range")
  }
}
