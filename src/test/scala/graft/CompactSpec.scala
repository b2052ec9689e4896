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

  test("shardManifest: partition-insensitive, single-row-change-sensitive, shard-consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf(), "documents").select("doc_id", "text")
    val m1 = Compact.shardManifest(docs, "doc_id", "text", numShards = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // order/partitioning insensitivity: XOR combination means the same
    // rows give the same manifest from any layout
    val m2 = Compact.shardManifest(docs.repartition(13), "doc_id", "text", 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m1 === m2, "the manifest must not depend on input partitioning")
    assert(m1.values.map(_._1).sum === docs.count(), "counts partition the corpus")
    // a single-row payload edit flips exactly its shard's hash, and
    // only the hash — counts are untouched
    val tweaked = docs.withColumn("text",
      when(col("doc_id") === 7L, concat(col("text"), lit("x")))
        .otherwise(col("text")))
    val m3 = Compact.shardManifest(tweaked, "doc_id", "text", 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m3.count { case (k, v) => m1(k) != v } === 1,
      "one changed row must flip exactly one shard digest")
    assert(m1.map { case (k, v) => k -> v._1 } === m3.map { case (k, v) => k -> v._1 })
    // NULL payload and empty payload are different deliveries
    val a = Seq((1L, Some("")), (2L, Some("x"))).toDF("doc_id", "text")
    val b = Seq((1L, None: Option[String]), (2L, Some("x"))).toDF("doc_id", "text")
    val ha = Compact.shardManifest(a, "doc_id", "text", 1).collect()(0).getLong(2)
    val hb = Compact.shardManifest(b, "doc_id", "text", 1).collect()(0).getLong(2)
    assert(ha !== hb, "the length discriminator must separate NULL from ''")
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

  test("writePartitioned: equality reads prune to the matching directory at planning time") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-partlayout").toString
    val events = Tables.load(spark, sf(), "events")
    Compact.writePartitioned(events, tmp, Seq("event_type"))
    val clicks = spark.read.parquet(tmp).filter(col("event_type") === "click")
    // planning-time pruning: the partition filter is in the scan...
    val plan = clicks.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"partition filter missing from scan:\n$plan")
    // ...and NO data file of any other partition is opened: execute
    // THIS plan instance and read the scan's numFiles metric
    // (inputFiles lists the relation pre-pruning, so it cannot show this)
    val qe = clicks.queryExecution
    val nRows = qe.toRdd.count()
    val scan = qe.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    val dirs = new java.io.File(tmp).listFiles().count(_.getName.startsWith("event_type="))
    assert(dirs === 5, "the layout should have one directory per type")
    assert(scan.metrics("numFiles").value * 5 <= scan.relation.location.inputFiles.length.toLong * 2,
      "pruning should cut the file count to ~1/5 of the table")
    assert(nRows === events.filter(col("event_type") === "click").count())
    // partition column round-trips as a real column
    assert(spark.read.parquet(tmp).select("event_type").distinct().count() === 5)
  }

  test("writePartitioned: numeric-looking string partition values need inference off to round-trip") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-parttype").toString
    val df = Seq(("a", "01"), ("b", "02"), ("c", "10")).toDF("id", "bucket")
    Compact.writePartitioned(df, tmp, Seq("bucket"))
    // default readers INFER the partition type from the directory name:
    // "01" comes back as INT 1 — the documented type-fidelity gap
    val inferred = spark.read.parquet(tmp).schema("bucket").dataType
    assert(inferred === org.apache.spark.sql.types.IntegerType,
      s"expected the documented inference hazard, got $inferred")
    // the documented fix: disable inference for the read → exact strings
    val prev = spark.conf.get("spark.sql.sources.partitionColumnTypeInference.enabled", "true")
    try {
      spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      val back = spark.read.parquet(tmp)
      assert(back.schema("bucket").dataType === org.apache.spark.sql.types.StringType)
      assert(back.filter(col("id") === "a").select("bucket").head().getString(0) === "01",
        "leading zero must survive the round trip with inference off")
    } finally spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", prev)
  }
}
