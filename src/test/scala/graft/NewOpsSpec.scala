package graft

import graft.operators.{Analytics, Association, KCore, Retrieval, Sketches, TimeSeries, Triangles}
import org.apache.spark.sql.functions._

/** Known-answer tests for the round-8 operator batch: association
  * rules, clustering coefficient, k-core, positional phrase search,
  * seasonal anomalies.
  */
class NewOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("basket rules: counts, confidence and lift on a hand-checked basket set") {
    // baskets: {1,2}, {1,2}, {1,2,3}, {1,3}, {2} → n=5
    val df = Seq(
      (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (12L, 3L),
      (13L, 1L), (13L, 3L),
      (14L, 2L)).toDF("basket", "item")
    val r = Association.basketRules(df, "basket", "item", minSupport = 2)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x)).toMap
    assert(r.keySet === Set((1L, 2L), (1L, 3L)))
    val p12 = r((1L, 2L))
    assert(p12.getLong(2) === 3L)            // pair_count
    assert(p12.getLong(3) === 4L)            // count(1)
    assert(p12.getLong(4) === 4L)            // count(2)
    assert(p12.getLong(5) === 5L)            // n_baskets
    assert(p12.getDouble(6) === 3.0 / 4)     // conf 1→2
    assert(p12.getDouble(8) === 3.0 * 5 / (4 * 4)) // lift
    val p13 = r((1L, 3L))
    assert(p13.getLong(2) === 2L && p13.getLong(4) === 2L)
    assert(p13.getDouble(7) === 1.0, "3 ⇒ 1 in every basket containing 3")
  }

  test("clustering coefficient: K4 nodes are fully clustered, a path is 0") {
    val k4 = (for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j))
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    val out = Triangles.nodeClusteringCoefficient((k4 ++ path).toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    (1L to 4L).foreach { v =>
      assert(out(v) === ((3L, 3L, 1.0)), s"K4 node $v: deg 3, 3 triangles, coeff 1")
    }
    Seq(11L, 12L).foreach { v =>
      assert(out(v) === ((2L, 0L, 0.0)), s"path node $v")
    }
    assert(!out.contains(10L), "degree-1 endpoints are excluded")
  }

  test("k-core: the 4-core of a K5 with pendant tails is exactly the K5") {
    val k5 = for (i <- 1L to 5L; j <- 1L to 5L if i < j) yield (i, j)
    val tails = Seq((1L, 10L), (2L, 11L), (10L, 11L)) // low-degree fringe
    val out = KCore.kCore((k5 ++ tails).toDF("src", "dst"), "src", "dst", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === (1L to 5L).toSet, "tails must peel away")
    assert(out.values.forall(_ === 4L), "inside the core every node keeps degree 4")
    // k larger than any degree → empty core, schema intact
    val empty = KCore.kCore(k5.toDF("src", "dst"), "src", "dst", k = 5)
    assert(empty.count() === 0L)
  }

  test("phrase search: positional intersection finds exact adjacent occurrences only") {
    val docs = Seq(
      (1L, "big data big data systems"),   // "big data" ×2
      (2L, "data big and big data"),       // "big data" ×1 (the first pair is reversed)
      (3L, "big model data"),              // non-adjacent: no hit
      (4L, "big data")).toDF("doc_id", "text")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text", nPhrases = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    // "big data" is the most frequent bigram (4 occurrences corpus-wide)
    assert(out === Map(
      ("big", "data", 1L) -> 2L,
      ("big", "data", 2L) -> 1L,
      ("big", "data", 4L) -> 1L))
  }

  test("seasonal anomalies: cross-multiplied integer comparison flags only true spikes") {
    val mk = (day: Int, hr: Int, v: Double) =>
      (java.sql.Timestamp.valueOf(f"2024-01-0$day $hr%02d:30:00"), v)
    // Sunday 2024-01-07 10:00 bucket: 20 × 1.0 plus one 30.0 spike →
    // n=21, sum_cents=5000; anomaly iff cents·21 > 5·5000, i.e.
    // v > 25000/2100 ≈ 11.9 → exactly the spike (which still pays its
    // own inflation of the bucket mean)
    val rows = Seq.fill(20)(mk(7, 10, 1.0)) ++ Seq(mk(7, 10, 30.0)) ++
      Seq(mk(6, 10, 3.0)) // saturday bucket: single event, never anomalous
    val out = TimeSeries.seasonalAnomalies(rows.toDF("ts", "value"), "ts", "value", factor = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1 -> 10) === ((21L, 5000L, 1L)), "sunday bucket: one spike")
    assert(out(7 -> 10) === ((1L, 300L, 0L)), "a lone event can never exceed 5x its own mean")
  }

  test("item similarity: fixed-point squared cosine ranks identical baskets first") {
    // items 1,2 always together (cosine 1); item 3 in half of 1's baskets
    val rows = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 2L)).toDF("basket", "item")
    val out = Association.itemSimilarity(rows, "basket", "item", minCooc = 2, topK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(6)) -> (r.getLong(1), r.getLong(5))).toMap
    // item 1's best neighbor is 2: score_q = 16*2^20/16 = 1048576 (cos²=1)
    assert(out((1L, 1)) === ((2L, 1048576L)))
    // second: 3 with cooc 2, score = 4*2^20/(4*2) = 524288 (cos²=1/2)
    assert(out((1L, 2)) === ((3L, 524288L)))
    assert(out((3L, 1))._1 === 1L)
  }

  test("daily OHLC: open/close follow the packed (micros, id) order, not value order") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("2024-01-05 09:00:00"), "trade", 5.0),
      (2L, ts("2024-01-05 12:00:00"), "trade", 9.5),
      (3L, ts("2024-01-05 12:00:00.000001"), "trade", 1.25), // low AND close
      (4L, ts("2024-01-06 10:00:00"), "trade", 7.0)).toDF("event_id", "ts", "event_type", "value")
    val out = TimeSeries.dailyOhlc(rows, "event_type", "ts", "value")
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out(4) === ((3L, 500L, 950L, 125L, 125L)), "jan 5: open 5.00, high 9.50, low=close 1.25")
    assert(out(5) === ((1L, 700L, 700L, 700L, 700L)), "single-event bar is flat")
  }

  test("group entropy: uniform beats skewed; single-value group is zero") {
    val rows = (Seq.fill(8)("u" -> "a") ++ Seq.fill(8)("u" -> "b") ++
      Seq.fill(15)("s" -> "a") ++ Seq.fill(1)("s" -> "b") ++
      Seq.fill(9)("m" -> "a")).toDF("source", "lang")
    val out = Analytics.groupEntropy(rows, "source", "lang")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("m") === ((9L, 1L, 0L)), "one value → zero entropy")
    // uniform 2-way: H = ln 2 ≈ 0.6931 → h_q = floor(ln2 * 2^20) = 726817
    assert(out("u")._3 === 726817L)
    assert(out("s")._3 > 0L && out("s")._3 < out("u")._3, "skew lowers entropy")
  }

  test("first-touch attribution credits session revenue to the first channel") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // user 1, one session: view → click → purchase(12.34)
      (1L, ts("2024-01-05 09:00:00"), 100L, "view", null.asInstanceOf[java.lang.Double]),
      (2L, ts("2024-01-05 09:05:00"), 100L, "click", null.asInstanceOf[java.lang.Double]),
      (3L, ts("2024-01-05 09:10:00"), 100L, "purchase", java.lang.Double.valueOf(12.34)),
      // same user, NEW session (gap > 30 min): purchase-first
      (4L, ts("2024-01-05 11:00:00"), 100L, "purchase", java.lang.Double.valueOf(5.0)),
      // user 2: no purchase
      (5L, ts("2024-01-05 09:00:00"), 200L, "click", null.asInstanceOf[java.lang.Double]))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.firstTouchAttribution(rows, "user_id", "ts", "event_type", "value")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("view") === ((1L, 1L, 1234L)), "session revenue lands on the FIRST touch")
    assert(out("purchase") === ((1L, 1L, 500L)), "gap split starts a fresh attribution")
    assert(out("click") === ((1L, 0L, 0L)))
  }

  test("kmv join cardinality: complete sketches are exact; estimator stays inside the contract") {
    val a = (1L to 60L).toDF("ka")
    val b = (41L to 100L).toDF("kb") // true intersection 20
    val small = Sketches.kmvJoinCardinality(a, "ka", b, "kb").head()
    assert(small.getLong(0) === 20L, "below k the sketch is complete → exact")
    assert(small.getLong(1) === 20L && small.getBoolean(4))
    val bigA = (1L to 3000L).toDF("ka")
    val bigB = (2001L to 5000L).toDF("kb") // true intersection 1000
    val big = Sketches.kmvJoinCardinality(bigA, "ka", bigB, "kb").head()
    assert(big.getLong(1) === 1000L)
    assert(big.getBoolean(4), s"estimate ${big.getLong(0)} outside the 35% contract")
  }

  test("misra-gries: the guarantee survives any partitioning; true heavies always present") {
    import graft.functions.HeavyHittersAgg
    // stream: item "hot" 40×, "warm" 25×, 100 singletons → n = 165
    // with k = 4: every item with count > 165/5 = 33 (just "hot") must
    // be in the summary regardless of how partial merges interleave
    val items = Seq.fill(40)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 100).map(i => s"one$i")
    val shuffled = new scala.util.Random(7).shuffle(items)
    Seq(1, 3, 13).foreach { parts =>
      val df = shuffled.toDF("token").repartition(parts)
      val m = df.agg(HeavyHittersAgg.heavyHitters(4)(col("token")))
        .head().getMap[String, Long](0)
      assert(m.size <= 4, s"summary must stay bounded, got ${m.size}")
      assert(m.contains("hot"), s"parts=$parts: guaranteed heavy item missing from $m")
      // counters never over-count
      assert(m.get("hot").forall(_ <= 40L))
    }
  }

  test("exactly-once sink: epoch re-delivery overwrites instead of duplicating") {
    import graft.streaming.ExactlyOnceSink
    implicit val sc = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-eo-sink").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val writer = ExactlyOnceSink.epochWriter(tmp)
    val q = input.toDF().toDF("id", "v").writeStream
      .foreachBatch(writer).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      val before = ExactlyOnceSink.readAll(spark, tmp)
      assert(before.count() === 3)
      val epochs = before.select("epoch").distinct().count()
      assert(epochs === 2, "each micro-batch owns its epoch directory")
      // simulate foreachBatch's at-least-once RE-DELIVERY of epoch 0
      // (post-recovery replay): same epoch id, same rows
      import spark.implicits._
      writer(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
      val after = ExactlyOnceSink.readAll(spark, tmp)
      assert(after.count() === 3, "re-delivered epoch must overwrite, not append")
      assert(after.groupBy("id").count().filter(col("count") > 1).count() === 0)
    } finally q.stop()
  }

  test("exactly-once across a real checkpointed restart (engine-level re-delivery)") {
    import graft.streaming.ExactlyOnceSink
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    import spark.implicits._
    // a REPLAYABLE source (file stream), a real checkpoint dir, and a
    // real stop → crash → restart: the first query commits epoch 0;
    // deleting its commit marker (the crash window between sink write
    // and offset commit) forces the RESTARTED engine to re-deliver
    // epoch 0 through foreachBatch with the same id — the idempotent
    // epoch write must absorb it, then the tail file arrives as epoch 1
    val in = java.nio.file.Files.createTempDirectory("graft-eo2-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-eo2-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-eo2-ck").toString
    val schema = new StructType().add("id", LongType).add("v", StringType)
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(ExactlyOnceSink.epochWriter(out)).start()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(in)
    val q1 = start()
    q1.processAllAvailable(); q1.stop(); q1.awaitTermination()
    // the run-loop thread unregisters the checkpoint AFTER stop()
    // returns — wait it out or the restart sees a concurrent user
    val t0 = System.nanoTime()
    while (spark.streams.active.exists(_.id == q1.id) &&
      (System.nanoTime() - t0) < 30000000000L) Thread.sleep(100)
    assert(ExactlyOnceSink.readAll(spark, out).count() === 2)
    // crash simulation at the exactly-once hazard point: sink output
    // exists but the batch's commit marker does not
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    assert(commits.nonEmpty, "the first run must have committed a batch")
    val newest = commits.maxBy(_.getName.toInt)
    // the local FS checkpoints are checksummed: the stale .N.crc must
    // go with the marker or the re-commit's rename throws
    // FileAlreadyExists (surfacing as "concurrently using")
    val crc = new java.io.File(newest.getParentFile, s".${newest.getName}.crc")
    assert(newest.delete(), "drop the newest commit marker")
    if (crc.exists()) crc.delete()
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(in)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val all = ExactlyOnceSink.readAll(spark, out)
      assert(all.count() === 3, "re-delivered epoch 0 must overwrite, not append")
      assert(all.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
      assert(all.groupBy("id").count().filter(col("count") > 1).count() === 0,
        "no duplicates across the restart")
      assert(all.select("epoch").distinct().count() === 2,
        "epoch 0 (re-delivered) + epoch 1 (tail)")
    } finally q2.stop()
  }

  test("streaming heavy hitters: bucketed MG state keeps every global heavy item") {
    import graft.streaming.StreamingSketch
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val hh = StreamingSketch.streamingHeavyHitters(
      input.toDF().toDF("token"), "token", k = 4, buckets = 4)
    val q = hh.writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    try {
      val items = Seq.fill(40)("hot") ++ Seq.fill(25)("warm") ++ (1 to 100).map(i => s"one$i")
      input.addData(new scala.util.Random(11).shuffle(items): _*)
      q.processAllAvailable()
      val cands = spark.table("hh").collect()
        .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      // n = 165 over 4 buckets; "hot" is heavy globally, so it is
      // heavy within its own bucket and the per-bucket guarantee keeps it
      assert(cands.keys.exists(_._2 === "hot"), s"global heavy item lost: $cands")
      // state boundedness: each bucket carries <= k candidates
      cands.keys.groupBy(_._1).foreach { case (b, ks) =>
        assert(ks.size <= 4, s"bucket $b overflowed: $ks")
      }
      // the stream keeps counting across later batches
      input.addData(Seq.fill(30)("hot"): _*)
      q.processAllAvailable()
      val c2 = spark.table("hh").collect()
        .filter(_.getString(1) == "hot").map(_.getLong(2)).max
      assert(c2 > cands.collectFirst { case ((_, "hot"), c) => c }.get,
        "the MG counter must grow as the hot item keeps arriving")
    } finally q.stop()
  }

  test("MMR rerank: a near-duplicate of the top hit is displaced by a diverse item") {
    import graft.operators.Similarity
    val emb = Seq(
      (100L, Array(1.0f, 0.0f)),     // query
      (1L, Array(0.99f, 0.01f)),     // best by relevance
      (2L, Array(0.98f, 0.0f)),      // near-duplicate of 1 — high rel, zero marginal value
      (3L, Array(0.4f, 0.8f)),       // diverse, lower rel
      (4L, Array(0.0f, -1.0f))       // diverse, anti-correlated
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 100), "vec_id", "embedding",
        shortlist = 4, k = 3)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out(1) === 1L, "rank 1 is pure relevance")
    // the defining MMR property: the near-duplicate (pure-relevance
    // rank 2) is DEMOTED past the diverse items — its marginal score
    // rel − sim(·, item 1) is ~0 while both diverse items keep theirs
    // (the anti-correlated item even gains: its max-sim is negative)
    assert(out(2) !== 2L, s"near-duplicate must not take rank 2: $out")
    assert(out(2) === 4L, s"the anti-correlated item has the best marginal score: $out")
    assert(out(3) === 2L, s"the near-dup re-enters only after diversity is exhausted enough: $out")
  }

  test("MMR rerank: a query with fewer candidates than k keeps its picks (short page, not zero rows)") {
    import graft.operators.Similarity
    // corpus holds the query + only TWO candidates; k = 3 exhausts the
    // shortlist after round 2 — the greedy loop must carry the existing
    // picks forward and return 2 rows, not drop the query entirely
    val emb = Seq(
      (100L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 100), "vec_id", "embedding",
        shortlist = 3, k = 3)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out === Map(1 -> 1L, 2 -> 2L),
      s"exhausted shortlist must yield the two picks made, got $out")
  }

  test("top paths: session sequences truncate at depth and count by frequency") {
    import graft.operators.Analytics
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // user 1: view>click>purchase>view (truncated at depth 3)
      (1L, ts("2024-01-05 09:00:00"), 10L, "view"),
      (2L, ts("2024-01-05 09:01:00"), 10L, "click"),
      (3L, ts("2024-01-05 09:02:00"), 10L, "purchase"),
      (4L, ts("2024-01-05 09:03:00"), 10L, "view"),
      // user 2 same prefix
      (5L, ts("2024-01-05 09:00:00"), 20L, "view"),
      (6L, ts("2024-01-05 09:01:00"), 20L, "click"),
      (7L, ts("2024-01-05 09:02:00"), 20L, "purchase"),
      // user 1 new session after the gap: single event
      (8L, ts("2024-01-05 12:00:00"), 10L, "error"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.topPaths(rows, "user_id", "ts", "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("view>click>purchase" -> 2L, "error" -> 1L))
  }

  test("gini: equal units score 0, total concentration scores (n-1)/n") {
    import graft.operators.Analytics
    val equal = Seq(("a", 1L, 500L), ("a", 2L, 500L), ("a", 3L, 500L), ("a", 4L, 500L))
    val concentrated = Seq(("b", 1L, 0L), ("b", 2L, 0L), ("b", 3L, 0L), ("b", 4L, 2000L))
    val out = Analytics.giniCoefficient(
        (equal ++ concentrated).toDF("grp", "unit", "cents"), "grp", "unit", "cents")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    assert(out("a") === ((4L, 0L, 0.0)), "uniform distribution → gini 0")
    // all value on the last of 4 units: num = (2*4-4-1)*2000 = 6000;
    // gini = 6000/(4*2000) = 0.75 = (n-1)/n
    assert(out("b") === ((4L, 6000L, 0.75)), "full concentration → (n-1)/n")
  }
}
