package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, TfIdf}
import graft.streaming.Subscribe
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpecBase {

  test("charShingles: correct set, short-text guard") {
    import spark.implicits._
    val r = Seq("abcdef", "ab").toDF("text")
      .select(TextFunctions.charShingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(r(0) === Set("abc", "bcd", "cde", "def"))
    assert(r(1) === Set.empty, "text shorter than k must give an empty set, not a reversed range")
  }

  test("shinglePairs finds near-dups robust to word-boundary edits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s", "en"),
      (2L, "the quick brown foxjumps over the lazy dog", "s", "en"), // space removed
      (3L, "unrelated content entirely different words here", "s", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val pairs = Dedup.shinglePairs(docs, "doc_id", "text", Seq("source", "lang"), 5, 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("tfidf: rare tokens outweigh common ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common word"),
      (3L, "common word extra")
    ).toDF("doc_id", "text")
    val r = TfIdf.tfidf(docs, "doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1)) -> (x.getLong(2), x.getDouble(4))).toMap
    assert(r((1L, "common"))._1 === 2L)
    assert(math.abs(r((1L, "common"))._2) < 1e-12, "df == N => idf 0")
    assert(r((1L, "rare"))._2 > r((2L, "word"))._2, "rarer token must score higher")
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val deduped = Subscribe.streamingDedup(
      input.toDF().toDF("ts", "doc_id"), "ts", "1 hour", Seq("doc_id"))
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      input.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L))
      q.processAllAvailable()
      input.addData((ts(3), 1L), (ts(4), 3L))
      q.processAllAvailable()
      val ids = spark.table("sdedup").collect().map(_.getLong(1)).sorted
      assert(ids === Array(1L, 2L, 3L), "duplicate doc_id 1 must be dropped")
    } finally q.stop()
  }

  test("hash split is disjoint, exhaustive, and stable under repartitioning") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf(), "documents")
    val (train, test) = Sampling.trainTestSplit(docs, "doc_id", testPct = 20)
    val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
    val testIds = test.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((trainIds & testIds).isEmpty, "splits must be disjoint")
    assert(trainIds.size + testIds.size === docs.count(), "splits must be exhaustive")
    val (train2, _) = Sampling.trainTestSplit(docs.repartition(13), "doc_id", testPct = 20)
    assert(train2.select("doc_id").collect().map(_.getLong(0)).toSet === trainIds,
      "membership must not depend on partitioning")
    val frac = testIds.size.toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"test fraction $frac far from 20%")
  }

  test("stratified sample honors per-group rates and nests like bucket ranges") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf(), "documents")
    val rates = Map("src0" -> 100, "src1" -> 50, "src2" -> 0)
    val got = Sampling.stratifiedHashSample(docs, "doc_id", "source", rates,
      defaultPct = 10)
    val bySource = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("src0") === totals("src0"), "rate 100 keeps everything")
    assert(!bySource.contains("src2"), "rate 0 keeps nothing")
    // rate p is exactly buckets [0, p): the 50% group is a SUBSET of
    // what a 100% rate would keep, and identical across partitionings
    val ids50 = got.filter(col("source") === "src1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.stratifiedHashSample(docs.repartition(7), "doc_id",
      "source", rates, defaultPct = 10)
      .filter(col("source") === "src1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === ids50, "membership must not depend on partitioning")
    assert(ids50.subsetOf(
      Sampling.hashBucketSample(docs, "doc_id", 0, 50)
        .select("doc_id").collect().map(_.getLong(0)).toSet),
      "per-group rate p must equal the global [0,p) bucket within the group")
  }

  test("perGroupCap keeps at most cap per group, equals the window form") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf(), "documents")
    val capped = Sampling.perGroupCap(docs, "source", "doc_id", cap = 7)
    val counts = capped.groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 7), "no group may exceed the cap")
    assert(capped.count() < docs.count(), "cap must actually drop rows")
    // the combinable bottom-k must select exactly what the window form would
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    val windowed = docs.withColumn("__h", h)
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy(col("__h"), col("doc_id"))))
      .filter(col("rank") <= 7)
      .select("source", "doc_id", "rank")
    assert(capped.except(windowed).isEmpty && windowed.except(capped).isEmpty,
      "bottom-k aggregator and row_number window must agree exactly")
  }

  test("temperatureMix boosts tail groups, downsamples head, hits the overall fraction") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf(), "documents")
    val kept = Sampling.temperatureMix(docs, "doc_id", "lang", num = 40, den = 100)
    val n = docs.count().toDouble
    val k = kept.count().toDouble
    assert(k / n > 0.25 && k / n < 0.55,
      s"overall keep ${k / n} should track the 40% target in expectation")
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptByLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val head = byLang.maxBy(_._2)._1
    val tail = byLang.minBy(_._2)._1
    val headRate = keptByLang.getOrElse(head, 0L).toDouble / byLang(head)
    val tailRate = keptByLang.getOrElse(tail, 0L).toDouble / byLang(tail)
    assert(headRate < tailRate,
      s"sqrt scaling must downsample the head ($head at $headRate) harder " +
        s"than the tail ($tail at $tailRate)")
    // determinism: membership is a pure function of id and group counts
    val again = Sampling.temperatureMix(docs, "doc_id", "lang", 40, 100)
      .select("doc_id")
    assert(kept.select("doc_id").except(again).isEmpty &&
      again.except(kept.select("doc_id")).isEmpty)
  }

  test("tokenBudgetSelect: bucketed shape equals the global running-sum window") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // adversarial corpus: score ties, a zero-token row, scores at the
    // bucket clamp edges (0.0 and 1.0), and ids out of score order
    val rows = (1L to 200L).map { id =>
      val score = (id % 17).toDouble / 16.0 // includes exact 0.0 and 1.0
      val toks = if (id % 31 == 0) 0L else (id % 13) + 1
      (id, score, toks)
    }
    val df = rows.toDF("doc_id", "score", "toks")
    for (budget <- Seq(0L, 137L, 500L, 100000L)) {
      val fast = Sampling.tokenBudgetSelect(df, "doc_id", "score", "toks", budget)
      val naive = df.withColumn("cum", sum(col("toks")).over(
          Window.orderBy(col("score").desc, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum") <= budget)
        .select(col("doc_id"), col("toks").as("n_tokens"))
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
        s"bucketed selection must equal the semantic window at budget=$budget")
    }
    // unbounded scores (raw perplexity scale): floor(score*buckets)
    // exceeds Int range — the clamp must run BEFORE the int cast, or
    // the best rows wrap negative into bucket 0 and get dropped
    val big = (1L to 50L).map(id => (id, id.toDouble * 1e7, id % 5 + 1L))
      .toDF("doc_id", "score", "toks")
    val fastBig = Sampling.tokenBudgetSelect(big, "doc_id", "score", "toks", 60L)
    val naiveBig = big.withColumn("cum", sum(col("toks")).over(
        Window.orderBy(col("score").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= 60L)
      .select(col("doc_id"), col("toks").as("n_tokens"))
    assert(fastBig.except(naiveBig).isEmpty && naiveBig.except(fastBig).isEmpty,
      "unbounded scores must clamp into the top bucket, not wrap to bucket 0")
    // NaN scores are contractually unselectable
    val withNan = Seq((1L, 0.5, 10L), (2L, Double.NaN, 10L), (3L, 0.9, 10L))
      .toDF("doc_id", "score", "toks")
    val keptIds = Sampling.tokenBudgetSelect(withNan, "doc_id", "score", "toks", 100L)
      .collect().map(_.getLong(0)).toSet
    assert(keptIds === Set(1L, 3L), "NaN-scored rows must not consume budget")
  }

  test("histogram: bins partition the range, counts conserve, extremes land at the edges") {
    import graft.operators.Sketches
    val docs = Tables.load(spark, sf(), "documents")
    val h = Sketches.histogram(docs, "source", "n_chars", bins = 10)
    val rows = h.collect()
    assert(rows.map(_.getAs[Long]("bin")).forall(b => b >= 0 && b <= 9))
    assert(rows.map(_.getAs[Long]("cnt")).sum === docs.count(), "every row lands in a bin")
    val minMax = docs.agg(min("n_chars"), max("n_chars")).head()
    val loDoc = docs.filter(col("n_chars") === minMax.getLong(0)).select("source").head().getString(0)
    val hiDoc = docs.filter(col("n_chars") === minMax.getLong(1)).select("source").head().getString(0)
    val bySrcBin = rows.map(r => (r.getString(0), r.getAs[Long]("bin"))).toSet
    assert(bySrcBin.contains((loDoc, 0L)), "the min value must land in bin 0")
    assert(bySrcBin.contains((hiDoc, 9L)), "the max value must land in the last bin")
  }

  test("clusterAwareSplit: near-dups never straddle the split, fraction sane") {
    import graft.operators.{Dedup, Sampling}
    val docs = Tables.load(spark, sf(), "documents")
    val split = Sampling.clusterAwareSplit(docs, "doc_id", "text", testPct = 20)
    val side = split.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // every confirmed near-dup pair must be on ONE side
    val pairs = Dedup.minhashDedup(docs, "doc_id", "text", 2, 4, 9, 10)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus must contain near-dups for this test to bite")
    pairs.foreach { case (a, b) =>
      assert(side(a) === side(b), s"near-dup pair ($a,$b) straddles train/test")
    }
    // the 20% holds at CLUSTER granularity (clusters move as units —
    // row-level fraction is legitimately lumpy when clusters are big)
    val byCluster = split.collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    val cfrac = byCluster.values.count(identity).toDouble / byCluster.size
    assert(cfrac > 0.1 && cfrac < 0.35, s"cluster-level test fraction $cfrac far from 20%")
  }

  test("sampledMedian: exact when the sample covers the group, close when it doesn't") {
    import graft.operators.Sketches
    val docs = Tables.load(spark, sf(), "documents") // 25 docs/source at sf0.001
    val est = Sketches.sampledMedian(docs, "source", "doc_id", "n_chars", k = 64)
      .collect().map(r => r.getString(0) -> (r.getAs[Int]("n_sample"), r.getAs[Long]("med2"))).toMap
    val exact = docs.collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
      .groupBy(_._1).map { case (s, vs) =>
        val sorted = vs.map(_._2).sorted
        val n = sorted.length
        s -> (sorted((n + 1) / 2 - 1) + sorted((n + 2) / 2 - 1))
      }
    exact.foreach { case (s, m2) =>
      assert(est(s)._1 <= 64)
      // k=64 >= every sf0.001 group, so the sketch must be EXACT here
      assert(est(s)._2 === m2, s"source $s sampled med2 ${est(s)._2} != exact $m2")
    }
    // undersampled path: k=8 still lands within the group's value range
    val rough = Sketches.sampledMedian(docs, "source", "doc_id", "n_chars", k = 8)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("med2")).toMap
    val ranges = docs.collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
      .groupBy(_._1).map { case (s, vs) => s -> (vs.map(_._2).min, vs.map(_._2).max) }
    ranges.foreach { case (s, (lo, hi)) =>
      assert(rough(s) >= 2 * lo && rough(s) <= 2 * hi, s"k=8 median for $s out of range")
    }
  }

  test("count-min sketch: never underestimates, within eps*N of exact") {
    import graft.operators.Sketches
    val events = Tables.load(spark, sf(), "events")
    val n = events.count()
    val eps = 0.01
    val cms = Sketches.countMin(events, col("user_id"), eps = eps, confidence = 0.99)
    val exact = events.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Sketches.estimateAll(cms, exact.keys.toSeq)
    exact.foreach { case (k, ex) =>
      val e = est(k)
      assert(e >= ex, s"count-min must never underestimate: key $k est $e < exact $ex")
      assert(e <= ex + (eps * n).toLong,
        s"key $k: est $e exceeds exact $ex + eps*N")
    }
  }

  test("approx distinct: HLL contract holds, KMV estimate within 10% of exact") {
    val rows = Queries.asMap("q_approx_users").build(spark, sf())
      .collect().map(r => r.getString(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    val exact = Tables.load(spark, sf(), "events").groupBy("event_type")
      .agg(countDistinct("user_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val (hllOk, kmv) = rows(k)
      assert(hllOk, s"$k: HLL estimate strayed beyond 3x rsd of exact $ex")
      // k=128 bottom-k: rsd ~ 1/sqrt(k-2) ~ 8.9%; measured worst case
      // across sf0.001/0.01/0.1 is 5.9% (sf0.1) on deterministic input
      assert(math.abs(kmv - ex) <= math.max(1L, (ex * 0.10).toLong),
        s"$k: kmv $kmv vs exact $ex")
    }
  }

  test("epochShuffle: a reproducible permutation with dense per-shard positions") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf(), "documents")
    val e7 = Sampling.epochShuffle(docs, "doc_id", seed = 7, numShards = 8)
    assert(e7.count() === docs.count(),
      "a shuffle is a permutation: every row, exactly once")
    // positions are dense 1..n within each shard — a trainer can
    // stream shard files in position order with no gaps
    e7.groupBy("shard").agg(count(lit(1)).as("n"), min("position").as("mn"),
        max("position").as("mx")).collect().foreach { r =>
      assert(r.getAs[Int]("mn") === 1 && r.getAs[Int]("mx").toLong === r.getAs[Long]("n"),
        s"shard ${r.get(0)}: positions must be dense 1..n")
    }
    // same seed reproduces the exact sequence; a new seed reshuffles
    val again = Sampling.epochShuffle(docs, "doc_id", seed = 7, numShards = 8)
    assert(e7.except(again).isEmpty && again.except(e7).isEmpty,
      "same seed must reproduce the identical epoch order")
    val e8 = Sampling.epochShuffle(docs, "doc_id", seed = 8, numShards = 8)
    assert(e8.except(e7).count() > 0, "a new seed must produce a new permutation")
  }

  test("slidingWindows: full token coverage, stride overlap, short tail window") {
    import graft.operators.Pack
    import spark.implicits._
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, "solo"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val w = Pack.slidingWindows(docs, "doc_id", "text",
      windowTokens = 4, strideTokens = 2).collect()
    val d1 = w.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    assert(d1.map(_.getString(3)).toSeq ===
      Seq("t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6", "t6"),
      "windows start at every stride boundary; the tail window is short, not dropped")
    assert(d1.map(_.getInt(2)).toSeq === Seq(4, 4, 3, 1))
    // coverage: the first `stride` tokens of each window, concatenated,
    // rebuild the document — nothing skipped, nothing reordered
    assert(d1.flatMap(_.getString(3).split(" ").take(2)).toSeq ===
      Seq("t0", "t1", "t2", "t3", "t4", "t5", "t6"))
    assert(w.filter(_.getLong(0) == 2L).map(_.getString(3)).toSeq === Seq("solo"))
    assert(!w.exists(_.getLong(0) == 3L), "NULL text cannot be chunked")
    // corpus invariant: windows per doc = (tokens-1)/stride + 1
    val corpus = Tables.load(spark, sf(), "documents")
    val nWin = Pack.slidingWindows(corpus, "doc_id", "text", 30, 15)
      .groupBy("doc_id").count()
    val expected = corpus.filter(col("text").isNotNull)
      .select(col("doc_id"),
        (((graft.functions.TextFunctions.tokenCount(col("text")) - 1) / 15)
          .cast("long") + 1).as("count"))
    assert(nWin.except(expected).isEmpty && expected.except(nWin).isEmpty)
  }

  test("quantileCut: bucketed shape equals the per-group window, exact keep counts") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // adversarial: score ties across groups, a NULL group, a NaN row,
    // clamp-edge scores (0.0, 1.0), and a group too small to keep any
    val rows = (1L to 300L).map { id =>
      val g = if (id % 7 == 0) null else s"g${id % 3}"
      (id, g, (id % 11).toDouble / 10.0)
    } ++ Seq((301L, "g0", Double.NaN), (302L, "tiny", 0.9), (303L, "tiny", 0.1))
    val df = rows.toDF("doc_id", "grp", "score")
    val fast = Sampling.quantileCut(df, "doc_id", "score", "grp", num = 30, den = 100)
    val naive = df.filter(col("score").isNotNull && !isnan(col("score")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("doc_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .filter(col("rk") <= expr("(n * 30) DIV 100"))
      .select("doc_id", "grp")
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
      "bucketed selection must equal the per-group window exactly")
    val kept = fast.collect()
    assert(!kept.exists(_.getLong(0) === 301L), "NaN scores are unselectable")
    assert(!kept.exists(r => r.getLong(0) === 302L || r.getLong(0) === 303L),
      "floor(2 * 30/100) = 0: a 2-row group keeps nothing")
    assert(kept.exists(r => r.isNullAt(1)), "a NULL group is a real group")
  }

  test("exactKSample: exactly k, equals the global window form, partition/seed contracts") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    import graft.functions.HashFunctions
    import spark.implicits._
    val df = ((1L to 400L).map(id => Some(id)) :+ (None: Option[Long]))
      .toDF("doc_id")
    val fast = Sampling.exactKSample(df, "doc_id", k = 57, seed = 7)
    assert(fast.count() === 57L, "the sample must have exactly k rows")
    val naive = df.filter(col("doc_id").isNotNull)
      .withColumn("h", HashFunctions.seededHash56(7, col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(Window.orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= 57).select("doc_id")
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
      "bucketed selection must equal the global bottom-k window exactly")
    // partitioning must not change membership
    val repart = Sampling.exactKSample(df.repartition(13), "doc_id", 57, seed = 7)
    assert(fast.except(repart).isEmpty && repart.except(fast).isEmpty,
      "the sample must not depend on input partitioning")
    // a different seed is a different (same-size) sample
    val reseeded = Sampling.exactKSample(df, "doc_id", 57, seed = 8)
    assert(reseeded.count() === 57L)
    assert(reseeded.except(fast).count() > 0, "seeds must give independent samples")
    // k >= corpus keeps every identifiable row; the NULL id never appears
    assert(Sampling.exactKSample(df, "doc_id", 1000, seed = 7).count() === 400L,
      "k past the corpus keeps all non-NULL-id rows")
  }

  test("upsampleMix: factors balance toward the head, capped, counts multiply exactly") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf(), "documents")
    val up = Sampling.upsampleMix(docs, "doc_id", "lang", maxRepeat = 4)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mx = byLang.values.max
    val upByLang = up.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (g, n) =>
      val rep = math.min(4L, (mx + n - 1) / n)
      assert(upByLang(g) === n * rep,
        s"$g: expected $n rows x factor $rep, got ${upByLang(g)}")
    }
    val head = byLang.maxBy(_._2)._1
    assert(upByLang(head) === byLang(head), "the head group is never repeated")
    // every copy is tagged: rep_no is dense 0..rep-1 per row
    val reps = up.filter(col("lang") === lit(head)).select("rep_no").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(reps === Set(0))
  }

  test("madOutliers: only the far point trips the integer MAD rule; exact when sampled fully") {
    import graft.operators.Sketches
    import spark.implicits._
    // 10..20 plus an extreme 1000: med2 = 15+16 = 31; devs |2v-31| sorted
    // 1,1,3,3,5,5,7,7,9,9,11,1969 -> madd2 = 5+7 = 12; rule dev > 26.7
    val rows = (1 to 11).map(i => (i.toLong, "g", 9L + i)) :+ (99L, "g", 1000L)
    val out = Sketches.madOutliers(rows.toDF("id", "grp", "v"), "grp", "id", "v", k = 64)
      .collect().head
    assert(out.getAs[Long]("n_rows") === 12)
    assert(out.getAs[Long]("med2") === 31)
    assert(out.getAs[Long]("madd2") === 12)
    assert(out.getAs[Long]("n_outliers") === 1)
  }

  test("randomProjection: bitwise-exact signed sums, outDim rows per vector") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, sf(), "embeddings")
    val out = Similarity.randomProjection(emb, "vec_id", "embedding", 64, 16).cache()
    val n = emb.filter(col("embedding").isNotNull && size(col("embedding")) >= 64).count()
    assert(out.count() === n * 16)
    // recompute one cell by hand from the public md5 sign formula
    val vid = out.select("vec_id").orderBy("vec_id").head.getLong(0)
    val vec = emb.filter(col("vec_id") === vid).select("embedding").head.getSeq[Float](0)
    val expected = (0 until 64).map { i =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(s"$i:0".getBytes("UTF-8"))
      val s = if ((((d(0) >> 4) & 0xf) % 2) == 0) 1.0 else -1.0
      vec(i).toDouble * s
    }.sum
    val got = out.filter(col("vec_id") === vid && col("j") === 0).head.getAs[Double]("proj")
    assert(got === expected, "fold order must make the projection bitwise-exact")
    out.unpersist()
  }

  test("weightedSample: selects exactly the top-k rows by the A-ES key") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf(), "documents")
    val k = 20
    val got = Sampling.weightedSample(docs, "doc_id", "n_chars", k)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 13), 16).toDouble + 1.0) / 4503599627370496.0
    }
    val expect = docs.filter(col("n_chars") > 0).select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (id, w) => (math.log(u(id)) / w, id) }
      .sortBy { case (key, id) => (-key, id) }.take(k).map(_._2).toSet
    assert(got === expect)
    assert(got.size === k)
  }
}
