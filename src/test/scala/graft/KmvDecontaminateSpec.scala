package graft

import graft.operators.{Decontaminate, Dedup, Sketches}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** KMV distinct sketch + n-gram decontamination (SURVEY rows 90, 91). */
class KmvDecontaminateSpec extends SparkSpecBase {

  test("kmvDistinct: exact below k, bounded error above k") {
    import spark.implicits._
    // group "small" has 40 distinct values (< k=64 → exact);
    // group "big" has 5000 distinct values (estimator path)
    val df = ((1 to 40).map(i => ("small", i.toLong)) ++
      (1 to 5000).map(i => ("big", 100000L + i)) ++
      (1 to 40).map(i => ("small", i.toLong))).toDF("grp", "v")
    val r = Sketches.kmvDistinct(df, Seq("grp"), "v", k = 64)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("small") === 40L, "below-k groups must be exact (duplicates ignored)")
    // relative error ~1/sqrt(k-2) ≈ 13%; allow 3 sigma
    assert(math.abs(r("big") - 5000.0) / 5000.0 < 0.4,
      s"KMV estimate ${r("big")} too far from 5000")
  }

  test("kmvDistinct: nulls carry no signal; result stable under repartition") {
    import spark.implicits._
    val df = (1 to 300).map(i => ("g", java.lang.Long.valueOf(i % 100))).toDF("grp", "v")
      .union(Seq(("g", null.asInstanceOf[java.lang.Long])).toDF("grp", "v"))
    val a = Sketches.kmvDistinct(df, Seq("grp"), "v").collect()(0).getLong(1)
    val b = Sketches.kmvDistinct(df.repartition(7), Seq("grp"), "v").collect()(0).getLong(1)
    assert(math.abs(a - 100.0) / 100.0 < 0.5, s"estimate $a too far from 100")
    assert(a === b, "KMV merge must be partition-order independent")
  }

  test("streamingKmvDistinct: bounded state tracks cardinality across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val est = graft.streaming.StreamingSketch.streamingKmvDistinct(
      input.toDF().toDF("grp", "v"), "grp", "v", k = 64)
    val q = est.writeStream.format("memory").queryName("kmvstream")
      .outputMode("update").start()
    try {
      input.addData((1 to 30).map(i => ("a", i.toLong)): _*)
      q.processAllAvailable()
      assert(spark.table("kmvstream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap === Map("a" -> 30L),
        "below-k estimates are exact")
      // second batch overlaps the first: 20 genuinely new values; the
      // state must dedup re-seen values, not recount them
      input.addData((11 to 50).map(i => ("a", i.toLong)): _*)
      q.processAllAvailable()
      assert(spark.table("kmvstream").collect().map(_.getLong(1)).max === 50L,
        "streaming estimate after two batches equals the true running distinct count")
    } finally q.stop()
  }

  test("ngramOverlap flags exactly the docs sharing a 3-gram, with distinct counts") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta"), // shares "alpha beta gamma" + "beta gamma delta"
      (2L, "no overlap at all here"),
      (3L, "alpha beta gamma"), // shares one 3-gram
      (4L, "tiny doc") // < 3 tokens → no grams
    ).toDF("doc_id", "text")
    val test = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val r = Decontaminate.ngramOverlap(train, test, "doc_id", "text", 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 2L, 3L -> 1L))
  }

  test("ngramOverlapBloom equals ngramOverlap exactly — even with a saturated bloom") {
    import spark.implicits._
    val train = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val test = Tables.load(spark, sf(), "documents")
      .filter(col("doc_id") % 10 === 0).select("doc_id", "text")
    val exact = Decontaminate.ngramOverlap(train, test, "doc_id", "text", 3)
    // realistic sizing: the prefilter admits few false positives
    val bloom = Decontaminate.ngramOverlapBloom(train, test, "doc_id", "text", 3,
      words = 4096)
    assert(bloom.except(exact).isEmpty && exact.except(bloom).isEmpty,
      "the confirm join must erase every bloom false positive")
    // words=1 saturates every bit of the single block: everything is a
    // candidate and correctness must come entirely from the confirm
    val saturated = Decontaminate.ngramOverlapBloom(train, test, "doc_id", "text", 3,
      words = 1)
    assert(saturated.except(exact).isEmpty && exact.except(saturated).isEmpty,
      "a fully saturated bloom must still confirm to the exact result")
    // the corpus-side prefilter probes a broadcast ≤words-row frame
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the bloom frame join should be broadcast, got:\n$plan")
  }

  test("removeContaminated drops flagged docs only; eval side is broadcast") {
    import spark.implicits._
    val train = Seq((1L, "alpha beta gamma delta"), (2L, "clean text entirely"))
      .toDF("doc_id", "text")
    val test = Seq((9L, "alpha beta gamma")).toDF("doc_id", "text")
    val kept = Decontaminate.removeContaminated(train, test, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
    // the corpus-side join must probe a broadcast, not shuffle the corpus
    val plan = Decontaminate.ngramOverlap(train, test, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-gram join should be broadcast, got:\n$plan")
  }

  test("streamingSampledMedian equals the batch sketch over the same prefix") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rows = (1L to 200L).map(i => (s"g${i % 3}", i, i * 7 % 101))
    val input = MemoryStream[(String, Long, Long)]
    val est = graft.streaming.StreamingSketch.streamingSampledMedian(
      input.toDF().toDF("grp", "id", "v"), "grp", "id", "v", k = 16)
    val q = est.writeStream.format("memory").queryName("medstream")
      .outputMode("update").start()
    try {
      input.addData(rows.take(120): _*)
      q.processAllAvailable()
      input.addData(rows.drop(120): _*) // state must merge across batches
      q.processAllAvailable()
      val streaming = spark.table("medstream").collect()
        .map(r => (r.getString(0), (r.getInt(1), r.getLong(2))))
        .groupBy(_._1).map { case (g, vs) => g -> vs.last._2 } // latest update per group
      val batch = graft.operators.Sketches.sampledMedian(
        rows.toDF("grp", "id", "v"), "grp", "id", "v", k = 16)
        .collect().map(r => r.getString(0) -> (r.getAs[Int]("n_sample"), r.getAs[Long]("med2")))
        .toMap
      batch.foreach { case (g, bm) =>
        assert(streaming(g) === bm, s"group $g: streaming != batch sketch")
      }
    } finally q.stop()
  }

  test("contaminationAudit: stream emits hits per micro-batch, clean docs silent") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val test = Seq((9L, "alpha beta gamma")).toDF("doc_id", "text")
    val audit = Decontaminate.contaminationAudit(
      input.toDF().toDF("doc_id", "text"), test, "doc_id", "text", 3)
    val q = audit.writeStream.format("memory").queryName("audit")
      .outputMode("append").start()
    try {
      input.addData((1L, "x alpha beta gamma y"), (2L, "totally clean text here"))
      q.processAllAvailable()
      val hits = spark.table("audit").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(hits === Set((1L, "alpha beta gamma")))
      // a later batch is probed independently (stateless join)
      input.addData((3L, "alpha beta gamma delta"))
      q.processAllAvailable()
      assert(spark.table("audit").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    } finally q.stop()
  }

  test("substringClusters: transitive provenance components, singletons kept") {
    import spark.implicits._
    val p1 = "a long shared passage number one that links documents"
    val p2 = "a different shared passage number two that links again"
    val docs = Seq(
      (1L, s"unique alpha $p1"),
      (2L, s"$p1 middle body $p2"), // bridges 1 and 3
      (3L, s"$p2 unique omega"),
      (4L, "entirely standalone text with no common passage")
    ).toDF("doc_id", "text")
    val r = Dedup.substringClusters(docs, "doc_id", "text",
      k = 5, window = 8, dfNum = 3, dfDen = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1) === 1L && r(2) === 1L && r(3) === 1L,
      s"1-2-3 must be one transitive component, got $r")
    assert(r(4) === 4L, "no shared passage → own singleton cluster")
    assert(r.size === 4, "every input doc appears exactly once")
  }

  test("scalarQuantize: round-trip error bounded by scale/254, packed == exploded") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, -1.5f, 3.0f, 0.0f)),
      (2L, Array(-2.0f, 2.0f, 1.999f, 0.001f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // zero vector → all-zero codes
    ).toDF("vec_id", "embedding")
    val packed = graft.operators.Quantize.scalarQuantizePacked(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
    assert(packed(3L)._2 === Seq(0, 0, 0, 0))
    // reconstruction error per dim <= scale/2 (= max|v|/254 per unit)
    val orig = Map(1L -> Seq(0.5, -1.5, 3.0, 0.0), 2L -> Seq(-2.0, 2.0, 1.999, 0.001))
    orig.foreach { case (id, v) =>
      val (scale, codes) = packed(id)
      v.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-9,
          s"vec $id: $x reconstructed as ${c * scale} (scale $scale)")
      }
    }
    // the exploded (oracled) form and the packed form must agree
    val exploded = graft.operators.Quantize.scalarQuantize(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    packed.foreach { case (id, (_, codes)) =>
      codes.zipWithIndex.foreach { case (c, i) =>
        assert(exploded((id, i)) === c, s"packed/exploded disagree at ($id, $i)")
      }
    }
  }

  test("packByTokenBudget: batches respect budget + last-doc slack, deterministic") {
    import spark.implicits._
    val docs = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "s1" else "s2", ("tok " * (i % 37 + 1).toInt).trim))
      .toDF("doc_id", "source", "text")
    val packed = graft.operators.Pack.packByTokenBudget(docs, "doc_id", "text", "source", budget = 100)
    val stats = graft.operators.Pack.batchStats(packed, "source").collect()
    stats.foreach { r =>
      assert(r.getLong(3) <= 100L + r.getInt(4) - 1,
        s"batch ${r.get(1)} total ${r.getLong(3)} exceeds budget+slack (max doc ${r.getInt(4)})")
    }
    // batch ids dense from 0 per group
    val perGroup = packed.collect().groupBy(_.getString(1))
    perGroup.foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(3)).distinct.sorted
      assert(ids.head === 0L && ids === (0L until ids.length).toArray.toSeq)
    }
    // partition-layout independence
    val packed2 = graft.operators.Pack.packByTokenBudget(
      docs.repartition(13), "doc_id", "text", "source", budget = 100)
    assert(packed.exceptAll(packed2).isEmpty && packed2.exceptAll(packed).isEmpty)
  }

  test("sharedSubstringPairs: common substring detected, boilerplate df-gated") {
    import spark.implicits._
    val shared = "the identical quoted passage travels between documents"
    val boiler = "common boilerplate header"
    val docs = Seq(
      (1L, s"$boiler unique one $shared"),
      (2L, s"$boiler unique words two padding $shared"),
      (3L, s"$boiler completely different body content here"),
      (4L, s"$boiler another unrelated body of text padding")
    ).toDF("doc_id", "text")
    // maxDf=2: the boilerplate prefix (in all 4 docs) is gated out, the
    // shared passage (2 docs) survives → only (1,2) pairs
    val pairs = Dedup.sharedSubstringPairs(docs, "doc_id", "text",
      k = 5, window = 8, minShared = 3, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      s"expected only the quoted-passage pair, got $pairs")
  }
}
