package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the driver contract): replicates the
  * sf0.1 documents corpus N× with distinct ids and times the dedup
  * operators, to check the candidate-generation cost curves hold
  * beyond the benchmark scale. Run:
  * `sbt "runMain graft.ScaleProbe 10"` — or
  * `sbt "runMain graft.ScaleProbe 10 tpch"` for the OLAP-side probe
  * (lineitem/orders replicated N×, q1/q3 shapes re-timed: checks the
  * two-phase agg and broadcast-join plans keep scaling linearly when
  * the fact tables grow).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 1 && args(1) == "tpch") { tpch(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "graph") { graph(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "ivm") { ivm(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "r9") { r9ops(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "r10") { r10ops(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "r10b") { r10bOps(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "r10c") { r10cOps(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "r10d") { r10dOps(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "stream") { streamState(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "top5") { top5(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "bpe") { bpeEncode(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "bloom") { bloomBreakEven(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "bloomat") { bloomAt(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "bloomcap") { bloomCap(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "ntile") { ntileCrossover(spark, factor); spark.stop(); return }
    if (args.length > 1 && args(1) == "lpa") { lpaCopartition(spark, factor); spark.stop(); return }
    val r4Only = args.length > 1 && args(1) == "r4"
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val big = (0 until factor).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
    }.reduce(_.unionByName(_)).cache()
    val n = big.count()
    println(s"corpus=$n docs")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    if (!r4Only) {
    time("dedup_exact")(Dedup.exact(big, "doc_id", "text").count())
    time("editdist_pairs")(Dedup.editDistancePairs(big, "doc_id", "text",
      maxDist = 8).count())
    time("minhash_clusters")(Dedup.minhashClusters(big, "doc_id", "text", 2, 4).count())
    if (factor <= 10) {
      // pair-emission output grows with the SQUARE of duplicate
      // multiplicity — the whole reason the cluster contract exists;
      // beyond 10x the pair queries are measuring output writing, not
      // the operator
      time("minhash_pairs")(Dedup.minhashDedup(big, "doc_id", "text", 2, 4, 9, 10).count())
      time("simhash")(Dedup.simhashPairs(big, "doc_id", "text", 3).count())
      time("shingle")(Dedup.shinglePairs(big, "doc_id", "text",
        Seq("source", "lang"), 5, 7, 10).count())
      // num=0/den=1 disables the Jaccard confirm, so this counts the
      // banded LSH CANDIDATE pairs themselves — the number that must
      // stay bounded as the corpus grows now that candidates come from
      // shingle-minhash bands instead of bucket membership alone
      time("shingle_candidates")(Dedup.shinglePairs(big, "doc_id", "text",
        Seq("source", "lang"), 5, 0, 1).count())
      // pair contract again (fp-multiplicity²), df gate held as a
      // corpus fraction (1/8) — the scale-stable form; an absolute
      // threshold gates every true shared fingerprint once the
      // templated corpus outgrows it
      time("substring_pairs")(Dedup.sharedSubstringPairsRelative(big,
        "doc_id", "text", k = 5, window = 8, minShared = 8).count())
    }
    // linear contract: corpus-side grams scanned once; the eval-side
    // broadcast does NOT grow with replication (same distinct grams)
    time("decontaminate")(graft.operators.Decontaminate.ngramOverlap(
      big.filter(col("doc_id") % 50 =!= 0), big.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", 3).count())
    }
    // linear contracts, round-4 operators: chunk ownership is two
    // combinable aggregates + one join; replication multiplies chunk
    // multiplicity but never pairs anything
    time("chunk_dedup")(Dedup.chunkDedup(big, "doc_id", "text").count())
    // O(new batch) output; near-dup probe is banded, so candidate work
    // grows with per-band multiplicity, not corpus²
    time("incremental_dedup")(Dedup.incrementalDedup(
      big.filter(col("doc_id") % 5 === 0), big.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", 2, 4, 9, 10).count())
    // two count-table aggregates + joins, all shuffle-partitioned by
    // bigram — no windows, no pairs
    time("bigram_lm")(graft.operators.TfIdf.bigramSurprisal(
      big, "doc_id", "text").count())
    // zero corpus shuffle: one combinable count + broadcast probs +
    // filtered scan — must track the scan linearly
    time("temperature_mix")(graft.operators.Sampling.temperatureMix(
      big, "doc_id", "lang", 40, 100).count())
    // one scoring pass (pinned) + bucket frames; budget scaled with the
    // corpus so the boundary bucket stays interior
    time("token_budget") {
      val scored = big.select(col("doc_id"),
        (graft.functions.TextFunctions.stopwordCount(col("text")).cast("double") /
          graft.functions.TextFunctions.tokenCount(col("text")).cast("double"))
          .as("score"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
      graft.operators.Sampling.tokenBudgetSelect(scored, "doc_id", "score", "toks",
        budget = 120000L * factor).count()
    }
    // round-5 delivery/mixing operators. toRdd.count() throughout: a
    // plain count() lets Catalyst prune the windows/payloads under test.
    // one map-side shard assignment + independent within-shard sorts —
    // the global shuffle order as a distributed sort; must be linear
    time("epoch_shuffle")(graft.operators.Sampling.epochShuffle(
      big, "doc_id", seed = 7, numShards = 64).queryExecution.toRdd.count())
    // pure per-row expressions, zero shuffle; output = tokens x W/S
    time("chunk_windows")(graft.operators.Pack.slidingWindows(
      big, "doc_id", "text", 30, 15).queryExecution.toRdd.count())
    // one pinned scoring pass + group-bucket frames; only each group's
    // boundary bucket ranks
    time("quantile_cut") {
      val scored = big.select(col("doc_id"), col("lang"),
        (graft.functions.TextFunctions.stopwordCount(col("text")).cast("double") /
          graft.functions.TextFunctions.tokenCount(col("text")).cast("double"))
          .as("score"))
      graft.operators.Sampling.quantileCut(scored, "doc_id", "score", "lang",
        30, 100).queryExecution.toRdd.count()
    }
    // one combinable count + broadcast factors + map-side explode —
    // zero corpus shuffle, like temperature_mix
    time("upsample_mix")(graft.operators.Sampling.upsampleMix(
      big, "doc_id", "lang", maxRepeat = 4).queryExecution.toRdd.count())
    // XOR digests combine map-side: the shuffle is ≤numShards partial
    // rows per task no matter the corpus size — must track the scan
    time("shard_manifest")(graft.operators.Compact.shardManifest(
      big, "doc_id", "text", numShards = 64).queryExecution.toRdd.count())
    // only the boundary hash bucket ranks (~1/1024 of the corpus); k
    // scaled with the corpus so the boundary stays interior
    time("exact_sample")(graft.operators.Sampling.exactKSample(
      big, "doc_id", k = 997L * factor, seed = 7)
      .queryExecution.toRdd.count())
    // the bloom frame is ≤words rows whatever the eval size; corpus
    // grams probe it in-stage and only candidates reach the confirm
    time("decontaminate_bloom")(graft.operators.Decontaminate.ngramOverlapBloom(
      big.filter(col("doc_id") % 50 =!= 0), big.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", 3, words = 1 << 16).queryExecution.toRdd.count())
    spark.stop()
  }

  /** Bloom-decontamination break-even probe (`sbt "runMain
    * graft.ScaleProbe 64 bloom"`): grow the EVAL side — the side row
    * 129 exists for — past `autoBroadcastJoinThreshold` and time the
    * broadcast-grams path (row 91) against the blocked-Bloom path
    * (row 129) at each size. Replica `i > 0` of an eval doc suffixes
    * every token with `·i`, so its grams are NEW distinct grams
    * (the eval-gram set grows linearly) that can never hit the
    * training corpus (the true-hit set stays fixed — outputs must be
    * identical at every size). The training corpus is pinned at sf0.1
    * and never replicated: this probe isolates the eval-size axis.
    */
  /** Replica `i > 0` of every eval doc with all tokens suffixed `·i`:
    * distinct grams grow linearly, true hits stay fixed (suffixed
    * grams can never match the training corpus). Shared by both bloom
    * probes so they measure the same construction.
    */
  private def evalReplicas(evalBase: org.apache.spark.sql.DataFrame,
                           k: Int): org.apache.spark.sql.DataFrame =
    (0 until k).map { i =>
      if (i == 0) evalBase
      else evalBase
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1·$i"))
    }.reduce(_.unionByName(_))

  /** The documented sizing rule, words ~ eval grams / 6 (~1% fp at
    * k=4), floored at 2^16 and clamped at 2^28 (a 2 GB frame — past
    * that, shard the filter). Long arithmetic: highestOneBit of a
    * huge gram count shifted in Int would wrap negative and silently
    * collapse the filter to the floor in exactly the huge-eval regime
    * the bloom path exists for.
    */
  private def bloomWords(nGrams: Long): Int =
    math.min(1L << 28,
      math.max(1L << 16, java.lang.Long.highestOneBit(nGrams / 6) << 1)).toInt

  private def bloomBreakEven(spark: SparkSession, maxK: Int): Unit = {
    import graft.operators.Decontaminate
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val train = docs.filter(col("doc_id") % 50 =!= 0).cache()
    println(s"train=${train.count()} docs (fixed)")
    val evalBase = docs.filter(col("doc_id") % 50 === 0)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    println(s"autoBroadcastJoinThreshold=$threshold")
    Seq(1, 16, 64, 256, 1024).filter(_ <= math.max(1, maxK)).foreach { k =>
      val eval = evalReplicas(evalBase, k).cache()
      val grams = Decontaminate.docGrams(eval, "doc_id", "text", 3)
        .select("gram").distinct()
      val (nGrams, gBytes) = grams.agg(count(lit(1)), sum(length(col("gram"))))
        .collect().headOption.map(r => (r.getLong(0), r.getLong(1))).getOrElse((0L, 0L))
      val words = bloomWords(nGrams)
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tb, nb) = time(Decontaminate.ngramOverlap(
        train, eval, "doc_id", "text", 3).count())
      val (tf, nf) = time(Decontaminate.ngramOverlapBloom(
        train, eval, "doc_id", "text", 3, words = words).count())
      require(nb == nf, s"paths disagree at k=$k: broadcast $nb vs bloom $nf")
      println(f"evalx$k%-4d grams=$nGrams%9d (~${gBytes / 1048576.0}%7.1f MB payload, " +
        f"bloom ${words * 8 / 1048576.0}%5.1f MB) " +
        f"broadcast=$tb%7.2fs bloom=$tf%7.2fs hits=$nb")
      eval.unpersist()
    }
  }

  /** One-size break-even demonstration (`java -Xmx2g -cp ... graft
    * .ScaleProbe 1024 bloomat`): run BOTH decontamination paths at a
    * single eval multiplier under whatever heap the JVM was given,
    * each guarded, printing OK/FAILED — the controlled experiment for
    * "broadcast dies where bloom holds": a forced broadcast of an
    * eval-gram relation that outgrows executor memory fails the
    * stage, while the bloom path's fixed ≤8B/word frame is immune to
    * eval size by construction.
    */
  private def bloomAt(spark: SparkSession, k: Int): Unit = {
    import graft.operators.Decontaminate
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val evalBase = docs.filter(col("doc_id") % 50 === 0)
    val eval = evalReplicas(evalBase, k)
    val heap = Runtime.getRuntime.maxMemory() / 1048576
    println(s"evalx$k under ${heap}MB heap")
    def attempt(name: String)(f: => Long): Unit = {
      // plan-identical eval-gram frames cache-hit across attempts —
      // clear so each path pays its own eval-side cost
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        val rows = f
        println(f"$name: OK ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows hits")
      } catch {
        case e: Throwable =>
          val root = Option(e.getCause).getOrElse(e)
          println(s"$name: FAILED after ${(System.nanoTime() - t0) / 1e9}s — " +
            s"${root.getClass.getSimpleName}: ${String.valueOf(root.getMessage).take(200)}")
      }
    }
    val nGrams = Decontaminate.docGrams(eval, "doc_id", "text", 3)
      .select("gram").distinct().count()
    val words = bloomWords(nGrams)
    println(s"eval grams=$nGrams bloom_words=$words")
    attempt("broadcast")(Decontaminate.ngramOverlap(
      train, eval, "doc_id", "text", 3).count())
    attempt("bloom")(Decontaminate.ngramOverlapBloom(
      train, eval, "doc_id", "text", 3, words = words).count())
  }

  /** Graph-side probe (`sbt "runMain graft.ScaleProbe 10 graph"`): the
    * round-8 graph heavies over a k×-replicated edge list. Replication
    * offsets node ids per replica, producing k DISJOINT copies of the
    * sf0.1 co-purchase graph: edge count scales by k while per-copy
    * degree structure is preserved — exactly how a bigger catalog with
    * the same co-purchase density looks, and the shape that makes the
    * expected curves checkable (triangles/wedges per copy constant, so
    * wall time should track edges ~linearly; super-linear growth would
    * mean cross-copy work is being generated where none exists).
    * PageRank/components/BFS iterate the same number of rounds per
    * copy (diameter unchanged), so their per-round shuffles must track
    * edges linearly too. item_sim replicates the (basket, item) table
    * the same way (both ids offset).
    */
  private def graph(spark: SparkSession, factor: Int): Unit = {
    val dir = "/root/testdata/sf0.1"
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_partkey")
    val baseEdges = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      .distinct().cache()
    println(s"base co-purchase edges=${baseEdges.count()}")
    val baseBaskets = li.cache()
    baseBaskets.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    Seq(1, factor).distinct.foreach { k =>
      val e = (0 until k).map { i =>
        baseEdges.select((col("src") + lit(i.toLong * 100000000L)).as("src"),
          (col("dst") + lit(i.toLong * 100000000L)).as("dst"))
      }.reduce(_.unionByName(_)).cache()
      println(s"--- x$k: edges=${e.count()}")
      time(s"triangles_x$k")(
        operators.Triangles.triangleCount(e, "src", "dst").count())
      time(s"pagerank_x$k")(
        operators.PageRank.run(e, "src", "dst", iters = 5).count())
      time(s"components_x$k")(
        operators.ConnectedComponents.componentsFromEdges(e, "src", "dst").count())
      e.unpersist()
      val b = (0 until k).map { i =>
        baseBaskets.select(
          (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i.toLong * 100000000L)).as("l_partkey"))
      }.reduce(_.unionByName(_)).cache()
      b.count()
      time(s"item_sim_x$k")(
        operators.Association.itemSimilarity(b, "l_orderkey", "l_partkey",
          minCooc = 3, topK = 5).count())
      b.unpersist()
    }
  }

  /** IVM-vs-recompute probe (`sbt "runMain graft.ScaleProbe 10 ivm"`):
    * the claim batch IVM exists for — absorbing a small CDC delta into
    * a materialized aggregate must cost ~the delta, not ~the base
    * table. Builds a k×-replicated orders state partitioned by a
    * custkey bucket, applies a delta CONCENTRATED in one partition
    * (the realistic shape: a day's changes touch recent keys, not all
    * of history), and times [[graft.operators.Ivm
    * .refreshGroupBySumTable]] against a full groupState recompute +
    * rewrite of the same post-delta base. Also reports the file-level
    * evidence: how many state files each path rewrote.
    */
  private def ivm(spark: SparkSession, factor: Int): Unit = {
    import graft.operators.Ivm
    val dir = java.nio.file.Files.createTempDirectory("graft-ivm-probe").toString
    val base = (0 until factor).map { i =>
      Tables.load(spark, "/root/testdata/sf0.1", "orders")
        .withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L))
    }.reduce(_.unionByName(_))
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("pb", (col("o_custkey") % 64).cast("int"))
      .cache()
    println(s"base orders=${base.count()} (x$factor)")
    val statePath = s"$dir/state"
    Ivm.groupState(base, Seq("pb", "o_custkey"), "cents")
      .write.partitionBy("pb").parquet(statePath)
    def stateFiles(): Set[String] = {
      val root = new java.io.File(statePath)
      root.listFiles().filter(_.getName.startsWith("pb=")).flatMap(d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}")).toSet
    }
    val before = stateFiles()
    // delta: one bucket's customers get new orders + one deletion — a
    // ~1/64 slice of the key space, like a day's changes at 100 TB
    val delta = base.filter(col("pb") === 7 && col("o_orderkey") % 200 === 0)
      .withColumn("__op", lit("I"))
      .withColumn("o_orderkey", col("o_orderkey") + 10000000000L) // above every replica's key range
      .unionByName(base.filter(col("pb") === 7 && col("o_orderkey") % 300 === 0)
        .withColumn("__op", lit("D")))
      .cache()
    println(s"delta rows=${delta.count()}")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    time("ivm_refresh")(Ivm.refreshGroupBySumTable(statePath, delta, "__op",
      Seq("pb", "o_custkey"), "cents", "pb"))
    val after = stateFiles()
    println(s"files untouched=${(before intersect after).size} rewritten=${(after diff before).size} of ${before.size}")
    // full recompute of the same post-delta base, written fresh
    time("full_recompute") {
      val post = base.unionByName(delta.filter(col("__op") === "I").drop("__op"))
        .join(delta.filter(col("__op") === "D").select("o_orderkey"),
          Seq("o_orderkey"), "left_anti")
      Ivm.groupState(post, Seq("pb", "o_custkey"), "cents")
        .write.mode("overwrite").partitionBy("pb").parquet(s"$dir/recomputed")
    }
    // the contract: both tables hold identical rows
    val a = spark.read.parquet(statePath)
    val b = spark.read.parquet(s"$dir/recomputed")
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "IVM != recompute")
    println("ivm == recompute: verified")
  }

  /** Round-9 pipeline operators at 10× corpus (`sbt "runMain
    * graft.ScaleProbe 10 r9"`): kl_drift and source_overlap are
    * one-explode + bucketed-join shapes that must track the scan;
    * canonical selection adds one combinable argmax to the cluster
    * cost; BPE encode is a pure map whose throughput should be flat
    * per row.
    */
  private def r9ops(spark: SparkSession, factor: Int): Unit = {
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val big = (0 until factor).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
    }.reduce(_.unionByName(_)).cache()
    println(s"corpus=${big.count()} docs")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    time("kl_drift")(graft.operators.Analytics.klDrift(
      big, "source", "text").count())
    time("source_overlap")(graft.operators.Sketches.sourceOverlap(
      big, "source", "text", 3, 128).count())
    time("dedup_canonical")(graft.operators.Dedup.keepCanonical(
      big, "doc_id", "text", "n_chars", 2, 4).count())
    time("bpe_encode")(graft.operators.Bpe.encode(big, "doc_id", "text",
      Seq(("t", "a"), ("ta", "b"), ("l", "e</w>"), ("s", "c"), ("sc", "a")))
      .queryExecution.toRdd.count())
  }

  /** Round-10 probe (`sbt "runMain graft.ScaleProbe 10 r10"`): the
    * operators the round-9 verdict flagged curve-less. q_communities
    * (LabelPropagation — per round one edge join + two combinable
    * aggs; with per-sweep lineage truncation wall time must track
    * edges), q_fk_discovery (13 per-column distinct aggregations —
    * the fact-sized work — plus a cols×k broadcast probe; must track
    * the scans), and the two-sided join IVM refresh vs a full
    * recompute of the same post-delta join (the delta-sized-work
    * claim row 219 makes).
    */
  private def r10ops(spark: SparkSession, factor: Int): Unit = {
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    // communities over the co-purchase graph (the graph probe's edge set)
    val li0 = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_partkey")
    val baseEdges = li0.as("x").join(li0.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      .distinct().cache()
    println(s"base co-purchase edges=${baseEdges.count()}")
    Seq(1, factor).distinct.foreach { k =>
      val e = (0 until k).map { i =>
        baseEdges.select((col("src") + lit(i.toLong * 100000000L)).as("src"),
          (col("dst") + lit(i.toLong * 100000000L)).as("dst"))
      }.reduce(_.unionByName(_)).cache()
      e.count()
      time(s"communities_x$k")(
        operators.LabelPropagation.communities(e, "src", "dst", rounds = 3).count())
      e.unpersist()
    }
    baseEdges.unpersist()
    // fk discovery: replicate the two fact tables (keys remapped), keep dims
    Seq(1, factor).distinct.foreach { k =>
      def rep(name: String, keyCols: Seq[String]) = {
        val base = Tables.load(spark, dir, name)
        (0 until k).map { i =>
          keyCols.foldLeft(base)((df, kc) =>
            df.withColumn(kc, col(kc) + lit(i.toLong * 100000000L)))
        }.reduce(_.unionByName(_))
      }
      val li = rep("lineitem", Seq("l_orderkey"))
      val ord = rep("orders", Seq("o_orderkey"))
      val cust = Tables.load(spark, dir, "customer")
      val supp = Tables.load(spark, dir, "supplier")
      val pt = Tables.load(spark, dir, "part")
      val nat = Tables.load(spark, dir, "nation")
      time(s"fk_discovery_x$k")(operators.Discovery.inclusionCandidates(Seq(
        ("lineitem.l_orderkey", li, "l_orderkey"),
        ("lineitem.l_partkey", li, "l_partkey"),
        ("lineitem.l_suppkey", li, "l_suppkey"),
        ("orders.o_orderkey", ord, "o_orderkey"),
        ("orders.o_custkey", ord, "o_custkey"),
        ("customer.c_custkey", cust, "c_custkey"),
        ("customer.c_nationkey", cust, "c_nationkey"),
        ("supplier.s_suppkey", supp, "s_suppkey"),
        ("supplier.s_nationkey", supp, "s_nationkey"),
        ("part.p_partkey", pt, "p_partkey"),
        ("nation.n_nationkey", nat, "n_nationkey")), k = 128).count())
    }
    // two-sided join IVM: refresh cost ~delta, recompute cost ~base
    import graft.operators.Ivm
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivm-join-probe").toString
    val ord = (0 until factor).map { i =>
      Tables.load(spark, dir, "orders")
        .withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L))
    }.reduce(_.unionByName(_))
      .select(col("o_orderkey"), col("o_custkey").as("custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")).cache()
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_nationkey")).cache()
    println(s"orders=${ord.count()} (x$factor) customers=${cust.count()}")
    val path = s"$tmp/matjoin"
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    t("join_ivm_build")(Ivm.writeJoinTable(path, ord, cust, "custkey", 64))
    def joinFiles(): Set[String] = {
      val root = new java.io.File(path)
      root.listFiles().filter(_.getName.startsWith("__jb=")).flatMap(d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}:${f.lastModified()}")).toSet
    }
    val beforeFiles = joinFiles()
    // delta CONCENTRATED in ~15 customers' join keys — the realistic
    // shape (a day's churn touches recent keys, not all of history);
    // the uniform-delta case degenerates to full recompute by design
    val hotCust = col("custkey") % 1000 === 0
    val deltaR = ord.filter(hotCust && col("o_orderkey") % 5 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000000L)
      .withColumn("__op", lit("I"))
      .unionByName(ord.filter(hotCust && col("o_orderkey") % 7 === 0)
        .withColumn("__op", lit("D")))
      .cache()
    val deltaS = cust.filter(hotCust).withColumn("__op", lit("D"))
      .unionByName(cust.filter(hotCust)
        .withColumn("c_nationkey", col("c_nationkey") + 1).withColumn("__op", lit("I")))
      .cache()
    println(s"deltaR=${deltaR.count()} deltaS=${deltaS.count()}")
    t("join_ivm_refresh")(Ivm.refreshJoinTable(path, ord, deltaR, cust, deltaS,
      "__op", "o_orderkey", "custkey", "custkey", 64))
    val afterFiles = joinFiles()
    println(s"join state files untouched=${(beforeFiles intersect afterFiles).size} " +
      s"rewritten=${(afterFiles diff beforeFiles).size} of ${beforeFiles.size}")
    t("join_full_recompute") {
      val rPost = ord.join(deltaR.filter(col("__op") === "D").select("o_orderkey"),
          Seq("o_orderkey"), "left_anti")
        .unionByName(deltaR.filter(col("__op") === "I").drop("__op"))
      val sPost = cust.join(deltaS.filter(col("__op") === "D").select("custkey"),
          Seq("custkey"), "left_anti")
        .unionByName(deltaS.filter(col("__op") === "I").drop("__op"))
      rPost.join(sPost, "custkey")
        .withColumn("__jb", Ivm.joinBucket("custkey", 64))
        .write.mode("overwrite").partitionBy("__jb").parquet(s"$tmp/recomputed")
    }
    val a = spark.read.parquet(path).drop("__jb")
    val b = spark.read.parquet(s"$tmp/recomputed").drop("__jb")
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "join IVM != recompute")
    println("join ivm == recompute: verified")
  }

  /** BPE encode throughput, heap vs rescan (`sbt "runMain
    * graft.ScaleProbe 32768 bpe"` — arg = merge-table size): a
    * well-formed table of `factor` merges over the sf0.1 corpus. The
    * rescan is O(merges × len) per word, the heap O(len log len) —
    * the gap is the whole point of the kernel, and at a production
    * 32k vocabulary the claim under test is that the heap encode's
    * wall-time is FLAT in table size.
    *
    * Table shape: a FIRING prefix — `SPARK_GRAFT_BPE_TRAIN` real
    * [[graft.operators.Bpe.train]]-learned merges (default 64; these
    * hit the corpus constantly, so the rank map is hot, not
    * decorative) — padded to `factor` with independent never-firing
    * rules (shared atomic left outside the corpus alphabet, distinct
    * atomic rights), the realistic big-vocabulary shape where most
    * of the table is irrelevant to any given word. The pad is O(1)
    * chars per rule — the earlier left-association chain grew rule
    * strings linearly with rank (O(n²) table chars ≈ 1 GB at 32k),
    * which would have measured table materialization, not encode.
    */
  private def bpeEncode(spark: SparkSession, nMerges: Int): Unit = {
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text").cache()
    val nTrain = sys.env.getOrElse("SPARK_GRAFT_BPE_TRAIN", "64").toInt
    println(s"docs=${docs.count()}, merges=$nMerges (trained prefix=$nTrain)")
    val t0 = System.nanoTime()
    val trained = graft.operators.Bpe.train(docs, "text", math.min(nTrain, nMerges))
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    println(f"bpe_train: ${(System.nanoTime() - t0) / 1e9}%.1fs, ${trained.size} merges")
    // pad over characters outside the corpus alphabet (0x2500.., below
    // the surrogate block): rule i = (shared left, distinct right),
    // both atomic, outputs distinct — wellFormed by construction
    val nPad = math.max(0, nMerges - trained.size)
    require(0x2501 + nPad < 0xD800, s"pad alphabet exhausted at $nPad rules")
    val padLeft = 0x2500.toChar.toString
    val pad = (0 until nPad).map(i => (padLeft, (0x2501 + i).toChar.toString))
    val merges = trained ++ pad
    require(graft.operators.Bpe.wellFormed(merges))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    time("bpe_heap")(graft.operators.Bpe.encode(docs, "doc_id", "text", merges)
      .queryExecution.toRdd.count())
    // the rescan baseline is O(merges × len) per word BY DESIGN — at a
    // production table (32k merges) it only proves it's unusable, so
    // it is skippable when the question is "is the heap flat vs 1k?"
    if (sys.env.getOrElse("SPARK_GRAFT_BPE_RESCAN", "1") == "1")
      time("bpe_rescan")(graft.operators.Bpe.encode(docs, "doc_id", "text", merges,
        forceRescan = true).queryExecution.toRdd.count())
  }

  /** Round-10b operators at 1× and N×: hierarchy rollup (forest ×N,
    * same depth — the closure row count scales with nodes·depth),
    * functional dependencies (orders ×N), chi-square cells (events ×N,
    * same cell grid), ROC-AUC (documents ×N, bounded score domain),
    * and peak concurrency (events ×N with DISTINCT users per replica —
    * the per-day boundary-event windows grow linearly, the realistic
    * way concurrency scales).
    */
  private def r10bOps(spark: SparkSession, factor: Int): Unit = {
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    Seq(1, factor).distinct.foreach { k =>
      val pt = (0 until k).map { i =>
        Tables.load(spark, dir, "part")
          .withColumn("p_partkey", col("p_partkey") + lit(i.toLong * 100000000L))
      }.reduce(_.unionByName(_)).cache()
      pt.count()
      val edges = pt.select(col("p_partkey").as("child"),
          floor((col("p_partkey") % 100000000L) / 10).cast("long").as("parent"))
        .filter(col("parent") >= 1)
        .withColumn("parent",
          col("parent") + (col("child") - col("child") % 100000000L))
      time(s"bom_rollup_x$k")(operators.Hierarchy.subtreeRollup(
        edges, "child", "parent",
        pt.select(col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("cents")),
        "p_partkey", "cents").count())
      pt.unpersist()

      val ord = (0 until k).map { i =>
        Tables.load(spark, dir, "orders")
          .withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L))
      }.reduce(_.unionByName(_)).cache()
      ord.count()
      time(s"fd_discovery_x$k")(operators.Discovery.functionalDependencies(
        ord, Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")).count())
      ord.unpersist()

      val ev = (0 until k).map { i =>
        Tables.load(spark, dir, "events")
          .withColumn("user_id", col("user_id") + lit(i.toLong * 100000000L))
      }.reduce(_.unionByName(_)).cache()
      ev.count()
      time(s"chisq_x$k")(operators.Stats.chiSquareCells(ev,
        col("event_type"), col("user_id") % 4).count())
      time(s"peak_concurrency_x$k")(operators.Analytics.peakConcurrency(
        ev, "user_id", "ts", 1800).count())
      ev.unpersist()

      val docs = (0 until k).map { i =>
        Tables.load(spark, dir, "documents")
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
      }.reduce(_.unionByName(_)).cache()
      docs.count()
      time(s"auc_x$k")(operators.Stats.rocAuc(docs,
        col("n_chars"), col("lang") === "en").count())
      docs.unpersist()

      // distinct suppliers per replica: more window partitions of the
      // same size — the shape a bigger fleet actually has
      val mv = (0 until k).map { i =>
        Tables.load(spark, dir, "lineitem")
          .withColumn("l_suppkey", col("l_suppkey") + lit(i.toLong * 100000000L))
          .withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L))
      }.reduce(_.unionByName(_))
        .select(col("l_suppkey"),
          (when(col("l_returnflag") === "R", -1L).otherwise(1L) *
            round(col("l_quantity")).cast("long")).as("delta"),
          graft.functions.TimeFunctions.epochSec(col("l_shipdate")).as("ep"),
          col("l_orderkey"), col("l_linenumber")).cache()
      mv.count()
      time(s"clamped_balance_x$k")(operators.TimeSeries.clampedBalance(
        mv, "l_suppkey", "delta", Seq("ep", "l_orderkey", "l_linenumber")).count())
      mv.unpersist()
    }
  }

  /** Round-10c operators at x1 and xN: winsorized/OLS ride
    * replica-distinct supplier keys (more window partitions / groups
    * of the same size — the bigger-fleet shape), modularity rides
    * disjoint graph replicas (the graph-probe convention), and the
    * document operators token-suffix each replica (the SfScale
    * lesson: verbatim copies would explode pair multiplicity
    * quadratically and measure output writing, not the operator).
    */
  private def r10cOps(spark: SparkSession, factor: Int): Unit = {
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    Seq(1, factor).distinct.foreach { k =>
      val li = (0 until k).map { i =>
        Tables.load(spark, dir, "lineitem")
          .withColumn("l_suppkey", col("l_suppkey") + lit(i.toLong * 100000000L))
          .withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L))
          .withColumn("l_partkey", col("l_partkey") + lit(i.toLong * 100000000L))
      }.reduce(_.unionByName(_)).cache()
      li.count()
      time(s"winsorized_x$k")(operators.Stats.winsorizedStats(li,
        col("l_suppkey"), round(col("l_extendedprice") * 100), 5, 95, 100).count())
      time(s"ols_x$k")(operators.Stats.olsPerGroup(li,
        col("l_suppkey"), round(col("l_quantity")), round(col("l_extendedprice") / 10)).count())
      val e = li.select("l_orderkey", "l_partkey").as("x")
        .join(li.select("l_orderkey", "l_partkey").as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      time(s"modularity_x$k")(operators.LabelPropagation.modularity(
        e, "src", "dst", rounds = 3).count())
      li.unpersist()

      val docs = (0 until k).map { i =>
        Tables.load(spark, dir, "documents")
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
          .withColumn("text", concat(col("text"), lit(s" zrep$i")))
      }.reduce(_.unionByName(_)).cache()
      docs.count()
      time(s"calibration_x$k")(operators.Stats.calibrationBins(docs,
        col("n_chars"), col("lang") === "en", 10).count())
      time(s"url_canonical_x$k") {
        val raw = concat(lit("HTTPS://WWW.Example"), (col("doc_id") % 5).cast("string"),
          lit(".com:443/Docs/"), col("source"), lit("/Item"),
          (col("doc_id") % 40).cast("string"),
          when(col("doc_id") % 3 === 0, lit("/?b=2&a=1&utm_source=feed"))
            .when(col("doc_id") % 3 === 1, lit("?a=1&utm_campaign=x&b=2#frag"))
            .otherwise(lit("?a=1&b=2")))
        docs.select(col("doc_id"), raw.as("url"))
          .select(col("doc_id"), col("url"),
            graft.functions.UrlFunctions.canonicalizeUrl(col("url")).as("canonical_url"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_urls"), countDistinct(col("url")).as("n_raw_forms"),
            min("doc_id").as("first_doc")).count()
      }
      time(s"minhash_accuracy_x$k")(Dedup.minhashAccuracy(
        docs, "doc_id", "text", 2, 4).count())
      time(s"lsh_tuning_x$k")(Dedup.lshTuningCurve(
        docs, "doc_id", "text", "source", 1, 2,
        Seq((1, 8), (2, 4), (4, 2), (8, 1))).count())
      docs.unpersist()
    }
  }

  /** Round-10d/e/f operators at x1 and xN — the heavier shapes among
    * the late-round additions: nDCG (broadcast queries × corpus scan),
    * autocorrelation (per-lag self-equi-join), feature hashing
    * (explode + combinable agg), burst dedup (per-key window), trend
    * decomposition (RANGE window), rendezvous movement (map-side
    * argmax). Same replica discipline as [[r10cOps]].
    */
  private def r10dOps(spark: SparkSession, factor: Int): Unit = {
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    Seq(1, factor).distinct.foreach { k =>
      val emb = (0 until k).map { i =>
        Tables.load(spark, dir, "embeddings")
          .withColumn("vec_id", col("vec_id") + lit(i.toLong * 100000000L))
      }.reduce(_.unionByName(_)).cache()
      emb.count()
      time(s"ndcg_x$k")(operators.Similarity.ndcgAtK(emb,
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", "label", 10).count())
      time(s"embed_dim_stats_x$k")(operators.Quantize.dimStats(
        emb, "vec_id", "embedding").count())
      emb.unpersist()

      val li = (0 until k).map { i =>
        Tables.load(spark, dir, "lineitem")
          .withColumn("l_suppkey", col("l_suppkey") + lit(i.toLong * 100000000L))
      }.reduce(_.unionByName(_))
        .filter(col("l_suppkey").isNotNull && col("l_shipdate").isNotNull &&
          col("l_quantity").isNotNull)
        .groupBy(col("l_suppkey").as("g"),
          graft.functions.TimeFunctions.truncDiv(
            graft.functions.TimeFunctions.epochSec(col("l_shipdate")), 86400L).as("day"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("qty")).cache()
      li.count()
      time(s"autocorr_x$k")(operators.TimeSeries.autocorrelation(
        li, "g", "day", "qty", Seq(1, 7)).count())
      time(s"trend_decompose_x$k")(operators.TimeSeries.trendDecompose(
        li, "g", "day", "qty", 3).count())
      li.unpersist()

      val ev = (0 until k).map { i =>
        Tables.load(spark, dir, "events")
          .withColumn("user_id", col("user_id") + lit(i.toLong * 100000000L))
      }.reduce(_.unionByName(_)).cache()
      ev.count()
      time(s"event_dedup_x$k")(operators.Sessionize.burstDedup(
        ev, Seq("user_id", "event_type"), "ts", 5).count())
      ev.unpersist()

      val docs = (0 until k).map { i =>
        Tables.load(spark, dir, "documents")
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
          .withColumn("text", concat(col("text"), lit(s" zrep$i")))
      }.reduce(_.unionByName(_)).cache()
      docs.count()
      time(s"feature_hash_x$k")(operators.FeaturePrep.featureHash(
        docs, "doc_id", "text", 64).count())
      time(s"rendezvous_x$k")(operators.Sharding.rendezvousMovement(
        docs, "doc_id", 8).count())
      docs.unpersist()
    }
  }

  /** Wedge-Bloom cap-boundary probe (r13, verdict #5): the triangle
    * wedge Bloom auto-sizes to nextPow2(E/16) clamped to
    * [1<<20, 1<<24]; the r12 decade run MEASURED ~1% fp to 250M edges,
    * but past the cap "fp degrades gracefully toward pass-through" was
    * asserted from design only. This leg replicates the EXACT Bloom
    * construction (Triangles.scala: one 64-bit block per pair, k=4
    * bits, xxhash64 word/mask split) at the CAP (1<<24 words = 128 MB
    * broadcast) over synthetic edge sets at 1x/2x/4x the cap's design
    * load (268M/536M/1073M edges) and measures the false-positive rate
    * on known-absent wedge pairs — the fraction of non-triangle wedges
    * that would survive into the exact close join.
    * Run: `sbt "runMain graft.ScaleProbe 4 bloomcap"` (factor bounds
    * the largest multiple).
    */
  /** r14 (verdict #6): measure the exact-ntile dispatch crossover
    * instead of resting the 10M `NTILE_WINDOW_MAX` constant on one
    * bench-scale pair. Times BOTH exact paths — the single-sort-task
    * window form and the range-partitioned distributed rank — at
    * n = factor/4, factor/2, factor MILLION synthetic entities
    * (seeded-hash values so the sort is real), forced through an
    * order-insensitive checksum that doubles as a bit-equality probe
    * between the two paths.
    * `sbt "runMain graft.ScaleProbe 30 ntile"` = legs at 7/15/30 M.
    */
  /** VERDICT r14 what's-wrong #5: the one-time repartition of the
    * persisted LPA edge set was plan-motivated (per-sweep label join
    * reuses the edge partitioning) but bench-neutral at sf0.1 because
    * AQE broadcasts the label table either way. This probe measures
    * both arms of the REAL operator (the spark.graft.lpa.copartition
    * escape hatch) across edge decades, recording wall time AND total
    * executed shuffle-write bytes per run: with the co-partition the
    * per-sweep shuffles stay label-sized, without it each sweep
    * re-shuffles the edge set once the label table stops
    * broadcasting. Node-id shifts reuse the graph probe's 1e8 stride
    * (perf probe — the replica labels exceed the 1e8 packing ceiling
    * exactly as the existing graph probe's replicas do).
    */
  private def lpaCopartition(spark: SparkSession, factor: Int): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val li0 = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      .select("l_orderkey", "l_partkey")
    val baseEdges = li0.as("x").join(li0.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      .distinct().cache()
    println(s"base co-purchase edges=${baseEdges.count()}")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    def run(name: String)(f: => Long): Unit = {
      org.apache.spark.graftbridge.CoreBridge.drainListenerBus(spark.sparkContext)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val rows = f
      org.apache.spark.graftbridge.CoreBridge.drainListenerBus(spark.sparkContext)
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows, " +
        f"shuffle_write=${shuffleBytes.get / 1048576.0}%.1f MiB")
    }
    try {
      for (k <- Seq(1, 4, factor).distinct if k >= 1) {
        val e = (0 until k).map { i =>
          baseEdges.select((col("src") + lit(i.toLong * 100000000L)).as("src"),
            (col("dst") + lit(i.toLong * 100000000L)).as("dst"))
        }.reduce(_.unionByName(_)).cache()
        println(s"--- x$k: edges=${e.count()}")
        // SPARK_GRAFT_LPA_ARM_ORDER=reverse flips which arm runs first
        // per decade — the first arm pays JIT/cache warmup, so a fair
        // wall-time read needs both orders (the bytes metric is
        // order-insensitive)
        val arms =
          if (sys.env.get("SPARK_GRAFT_LPA_ARM_ORDER").contains("reverse"))
            Seq(false, true)
          else Seq(true, false)
        for (copart <- arms) {
          spark.conf.set("spark.graft.lpa.copartition", copart.toString)
          run(s"communities_x${k}_copart=$copart")(
            operators.LabelPropagation.communities(e, "src", "dst", rounds = 3)
              .count())
        }
        spark.conf.set("spark.graft.lpa.copartition", "true")
        e.unpersist(blocking = false)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def ntileCrossover(spark: SparkSession, factor: Int): Unit = {
    val k = 5
    val win = org.apache.spark.sql.expressions.Window
    for (m <- Seq(factor / 4, factor / 2, factor).distinct if m >= 1) {
      val n = m * 1000000L
      val df = spark.range(n).select(col("id"),
          pmod(xxhash64(col("id"), lit(14)), lit(1000000007L)).as("v"))
        .cache()
      df.count()
      val order = Seq(col("v"), col("id"))
      def checksum(d: org.apache.spark.sql.DataFrame): Long =
        d.agg(sum(col("b") * pmod(col("id"), lit(97L)))).collect()(0).getLong(0)
      def time(name: String)(f: => Long): Long = {
        val t0 = System.nanoTime()
        val cs = f
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs checksum=$cs")
        cs
      }
      val a = time(s"ntile_window n=${m}M")(checksum(
        df.withColumn("b", ntile(k).over(win.orderBy(order: _*)).cast("long"))))
      val b = time(s"ntile_distributed n=${m}M")(checksum(
        graft.operators.Analytics.distributedNtile(df, k, order, "b")))
      assert(a == b, s"paths disagree at ${m}M: $a vs $b")
      df.unpersist(blocking = false)
    }
  }

  private def bloomCap(spark: SparkSession, factor: Int): Unit = {
    import org.apache.spark.sql.{Column, DataFrame}
    val w = 1 << 24
    def pairW(x: Column, y: Column): Column =
      pmod(xxhash64(x, y, lit(1)), lit(w.toLong))
    def withMask(df: DataFrame, x: String, y: String): DataFrame = df
      .withColumn("__h2", xxhash64(col(x), col(y), lit(2)))
      .withColumn("__m", expr((0 until 4).map(j =>
        s"shiftleft(1L, cast(shiftright(__h2, ${6 * j}) & 63L as int))")
        .mkString(" | ")))
      .drop("__h2")
    val probes = 4L * 1000 * 1000
    for (mult <- Seq(1L, 2L, 4L) if mult <= factor) {
      val e = (1L << 24) * 16 * mult
      val edges = spark.range(e)
        .select(col("id").as("x"), (col("id") * 2654435761L + 17L).as("y"))
      val bloom = withMask(
          edges.select(pairW(col("x"), col("y")).as("__w"), col("x"), col("y")),
          "x", "y")
        .groupBy("__w").agg(expr("bit_or(__m)").as("__bits"))
      // probe pairs are disjoint from every inserted pair by
      // construction (y = -1 is never an edge endpoint above)
      val absent = spark.range(probes).select((col("id") + e).as("x"), lit(-1L).as("y"))
      val t0 = System.nanoTime()
      val fp = withMask(absent, "x", "y")
        .withColumn("__w", pairW(col("x"), col("y")))
        .join(broadcast(bloom), "__w")
        .filter(col("__bits").bitwiseAND(col("__m")) === col("__m"))
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"bloomcap edges=$e%d words=$w loadx=$mult%d fp=${fp.toDouble / probes}%.4f " +
        f"close_join_input_per_1M_nontriangle_wedges=${fp.toDouble / probes * 1e6}%.0f sec=$sec%.1f")
    }
  }

  /** Streaming state-store scale probe (r12, verdict #6): the
    * mapGroupsWithState sketches DECLARE bounded per-group state (k
    * minima / k samples, never the stream's cardinality); this probe
    * MEASURES it. For each group-count decade it drives `factor`×10
    * micro-batches of [[StreamingSketch.streamingKmvDistinct]] through
    * a MemoryStream with full value churn (every batch brings each
    * group 8 NEVER-SEEN values, so distinct-values-per-group grows
    * ~8× per 10 batches while state must stay k-bounded), snapshots
    * the state operator's numRowsTotal/memoryUsedBytes at three
    * points of the run, and prints the groups → bytes curve. Healthy:
    * rows == groups, bytes/group flat across decades (state is
    * groups×k), and bytes@end/bytes@early ≈ 1 once the k minima
    * saturate (~batch 8) — a caught leak is bytes growing with the
    * CHURN instead of the group count. A second, shorter pass probes
    * [[StreamingSketch.streamingExactKSample]] the same way.
    * Run: `sbt "runMain graft.ScaleProbe 10 stream"`.
    */
  private def streamState(spark: SparkSession, factor: Int): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSketch
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = math.max(10, factor * 10)
    def drive(name: String, groups: Int,
              mk: DataFrame => DataFrame): Unit = {
      val in = MemoryStream[(Long, Long)]
      val q = mk(in.toDF.toDF("g", "v"))
        .writeStream.format("noop").outputMode("update")
        .queryName(s"${name}_$groups").start()
      def stateSnapshot(): (Long, Long) = {
        val p = q.lastProgress
        if (p == null || p.stateOperators.isEmpty) (0L, 0L)
        else (p.stateOperators.head.numRowsTotal,
          p.stateOperators.head.memoryUsedBytes)
      }
      val marks = Set(math.max(1, batches / 10), batches / 2, batches)
      val snaps = scala.collection.mutable.LinkedHashMap[Int, (Long, Long)]()
      (1 to batches).foreach { b =>
        // churn: 8 fresh values per group per batch — never repeated
        in.addData((0 until groups).flatMap(g =>
          (0 until 8).map(i => (g.toLong, b.toLong * 1000000 + g.toLong * 8 + i))))
        q.processAllAvailable()
        if (marks(b)) snaps(b) = stateSnapshot()
      }
      q.stop()
      val line = snaps.map { case (b, (rows, bytes)) =>
        f"b$b%d rows=$rows%d bytes=$bytes%d" }.mkString("  ")
      val (_, endBytes) = snaps.last._2
      println(f"$name groups=$groups%6d  $line  bytes/group=${endBytes.toDouble / groups}%.0f")
    }
    Seq(100, 1000, 10000).foreach { g =>
      drive("kmv_distinct", g,
        df => StreamingSketch.streamingKmvDistinct(df, "g", "v", k = 64))
    }
    Seq(100, 1000).foreach { g =>
      drive("exactk_sample", g,
        df => StreamingSketch.streamingExactKSample(df, "g", "v", k = 64))
    }
    // r13 (verdict #7): the two sketches the r12 curve didn't cover.
    // sampled-median state is k (hash, value) pairs per group — same
    // contract as kmv; the fresh-values churn exercises exactly the
    // path that would leak if the buffer insert kept more than k.
    Seq(100, 1000).foreach { g =>
      drive("sampled_median", g,
        df => StreamingSketch.streamingSampledMedian(df, "g", "v", "v", k = 64))
    }
    // streaming Misra-Gries keys its state by BUCKET (the group axis
    // here IS the bucket count); full-churn fresh tokens per batch is
    // the adversarial input — a correct MG summary stays <= k tokens
    // per bucket while total distinct tokens grow without bound.
    Seq(100, 1000).foreach { g =>
      drive("heavy_hitters", g,
        df => StreamingSketch.streamingHeavyHitters(df, "v", k = 48, buckets = g))
    }
  }

  /** The SECOND scale decade (r12, carried verdict item): the five
    * most expensive registry operators at ×10 (the sf1 replica scale
    * every curve so far stops at) and ×100 (sf10-equivalent) of the
    * sf0.1 inputs, measured in ONE run on ONE box so the ×10→×100
    * ratio is a true decade, not a cross-round comparison.
    *
    * Replica discipline: graph operators get DISJOINT node-id-offset
    * copies (per-copy degree structure preserved — cross-copy work
    * appearing would be a real super-linear bug); document operators
    * get token-suffixed copies (the SfScale lesson: byte-identical
    * replicas make every pair operator quadratic in REPLICATION, which
    * measures output writing, not candidate generation).
    *
    * This is also where the §5 sizing rules get their first exercise
    * past ×10: triangles re-runs at ×100 with `bloomWords` raised per
    * the one-power-of-two-per-4×-edges rule (1<<20 → 1<<23) and with
    * the default, so the rule's value is MEASURED; dedup_simhash's
    * 4×14-bit chunk banding has a random-collision candidate floor of
    * ~4·n²/2¹⁵ that is invisible at 50k docs and real at 500k — the
    * probe prints pair output so the floor's onset is recorded.
    * Run: `SPARK_DRIVER_MEM=48g sbt "runMain graft.ScaleProbe 100 top5"`.
    */
  private def top5(spark: SparkSession, factor: Int): Unit = {
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    // every iteration's inputs come off disk, and between operators
    // EVERYTHING cached/checkpointed is dropped — the decade ratio
    // must not ride on a warm block store (the suite-position lesson)
    def releaseEverything(): Unit = {
      Dedup.releasePins()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-top5").toString
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_partkey")
    li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      .distinct()
      .write.parquet(s"$tmp/edges")
    Seq(10, factor).distinct.foreach { k =>
      val baseEdges = spark.read.parquet(s"$tmp/edges")
      (0 until k).map { i =>
        baseEdges.select((col("src") + lit(i.toLong * 100000000L)).as("src"),
          (col("dst") + lit(i.toLong * 100000000L)).as("dst"))
      }.reduce(_.unionByName(_)).write.parquet(s"$tmp/edges_x$k")
      val e = spark.read.parquet(s"$tmp/edges_x$k")
      println(s"--- x$k: edges=${e.count()}")
      time(s"triangles_x$k")(
        operators.Triangles.triangleCount(e, "src", "dst").count())
      releaseEverything()
      if (k > 10) {
        // the §5 rule under test: +1 power of two per 4x edges past x10
        time(s"triangles_x${k}_bloom23")(
          operators.Triangles.triangleCount(e, "src", "dst",
            bloomWords = 1 << 23).count())
        releaseEverything()
      }
      time(s"communities_x$k")(
        operators.LabelPropagation.communities(e, "src", "dst").count())
      releaseEverything()
      time(s"modularity_x$k")(
        operators.LabelPropagation.modularity(e, "src", "dst", rounds = 3).count())
      releaseEverything()
      (0 until k).map { i =>
        Tables.load(spark, dir, "documents")
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
          .withColumn("text", concat(col("text"), lit(s" zrep$i")))
      }.reduce(_.unionByName(_)).write.parquet(s"$tmp/docs_x$k")
      val docs = spark.read.parquet(s"$tmp/docs_x$k")
      println(s"--- x$k: docs=${docs.count()}")
      time(s"substring_clusters_x$k")(
        Dedup.substringClusters(docs, "doc_id", "text", k = 5, window = 8).count())
      releaseEverything()
      time(s"simhash_pairs_x$k")(
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).count())
      releaseEverything()
    }
  }

  /** OLAP-side probe: the Q1 multi-agg scan and Q3 join+agg+topk over
    * an N×-replicated fact side (order/lineitem keys remapped to stay
    * consistent; dimensions unchanged — exactly how a bigger cluster
    * sees the same star schema).
    */
  private def tpch(spark: SparkSession, factor: Int): Unit = {
    val dir = "/root/testdata/sf0.1"
    def rep(name: String, keyCols: Seq[String]): org.apache.spark.sql.DataFrame = {
      val base = Tables.load(spark, dir, name)
      (0 until factor).map { i =>
        keyCols.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(i.toLong * 100000000L)))
      }.reduce(_.unionByName(_))
    }
    val li = rep("lineitem", Seq("l_orderkey"))
    val ord = rep("orders", Seq("o_orderkey"))
    val cust = Tables.load(spark, dir, "customer")
    println(s"lineitem=${li.count()} orders=${ord.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs, $rows rows")
    }
    time("q1_agg_shape")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1))).count())
    time("q3_shape") {
      // o_custkey is NOT remapped: each customer simply owns N× orders
      broadcast(cust.filter(col("c_mktsegment") === "BUILDING"))
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10).count()
    }
    time("flagship_shape") {
      val sums = ord.groupBy("o_custkey")
        .agg(count(lit(1)).as("order_cnt"), sum("o_totalprice").as("total_spent"))
      sums.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .orderBy(col("order_cnt").desc, col("o_custkey")).limit(20).count()
    }
  }
}
