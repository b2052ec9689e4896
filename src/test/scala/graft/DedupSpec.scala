package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s1"),
      (2L, "the quick brown fox jumps over the lazy dog", "s1"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat", "s1"), // near dup of 1
      (4L, "completely different words entirely unrelated text", "s1"),
      (5L, "THE  QUICK brown fox jumps over the lazy dog", "s2")  // fp dup of 1
    ).toDF("doc_id", "text", "source")
  }

  test("stream pins survive batch LRU cycling; releasePins clears both sets") {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    Dedup.releasePins()
    val streamStatic = Dedup.registerStreamPin(Seq(1L, 2L).toDF("x"))
    streamStatic.count()
    assert(streamStatic.storageLevel !== StorageLevel.NONE,
      "a stream pin must be persisted")
    // five batch registrations cycle the whole 4-entry LRU
    (1 to 5).foreach(i => Dedup.registerPin(Seq(i.toLong).toDF("y")).count())
    assert(streamStatic.storageLevel !== StorageLevel.NONE,
      "cycling the batch pin LRU must not evict a live stream's static frame")
    Dedup.releasePins()
    assert(streamStatic.storageLevel === StorageLevel.NONE,
      "releasePins must drop stream pins once their streams are stopped")
  }

  test("exact dedup groups identical content and elects min id") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .filter(col("dup_cnt") > 1).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("canonical_id") === 1L)
    assert(r.head.getAs[Long]("dup_cnt") === 2L)
  }

  test("fingerprint dedup also collapses case/whitespace variants") {
    val r = Dedup.fingerprint(docs, "doc_id", "text")
      .filter(col("dup_cnt") > 1).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("dup_cnt") === 3L) // 1, 2, and 5
  }

  test("jaccard pairs finds the near-dup inside its bucket only") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", "source", 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup pair")
    assert(pairs.contains((1L, 3L)), "near dup pair (7/9 jaccard)")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "bucket s2 is isolated")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "dissimilar doc excluded")
  }

  test("chunkDedup drops repeated chunks, keeps first occurrence, rebuilds in order") {
    import spark.implicits._
    // chunk size 3: doc 1 = [A B], doc 2 = [B C] (B repeats), doc 3 = [A B] (all repeat)
    val a = "alpha beta gamma"; val b = "delta epsilon zeta"; val c = "eta theta iota"
    val in = Seq(
      (1L, s"$a $b"), (2L, s"$b $c"), (3L, s"$a $b")
    ).toDF("doc_id", "text")
    val r = Dedup.chunkDedup(in, "doc_id", "text", chunkTokens = 3)
      .collect().map(x => (x.getAs[Long]("doc_id"),
        (x.getAs[Long]("n_chunks"), x.getAs[Long]("n_kept"), x.getAs[String]("dedup_text"))))
      .toMap
    assert(r(1L) === ((2L, 2L, s"$a $b")), "doc 1 owns both its chunks")
    assert(r(2L) === ((2L, 1L, c)), "doc 2 loses chunk B to doc 1, keeps C")
    assert(r(3L) === ((2L, 0L, "")), "doc 3 is fully boilerplate")
  }

  test("minhash LSH surfaces near-dups and confirmation filters the rest") {
    val r = Dedup.minhashDedup(docs, "doc_id", "text",
      bands = 2, rowsPerBand = 4, num = 9, den = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r.contains((1L, 2L)), "identical docs must survive LSH + confirm")
    assert(!r.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash clustering: copies collapse to one cluster, O(n) output") {
    import spark.implicits._
    // 3 copies of doc 1's text under new ids + an unrelated doc
    val corpus = docs.union(Seq(
      (10L, "the quick brown fox jumps over the lazy dog", "s3"),
      (11L, "the quick brown fox jumps over the lazy dog", "s3")
    ).toDF("doc_id", "text", "source"))
    val clusters = Dedup.minhashClusters(corpus, "doc_id", "text",
      bands = 2, rowsPerBand = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size === corpus.count(), "one row per document")
    assert(clusters(1L) === clusters(2L) && clusters(1L) === clusters(10L) &&
      clusters(1L) === clusters(11L), "all copies share a cluster")
    assert(clusters(1L) === 1L, "cluster id is the component's min doc id")
    assert(clusters(4L) !== clusters(1L), "unrelated doc stays apart")
  }

  test("3 jumped rounds reach the same clusters as 5 on the corpus") {
    // With per-round pointer jumping, 3 rounds cover diameter 14 — the
    // corpus's components (plain one-hop propagation still moved labels
    // at round 6) are fully resolved, so 3 == 5 pins both the round
    // count (4 fewer membership-sized shuffles than the old 5-round
    // default) and fixpoint-exactness.
    val corpus = Tables.load(spark, sf(), "documents")
    def run(iters: Int) = Dedup.minhashClusters(corpus, "doc_id", "text",
      bands = 2, rowsPerBand = 4, iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val three = run(3)
    val five = run(5)
    assert(three === five, "3-round labels must match 5-round labels")
  }

  test("simhash: identical docs distance 0, near-dups close, distinct far") {
    val sims = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) === sims(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(3L)) < ham(sims(1L), sims(4L)),
      "near-dup must be closer than unrelated doc")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("editDistancePairs: LSH candidates surface near matches, no cartesian") {
    import spark.implicits._
    // sub-shingle texts have NO signature: they must be excluded, not
    // collapse into one NULL-keyed band bucket that pairs them all
    val corpus = docs.union(Seq((20L, "abc", "s9"), (21L, "xyz", "s9"))
      .toDF("doc_id", "text", "source"))
    val pairs = Dedup.editDistancePairs(corpus, "doc_id", "text",
      maxDist = 8, prefixLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)), "identical docs must match at distance 0")
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 === 0)
    assert(keys.contains((1L, 3L)), "shared 40-char prefix must match")
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not even become a candidate")
    assert(!keys.exists(p => p._1 >= 20L || p._2 >= 20L),
      "sub-shingle texts must not pair through NULL signatures")
  }

  test("editDistanceJoin links near-matches across two tables, no cartesian") {
    import spark.implicits._
    val left = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tail"),
      (11L, "completely different words entirely unrelated text")
    ).toDF("id", "t")
    val right = Seq(
      (20L, "the quick brown fox jumps over the hazy dog tail"), // 1 edit inside prefix 40
      (21L, "zebra yankee xray whiskey victor uniform tango")
    ).toDF("id", "t")
    val links = Dedup.editDistanceJoin(left, "id", "t", right, "id", "t", maxDist = 4)
      .collect().map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id"),
        r.getAs[Int]("dist"))).toSet
    assert(links.contains((10L, 20L, 1)), "near match must link")
    assert(links.size === 1, "unrelated rows must not link")
  }

  test("containmentPairs is directional: the quote flags, the article doesn't") {
    import spark.implicits._
    val in = Seq(
      (1L, "alpha beta gamma", "s1"), // fully contained in 2
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "s1"),
      (3L, "unrelated words entirely different content", "s1")
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.containmentPairs(in, "doc_id", "text", "source", num = 9, den = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "the quote is contained in the article")
    assert(!pairs.contains((2L, 1L)), "the article is NOT contained in the quote")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("chunkDedup conserves chunks: kept + dropped == total, global kept == distinct") {
    val docs = Tables.load(spark, sf(), "documents")
    val r = Dedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 20)
    // per-doc: n_kept <= n_chunks; corpus-wide: total chunks conserved
    assert(r.filter(col("n_kept") > col("n_chunks")).isEmpty)
    val totals = r.agg(sum("n_chunks"), sum("n_kept")).head()
    val expectedChunks = docs.select(
      (((size(split(trim(col("text")), "\\s+")) - 1) / 20).cast("long") + 1).as("c"))
      .agg(sum("c")).head().getLong(0)
    assert(totals.getLong(0) === expectedChunks, "every chunk is accounted for")
    // kept chunks across the corpus == distinct chunk hashes (each
    // distinct chunk is kept exactly once, by exactly one owner)
    val distinctChunks = docs.select(posexplode(transform(
      sequence(lit(0), ((size(split(trim(col("text")), "\\s+")) - 1) / 20).cast("int")),
      i => array_join(slice(split(trim(col("text")), "\\s+"), i * 20 + 1, lit(20)), " "))))
      .select(col("col")).distinct().count()
    assert(totals.getLong(1) === distinctChunks, "one keeper per distinct chunk")
  }

  test("incrementalDedup flags exact and near dups against a reference corpus") {
    import spark.implicits._
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog sleeping deeply tonight"),
      (2L, "completely different words entirely unrelated content here")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog sleeping deeply tonight"), // exact
      (11L, "the quick brown fox jumps over the lazy dog sleeping deeply today"), // near
      (12L, "zebra yankee xray whiskey victor uniform tango sierra")  // novel
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalDedup(fresh, ref, "doc_id", "text",
      bands = 2, rowsPerBand = 4, num = 4, den = 5)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Boolean]("exact_dup"), x.getAs[Boolean]("near_dup"),
          x.getAs[Boolean]("is_kept"))).toMap
    assert(r(10L)._1, "identical text must flag exact_dup")
    assert(!r(10L)._3, "exact dup must not be kept")
    assert(r(11L)._2 && !r(11L)._1, "one-word change flags near but not exact")
    assert(r(12L) === ((false, false, true)), "novel doc sails through")
  }

  test("selective salting emits the same pairs as blanket salting") {
    import spark.implicits._
    // A deliberately hot bucket (40 rows of one key) + cold buckets, so
    // the selective path exercises BOTH the salted and unsalted branch.
    val rows = (1L to 40L).map(i => (i, "hot")) ++
      Seq((101L, "c1"), (102L, "c1"), (103L, "c2"), (104L, "c2"), (105L, "c3"))
    val df = rows.toDF("id", "k")
    def pairs(hotThreshold: Int) =
      Dedup.saltedSelfJoin(df, Seq("k"), saltFactor = 4, hotThreshold = hotThreshold)
        .select(col("a.id"), col("b.id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val selective = pairs(hotThreshold = 10) // hot bucket salted, cold pass through
    val blanket = pairs(hotThreshold = 0)    // everything salted (old behavior)
    val expected = (for {
      (i, ki) <- rows; (j, kj) <- rows if ki == kj && i < j
    } yield (i, j)).toSet
    assert(selective === expected)
    assert(blanket === expected)
  }

  test("shinglePairsReleasable release() drops the cache pin") {
    // track RDD id SETS, not counts: the pin now also lands in the
    // bounded LRU, which may evict an older pin when this one arrives
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (prs, release) = Dedup.shinglePairsReleasable(
      docs.withColumn("lang", lit("en")), "doc_id", "text",
      Seq("source", "lang"), k = 5, num = 7, den = 10)
    val out = prs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)))
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "representation should be pinned while in use")
    release()
    assert((spark.sparkContext.getPersistentRDDs.keySet & added).isEmpty,
      "release() must unpersist the internal pin")
  }

  test("simhash banding distributes bits for any hamming budget (no degenerate chunk)") {
    // maxHamming=10 → 11 chunks; with ceil-width chunking the last chunks
    // would cover zero real bits and degenerate into an all-pairs join
    for (mh <- Seq(1, 3, 10, 13)) {
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = mh)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"identical docs must pair at maxHamming=$mh")
      assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L) || mh > 20,
        s"unrelated doc must not pair at maxHamming=$mh")
    }
  }

  test("hammingPairs: banded candidates equal brute force on planted bit sketches") {
    import spark.implicits._
    // 10-bit sketches with planted distances 0, 1, 2, 3 and far rows
    val rows = Seq(1L -> 0x155L, 2L -> 0x155L, 3L -> 0x154L, 4L -> 0x157L,
      5L -> 0x15DL, 6L -> 0x2AAL, 7L -> 0x000L)
    val df = rows.toDF("id", "hash")
    for (mh <- Seq(0, 1, 2)) {
      val got = Dedup.hammingPairs(df, bits = 10, maxHamming = mh)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (a, ha) <- rows; (b, hb) <- rows if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= mh
      } yield (a, b, d)).toSet
      assert(got === want, s"maxHamming=$mh")
    }
  }

  test("keepCanonical: longest member wins per near-dup cluster, ties to smallest id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length}
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),          // near-dup of 2, shorter
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // longest in cluster → canonical
      (3L, "totally different content here entirely"),       // singleton → keeps itself
      (4L, "theta eta zeta epsilon delta gamma beta alpha")  // same token SET + length as 2 → id tie → 2 wins
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")).cast("long"))
    val out = Dedup.keepCanonical(docs, "doc_id", "text", "n_chars",
        bands = 2, rowsPerBand = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(3) === ((3L, true)), "singleton keeps itself")
    // docs 1/2/4 share minhash bands (same token prefix): one cluster,
    // canonical = longest text, tie on length broken by smallest id
    assert(out(1)._2 === false && out(1)._1 === out(2)._1)
    assert(out(2) === ((2L, true)), s"longest/lowest-id member must win: $out")
    assert(out(4)._2 === false)
  }

  test("keepCanonical: string ids tie-break deterministically; NULL-length singletons keep themselves") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length, lit, when}
    // the two failure modes the packed (len, -id) tie-break had: a
    // STRING id (numeric negation → NULL → nondeterministic max_by)
    // and an all-NULL length cluster (dropped by a null-hostile max
    // equality)
    val docs = Seq(
      ("doc-b", "alpha beta gamma delta epsilon zeta eta theta"),
      ("doc-a", "theta eta zeta epsilon delta gamma beta alpha"), // same len → "doc-a" < "doc-b" wins
      ("doc-z", null: String)                                     // null text AND null length
    ).toDF("doc_id", "text")
      .withColumn("n_chars", when(col("text").isNotNull, length(col("text")).cast("long")))
    val out = Dedup.keepCanonical(docs, "doc_id", "text", "n_chars",
        bands = 2, rowsPerBand = 2).collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getBoolean(3))).toMap
    assert(out("doc-a") === (("doc-a", true)),
      s"smallest string id must win the length tie: $out")
    assert(out("doc-b") === (("doc-a", false)))
    assert(out("doc-z") === (("doc-z", true)),
      s"a NULL-length singleton keeps itself as canonical: $out")
  }
}
