package graft

import graft.qpu._

class CacheSpec extends SparkSpecBase {

  test("cache hits on the same plan, misses on a new one, LRU-evicts") {
    val cache = new QueryCache(maxEntries = 2)
    def q(status: String) =
      FilterQpu(DatastoreQpu(spark, sf(), "orders"), Seq(Eq("o_orderstatus", status))).toDF

    val a1 = cache.getOrCache("a", q("F"))
    assert(cache.misses === 1 && cache.hits === 0)
    val a2 = cache.getOrCache("a", q("F"))
    assert(cache.hits === 1)
    assert(a1.count() === a2.count())

    cache.getOrCache("b", q("O"))
    cache.getOrCache("c", q("P")) // evicts "a" (LRU)
    assert(cache.size === 2)
    cache.getOrCache("a", q("F"))
    assert(cache.misses === 4, "evicted entry must rebuild")

    cache.invalidate("a")
    cache.getOrCache("a", q("F"))
    assert(cache.misses === 5, "invalidated entry must rebuild")
    cache.clear()
    assert(cache.size === 0)
  }

  test("plan-keyed cache does not serve hits across different output aliases") {
    import org.apache.spark.sql.functions.col
    // canonicalization strips aliases, so these two plans are
    // sameResult-equal; the cache key must still tell them apart or the
    // second caller gets a frame with the wrong column name
    val base = Tables.load(spark, sf(), "region")
    val c = new QueryCache()
    val a = CacheQpu(DataFrameQpu(base.select(col("r_regionkey").as("ka"))), c).toDF
    val b = CacheQpu(DataFrameQpu(base.select(col("r_regionkey").as("kb"))), c).toDF
    assert(a.columns.toSeq === Seq("ka"))
    assert(b.columns.toSeq === Seq("kb"),
      "alias-only variant must not be served the cached frame verbatim")
    // and the schema-aware key still HITS on the genuinely same query
    val again = CacheQpu(DataFrameQpu(base.select(col("r_regionkey").as("ka"))), c).toDF
    assert(again.columns.toSeq === Seq("ka") && c.hits >= 1)
  }

  test("CacheQpu returns identical results for the same child plan") {
    val child = DatastoreQpu(spark, sf(), "nation")
    val cache = new QueryCache()
    val r1 = CacheQpu(child, cache).toDF.collect().toSet
    val r2 = CacheQpu(child, cache).toDF.collect().toSet
    assert(cache.hits === 1)
    assert(r1 === r2)
  }
}
