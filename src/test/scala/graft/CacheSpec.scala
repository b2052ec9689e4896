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

  test("CacheQpu returns identical results for the same child plan") {
    val child = DatastoreQpu(spark, sf(), "nation")
    val cache = new QueryCache()
    val r1 = CacheQpu(child, cache).toDF.collect().toSet
    val r2 = CacheQpu(child, cache).toDF.collect().toSet
    assert(cache.hits === 1)
    assert(r1 === r2)
  }
}
