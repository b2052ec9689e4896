package graft.qpu

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable

/** Cache QPU: LRU result cache
  * (reference: internal/qpu_classes/cache/cache.go +
  * cache/lruCache/lruCache.go — caches query responses keyed by the
  * query string, LRU-evicted, invalidated on upstream notifications).
  *
  * Spark-first form: the cached value is not a serialized response but
  * the *dataset itself*, pinned with `persist(MEMORY_AND_DISK)` across
  * the cluster — so a hit serves from executor block storage and still
  * benefits from pushdown of further predicates layered on top. The
  * registry is LRU over logical-plan keys; eviction unpersists.
  * `invalidate` covers the reference's subscribe-driven invalidation.
  */
final class QueryCache(maxEntries: Int = 32) {
  // Keys are compared with equals(): string keys for client queries,
  // canonicalized LogicalPlans (structural equality) for plan-keyed
  // entries — NOT plan.toString, which Spark truncates past
  // spark.sql.debug.maxToStringFields and would collide distinct plans.
  private val entries = mutable.LinkedHashMap.empty[Any, DataFrame]
  private var hitCnt = 0L
  private var missCnt = 0L

  def hits: Long = hitCnt
  def misses: Long = missCnt
  def size: Int = entries.size

  def getOrCache(key: Any, build: => DataFrame): DataFrame = synchronized {
    entries.remove(key) match {
      case Some(df) =>
        hitCnt += 1
        entries.put(key, df) // re-insert → most-recently-used
        df
      case None =>
        missCnt += 1
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        entries.put(key, df)
        if (entries.size > maxEntries) {
          val (oldKey, oldDf) = entries.head
          oldDf.unpersist(blocking = false)
          entries.remove(oldKey)
        }
        df
    }
  }

  def invalidate(key: Any): Unit = synchronized {
    entries.remove(key).foreach(_.unpersist(blocking = false))
  }

  def clear(): Unit = synchronized {
    entries.valuesIterator.foreach(_.unpersist(blocking = false))
    entries.clear()
  }
}

object QueryCache {
  /** Shared default instance (one per JVM, like the reference's one
    * cache service per deployment).
    */
  lazy val default: QueryCache = new QueryCache()
}

/** Cache QPU node for graph composition: keyed by the child plan PLUS
  * its output column names — canonicalization strips aliases (that is
  * what makes equivalent plans hit), so two queries differing ONLY in
  * an output alias would otherwise collide and the hit would hand back
  * a frame with the wrong schema (Spark's own CacheManager re-maps
  * output attributes on such hits; this cache returns frames verbatim).
  */
final case class CacheQpu(input: Qpu, cache: QueryCache = QueryCache.default) extends Qpu {
  def toDF: DataFrame = {
    val child = input.toDF
    cache.getOrCache(
      (child.queryExecution.logical.canonicalized, child.schema.fieldNames.toList),
      child)
  }
}
