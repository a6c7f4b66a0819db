package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded per-session memo for analyzed-plan DataFrames (table loads,
  * index file listings). Two eviction paths, because neither alone is
  * enough:
  *  - entries of STOPPED sessions are pruned on access, and
  *  - the session map itself is a small access-ordered LRU — sessions
  *    created via `newSession()`/`cloneSession()` against a long-lived
  *    context are never stopped, so without the bound they (and every
  *    DataFrame they cache) would be retained forever. A weak-keyed map
  *    would not help: the cached DataFrames strongly reference their
  *    session, keeping the key reachable.
  * The values are plan metadata only (no data blocks), so even the
  * bounded worst case is a few MB; loads run OUTSIDE the lock (a cold
  * `spark.read.parquet` lists files and reads footers, ~50-100 ms).
  */
final class SessionCache[K](maxSessions: Int = 8) {
  private type Inner = scala.collection.concurrent.TrieMap[K, DataFrame]
  private val map =
    new java.util.LinkedHashMap[SparkSession, Inner](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, Inner]): Boolean =
        size() > maxSessions
    }

  def getOrElseUpdate(spark: SparkSession, key: K)(load: => DataFrame): DataFrame = {
    val inner = map.synchronized {
      val it = map.keySet.iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      map.computeIfAbsent(spark, _ => scala.collection.concurrent.TrieMap.empty)
    }
    // TrieMap.getOrElseUpdate may race two loaders for one key; both
    // produce the same analyzed plan, so last-write-wins is benign.
    inner.getOrElseUpdate(key, load)
  }

  /** Drop every entry (across sessions) whose key satisfies `p`. */
  def invalidateWhere(p: K => Boolean): Unit = map.synchronized {
    map.values.forEach(m => m.keySet.filter(p).foreach(m.remove))
  }

  /** Number of live session entries (spec hook). */
  def sessionCount: Int = map.synchronized(map.size())
}
