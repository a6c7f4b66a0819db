package graft.core

import graft.SparkSpec

/** Round-4 advisory: the per-session memo maps (Tables, AnnIndex) only
  * evicted on SparkContext stop, so `newSession()` clones against a
  * long-lived context accumulated forever. [[SessionCache]] bounds the
  * session map with an access-ordered LRU; these cases pin the bound,
  * the memoization itself, and targeted invalidation. */
class SessionCacheSpec extends SparkSpec {

  test("session entries beyond the cap are evicted (LRU)") {
    val c = new SessionCache[String](maxSessions = 3)
    val clones = (1 to 5).map(_ => spark.newSession())
    clones.foreach { s =>
      c.getOrElseUpdate(s, "k")(s.range(1).toDF("id"))
    }
    assert(c.sessionCount == 3)
  }

  test("loads are memoized per (session, key)") {
    val c = new SessionCache[String]()
    var loads = 0
    def load = { loads += 1; spark.range(1).toDF("id") }
    c.getOrElseUpdate(spark, "a")(load)
    c.getOrElseUpdate(spark, "a")(load)
    assert(loads == 1)
    c.getOrElseUpdate(spark, "b")(load)
    assert(loads == 2)
  }

  test("invalidateWhere drops matching keys, keeps the rest") {
    val c = new SessionCache[String]()
    var loads = 0
    def load = { loads += 1; spark.range(1).toDF("id") }
    c.getOrElseUpdate(spark, "x/centroids")(load)
    c.getOrElseUpdate(spark, "x/vectors")(load)
    c.getOrElseUpdate(spark, "y/centroids")(load)
    c.invalidateWhere(_.startsWith("x/"))
    c.getOrElseUpdate(spark, "y/centroids")(load) // still memoized
    assert(loads == 3)
    c.getOrElseUpdate(spark, "x/centroids")(load) // reloads after drop
    assert(loads == 4)
  }
}
