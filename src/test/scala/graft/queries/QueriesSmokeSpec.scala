package graft.queries

import graft.SparkSpec

/** Every declared query must run on the t1 smoke scale factor — this is
  * the driver's entry/row-count gate in miniature. */
class QueriesSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or documented rows-only status") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert(q == o, s"queries without oracle: ${q -- o}")
  }

  graft.SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
