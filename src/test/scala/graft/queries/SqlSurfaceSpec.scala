package graft.queries

import graft.SparkSpec
import graft.core.Tables

/** The plain-SQL face of the engine: every testdata table registered and
  * queryable via spark.sql, including the registered native functions —
  * what a user of the reference's Athena workflow would type. */
class SqlSurfaceSpec extends SparkSpec {
  test("registered tables answer ad-hoc SQL") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    graft.functions.GraftFunctions.register(spark)

    val joined = spark.sql("""
      SELECT n_name, COUNT(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_customers DESC, n_name LIMIT 5""").collect()
    assert(joined.length == 5 && joined.head.getLong(1) > 0)

    val sims = spark.sql("""
      SELECT a.vec_id, b.vec_id,
             vec_cosine(a.embedding, b.embedding) AS cs
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 5 ORDER BY a.vec_id""").collect()
    assert(sims.length == 5)
    assert(sims.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))

    // views compose over registered tables
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW big_orders AS
                 SELECT * FROM orders WHERE o_totalprice > 300000""")
    val n = spark.sql("SELECT COUNT(*) FROM big_orders").collect()(0).getLong(0)
    assert(n > 0 && n < 1500)
  }
}
