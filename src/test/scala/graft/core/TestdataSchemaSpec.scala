package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Schema canary over the REAL driver-provided testdata.
  *
  * Round 6 lost 9 queries, 16 tests, and the whole bench artifact to one
  * silent physical-type drift (events.ts: int64-nanos → timestamp[us])
  * because every loader assumption was implicit. This spec is the Spark
  * analog of the reference crawler re-inferring schemas on a schedule
  * (option_a_cdk_py/option_a/stack.py:180-193, UPDATE_IN_DATABASE): it
  * reads the actual parquet footers and pins, per table, exactly the
  * (name, type) surface the engine depends on — so the next drift fails
  * ONE named test that says which column moved, instead of 16 opaque
  * analysis errors.
  *
  * Deliberately reads `/root/testdata/sf0.001` (the real files, not a
  * fixture): the whole point is to catch the fixture/reality gap.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** The engine's expectation for each table's raw on-disk schema,
    * written as (column -> acceptable Spark read types). `ts` admits the
    * three physical generations Tables.normalizeTs handles. */
  private val tsVariants: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  private def rawSchema(table: String): StructType = {
    // Same conf the loader sets: lets a NANOS file read as raw long
    // instead of failing PARQUET_TYPE_ILLEGAL; no-op otherwise.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$table.parquet").schema
  }

  private def assertSchema(
      table: String, expected: Seq[(String, DataType)]): Unit = {
    val actual = rawSchema(table).map(f => f.name -> f.dataType)
    assert(actual == expected,
      s"\n$table drifted:\n  on disk:  $actual\n  expected: $expected")
  }

  test("canary: region/nation/customer/supplier/part raw schemas") {
    assertSchema("region",
      Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertSchema("nation", Seq("n_nationkey" -> IntegerType,
      "n_name" -> StringType, "n_regionkey" -> IntegerType))
    assertSchema("customer", Seq("c_custkey" -> LongType,
      "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assertSchema("supplier", Seq("s_suppkey" -> LongType,
      "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType))
    assertSchema("part", Seq("p_partkey" -> LongType,
      "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType))
  }

  test("canary: orders/lineitem raw schemas (date columns are µs ts)") {
    assertSchema("orders", Seq("o_orderkey" -> LongType,
      "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType))
    assertSchema("lineitem", Seq("l_orderkey" -> LongType,
      "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType))
  }

  test("canary: documents/embeddings raw schemas") {
    assertSchema("documents", Seq("doc_id" -> LongType,
      "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertSchema("embeddings", Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
  }

  test("canary: events raw schema — ts must be a known physical type") {
    val actual = rawSchema("events").map(f => f.name -> f.dataType)
    assert(actual.map(_._1) ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      s"events column set drifted: ${actual.map(_._1)}")
    val nonTs = actual.filterNot(_._1 == "ts")
    assert(nonTs == Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType), s"events non-ts types drifted: $nonTs")
    val tsType = actual.toMap.apply("ts")
    assert(tsVariants.contains(tsType),
      s"events.ts drifted to $tsType — Tables.normalizeTs only handles " +
        s"$tsVariants; extend the normalizer AND this canary")
  }

  test("canary: the loader normalizes events.ts to TimestampType") {
    // Whatever the physical generation, the engine-facing contract is a
    // session-zoned TimestampType — every events query builds on it.
    val loaded = Tables(spark, sfDir, "events")
    assert(loaded.schema("ts").dataType == TimestampType,
      s"loader produced ${loaded.schema("ts").dataType}")
    // And the values are sane instants (the testdata generator writes
    // 2024-era events): a unit mix-up (ns-as-µs) would land centuries off.
    val year = loaded
      .selectExpr("min(year(ts)) AS lo", "max(year(ts)) AS hi").head()
    assert(year.getInt(0) >= 2000 && year.getInt(1) <= 2100,
      s"events.ts decoded outside [2000, 2100]: $year — unit mix-up?")
  }
}
