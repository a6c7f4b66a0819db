package graft.lake

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond the raw zone's gzip JSON and the
  * curated zone's parquet: CSV (headers + explicit schema), ORC, and
  * plain JSON all round-trip the same relation. */
class FormatsSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def nationFingerprint(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, Int)] =
    df.select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1).toSeq

  test("csv round-trip with header and explicit schema") {
    val out = tmpDir("fmt") + "/nation_csv"
    val nation = Tables(spark, sfDir, "nation")
    nation.write.option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.option("header", "true").schema(schema).csv(out)
    assert(nationFingerprint(back) == nationFingerprint(nation))
  }

  test("orc round-trip") {
    val out = tmpDir("fmt") + "/nation_orc"
    val nation = Tables(spark, sfDir, "nation")
    nation.write.orc(out)
    assert(nationFingerprint(spark.read.orc(out)) == nationFingerprint(nation))
  }

  test("json round-trip with schema inference") {
    val out = tmpDir("fmt") + "/nation_json"
    val nation = Tables(spark, sfDir, "nation")
    nation.write.json(out)
    val back = spark.read.json(out)
    assert(nationFingerprint(back) == nationFingerprint(nation))
  }

  test("csv with malformed rows quarantines via PERMISSIVE corrupt column") {
    val dir = tmpDir("fmt-bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      "1,GOOD\nnot_an_int,BAD\n2,ALSO_GOOD\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
  }
}
