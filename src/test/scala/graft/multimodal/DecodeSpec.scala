package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecodeSpec extends SparkSpec {
  import spark.implicits._

  test("decodeBinary attaches typed metadata and features") {
    val df = Seq(
      (1L, "hello world"),
      (2L, ""),
      (3L, "x" * 1000)).toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("payload"))
    val out = Decode.decodeBinary(df, "payload").orderBy("id").collect()

    assert(out.length == 3)
    val meta1 = out(0).getStruct(out(0).fieldIndex("media_meta"))
    assert(meta1.getString(0) == "bin")
    assert(meta1.getLong(3) == 11L)
    val feats = out(0).getSeq[Double](out(0).fieldIndex("features"))
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0) < 1e-9) // L1-normalized histogram

    // empty payload: zero geometry, zero-sum features
    val meta2 = out(1).getStruct(out(1).fieldIndex("media_meta"))
    assert(meta2.getInt(1) == 0 && meta2.getLong(3) == 0L)
  }

  test("format sniffing recognizes magic bytes") {
    assert(Decode.FakeCodec.sniffFormat(
      Array(0xFF.toByte, 0xD8.toByte, 0x00)) == "jpeg")
    assert(Decode.FakeCodec.sniffFormat(
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)) == "png")
    assert(Decode.FakeCodec.sniffFormat("text".getBytes) == "bin")
  }

  test("sampleFrames slices deterministic chunks") {
    val df = Seq((1L, "abcdefghijklmnop")).toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("payload"))
    val frames = Decode.sampleFrames(df, "payload", frameSize = 4, stride = 2)
      .select(explode(col("frames")).as("f"))
      .collect().map(r => new String(r.getAs[Array[Byte]](0)))
    assert(frames.head == "abcd")
    assert(frames.forall(_.length <= 4))
  }
}
