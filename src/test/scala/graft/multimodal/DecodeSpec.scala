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

  test("frameEnergies sums exact unsigned bytes per frame, partial frame included") {
    val df = Seq(
      (1L, "aabb"),   // frames of 2: [97+97, 98+98]
      (2L, "abc"),    // partial final frame: [97+98, 99]
      (3L, "")        // empty payload: no frames
    ).toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("payload"))
    val out = Decode.frameEnergies(df, "payload", 2)
      .orderBy("id").collect()
      .map(r => r.getSeq[Long](r.fieldIndex("energies")))
    assert(out(0) == Seq(194L, 196L))
    assert(out(1) == Seq(195L, 99L))
    assert(out(2).isEmpty)
    // null payloads behave as empty, like the other Decode seams
    val withNull = Seq((1L, Option.empty[Array[Byte]]))
      .toDF("id", "payload")
    assert(Decode.frameEnergies(withNull, "payload", 4)
      .collect()(0).getSeq[Long](2).isEmpty)
    // high-bit bytes count unsigned (0xFF = 255, not -1)
    val hi = Seq((1L, Array(0xFF.toByte, 0xFE.toByte))).toDF("id", "payload")
    assert(Decode.frameEnergies(hi, "payload", 2)
      .collect()(0).getSeq[Long](2) == Seq(509L))
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

  test("JdkImageCodec: real PNG round-trip, header-only sniff, resize") {
    import Decode.JdkImageCodec
    val png = JdkImageCodec.encodePng(33, 21, 0x123456)
    // a real PNG signature, not a fake
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P'.toByte)
    assert(JdkImageCodec.sniff(png) == ("png", 33, 21))
    // lossless pixel recovery of the fill color
    assert(JdkImageCodec.pixel0(png) == (0x12, 0x34, 0x56))
    // resize re-encodes to the requested geometry
    val small = JdkImageCodec.resizePng(png, 8, 5)
    assert(JdkImageCodec.sniff(small) == ("png", 8, 5))
    // non-image bytes sniff fail-open, never throw
    assert(JdkImageCodec.sniff("not an image".getBytes("UTF-8")) ==
      ("bin", 0, 0))
    assert(JdkImageCodec.sniff(Array.empty[Byte]) == ("bin", 0, 0))
  }

  test("JdkAudioCodec: real WAV round-trip, header-only sniff (round 18)") {
    import Decode.JdkAudioCodec
    val minted = Array.tabulate(37)(i =>
      ((i * 173) % 2001 - 1000).toShort)
    val wav = JdkAudioCodec.encodeWav(minted, 8000f)
    // a real RIFF/WAVE container, not a fake
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    // header-only sniff reports container, rate, channels, frames
    assert(JdkAudioCodec.sniffWav(wav) == ("wav", 8000, 1, 37L))
    // PCM is lossless: exact sample recovery, negatives included
    assert(JdkAudioCodec.samples(wav).sameElements(minted))
    // non-audio bytes sniff fail-open, never throw
    assert(JdkAudioCodec.sniffWav("not audio".getBytes("UTF-8")) ==
      ("bin", 0, 0, 0L))
    assert(JdkAudioCodec.sniffWav(Array.empty[Byte]) == ("bin", 0, 0, 0L))
  }
}
