package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The container has no image/audio codecs, so the "decode" here is a
  * deterministic fake (byte-derived width/height) — the Spark-side contract
  * is the real part: binary columns flow through scans/projections without
  * being interpreted, metadata extraction is columnar, and heavyweight
  * decode lives behind [[graft.multimodal.Decode]] (mapPartitions over
  * batches) so a codec swap-in touches one function.
  */
object Multimodal {
  val mm01_binary_meta = Q(
    "mm01_binary_meta",
    (s, dir) => {
      // Documents' text reinterpreted as a binary payload: extract byte
      // metadata (size, digest) and a fake decoded geometry.
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          col("text").cast("binary").as("payload"),
          col("source"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("content_md5"),
          (octet_length(col("payload")) % 640).cast("long").as("fake_width"),
          (ascii(substring(col("payload").cast("string"), 1, 1)) % 480)
            .cast("long").as("fake_height"),
          col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             md5(text) AS content_md5,
             CAST(strlen(text) % 640 AS BIGINT) AS fake_width,
             CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END % 480 AS BIGINT) AS fake_height,
             source
      FROM documents
      ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(mm01_binary_meta)
}
