package graft.ingest

import org.apache.spark.sql.types._

/** Data model of the ingestion plane.
  *
  * Mirrors the reference's page document (one gzipped JSON object per page,
  * /root/reference/option_a_cdk_py/lambda/worker.py:93-99) and its Hive
  * layout `raw/source=<endpoint>/ingestion_date=<date>/page=NNNNNN.json.gz`
  * (worker.py:27-28). The id format `endpoint-date-page-i` is the golden
  * contract the reference's smoke tests assert (README.md:104-106).
  */
final case class WorkItem(endpoint: String, ingestionDate: String, page: Int)

/** Minimal JSON string escaping shared by every hand-built JSON line
  * (page documents and quarantine records): backslash, quote, and control
  * characters — exactly the set that can break a JSONL consumer. */
object Json {
  def esc(s: String): String = Option(s).getOrElse("").flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}

final case class PageItem(id: String, value: Long)

final case class PageDoc(
    endpoint: String,
    date: String,
    page: Long,
    fetched_at: String,
    items: Seq[PageItem]) {

  /** Compact JSON (no spaces), fixed key order — byte-compatible with the
    * reference's json.dumps(separators=(',',':')) (worker.py:30-51). */
  def toJson: String = {
    import Json.esc
    val itemsJson = items
      .map(i => s"""{"id":"${esc(i.id)}","value":${i.value}}""")
      .mkString("[", ",", "]")
    s"""{"endpoint":"${esc(endpoint)}","date":"${esc(date)}",""" +
      s""""page":$page,"fetched_at":"${esc(fetched_at)}","items":$itemsJson}"""
  }
}

object RawSchema {
  /** Payload schema as the reference's crawler infers it
    * (rbac-demo/README.md:98): timestamps stay strings. */
  val payload: StructType = StructType(Seq(
    StructField("endpoint", StringType),
    StructField("date", StringType),
    StructField("page", LongType),
    StructField("fetched_at", StringType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("value", LongType)))))))

  /** Deterministic page path relative to the raw root (worker.py:27-28). */
  def pagePath(w: WorkItem): String =
    f"source=${w.endpoint}/ingestion_date=${w.ingestionDate}/page=${w.page}%06d.json.gz"
}

/** Ingestion config mirroring the reference worker's env contract
  * (worker.py:21-25, stack.py:106-135). */
final case class IngestConfig(
    endpoints: Seq[String] = Seq("api-a", "api-b", "api-c", "api-d"),
    pagesPerEndpoint: Int = 10,
    itemsPerPage: Int = 5,
    maxRetries: Int = 5,
    backoffBaseMs: Long = 500L,
    requestTimeoutMs: Long = 20000L,
    qpsSleepMs: Long = 0L)
