package graft.ingest

/** Page fetchers. [[MockFetcher]] reproduces the reference's deterministic
  * synthetic payload (worker.py:86-108); [[HttpFetcher]] implements its
  * HTTP path's retry contract (worker.py:110-199) with an injectable
  * transport so the policy is unit-testable offline.
  */
trait Fetcher extends Serializable {
  def fetch(w: WorkItem): PageDoc
}

/** Deterministic mock: 5 items, ids `endpoint-date-page-i`, values 0..n-1
  * (worker.py:93-99). `fetchedAt` is injected for reproducible goldens. */
final case class MockFetcher(
    itemsPerPage: Int = 5,
    fetchedAt: String = "2026-01-01T00:00:00.000000Z") extends Fetcher {
  def fetch(w: WorkItem): PageDoc = PageDoc(
    endpoint = w.endpoint,
    date = w.ingestionDate,
    page = w.page.toLong,
    fetched_at = fetchedAt,
    items = (0 until itemsPerPage).map(i =>
      PageItem(s"${w.endpoint}-${w.ingestionDate}-${w.page}-$i", i.toLong)))
}

/** Transient-failure-aware HTTP fetcher.
  *
  * Policy (worker.py:121,140,154,191-192; BASELINE.md): at most
  * `maxRetries` attempts; retry only on 429/500/502/503/504 or transport
  * error; exponential backoff base*2^attempt; non-transient status fails
  * immediately. `transport` returns (statusCode, body) — production wires
  * an HTTP client here, tests wire a script of responses.
  */
final class HttpFetcher(
    cfg: IngestConfig,
    transport: WorkItem => (Int, String),
    sleep: Long => Unit = Thread.sleep,
    parse: String => PageDoc) extends Fetcher {

  private val transient = Set(429, 500, 502, 503, 504)

  def fetch(w: WorkItem): PageDoc = {
    var attempt = 0
    while (true) {
      val result: Either[Throwable, (Int, String)] =
        try Right(transport(w))
        catch { case e: Exception => Left(e) }
      result match {
        case Right((200, body)) => return parse(body)
        case Right((code, _)) if !transient(code) =>
          throw new RuntimeException(
            s"non-transient HTTP $code for $w (no retry)")
        case failure =>
          attempt += 1
          if (attempt >= cfg.maxRetries) {
            val why = failure match {
              case Right((code, _)) => s"HTTP $code"
              case Left(e) => e.toString
            }
            throw new RuntimeException(
              s"giving up on $w after $attempt attempts: $why")
          }
          sleep(cfg.backoffBaseMs * (1L << (attempt - 1)))
      }
    }
    sys.error("unreachable")
  }
}

/** A fetcher that fails for selected work items — poison-path testing
  * (mirrors SQS redrive -> DLQ, stack.py:66-78). */
final case class FailingFetcher(
    inner: Fetcher,
    poison: Set[(String, Int)]) extends Fetcher {
  def fetch(w: WorkItem): PageDoc =
    if (poison((w.endpoint, w.page)))
      throw new RuntimeException(s"poison work item $w")
    else inner.fetch(w)
}
