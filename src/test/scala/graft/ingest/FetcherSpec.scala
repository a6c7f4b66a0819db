package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Retry/backoff policy of the HTTP fetcher (worker.py:110-199 contract),
  * driven through a scripted transport — no network. */
class FetcherSpec extends AnyFunSuite {
  private val cfg = IngestConfig(maxRetries = 5, backoffBaseMs = 500L)
  private val w = WorkItem("api-a", "2026-08-11", 1)
  private val okBody = MockFetcher().fetch(w).toJson
  private def parse(body: String): PageDoc = MockFetcher().fetch(w)

  private def fetcher(script: Iterator[(Int, String)],
      sleeps: collection.mutable.Buffer[Long]) =
    new HttpFetcher(cfg, _ => script.next(), sleeps += _, parse)

  test("mock fetcher reproduces the reference's deterministic payload") {
    val doc = MockFetcher().fetch(WorkItem("api-b", "2026-08-11", 3))
    assert(doc.items.map(_.id) ==
      (0 to 4).map(i => s"api-b-2026-08-11-3-$i"))
    assert(doc.items.map(_.value) == (0L to 4L))
    assert(doc.toJson.startsWith(
      """{"endpoint":"api-b","date":"2026-08-11","page":3,"fetched_at":"""))
    assert(!doc.toJson.contains(" ")) // compact separators
  }

  test("transient errors retry with exponential backoff, then succeed") {
    val sleeps = collection.mutable.Buffer[Long]()
    val f = fetcher(Iterator((503, ""), (429, ""), (200, okBody)), sleeps)
    f.fetch(w)
    assert(sleeps.toSeq == Seq(500L, 1000L)) // 0.5s doubling
  }

  test("gives up after maxRetries transient failures") {
    val sleeps = collection.mutable.Buffer[Long]()
    val f = fetcher(Iterator.continually((503, "")), sleeps)
    val e = intercept[RuntimeException](f.fetch(w))
    assert(e.getMessage.contains("after 5 attempts"))
    assert(sleeps.toSeq == Seq(500L, 1000L, 2000L, 4000L)) // 4 sleeps, 5 tries
  }

  test("non-transient status fails immediately without retry") {
    val sleeps = collection.mutable.Buffer[Long]()
    val f = fetcher(Iterator((404, ""), (200, okBody)), sleeps)
    val e = intercept[RuntimeException](f.fetch(w))
    assert(e.getMessage.contains("non-transient HTTP 404"))
    assert(sleeps.isEmpty)
  }

  test("transport exceptions count as transient") {
    val sleeps = collection.mutable.Buffer[Long]()
    val script = Iterator[() => (Int, String)](
      () => throw new RuntimeException("connection reset"),
      () => (200, okBody))
    val f = new HttpFetcher(cfg, _ => script.next()(), sleeps += _, parse)
    f.fetch(w)
    assert(sleeps.toSeq == Seq(500L))
  }
}
