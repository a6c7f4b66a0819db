package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{MockFetcher, PageDoc, RawSchema, WorkItem}
import graft.sql.Dialect

/** Property-style invariants (ScalaCheck generators, fixed seeds via
  * deterministic sampling loops). */
class PropertySpec extends AnyFunSuite {
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)))

  private val workGen: Gen[WorkItem] = for {
    e <- Gen.oneOf("api-a", "api-b", "api-c", "api-d")
    d <- Gen.choose(1, 28).map(d => f"2026-03-$d%02d")
    p <- Gen.choose(1, 999999)
  } yield WorkItem(e, d, p)

  test("page path round-trips (endpoint, date, page)") {
    samples(workGen).foreach { w =>
      val path = RawSchema.pagePath(w)
      val re = "source=(.*)/ingestion_date=(.*)/page=(\\d{6})\\.json\\.gz".r
      path match {
        case re(e, d, p) =>
          assert(e == w.endpoint && d == w.ingestionDate)
          assert(p.toInt == w.page || w.page > 999999)
        case _ => fail(s"malformed path $path")
      }
    }
  }

  test("mock page JSON parses back to the same document (Spark schema)") {
    samples(workGen, 50).foreach { w =>
      val doc = MockFetcher().fetch(w)
      val json = doc.toJson
      // minimal JSON sanity without a parser dependency: balanced,
      // compact, fields present in contract order
      assert(json.count(_ == '{') == json.count(_ == '}'))
      assert(json.indexOf("\"endpoint\"") < json.indexOf("\"date\"") &&
        json.indexOf("\"date\"") < json.indexOf("\"page\"") &&
        json.indexOf("\"page\"") < json.indexOf("\"fetched_at\"") &&
        json.indexOf("\"fetched_at\"") < json.indexOf("\"items\""))
      assert(doc.items.length == 5 && doc.items.map(_.value) == (0L to 4L))
    }
  }

  test("dialect translation is idempotent") {
    val sqlGen = for {
      pat <- Gen.oneOf("'%Y-%m-%d'", "'%Y-%m-%d %H:%i:%s'", "'yyyy-MM-dd'")
      id <- Gen.oneOf("\"db\".\"tbl\"", "`db`.`tbl`", "tbl")
    } yield s"SELECT date_format(ts, $pat) FROM $id WHERE s = 'a\"b'"
    samples(sqlGen, 50).foreach { sql =>
      val once = Dialect.translate(sql)
      assert(Dialect.translate(once) == once)
      assert(!once.matches(".*'[^']*%[YmdHis][^']*'.*"))
    }
  }

  test("json escaping handles control characters and quotes") {
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\t', '')))
      .map(_.mkString)
    samples(strGen, 100).foreach { s =>
      val doc = PageDoc(s, "2026-01-01", 1, s, Nil)
      val json = doc.toJson
      // no raw control chars or unescaped quotes may survive
      assert(!json.exists(c => c < ' '))
      val payload = json.drop(1).dropRight(1)
      assert(!payload.replace("\\\\", "").replace("\\\"", "")
        .drop(1).init.contains("\\\"\"\""))
    }
  }
}
