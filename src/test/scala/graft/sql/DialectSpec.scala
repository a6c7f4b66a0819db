package graft.sql

import org.scalatest.funsuite.AnyFunSuite

class DialectSpec extends AnyFunSuite {
  test("presto date_format patterns become java patterns") {
    assert(Dialect.translate(
      "WHERE ingestion_date = date_format(current_date, '%Y-%m-%d')") ==
      "WHERE ingestion_date = date_format(current_date, 'yyyy-MM-dd')")
  }

  test("double-quoted identifiers become backticks, strings untouched") {
    assert(Dialect.translate(
      """SELECT endpoint FROM "option_a_demo_db"."raw" WHERE e = 'x"y'""") ==
      """SELECT endpoint FROM `option_a_demo_db`.`raw` WHERE e = 'x"y'""")
  }

  test("time components translate") {
    assert(Dialect.translate("date_format(ts, '%Y-%m-%d %H:%i:%s')") ==
      "date_format(ts, 'yyyy-MM-dd HH:mm:ss')")
  }
}
