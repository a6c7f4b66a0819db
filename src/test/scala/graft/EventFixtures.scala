package graft

import org.apache.spark.sql.SparkSession

/** One logical event log written in every `ts` physical generation the
  * engine supports, so specs can prove batch ≡ stream on each branch of
  * [[graft.core.Tables.normalizeTs]] — a twin that only ever sees one
  * generation can silently diverge on the others (round 6's regression).
  *
  * Layout matches the driver testdata: `<dir>/events.parquet` with
  * columns (event_id, ts, user_id, event_type, value, props).
  */
object EventFixtures {

  /** Deterministic logical events: 3 users, 4 types, ~3 hours of
    * activity with same-second ties (every 5th pair shares a second) so
    * sequence determinism is exercised, not just aggregation. */
  val base: Seq[(Long, Long, Long, String, Double)] = {
    val t0 = 1704067200L // 2024-01-01T00:00:00Z
    (1 to 60).map { i =>
      val user = (i % 3) + 1L
      val tpe = Seq("view", "click", "signup", "purchase")(i % 4)
      val sec = t0 + (i / 5) * 600L + (if (i % 5 == 0) 0L else (i % 5) * 7L)
      (i.toLong, sec, user, tpe, i * 1.5)
    }
  }

  /** ts as raw int64 epoch-nanos (the pre-round-6 testdata generation;
    * LongType branch of normalizeTs). */
  def writeLongNanos(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    base.map { case (id, sec, u, t, v) =>
      (id, sec * 1000000000L, u, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** ts as TIMESTAMP_NTZ — parquet timestamp[us] isAdjustedToUTC=false,
    * the current testdata generation (TimestampNTZType branch). */
  def writeMicrosNtz(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    base.map { case (id, sec, u, t, v) =>
      (id,
        java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC),
        u, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** ts as session-zoned TIMESTAMP — parquet timestamp[us]
    * isAdjustedToUTC=true (TimestampType passthrough branch). */
  def writeMicrosLtz(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      base.map { case (id, sec, u, t, v) =>
        (id, new java.sql.Timestamp(sec * 1000L), u, t, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  /** All generations, keyed by a label for assertion messages. */
  def writeAll(spark: SparkSession, mkDir: String => String): Map[String, String] =
    Map(
      "long-nanos" -> writeLongNanos(spark, mkDir("ev-longns")),
      "micros-ntz" -> writeMicrosNtz(spark, mkDir("ev-ntz")),
      "micros-ltz" -> writeMicrosLtz(spark, mkDir("ev-ltz")))
}
