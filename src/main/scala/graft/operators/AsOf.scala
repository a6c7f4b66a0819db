package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with right time <= left time within the same key.
  *
  * Spark has no native ASOF join; the scalable composition is the
  * union+carry trick: tag both sides, sort within the key partition by
  * (time, side), and carry the last-seen right payload forward with an
  * ignore-nulls running `last`. ONE shuffle on the key — same cost as a
  * regular join — versus the naive inequality-join which explodes to a
  * per-key cross product and versus a broadcast of the whole right side.
  *
  * Ties: a right row at exactly the left time matches (>= semantics);
  * multiple right rows at the SAME key+time resolve by input order, so
  * pass a strictly-ordering time column (e.g. epoch micros) for full
  * determinism. Left and right must share only the `on` columns.
  */
object AsOf {
  def join(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(on.contains)
    val payload = right.columns.toSeq.filterNot(on.contains)

    val lPart = left.select(
      on.map(col) ++
        Seq(col(leftTimeCol).as("_t"), lit(1).as("_side")) ++
        leftRest.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"_r_$c")): _*)
    val rPart = right.select(
      on.map(col) ++
        Seq(col(rightTimeCol).as("_t"), lit(0).as("_side")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"_r_$c")): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.foldLeft(lPart.unionByName(rPart))((df, c) =>
      df.withColumn(s"_c_$c",
        last(when(col("_side") === 0, col(s"_r_$c")), ignoreNulls = true)
          .over(w)))
    carried
      .filter(col("_side") === 1)
      .select(
        (on ++ leftRest).map(col) ++
          payload.map(c => col(s"_c_$c").as(s"asof_$c")): _*)
  }
}
