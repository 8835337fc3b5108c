package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join.
  *
  * For each left row, attach the payload of the right row with the
  * greatest `rightTime <= leftTime` within the same `key` (ties on
  * `rightTime` broken by the largest `rightTieBreak`).
  *
  * Implementation is the union-window technique rather than a range join:
  * tag both inputs, union them (a no-shuffle concat), then one window
  * shuffle on `key` ordered by (time, side, tiebreak) and a running
  * `last(payload, ignoreNulls)`. Cost at scale: exactly one shuffle of
  * |L|+|R| rows and a per-key sort — no range cross product, no skew
  * amplification beyond the key distribution itself. This is the right
  * physical shape for ASOF JOIN on Spark, which lacks a native operator.
  */
object AsOfJoin {

  /** @param left          driving rows (each kept exactly once)
    * @param right         lookup rows
    * @param key           equi-join key column name (present in both)
    * @param leftTime      event-time column on `left`
    * @param rightTime     event-time column on `right`
    * @param rightPayload  right columns carried to output (null if no match)
    * @param rightTieBreak right column breaking ties on equal rightTime
    *                      (max wins); must be castable to long
    * @param direction     "backward" (greatest rightTime <= leftTime —
    *                      the default, SQL ASOF ON l.t >= r.t) or
    *                      "forward" (smallest rightTime >= leftTime)
    * @param tolerance     optional SQL interval string (e.g.
    *                      "30 MINUTES"): a match farther than this from
    *                      leftTime is nulled out — the merge_asof
    *                      tolerance semantics. Applied as a map-side
    *                      post-filter, so the physical shape (one
    *                      |L|+|R| shuffle) is unchanged.
    * @return left columns + one struct column `__match` of rightPayload
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String,
      direction: String = "backward",
      tolerance: Option[String] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    val payloadType = StructType(rightPayload.map(n => right.schema(n)))

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right
      .select(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightTieBreak).cast("long").as("__tie"),
        struct(rightPayload.map(col): _*).as("__payload"))
      .withColumns(leftCols.filterNot(_ == key)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)

    val ordered = Seq("__t", "__side", "__tie", "__payload")
    val unioned = l.select((leftCols ++ ordered).map(col): _*)
      .unionByName(r.select((leftCols ++ ordered).map(col): _*))

    // Backward: ascending time; right rows sort before left rows at equal
    // time (__side 0 < 1), so a right row at exactly leftTime is visible —
    // inclusive <= semantics, matching SQL ASOF JOIN ON l.t >= r.t.
    // Forward: DESCENDING time traversal turns "smallest rightTime >=
    // leftTime" into the same running-last problem; __side/__tie stay
    // ascending so at equal times rights are traversed first and the
    // max-tiebreak right is traversed last (last() wins).
    val timeOrder =
      if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window
      .partitionBy(col(key))
      .orderBy(timeOrder, col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      // matched right event time, from the same last non-null row as
      // __match (right rows always carry both non-null)
      .withColumn("__mt", last(when(col("__side") === 0, col("__t")),
        ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withTol = tolerance match {
      case None => matched
      case Some(tol) =>
        val ok =
          if (direction == "backward")
            col("__mt") >= col(leftTime) - expr(s"INTERVAL $tol")
          else
            col("__mt") <= col(leftTime) + expr(s"INTERVAL $tol")
        matched.withColumn("__match", when(ok, col("__match")))
    }
    withTol.select(leftCols.map(col) :+ col("__match"): _*)
  }
}
