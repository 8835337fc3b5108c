package graft.queries

import graft.core.Graft
import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Exact._

/** Time-series / event-log corpus over the `events` table
  * (event_id, ts, user_id, event_type, value, props-JSON).
  */
object Events {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "events")

  /** q21: as-of join — each click picks up the most recent prior-or-equal
    * view by the same user. See [[graft.operators.AsOfJoin]] for the
    * one-shuffle union-window physical shape.
    */
  def q21AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    // Pre-dedupe the right side to one row per (user_id, ts), keeping the
    // max event_id: SQL ASOF JOIN picks an arbitrary row among equal
    // rightTimes, so both sides must agree on the representative before
    // the join for a deterministic oracle compare.
    val viewTie = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("__vrn", row_number().over(viewTie))
      .filter(col("__vrn") === 1)
      .drop("__vrn")
    AsOfJoin.join(clicks, views,
        key = "user_id", leftTime = "click_ts", rightTime = "ts",
        rightPayload = Seq("event_id", "value"), rightTieBreak = "event_id")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("__match.event_id").as("view_id"),
        col("__match.value").as("view_value"))
      .orderBy(col("click_id"))
  }

  /** x36: FORWARD as-of join with a tolerance bound — each click picks
    * up the NEXT view by the same user within 30 minutes (merge_asof
    * direction="forward", tolerance semantics): the attribution-window
    * form of point-in-time joins. Same one-shuffle union-window physical
    * shape as q21, traversed in descending time; the tolerance is a
    * map-side post-filter.
    */
  def x36AsOfForward(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val viewTie = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("__vrn", row_number().over(viewTie))
      .filter(col("__vrn") === 1)
      .drop("__vrn")
    AsOfJoin.join(clicks, views,
        key = "user_id", leftTime = "click_ts", rightTime = "ts",
        rightPayload = Seq("event_id", "value"), rightTieBreak = "event_id",
        direction = "forward", tolerance = Some("30 MINUTES"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("__match.event_id").as("view_id"),
        col("__match.value").as("view_value"))
      .orderBy(col("click_id"))
  }

  /** q22: range join — events bucketed into static value bands via a
    * broadcast interval table (map-only at scale).
    */
  def q22RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("b0_50", 0.0, 50.0), ("b50_100", 50.0, 100.0),
      ("b100_150", 100.0, 150.0), ("b150_200", 150.0, 200.0),
      ("b200_inf", 200.0, 1e18))
      .toDF("band", "lo", "hi")
    RangeJoin.bandJoin(ev(s, dir), bands, "value", "lo", "hi")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("band"))
  }

  /** q23: tumbling-window aggregation (hourly) by event type — the batch
    * shape of a streaming windowed agg; partial aggregation makes this
    * one bounded shuffle.
    */
  def q23HourlyAgg(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** q24: JSON scalar functions — extract a field from the props JSON
    * column, group on it. get_json_object is codegen'd; no UDF.
    */
  def q24JsonExtract(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("k"))

  /** q25: sessionization — gap > 30 min starts a new session; per-user
    * session stats. Two windows over the same (user_id, ts) sort — Spark
    * reuses the single shuffle+sort for both.
    */
  def q25Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    // The events parquet stores ts as timestamp[us] without a zone, which
    // Spark reads as TIMESTAMP_NTZ; unix_micros only accepts TIMESTAMP.
    // Under the UTC session timezone the NTZ->TZ cast reinterprets the
    // same wall-clock instant, so the micros are identical either way.
    // In any OTHER zone the cast is non-uniform across DST transitions
    // and could move session boundaries — enforce the precondition
    // instead of silently depending on Graft.session's default.
    require(s.conf.get("spark.sql.session.timeZone") == "UTC",
      "q25 sessionization requires spark.sql.session.timeZone=UTC: its " +
        "TIMESTAMP_NTZ->TIMESTAMP cast is only instant-preserving under " +
        "a fixed-offset zone (Graft.session pins UTC; this session was " +
        "built elsewhere)")
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    val sessions = ev(s, dir)
      .withColumn("prev_us", lag(tsUs, 1).over(byUser))
      .withColumn("new_session",
        (col("prev_us").isNull ||
          (tsUs - col("prev_us")) > gapUs).cast("int"))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("session_events"))
    sessions
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("session_events")).as("n_events"),
        max(col("session_events")).as("longest_session"))
      .orderBy(col("user_id"))
  }
}
