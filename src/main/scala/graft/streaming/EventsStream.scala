package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.operators.QueryDef

/** Structured Streaming surface (north-star stretch; the reference is
  * pure batch, SURVEY.md §2.6).
  *
  * The aggregation logic is ONE function ([[windowedAgg]]) applied to
  * either a batch DataFrame or a stream: identical semantics by
  * construction, which the StreamingSpec asserts via MemoryStream —
  * exactly how a production lambda-free pipeline keeps its batch
  * backfill and live path in lockstep.
  *
  * Scale notes: tumbling-window counts are the streaming-friendly shape
  * — per-key state is one row per (window, event_type), watermarking
  * bounds state (2 h late-data horizon), and the shuffle key
  * (window, event_type) is low-cardinality and time-local, so state
  * store partitions stay small no matter how long the stream runs.
  */
object EventsStream {

  /** Tumbling 1-hour windows per event_type: event count + exact integer
    * sum of the JSON `k` property (BIGINT arithmetic — no float
    * accumulation, so batch/stream/oracle agree exactly). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      // LongType, matching the oracle's CAST(... AS BIGINT): an int
      // cast would null out k values beyond 2^31 that DuckDB keeps
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("k_sum"))

  /** Streaming variant: watermark bounds the state store; late events
    * beyond 2 h are dropped deterministically. */
  def streamingWindowedAgg(events: DataFrame): DataFrame =
    windowedAgg(events.withWatermark("ts", "2 hours"))

  /** Batch twin exposed to the driver contract (oracled in DuckDB via
    * date_trunc — Spark's epoch-aligned 1-hour windows coincide). */
  def tumblingWindow(s: SparkSession, dir: String): DataFrame =
    windowedAgg(Tables.events(s, dir))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n_events"), col("k_sum"))
      .orderBy("hour_start", "event_type")

  val tumblingWindowSql: String =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Sliding 1-hour windows advancing every 15 minutes, per event_type:
    * each event lands in exactly 4 overlapping windows. Aggregates are
    * exact integers only — and no DISTINCT, which streaming
    * aggregation rejects (its state would be unbounded per window) —
    * so one function serves batch, stream and oracle bit-for-bit. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("user_id")).as("uid_sum"))

  /** Streaming variant: watermark bounds state to the open windows of
    * the last 2 hours plus slack; the 4× window fan-out is the only
    * state amplification vs the tumbling case. */
  def streamingSlidingAgg(events: DataFrame): DataFrame =
    slidingAgg(events.withWatermark("ts", "2 hours"))

  /** Batch twin for the driver contract. Spark's sliding windows are
    * epoch-aligned; the oracle reproduces them as time_bucket(15 min)
    * minus k·15 min for k in 0..3. */
  def slidingWindow(s: SparkSession, dir: String): DataFrame =
    slidingAgg(Tables.events(s, dir))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n_events"), col("uid_sum"))
      .orderBy("win_start", "event_type")

  val slidingWindowSql: String =
    """WITH ex AS (
      |  SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
      |           - k.k * INTERVAL '15 minutes' AS win_start,
      |         event_type, user_id
      |  FROM events CROSS JOIN range(0, 4) k(k))
      |SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
      |       count(*) AS n_events,
      |       CAST(sum(user_id) AS BIGINT) AS uid_sum
      |FROM ex GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val defs: Vector[QueryDef] = Vector(
    QueryDef("q32_tumbling_window", tumblingWindow, Some(tumblingWindowSql)),
    QueryDef("q42_sliding_window", slidingWindow, Some(slidingWindowSql)),
  )
}
