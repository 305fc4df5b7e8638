package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.sources.Tables
import graft.operators.QueryDef

/** Sessionization: split each user's event stream into sessions at
  * >30-minute inactivity gaps.
  *
  * Two implementations with matching semantics:
  *  - [[sessionsBatch]]: windowed lag + running-sum session ids — the
  *    backfill path, fully relational, oracled in DuckDB (q35). The only
  *    shuffle is the per-user window partition; session-id assignment is
  *    deterministic via the (ts, event_id) total order.
  *  - [[sessionsStreaming]]: `flatMapGroupsWithState` — the live path
  *    with explicit per-user state (open session aggregate), the
  *    Structured Streaming custom-state surface. Closed sessions are
  *    emitted as gaps are observed; the open session stays in state.
  *    State per user is O(1) (one open session), so the state store is
  *    bounded by the user cardinality, not the stream length.
  */
object Sessionize {

  val GapUs: Long = 30L * 60 * 1000000 // 30 min in microseconds

  /** Batch sessionization over `events`: per (user, session) rollup. */
  def sessionsBatch(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > GapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        (col("end_us") - col("start_us")).as("duration_us"))
      .orderBy("user_id", "session_id")
  }

  val sessionsBatchSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
       |lagged AS (
       |  SELECT user_id, event_id, us,
       |         lag(us) OVER w AS prev_us
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |marked AS (
       |  SELECT user_id, event_id, us,
       |         CASE WHEN prev_us IS NULL OR us - prev_us > ${GapUs} THEN 1 ELSE 0 END AS new_s
       |  FROM lagged),
       |sessions AS (
       |  SELECT user_id, us,
       |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM marked)
       |SELECT user_id, session_id, count(*) AS n_events,
       |       CAST(max(us) - min(us) AS BIGINT) AS duration_us
       |FROM sessions
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** One emitted (closed) session. */
  final case class Session(
    user_id: Long, n_events: Long, start_us: Long, end_us: Long)

  /** Open-session state carried between triggers. */
  final case class OpenSession(n_events: Long, start_us: Long, end_us: Long)

  /** Streaming sessionization with explicit state: events arrive as
    * (user_id, event-time micros); closed sessions are emitted once the
    * gap that closes them is seen. The open session survives in
    * `GroupState` across triggers. */
  def sessionsStreaming(events: Dataset[(Long, Long)]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[OpenSession]) =>
          // within a trigger, order this user's new events by time
          val times = rows.map(_._2).toSeq.sorted
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          times.foreach { t =>
            open match {
              case Some(o) if t - o.end_us <= GapUs =>
                // t may be EARLIER than the stored bounds when a late
                // event lands in a later trigger: merge with min/max so
                // the open session never moves backwards (a bare
                // end_us = t produced end < start on such input).
                // Cross-trigger disorder beyond the gap window still
                // cannot be reconciled without watermark-delayed
                // emission — callers must bound lateness to the gap,
                // which is the discipline SessionizeSpec drives.
                open = Some(OpenSession(o.n_events + 1,
                  math.min(o.start_us, t), math.max(o.end_us, t)))
              case Some(o) =>
                closed += Session(user, o.n_events, o.start_us, o.end_us)
                open = Some(OpenSession(1L, t, t))
              case None =>
                open = Some(OpenSession(1L, t, t))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  /** As-of (point-in-time) join: for every `purchase`, the most recent
    * `click` of the same user at or before it — the feature-generation
    * primitive of training pipelines ("state of X as of event time").
    *
    * Spark has no ASOF JOIN operator; the idiomatic scale-out encoding
    * is union + running `last(..., ignoreNulls)` over one per-user
    * window: a SINGLE shuffle on user_id and a partition-local sort,
    * instead of the range-join pair explosion a `l.ts >= r.ts` theta
    * join would plan. Ties (click and purchase at the same microsecond)
    * sort click-first, matching ASOF's `r.ts <= l.ts`. The DuckDB
    * oracle uses its NATIVE ASOF LEFT JOIN — an independent
    * implementation cross-validating the window encoding. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("tag", when(col("event_type") === "click", 0).otherwise(1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("click_us",
        last(when(col("tag") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("us"),
        col("click_us"), (col("us") - col("click_us")).as("gap_us"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS us,
      |       epoch_us(r.ts) AS click_us,
      |       epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      |  ON l.user_id = r.user_id AND r.ts <= l.ts
      |ORDER BY l.event_id""".stripMargin

  val defs: Vector[QueryDef] = Vector(
    QueryDef("q35_sessions", sessionsBatch, Some(sessionsBatchSql)),
    QueryDef("q36_asof_join", asofJoin, Some(asofJoinSql)),
  )
}
