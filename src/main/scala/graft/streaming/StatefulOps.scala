package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming stateful operators (SURVEY.md §2.7 last row): watermarked
  * windowed aggregation, bounded-state cross-batch dedup, session windows,
  * and a custom flatMapGroupsWithState sessionizer.
  *
  * State-at-scale notes: every operator here keys state by a bounded
  * watermark, so state size is O(active keys within the watermark
  * horizon), not O(history). The watermark is the contract that lets a
  * 1000-executor cluster age state out; the reference's per-batch dedup
  * (main.R:105) is the degenerate zero-state case.
  */
object StatefulOps {

  /** Tumbling event-time counts with a watermark (append-mode capable). */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /** Cross-batch dedup with bounded state — the scale upgrade of the
    * reference's per-batch-only dedup: duplicates are dropped across
    * micro-batches as long as they arrive within the watermark horizon,
    * and state older than the horizon is evicted. */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, watermark: String,
      keys: String*): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Built-in session windows: gap-based grouping on event time. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n"))

  /** Stream-stream interval join (event-time attribution): each click
    * matches the views by the SAME user whose timestamp is at most
    * `within` before it — the streaming form of the q19 as-of/attribution
    * family. Both sides are watermarked and the join condition carries an
    * explicit event-time interval, so Spark derives a state eviction
    * bound: buffered rows older than watermark + interval are dropped,
    * making join state O(rows in the horizon per side), never O(history)
    * — the only stream-stream join shape that survives 100 TB/day. Inner
    * join ⇒ matches emit as soon as both sides arrive; the watermark
    * exists for state cleanup (an outer variant would also need it for
    * emit-on-close).
    *
    * @param views  streaming frame with (v_user, v_ts)
    * @param clicks streaming frame with (c_user, c_ts)
    */
  def intervalAttribution(views: DataFrame, clicks: DataFrame,
      within: String = "10 minutes",
      watermark: String = "1 minute"): DataFrame = {
    val v = views.withWatermark("v_ts", watermark)
    val c = clicks.withWatermark("c_ts", watermark)
    v.join(c, expr(
      s"""v_user = c_user AND
          c_ts >= v_ts AND
          c_ts <= v_ts + interval $within"""))
      .select(col("v_user").as("user"), col("v_ts"), col("c_ts"))
  }

  final case class Event(user: String, ts: Timestamp)
  final case class SessionAgg(user: String, events: Long, lastTs: Long)
  final case class ClosedSession(user: String, events: Long)

  /** Custom sessionizer via flatMapGroupsWithState with EVENT-time
    * timeouts: accumulates per-user event counts; a session closes (and
    * emits) when the watermark passes last-event-time + gap. The
    * custom-state escape hatch for semantics session_window can't express
    * (emit-on-close, custom payloads); event-time timeout keeps it
    * deterministic — no wall clock in the semantics, state bounded by the
    * watermark horizon. */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val aggEnc = Encoders.product[SessionAgg]
    implicit val eventEnc = Encoders.product[Event]
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user)(Encoders.STRING)
      .flatMapGroupsWithState[SessionAgg, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: String, batch: Iterator[Event], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.events))
          } else {
            val evs = batch.toSeq
            val prev = state.getOption
            val agg = SessionAgg(user,
              prev.map(_.events).getOrElse(0L) + evs.size,
              math.max(evs.map(_.ts.getTime).max,
                prev.map(_.lastTs).getOrElse(Long.MinValue)))
            state.update(agg)
            state.setTimeoutTimestamp(agg.lastTs + gapMs)
            Iterator.empty
          }
      }
  }
}
