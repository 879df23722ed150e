package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (beyond the batch-only reference,
  * SURVEY §2.11): event-time windowed aggregation with watermarks and
  * stateful gap-based sessionisation via flatMapGroupsWithState —
  * the streaming counterpart of the batch sessionisation in
  * [[graft.queries.Q.sessionize]].
  *
  * Both transforms are source-agnostic: feed them a `readStream` of
  * the events table shape (user_id long, event_type string,
  * ts timestamp) or a MemoryStream in tests.
  */
object EventStreams {

  /** Per-window, per-type event counts with a watermark bounding
    * state. */
  def windowedEventCounts(events: DataFrame, windowLength: String = "5 minutes",
                          watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("windowStart"), col("event_type"), col("n"))

  /** Top-k most active entities per event-time window — the bounded
    * heap aggregate ([[graft.plans.TopKIdsAgg]]) running INSIDE
    * streaming state: per-window per-entity counts (first stateful
    * aggregation) feed a per-window heap (second), the chained shape
    * Structured Streaming supports in Append mode when both group by
    * the time window. State per window is one k-bounded heap, not the
    * entity counts — the trending-query shape at any stream volume. */
  def topEntitiesPerWindow(events: DataFrame, idCol: String = "user_id",
                           windowLength: String = "5 minutes",
                           k: Int = 3,
                           watermark: String = "10 minutes"): DataFrame =
    graft.plans.TopK.rankBy(
        events
          .withWatermark("ts", watermark)
          .groupBy(window(col("ts"), windowLength).as("w"), col(idCol))
          .agg(count(lit(1)).as("n")),
        Seq("w"), "n", idCol, k)
      .select(col("w.start").as("windowStart"), col(idCol), col("n"),
        col("rank"))

  /** Stream-stream interval join — the attribution shape (impression
    * → conversion within a bound): rows of `left` and `right` sharing
    * `keyCol` pair up when the right event lands inside
    * [left ts, left ts + within]. Both sides carry event-time
    * watermarks, and the time bound is two-sided, so Spark derives a
    * state-eviction horizon for BOTH buffers — without it a
    * stream-stream join's state grows without limit. Inner join:
    * unmatched rows simply age out of state.
    *
    * The two inputs must share ONLY `keyCol` (timestamp/payload
    * column names must differ) so the equi-join key needs no aliasing
    * gymnastics in streaming plans. State per key ≈ events inside one
    * watermark+within horizon — bounded by stream rate, not stream
    * length. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTsCol: String, rightTsCol: String,
                   within: String = "10 minutes",
                   watermark: String = "10 minutes"): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet) == Set(keyCol),
      s"left/right may share only '$keyCol' " +
        "(rename timestamp/payload columns apart)")
    left.withWatermark(leftTsCol, watermark).alias("l")
      .join(right.withWatermark(rightTsCol, watermark).alias("r"),
        expr(s"l.`$keyCol` = r.`$keyCol` AND " +
          s"`$rightTsCol` >= `$leftTsCol` AND " +
          s"`$rightTsCol` <= `$leftTsCol` + interval $within"))
      .drop(col(s"r.`$keyCol`"))
  }

  case class Event(userId: Long, eventType: String, tsMicros: Long)
  case class SessionState(start: Long, lastTs: Long, n: Int)
  case class SessionOut(userId: Long, startMicros: Long, endMicros: Long,
    nEvents: Int, closed: Boolean)

  /** Gap-based sessionisation: a session closes when no event arrives
    * within `gapMicros` (by event time within the group). With
    * `tailTimeout` set, a processing-time timeout flushes the open
    * tail session; leave it None in tests — the periodic timeout
    * wake-up batches never let `processAllAvailable` settle. Emits
    * closed sessions plus the open session's running snapshot. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMicros: Long,
                 tailTimeout: Option[String] = None): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        if (tailTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event],
         state: GroupState[SessionState]) => {
          if (batch.isEmpty && state.hasTimedOut) {
            // flush the open session on timeout
            val out = state.getOption.map(s =>
              SessionOut(userId, s.start, s.lastTs, s.n, closed = true))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.tsMicros)
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMicros - s.lastTs > gapMicros =>
                  closed += SessionOut(userId, s.start, s.lastTs, s.n,
                    closed = true)
                  cur = Some(SessionState(e.tsMicros, e.tsMicros, 1))
                case Some(s) =>
                  cur = Some(s.copy(lastTs = e.tsMicros, n = s.n + 1))
                case None =>
                  cur = Some(SessionState(e.tsMicros, e.tsMicros, 1))
              }
            }
            cur.foreach(state.update)
            tailTimeout.foreach(state.setTimeoutDuration)
            closed.iterator ++
              cur.map(s => SessionOut(userId, s.start, s.lastTs, s.n,
                closed = false)).iterator
          }
        })
  }
}
