package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: per-user sessionization of the event stream
  * via flatMapGroupsWithState — the KeyValueGroupedDataset custom-state
  * path of SURVEY.md §2.10's extension plan. A session closes when the
  * gap since the last event exceeds `gapSeconds`; closed sessions are
  * emitted with their aggregates.
  *
  * State per key is O(1) (running aggregates, not buffered events), so
  * executor state stores stay bounded at any stream volume.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class SessionState(
      start: Long, lastSeen: Long, nEvents: Long, sumValue: Double)

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Close out sessions with a processing-time timeout. Input must have
    * (user_id, ts, event_type, value).
    */
  def sessions(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          // events within a batch arrive unordered: sort the micro-batch
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val t = e.ts.getTime
            if (st == null) {
              st = SessionState(t, t, 1L, e.value)
            } else if (t - st.lastSeen > gapMs) {
              closed += Session(userId, new Timestamp(st.start),
                new Timestamp(st.lastSeen), st.nEvents, st.sumValue)
              st = SessionState(t, t, 1L, e.value)
            } else {
              st = st.copy(lastSeen = math.max(st.lastSeen, t),
                nEvents = st.nEvents + 1, sumValue = st.sumValue + e.value)
            }
          }
          if (st != null) state.update(st) else state.remove()
          closed.iterator
      }
  }

  /** Batch twin with identical semantics (window lag + cumulative
    * session ids): the oracle for the streaming path on a static frame.
    */
  def sessionsBatch(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapMs = gapSeconds * 1000L
    events
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__newSession",
        when(col("__prev").isNull ||
          (col("ts").cast("long") - col("__prev").cast("long")) * 1000L > gapMs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__newSession")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .drop("__sid")
  }
}
