package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  GroupState,
  GroupStateTimeout,
  OutputMode,
  StatefulProcessor,
  TTLConfig,
  TimeMode,
  TimerValues,
  ValueState
}
import org.apache.spark.sql.{DataFrame, Dataset}

/** §2.10 True Structured Streaming forms (SURVEY.md).
  *
  * These transforms are source-agnostic: production wires them to
  * readStream (kafka/files); StreamingSpec drives them through
  * MemoryStream to prove watermark, session-merge, and state
  * semantics. The batch-checkable twins live in
  * graft.operators.StreamingBatch and share the same window
  * expressions.
  */
object StreamOps {

  /** Canonical event record for the streaming surface. */
  case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double
  )

  /** Output of the purchases-since-last-error stateful op. */
  case class PurchaseState(event_id: Long, user_id: Long, n_purch: Int)

  /** 1h tumbling count+sum per event type; 10-minute watermark drops
    * late rows and bounds window state. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_val"))
      .select(
        col("window.start").as("ws"),
        col("event_type"),
        col("cnt"),
        col("sum_val")
      )

  /** Session windows (30-minute gap) per user with watermark-bounded
    * state — sessions merge as events arrive and emit on close. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"),
        col("cnt")
      )

  /** Stateful dedup on event_id within the watermark horizon. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes").dropDuplicates(Seq("event_id"))

  /** Stream-stream inner join: each purchase joined to clicks by the
    * same user within the preceding hour. Watermarks on both sides let
    * Spark bound the join state (a side can discard buffered rows once
    * the other side's watermark passes the time-range condition). */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(
        col("event_id").as("p_id"),
        col("user_id").as("p_user"),
        col("ts").as("p_ts")
      )
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(
        col("event_id").as("c_id"),
        col("user_id").as("c_user"),
        col("ts").as("c_ts")
      )
    p.join(
      c,
      expr(
        "p_user = c_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 HOUR"
      )
    )
  }

  /** `transformWithState` processor — the Spark 4 replacement API for
    * flatMapGroupsWithState, same purchases-since-last-error semantics
    * as `purchasesSinceError` below. Typed `ValueState` comes from the
    * processor handle instead of a GroupState argument; the API runs
    * only on the RocksDB state store provider (StreamingSpec exercises
    * exactly that, proving the disk-backed store the in-memory default
    * can't represent — the configuration that holds state at 100 TB). */
  class PurchasesSinceErrorProcessor
      extends StatefulProcessor[Long, Event, PurchaseState] {
    @transient private var nState: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      nState = getHandle
        .getValueState[Int]("n_purch", Encoders.scalaInt, TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[Event],
        timerValues: TimerValues
    ): Iterator[PurchaseState] = {
      var n = if (nState.exists()) nState.get() else 0
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        e.event_type match {
          case "error"    => n = 0
          case "purchase" => n += 1
          case _          => ()
        }
        PurchaseState(e.event_id, user, n)
      }
      nState.update(n)
      out.iterator
    }
  }

  /** purchasesSinceError on the Spark 4 `transformWithState` API. */
  def purchasesSinceErrorTws(events: Dataset[Event]): Dataset[PurchaseState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new PurchasesSinceErrorProcessor,
        TimeMode.None(),
        OutputMode.Append()
      )
  }

  /** Custom keyed state: purchases since the user's last error —
    * the streaming twin of StreamingBatch.streamStatefulCustom. */
  def purchasesSinceError(events: Dataset[Event]): Dataset[PurchaseState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[Event], state: GroupState[Int]) => {
          var n = state.getOption.getOrElse(0)
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            e.event_type match {
              case "error"    => n = 0
              case "purchase" => n += 1
              case _          => ()
            }
            PurchaseState(e.event_id, user, n)
          }
          state.update(n)
          out.iterator
        }
      )
  }
}
