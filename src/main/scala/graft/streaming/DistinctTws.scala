package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming FIRST-OCCURRENCE extraction on `transformWithState`'s
  * `MapState` — the third state-variable shape (q225 ValueState, q228
  * ListState + timers, this MapState), completing the Spark-4
  * arbitrary-state API surface.
  *
  * Per user, emit (user_id, event_type) exactly ONCE — on the type's
  * first arrival, across micro-batches — by keeping the seen set as a
  * native `MapState[String, Boolean]`: point `containsKey` probes and
  * point puts against RocksDB, NEVER a read-modify-write of a serialized
  * Set blob (what GroupState would force). At 100 TB that's the
  * difference between O(new types) store work per batch and O(all types
  * ever seen) — the same append-vs-rewrite win q228's ListState gives
  * long sessions. State size: one map entry per DISTINCT (user, type)
  * pair, bounded by the type alphabet, not the event count.
  *
  * The q230 gate chains a streaming aggregation over the emissions:
  * count per type ≡ the batch COUNT(DISTINCT user_id) — correct IFF
  * every later duplicate (the replay feeds each type to a user many
  * times, in batches far apart) was suppressed by state carried across
  * batch boundaries, and no first occurrence was double-emitted.
  * Clock-free (TimeMode.None), so Trigger.AvailableNow terminates.
  */
object DistinctTws {
  import Transitions.Ev

  final case class FirstSeen(user_id: Long, event_type: String)

  class FirstSeenProcessor
      extends StatefulProcessor[Long, Ev, FirstSeen] {
    @transient private var seen: MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[String, Boolean](
        "seen", Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[FirstSeen] =
      rows.flatMap { ev =>
        if (seen.containsKey(ev.event_type)) None
        else {
          seen.updateValue(ev.event_type, true)
          Some(FirstSeen(uid, ev.event_type))
        }
      }
  }

  /** First occurrence of each (user, event_type) across the stream.
    * Requires the RocksDB state store provider, like all TWS operators. */
  def firstOccurrences(events: Dataset[Ev]): Dataset[FirstSeen] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FirstSeenProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
