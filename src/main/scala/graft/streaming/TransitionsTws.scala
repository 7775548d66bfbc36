package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** The transition-extraction operator rebuilt on `transformWithState` —
  * Spark 4's arbitrary-state API (SPARK-40434, the successor to
  * flatMapGroupsWithState: typed composable state variables, native TTL,
  * RocksDB-only). Same semantics as [[Transitions.transitionPairs]]: per
  * user, carry the LAST event in a `ValueState`, emit consecutive pairs
  * in (ts, event_id) order; state TTL is the idle-eviction horizon the
  * GroupState version arms by hand — here the store expires it natively,
  * with no always-run-another-batch coupling, so BOUNDED REPLAYS AND
  * EVICTION COEXIST (the trade the q210 gate had to opt out of).
  *
  * The q225 gate runs this against the exact oracle q210's
  * flatMapGroupsWithState version hash-matches — two independent state
  * APIs, one truth.
  */
object TransitionsTws {
  import Transitions.{Ev, Pair}

  class TransitionProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Ev, Pair] {
    @transient private var last: ValueState[Ev] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Ev]("last", Encoders.product[Ev], ttl)

    override def handleInputRows(uid: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[Pair] = {
      val evs = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val carried = if (last.exists()) Seq(last.get()) else Nil
      val chain = carried ++ evs
      if (evs.nonEmpty) last.update(evs.last)
      chain.sliding(2).collect {
        case Seq(a, b) => Pair(uid, a.event_type, b.event_type)
      }
    }
  }

  /** Extract transition pairs via transformWithState. Requires the
    * RocksDB state store provider (the API rejects the default HDFS
    * provider) — callers set `spark.sql.streaming.stateStore
    * .providerClass` before starting the query. */
  def transitionPairs(events: Dataset[Ev],
                      ttl: TTLConfig = TTLConfig.NONE): Dataset[Pair] = {
    import events.sparkSession.implicits._
    // TTL state variables require the processing-time clock; without TTL
    // the operator is clock-free (TimeMode.None). TTLConfig.NONE carries
    // Duration.ZERO (not null), so test for zero-or-null — under
    // ProcessingTime, shouldRunAnotherBatch is unconditionally true and
    // Trigger.AvailableNow would loop no-data micro-batches forever.
    val mode =
      if (ttl.ttlDuration == null || ttl.ttlDuration.isZero) TimeMode.None()
      else TimeMode.ProcessingTime()
    events.groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor(ttl), mode,
        OutputMode.Append())
  }
}
