package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-transition extraction — the q200 lag-window semantics
  * under Structured Streaming.
  *
  * Lag windows don't exist in streaming; the streaming form of "what
  * follows what per user" is keyed state carrying each user's LAST seen
  * event across micro-batches: every batch sorts the user's new events by
  * (ts, event_id) — the same total order as the batch window — prepends
  * the carried event, and emits the consecutive pairs. As long as
  * micro-batch boundaries respect that total order (time-sliced replay
  * files; in production, watermark-ordered sources), the emitted pair
  * multiset is IDENTICAL to the batch lag window's — the law the q210
  * gate proves by hash-matching q200's oracle.
  *
  * State per user is ONE event (not a buffer), and users idle beyond
  * `idleHorizon` of processing time are EVICTED (their carried event is
  * dropped, so a transition spanning a longer silence is not emitted —
  * the explicit trade for a bounded store), so the store size tracks
  * LIVE users, never every user ever seen — the 100 TB streaming
  * property.
  *
  * Eviction and FINITE replays don't mix at the engine level: with
  * ProcessingTimeTimeout armed, `FlatMapGroupsWithStateExec
  * .shouldRunAnotherBatch` is always-true, so an AvailableNow query
  * keeps running no-data micro-batches until every pending timer fires —
  * i.e. `awaitTermination` spins for the full idle horizon. Long-running
  * production streams (the timeout's reason to exist) never await
  * termination that way; bounded replays like the q210 gate pass
  * `idleHorizon = None` and carry the NoTimeout semantics the gate
  * hash-checks.
  */
object Transitions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                event_type: String)
  case class Pair(user_id: Long, prev_type: String, next_type: String)

  /** Extract transition pairs from a (possibly streaming) event dataset.
    * `idleHorizon`: processing-time silence after which a user's carried
    * state is evicted (bounded-store contract above). */
  /** The flatMapGroupsWithState update function. Public so tests can
    * drive it with TestGroupState (the Sessionizer.updateSession
    * discipline). */
  def updateTransitions(idleHorizon: Option[String])(
      uid: Long, it: Iterator[Ev], state: GroupState[Ev]): Iterator[Pair] = {
    if (state.hasTimedOut) {
      // idle-user eviction: drop the carried event, emit nothing
      state.remove()
      Iterator.empty
    } else {
      val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val chain = state.getOption.toSeq ++ evs
      if (evs.nonEmpty) state.update(evs.last)
      idleHorizon.foreach(state.setTimeoutDuration)
      chain.sliding(2).collect {
        case Seq(a, b) => Pair(uid, a.event_type, b.event_type)
      }
    }
  }

  /** Extract transition pairs. `idleHorizon = Some(h)` (the production
    * default) arms idle-user eviction; `None` disables it for bounded
    * replays (scaladoc above). */
  def transitionPairs(events: Dataset[Ev],
                      idleHorizon: Option[String] = Some("1 hour")): Dataset[Pair] = {
    import events.sparkSession.implicits._
    val conf =
      if (idleHorizon.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Ev, Pair](OutputMode.Append, conf)(
        updateTransitions(idleHorizon))
  }

  /** Batch twin on the same code path (for specs): one call, no state
    * carried in, same per-user sort. */
  def transitionPairsBatch(events: DataFrame): Dataset[Pair] = {
    import events.sparkSession.implicits._
    transitionPairs(
      events.selectExpr("user_id", "ts", "event_id", "event_type").as[Ev])
  }
}
