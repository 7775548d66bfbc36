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
  * State per user is ONE event (not a buffer), so the store size tracks
  * live users, never history — the 100 TB streaming property.
  */
object Transitions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                event_type: String)
  case class Pair(user_id: Long, prev_type: String, next_type: String)

  /** Extract transition pairs from a (possibly streaming) event dataset. */
  def transitionPairs(events: Dataset[Ev]): Dataset[Pair] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Ev, Pair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[Ev]) =>
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val chain = state.getOption.toSeq ++ evs
          if (evs.nonEmpty) state.update(evs.last)
          chain.sliding(2).collect {
            case Seq(a, b) => Pair(uid, a.event_type, b.event_type)
          }
      }
  }

  /** Batch twin on the same code path (for specs): one call, no state
    * carried in, same per-user sort. */
  def transitionPairsBatch(events: DataFrame): Dataset[Pair] = {
    import events.sparkSession.implicits._
    transitionPairs(
      events.selectExpr("user_id", "ts", "event_id", "event_type").as[Ev])
  }
}
