package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for the streaming as-of join: a tagged union of the two
  * sides (exactly one of `left`/`right` set), carrying the join key, the
  * event time, and the tie-break value for right rows. */
final case class AsOfEvent[L, R](
    key: String,
    eventTime: Timestamp,
    tie: Long,
    left: Option[L],
    right: Option[R])

/** A finalized left row with the as-of matched right payload (None = no
  * right row at or before the left's time — the left-join contract, same as
  * the batch operator). */
final case class AsOfJoined[L, R](
    key: String,
    eventTime: Timestamp,
    left: L,
    asof: Option[R])

/** Per-key buffer: lefts not yet past the watermark, rights that can still
  * match a future left. Both lists are bounded by the watermark delay — see
  * `AsOfStream.advance` for the pruning rule. */
final case class AsOfBuffer[L, R](
    lefts: List[(Long, L)],
    rights: List[(Long, Long, R)])

/** Streaming counterpart of [[graft.operators.AsOf.asOfBackward]]: attach to
  * each left event the latest right event with the same key and
  * right-time ≤ left-time (ties on time to the largest `tie`), against a
  * LIVE right side — the "latest model/feature snapshot at event time"
  * primitive a training pipeline needs online.
  *
  * Event-time correctness: a left at time t is only emitted once the
  * watermark has passed t. Any right row that could still change t's match
  * would have right-time ≤ t ≤ watermark — i.e. it would be late beyond the
  * watermark and is dropped by the engine before reaching the state
  * function. So emitted matches are FINAL, and the streaming output equals
  * the batch as-of join over the same data (asserted in AsOfStreamSpec).
  *
  * Scale: state is per-key and bounded by the watermark delay — pending
  * lefts are all younger than the watermark, and of the rights at or before
  * the watermark only the single best survives (anything older can never
  * win again; event-time timeouts fire the pruning even for keys that stop
  * receiving data). The one retained settled right per key lives for the
  * key's lifetime BY CONTRACT — it is the match for any future left — the
  * same indefinite right-side retention as a stream-stream outer join
  * without a right-side condition. The shuffle is one hash exchange on the
  * join key per micro-batch, same as the batch form's single shuffle; with
  * the RocksDB state-store provider the buffers never live in executor
  * heap.
  */
object AsOfStream {

  /** Pure state transition: fold `incoming` into `st`, emit every left at
    * or before `watermarkMs`, prune rights that can no longer win. Kept
    * free of GroupState so the semantics are unit-testable directly. */
  def advance[L, R](st: AsOfBuffer[L, R], incoming: Seq[AsOfEvent[L, R]],
                    watermarkMs: Long, key: String)
      : (AsOfBuffer[L, R], List[AsOfJoined[L, R]]) = {
    val lefts = st.lefts ++ incoming.collect {
      case e if e.left.isDefined => (e.eventTime.getTime, e.left.get)
    }
    val rights = st.rights ++ incoming.collect {
      case e if e.right.isDefined => (e.eventTime.getTime, e.tie, e.right.get)
    }
    val (ready, pending) = lefts.partition(_._1 <= watermarkMs)
    val out = ready.sortBy(_._1).map { case (t, l) =>
      val best = rights.filter(_._1 <= t)
        .maxByOption(r => (r._1, r._2))
      AsOfJoined(key, new Timestamp(t), l, best.map(_._3))
    }
    // rights at or before the watermark: every future left has
    // time > watermark, so only the single best of them can ever win again
    val (settled, live) = rights.partition(_._1 <= watermarkMs)
    val kept = settled.maxByOption(r => (r._1, r._2)).toList ++ live
    (AsOfBuffer(pending, kept), out)
  }

  def asOfBackwardStream[L, R](events: Dataset[AsOfEvent[L, R]],
                               watermarkDelay: String)(
      implicit stEnc: Encoder[AsOfBuffer[L, R]],
      outEnc: Encoder[AsOfJoined[L, R]]): Dataset[AsOfJoined[L, R]] =
    events
      .withWatermark("eventTime", watermarkDelay)
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[AsOfEvent[L, R]], state: GroupState[AsOfBuffer[L, R]]) =>
          val st = state.getOption.getOrElse(AsOfBuffer[L, R](Nil, Nil))
          val wm = state.getCurrentWatermarkMs()
          val (next, out) = advance(st, it.toSeq, wm, key)
          if (next.lefts.isEmpty && next.rights.isEmpty) state.remove()
          else {
            state.update(next)
            // wake this key when the watermark passes its oldest pending
            // left OR its oldest still-live right, even if no further data
            // for the key ever arrives: lefts must emit, and live rights
            // must prune down to the single settled best (without the
            // wake, a rights-only burst would pin its whole list forever)
            (next.lefts.map(_._1) ++ next.rights.map(_._1).filter(_ > wm))
              .minOption.foreach(state.setTimeoutTimestamp)
          }
          out.iterator
      }
}
