package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native `session_window` gap sessionization — the built-in streaming
  * counterpart of the batch lag→flag→running-sum form (q87,
  * [[graft.queries.Extensions.eventSessionsOn]]). Works unchanged on batch
  * and streaming frames; in streaming, Spark keeps one merging session per
  * live (user, window) — state bounded by ACTIVE sessions, the engine's
  * own session-merge machinery instead of hand-rolled state.
  *
  * Boundary alignment: the batch form keeps an event in the session when
  * its gap is ≤ G (`> G` starts a new one), while `session_window` merges
  * only when the gap is STRICTLY under the window length ([start, end)
  * half-open). Passing G+1 µs as the window gap makes "merge iff gap < G+1"
  * ≡ "merge iff gap ≤ G" — exact agreement at the boundary, proven on an
  * exactly-G-apart fixture in SessionWindowSpec.
  */
object SessionWindows {

  /** Per-user sessions as (user_id, n_events, start_us, span_us) — the q87
    * output shape minus the per-user sequence number (a window ordinal the
    * engine-native form has no use for). */
  def userSessions(events: DataFrame, gapUs: Long): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapUs + 1} microsecond").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span_us"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("span_us"))
}
