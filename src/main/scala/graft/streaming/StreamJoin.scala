package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: click→purchase attribution.
  *
  * The reference joins a stream only against BROADCAST state (model centers
  * — /root/reference/src/main/scala/es/dmr/uimp/realtime/InvoicePipeline.scala:120-131);
  * joining two live streams is the capability a training-data / analytics
  * pipeline adds on top, and Structured Streaming expresses it natively:
  * both sides watermarked, the join condition carrying BOTH an equality key
  * (user) and a time interval, so the state store can evict — a click older
  * than `lookback` behind the purchase watermark can never join again and
  * is dropped. Without the interval bound the state grows forever; with it,
  * per-key state is O(events inside the lookback window).
  *
  * The SAME function serves batch frames: the plan becomes an ordinary
  * equi-join on user_id (one shuffle of each side) plus a range filter —
  * which is how the q66 registry row drives it under the DuckDB oracle,
  * and how StreamJoinSpec asserts replay equivalence.
  */
object StreamJoin {

  /** All (purchase, click) pairs where the click happened in
    * `(purchase_ts - lookback, purchase_ts]` by the same user.
    *
    * Inputs need columns (event_id, user_id, ts [, value]); pass streaming
    * frames for the streaming join (watermarks applied here), batch frames
    * for the batch twin (watermarks are a no-op on batch plans). */
  def attributionPairs(purchases: DataFrame, clicks: DataFrame,
                       lookback: String = "24 hours",
                       delay: String = "40 seconds"): DataFrame =
    attributionJoin(purchases, clicks, lookback, delay, "inner")

  /** LEFT-OUTER variant: every purchase survives, unattributed ones with
    * null click columns. On streams this is the join type with real
    * engine semantics attached — an unmatched purchase can only be
    * EMITTED (with nulls) once the click-side watermark has passed its
    * interval, because until then a matching click may still arrive; the
    * state store holds it exactly that long. The batch twin is a plain
    * left outer join, which is how the q194 gate oracles it;
    * StreamJoinSpec replays the streaming form and asserts the matured
    * result equals the batch twin, nulls included. */
  def attributionPairsOuter(purchases: DataFrame, clicks: DataFrame,
                            lookback: String = "24 hours",
                            delay: String = "40 seconds"): DataFrame =
    attributionJoin(purchases, clicks, lookback, delay, "left_outer")

  private def attributionJoin(purchases: DataFrame, clicks: DataFrame,
                              lookback: String, delay: String,
                              joinType: String): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"), col("value").as("click_value"))
      .withWatermark("click_ts", delay)
    p.join(c, expr(
      s"""user_id = click_user
          AND click_ts <= purchase_ts
          AND click_ts > purchase_ts - INTERVAL $lookback"""), joinType)
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"), col("click_value"))
  }
}
