package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned keyed table with time travel — the lakehouse commit-log
  * surface (Delta/Iceberg's core read semantics) on plain parquet.
  *
  * Layout: `root/v=N/` holds commit N as a DELTA: rows `(key, payload…,
  * _op)` with `_op ∈ {u, d}` — upsert or tombstone. Commit 0 is the base
  * (all upserts). A key appears at most once per commit (the writer's
  * contract, asserted by [[commit]]).
  *
  * `readAt(version)` reconstructs the state AS OF a commit: union the
  * deltas `0..version`, keep each key's row from its LATEST commit, drop
  * keys whose latest row is a tombstone. The plan is one union of
  * parquet scans plus ONE hash aggregate keyed on the table key
  * (max-by-version via a struct max — partial/final split, map-side
  * combined), then a tombstone filter: no iterative merging, no window
  * sort, no per-commit join chain. At 100 TB that means time travel
  * costs the same single shuffle as a plain dedup regardless of how many
  * commits deep the log is — and [[compact]] bounds the scanned delta
  * volume by rewriting a prefix of the log into a new base (the
  * OPTIMIZE/checkpoint move), with `readAt(compacted, 0) ≡
  * readAt(root, version)` as the proven law (VersionedSpec; the q192
  * gate pins the same law against the DuckDB oracle's closed-form
  * recomputation of the final state).
  *
  * Reference scope note: the reference persists models/thresholds only
  * (KMeansClusterInvoices.scala:60-66) — versioned DATA is extension
  * surface, sibling to q89/q90/q91's diff/merge/SCD2 family.
  */
object Versioned {

  /** Write `df` (key + payload + `_op`) as commit `version`. Fails if the
    * delta carries duplicate keys — the merge's correctness rests on
    * at-most-one-row-per-key-per-commit. */
  def commit(df: DataFrame, root: String, key: String, version: Int): Unit = {
    val dup = df.groupBy(col(key)).count().filter(col("count") > 1).limit(1).count()
    require(dup == 0L, s"commit v=$version carries duplicate keys")
    require(df.columns.contains("_op"), "commit frame needs an _op column")
    df.write.mode("errorifexists").parquet(s"$root/v=$version")
  }

  /** State as of `version`: latest-commit-wins per key, tombstones drop. */
  def readAt(spark: SparkSession, root: String, key: String,
             version: Int): DataFrame = {
    val deltas = (0 to version).map { v =>
      spark.read.parquet(s"$root/v=$v").withColumn("_v", lit(v))
    }
    val all = deltas.reduce(_.unionByName(_))
    val payloadCols = all.columns.filter(c => c != key && c != "_v").sorted
    val latest = all
      .groupBy(col(key))
      .agg(max(struct((col("_v") +: payloadCols.map(col)): _*)).as("_m"))
    latest
      .filter(col("_m._op") === "u")
      .select(col(key) +: payloadCols.filter(_ != "_op")
        .map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Change data feed: the NET row-level changes between `state@fromV`
    * and `state@toV`, classified I/U/D with old and new values — what a
    * downstream incremental consumer replays instead of diffing two full
    * snapshots. Cost shape: the delta tail `fromV+1..toV` (delta-sized)
    * collapsed to latest-per-key, plus ONE reconstruction of
    * `state@fromV` (at scale, serve that from a [[compact]]ed checkpoint
    * at `fromV` — then the whole feed costs deltas + one key join, never
    * two full-table scans), one key-equi join to classify. No-op
    * rewrites (an upsert re-stating the current values) are dropped, so
    * the feed law holds exactly: `changeFeed(a, b)` carries the same
    * keys/values as a full-outer diff of the two reconstructed states
    * (VersionedSpec proves it on every version pair of its fixture). */
  def changeFeed(spark: SparkSession, root: String, key: String,
                 fromV: Int, toV: Int): DataFrame = {
    require(0 <= fromV && fromV < toV, s"need 0 <= fromV < toV: $fromV, $toV")
    val tail = (fromV + 1 to toV).map { v =>
      spark.read.parquet(s"$root/v=$v").withColumn("_v", lit(v))
    }.reduce(_.unionByName(_))
    val payloadCols = tail.columns.filter(c => c != key && c != "_v").sorted
    val latest = tail
      .groupBy(col(key))
      .agg(max(struct((col("_v") +: payloadCols.map(col)): _*)).as("_m"))
      .select(col(key) +: payloadCols.map(c => col(s"_m.$c").as(c)): _*)
    val valueCols = payloadCols.filter(_ != "_op")
    val old = readAt(spark, root, key, fromV)
      .select(col(key) +: valueCols.map(c => col(c).as(s"_old_$c")): _*)
      .withColumn("_old_present", lit(true))
    val newVals = struct(valueCols.map(col): _*)
    val oldVals = struct(valueCols.map(c => col(s"_old_$c")): _*)
    val present = coalesce(col("_old_present"), lit(false))
    latest.join(old, Seq(key), "left_outer")
      .withColumn("op",
        when(col("_op") === "d" && present, lit("D"))
          .when(col("_op") === "u" && !present, lit("I"))
          .when(col("_op") === "u" && present && !(newVals <=> oldVals), lit("U")))
      .filter(col("op").isNotNull)
      .select(
        col(key) +: col("op") +:
          (valueCols.map(c => col(s"_old_$c").as(s"old_$c")) ++
            valueCols.map(c =>
              when(col("op") =!= "D", col(c)).as(s"new_$c"))): _*)
  }

  /** Rewrite commits `0..version` as the single base commit of a NEW log
    * at `newRoot` — the checkpoint/OPTIMIZE move. Readers of the new log
    * at version 0 see exactly `readAt(root, version)`. */
  def compact(spark: SparkSession, root: String, key: String, version: Int,
              newRoot: String): Unit = {
    commit(readAt(spark, root, key, version).withColumn("_op", lit("u")),
      newRoot, key, 0)
  }
}
