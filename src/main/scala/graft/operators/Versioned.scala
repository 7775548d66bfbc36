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
    * at-most-one-row-per-key-per-commit.
    *
    * OPTIMISTIC CONCURRENCY (round-11 verdict #4): the version slot is
    * claimed by an ATOMIC directory rename — the delta is written to a
    * private temp dir, then renamed to `v=N` with ATOMIC_MOVE. Two racing
    * writers of the same version both finish their writes, but exactly ONE
    * rename lands (a parquet commit dir is never empty, so the loser's
    * rename fails at the filesystem); the loser gets a clean
    * ConcurrentModificationException instead of interleaved files. Readers
    * never observe a partial commit: `v=N` appears in one rename. The log
    * is also append-only and GAP-FREE by construction — committing v=N
    * requires v=N-1 to exist. */
  /** `ownerTag`, when set, is written as a `_owner_<tag>` marker file into
    * the staging dir BEFORE the atomic rename — so ownership commits
    * atomically with the data and a later reader can distinguish "my own
    * replayed commit" from "a foreign writer took this slot" (the q227
    * replay fence). The tag must be stable across the writer's restarts
    * (derive it from the checkpoint location / query id, not the runId). */
  def ownerMarker(root: String, version: Int, ownerTag: String): java.nio.file.Path =
    java.nio.file.Paths.get(root, s"v=$version",
      "_owner_" + ownerTag.replaceAll("[^A-Za-z0-9._-]", "_"))

  def commit(df: DataFrame, root: String, key: String, version: Int,
             checkDuplicates: Boolean = true,
             ownerTag: Option[String] = None): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // The duplicate check is a full extra action over the delta; writers
    // whose plan already guarantees one-row-per-key (e.g. a groupBy(key)
    // immediately upstream, as in the q227 upsert sink) may skip it.
    if (checkDuplicates) {
      val dup = df.groupBy(col(key)).count().filter(col("count") > 1).limit(1).count()
      require(dup == 0L, s"commit v=$version carries duplicate keys")
    }
    require(df.columns.contains("_op"), "commit frame needs an _op column")
    val rootPath = Paths.get(root)
    Files.createDirectories(rootPath)
    require(version == 0 || Files.exists(rootPath.resolve(s"v=${version - 1}")),
      s"commit v=$version would leave a gap: v=${version - 1} does not exist")
    val target = rootPath.resolve(s"v=$version")
    def lost() = throw new java.util.ConcurrentModificationException(
      s"commit v=$version lost the race: another writer committed this version")
    if (Files.exists(target)) lost()
    val tmp = rootPath.resolve(s"_tmp_v${version}_${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    ownerTag.foreach { tag =>
      Files.createFile(tmp.resolve(
        ownerMarker(root, version, tag).getFileName)): Unit
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      // Only the claimed-slot signatures mean a lost race; any other
      // FileSystemException (AccessDenied, AtomicMoveNotSupported, …) is a
      // genuine IO failure and must propagate, not masquerade as a race.
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.DirectoryNotEmptyException =>
        rm(tmp.toFile)
        lost()
      case _: java.nio.file.FileSystemException if Files.exists(target) =>
        // the move failed AND the slot is occupied: a concurrent writer won
        rm(tmp.toFile)
        lost()
      case e: Throwable =>
        rm(tmp.toFile)
        throw e
    }
  }

  /** Clean precondition check: every commit dir in `0..version` exists —
    * a gapped or truncated log fails HERE with the offending version,
    * not deep inside a parquet scan. */
  private def requireContiguous(root: String, version: Int): Unit =
    (0 to version).foreach { v =>
      require(new java.io.File(s"$root/v=$v").exists(),
        s"versioned log at $root is not contiguous: v=$v missing " +
          s"(asked for version $version)")
    }

  /** State as of `version`: latest-commit-wins per key, tombstones drop. */
  def readAt(spark: SparkSession, root: String, key: String,
             version: Int): DataFrame = {
    requireContiguous(root, version)
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
                 fromV: Int, toV: Int): DataFrame =
    changeFeedVia(spark, root, key, fromV, toV,
      readAt(spark, root, key, fromV))

  /** The checkpoint-served change feed: identical output to
    * [[changeFeed]](root, fromV, toV), but the from-state is reconstructed
    * from a COMPACTED checkpoint log (one base commit = `readAt(root,
    * fromV)`, written by [[compact]]) instead of folding `fromV+1` deltas
    * — the scale shape the changeFeed scaladoc promises: the feed costs
    * the delta tail plus ONE base scan, regardless of how deep the live
    * log is. Equality with the uncompacted feed is the q217 gate and a
    * VersionedSpec law. */
  def changeFeedFromCheckpoint(spark: SparkSession, checkpointRoot: String,
                               root: String, key: String,
                               fromV: Int, toV: Int): DataFrame =
    changeFeedVia(spark, root, key, fromV, toV,
      readAt(spark, checkpointRoot, key, 0))

  private def changeFeedVia(spark: SparkSession, root: String, key: String,
                            fromV: Int, toV: Int,
                            fromState: DataFrame): DataFrame = {
    require(0 <= fromV && fromV < toV, s"need 0 <= fromV < toV: $fromV, $toV")
    requireContiguous(root, toV)
    val tail = (fromV + 1 to toV).map { v =>
      spark.read.parquet(s"$root/v=$v").withColumn("_v", lit(v))
    }.reduce(_.unionByName(_))
    val payloadCols = tail.columns.filter(c => c != key && c != "_v").sorted
    val latest = tail
      .groupBy(col(key))
      .agg(max(struct((col("_v") +: payloadCols.map(col)): _*)).as("_m"))
      .select(col(key) +: payloadCols.map(c => col(s"_m.$c").as(c)): _*)
    val valueCols = payloadCols.filter(_ != "_op")
    val old = fromState
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
