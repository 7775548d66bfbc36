package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-maintenance operators: snapshot diff (CDC), merge-apply (upsert),
  * and slowly-changing-dimension type-2 history. The reference pipeline is
  * append-only, but any engine feeding a training corpus from operational
  * tables needs the change-capture half: detect what moved between two
  * snapshots, apply a changefeed to a target, and keep attribute history.
  *
  * Scale shape (the whole point of these formulations):
  *  - `snapshotDiff` is ONE co-partitioned full-outer join on the key —
  *    attribute comparison is row-local, so 100 TB diffs at the cost of one
  *    key shuffle per side. No window, no collect.
  *  - `applyChanges` is one key join against the changefeed plus a union of
  *    inserts — the changefeed is usually tiny relative to the target, so
  *    Catalyst/AQE broadcasts it and the target never shuffles at all.
  *  - `scd2History` windows exclusively on the ENTITY key (high cardinality
  *    by construction — one partition per entity's handful of rows), never
  *    on a low-cardinality attribute: both passes sort within the same key
  *    partitioning, so the second window reuses the first's exchange.
  *
  * All comparisons are null-safe (`<=>` / IS DISTINCT FROM): a NULL→value
  * transition is a real update, NULL→NULL is not — the semantics DuckDB,
  * Spark, and the SQL standard agree on, which is what makes these
  * operators oracle-checkable cross-engine.
  */
object Maintenance {

  private def requireSameSchema(a: DataFrame, b: DataFrame): Unit =
    require(a.columns.toSeq == b.columns.toSeq,
      s"snapshot schemas differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")

  /** Changes between two snapshots of the same table, keyed by `keys`:
    * one row per inserted ('I'), deleted ('D'), or updated ('U') key, with
    * `old_<attr>` / `new_<attr>` columns for every non-key attribute.
    * Unchanged keys produce no row. Exactly one full-outer key join;
    * attribute comparison is a row-local null-safe fold. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    requireSameSchema(oldSnap, newSnap)
    require(keys.nonEmpty && keys.forall(oldSnap.columns.contains),
      s"keys ${keys.mkString(",")} must be columns of the snapshots")
    val attrs = oldSnap.columns.filterNot(keys.contains).toSeq
    val o = oldSnap.select(oldSnap.columns.map(c => col(c).as(s"__o_$c")).toSeq: _*)
    val n = newSnap.select(newSnap.columns.map(c => col(c).as(s"__n_$c")).toSeq: _*)
    val on = keys.map(k => col(s"__o_$k") <=> col(s"__n_$k")).reduce(_ && _)
    val anyDiff = attrs.map(a => !(col(s"__o_$a") <=> col(s"__n_$a")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val change = when(col(s"__n_${keys.head}").isNull, lit("D"))
      .when(col(s"__o_${keys.head}").isNull, lit("I"))
      .when(anyDiff, lit("U"))
    val keyCols = keys.map(k => coalesce(col(s"__n_$k"), col(s"__o_$k")).as(k))
    val attrCols = attrs.flatMap(a =>
      Seq(col(s"__o_$a").as(s"old_$a"), col(s"__n_$a").as(s"new_$a")))
    o.join(n, on, "full_outer")
      .withColumn("change", change)
      .filter(col("change").isNotNull)
      .select((keyCols :+ col("change")) ++ attrCols: _*)
  }

  /** Applies a [[snapshotDiff]]-shaped changefeed to `target` (MERGE):
    * 'D' rows are dropped, 'U' rows take their `new_<attr>` values, 'I'
    * rows are appended. `applyChanges(old, snapshotDiff(old, new), keys)`
    * is exactly `new` — the round-trip law MaintenanceSpec and the q90
    * oracle pin. One left join on the key (broadcast when the feed is
    * small) plus a union of inserts. */
  def applyChanges(target: DataFrame, changes: DataFrame,
      keys: Seq[String]): DataFrame = {
    val attrs = target.columns.filterNot(keys.contains).toSeq
    val feedCols = keys ++ Seq("change") ++ attrs.map(a => s"new_$a")
    require(feedCols.forall(changes.columns.contains),
      s"changefeed must carry ${feedCols.mkString(",")}")
    val feed = changes.select(feedCols.map(col).toSeq: _*)
    val on = keys.map(k => target(k) <=> feed(k)).reduce(_ && _)
    val merged = target.join(feed, on, "left_outer")
      .filter(feed("change").isNull || feed("change") === "U")
      .select(keys.map(k => target(k).as(k)) ++ attrs.map(a =>
        when(feed("change") === "U", feed(s"new_$a"))
          .otherwise(target(a)).as(a)): _*)
    val inserts = feed.filter(col("change") === "I")
      .select((keys.map(col) ++ attrs.map(a => col(s"new_$a").as(a))).toSeq: _*)
    merged.unionByName(inserts)
  }

  /** Schema-evolving MERGE: when the changefeed carries `new_<col>`
    * columns the target lacks — the "today's feed added a column" moment
    * every long-lived table hits — widen the target first (the new column
    * is NULL for all existing rows: history is never fabricated), then
    * apply as usual. Rows the feed doesn't touch keep NULL in the new
    * column; updated/inserted rows get the feed's value. One projection
    * on top of [[applyChanges]] — no extra shuffle, no table rewrite
    * beyond the MERGE itself. */
  def applyChangesEvolving(target: DataFrame, changes: DataFrame,
      keys: Seq[String]): DataFrame = {
    val added = changes.columns.collect {
      case c if c.startsWith("new_") &&
        !target.columns.contains(c.stripPrefix("new_")) => c.stripPrefix("new_")
    }
    val widened = added.foldLeft(target) { (t, a) =>
      t.withColumn(a, lit(null).cast(changes.schema(s"new_$a").dataType))
    }
    applyChanges(widened, changes, keys)
  }

  /** Continuously applies a streaming changefeed to a parquet target:
    * each micro-batch MERGEs via [[applyChanges]] and swaps the target
    * directory through a crash-safe rename sequence. The batch operator
    * being deterministic makes the stream's final state equal to one big
    * batch apply of the same changes — MaintenanceSpec replays a chunked
    * feed and compares against the q90 round-trip law.
    *
    * Swap protocol (no step ever deletes the only copy of the data):
    * write `.next` → delete stale `.old` → rename target→`.old` →
    * rename `.next`→target → delete `.old`. The target can only be
    * missing between the two renames, and then the displaced pre-batch
    * state is at `.old`; batch start restores it ([[recoverSwap]]) and the
    * checkpoint replays the uncommitted epoch against it — recovery lands
    * on the pre-batch state, never on a half-applied one. Renames are
    * per-directory filesystem moves: atomic on HDFS-like stores, NOT on
    * object stores — there, and in any deployment wanting concurrent
    * readers, target a table format with a real commit protocol (the
    * foreachBatch body is unchanged; only the swap is format-specific).
    *
    * Scale note: rewrite-on-batch is the no-table-format fallback; on a
    * real deployment the same foreachBatch body targets a format with
    * row-level MERGE, and with a partitioned target only partitions
    * containing changed keys need rewriting. */
  def applyChangesStream(changes: DataFrame, targetDir: String,
      keys: Seq[String], checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.hadoop.fs.Path
        val spark = batch.sparkSession
        val conf = spark.sparkContext.hadoopConfiguration
        val target = new Path(targetDir)
        val fs = target.getFileSystem(conf)
        recoverSwap(fs, target)
        val merged = applyChanges(spark.read.parquet(targetDir), batch, keys)
        val tmp = new Path(targetDir + ".next")
        val old = new Path(targetDir + ".old")
        merged.write.mode("overwrite").parquet(tmp.toString)
        // Hadoop FileSystem reports most rename/delete failures (dest
        // exists, src missing, object-store quirks) by returning false,
        // not throwing — a swallowed false here would let the epoch
        // commit while the merged data in .next is silently discarded.
        // Throw so the batch fails and the checkpoint replays the epoch.
        def mustRename(src: Path, dst: Path): Unit =
          require(fs.rename(src, dst), s"rename $src -> $dst failed")
        def mustDelete(p: Path): Unit =
          require(!fs.exists(p) || fs.delete(p, true), s"delete $p failed")
        mustDelete(old) // stale from a crash after a completed swap
        mustRename(target, old)
        mustRename(tmp, target)
        mustDelete(old)
        ()
      }
      .start()

  /** Restores the target if a previous run died mid-swap: the only state
    * with the target missing is between the two renames, where the
    * pre-batch data sits whole at `.old`. Idempotent; no-op when healthy. */
  private[graft] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
      target: org.apache.hadoop.fs.Path): Unit = {
    val old = new org.apache.hadoop.fs.Path(target.toString + ".old")
    if (!fs.exists(target) && fs.exists(old)) {
      require(fs.rename(old, target), s"recovery rename $old -> $target failed")
      ()
    }
  }

  /** Incrementally maintains a (group, count, exact-sum) aggregate view
    * under a [[snapshotDiff]] changefeed — materialized-view delta
    * maintenance, the step that lets a 100 TB fact table's rollup refresh
    * from a day's changes without rescanning history.
    *
    * `view` is (g, cnt, s); `changes` carries (change, old_g, new_g,
    * old_q, new_q) where *_q are the value's floor-quantized integers
    * (the [[graft.functions.Exact]] discipline — decimal adds are exact
    * and order-independent, so incremental ≡ recompute BIT-FOR-BIT, not
    * approximately; the q95 oracle pins exactly that). Updates contribute
    * to both sides, so a row migrating between groups moves its count and
    * value; groups reaching count 0 vanish. Cost: one aggregate of the
    * changefeed + one key join against the view — never the fact table. */
  def incrementalAgg(view: DataFrame, changes: DataFrame): DataFrame = {
    val adds = changes.filter(col("change").isin("I", "U"))
      .select(col("new_g").as("g"), lit(1L).as("dn"), col("new_q").as("dv"))
    val subs = changes.filter(col("change").isin("D", "U"))
      .select(col("old_g").as("g"), lit(-1L).as("dn"), negate(col("old_q")).as("dv"))
    val delta = adds.unionByName(subs)
      .groupBy("g").agg(sum("dn").as("dn"), sum("dv").as("dv"))
    view.join(delta, Seq("g"), "full_outer")
      .select(col("g"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("cnt"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("dv"), lit(0L))).as("s"))
      .filter(col("cnt") > 0)
  }

  /** Merkle-style per-bucket fingerprint summary of a snapshot:
    * ≤ `buckets` rows of (bucket, n_rows, fp), fp = XOR of a
    * caller-supplied deterministic row hash, bucket = keyHash mod buckets.
    *
    * The anti-entropy primitive: to learn WHETHER and WHERE two replicas /
    * snapshots diverge, each side scans LOCALLY (one map-side-combinable
    * aggregate — XOR and count are associative+commutative, so partials
    * merge in any order with no overflow) and only the bucket summaries
    * travel. Comparing summaries ([[fingerprintDiff]]) yields the repair
    * set; a full-data join ([[snapshotDiff]]) then runs on the divergent
    * buckets ONLY. At 100 TB that turns "are these tables equal?" from a
    * table-sized shuffle into O(buckets) bytes moved per check — the
    * standard replica-reconciliation design (Merkle trees flattened to one
    * level; public literature, e.g. Dynamo-style anti-entropy). */
  def bucketFingerprints(snap: DataFrame, keyHash: Column, rowHash: Column,
                         buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    snap.select(pmod(keyHash, lit(buckets.toLong)).as("bucket"), rowHash.as("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("fp"))
  }

  /** Buckets where two snapshots' summaries disagree — the repair set.
    * Missing buckets count as empty (0 rows, NULL fp); comparison is
    * null-safe so a one-sided bucket always surfaces. */
  def fingerprintDiff(oldFp: DataFrame, newFp: DataFrame): DataFrame = {
    val o = oldFp.select(col("bucket"),
      col("n_rows").as("old_n"), col("fp").as("old_fp"))
    val n = newFp.select(col("bucket"),
      col("n_rows").as("new_n"), col("fp").as("new_fp"))
    o.join(n, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"),
        col("old_fp"), col("new_fp"))
      .filter(col("old_n") =!= col("new_n") ||
        !(col("old_fp") <=> col("new_fp")))
  }

  /** Point-in-time (temporal) lookup against an SCD2 history: for each
    * probe row (entity key + `probe_ts`), the history version whose
    * half-open validity interval [valid_from, valid_to) contains the
    * probe instant — the query side of [[scd2History]], and the lookup a
    * feature store runs to avoid training-serving leakage ("the value AS
    * OF the example's timestamp", never the current one).
    *
    * Scale shape: ONE co-partitioned equi-join on the entity key; the
    * interval predicate is row-local on the joined pair, so no range-join
    * blow-up — per-entity history is versions-per-entity small by
    * construction. A probe inside the history always matches EXACTLY one
    * version (intervals partition [first_valid_from, ∞)); probes before
    * an entity's first version produce no row. */
  def pointInTime(history: DataFrame, probes: DataFrame,
      keys: Seq[String], probeTs: String = "probe_ts"): DataFrame =
    history.join(probes, keys)
      .filter(col("valid_from") <= col(probeTs) &&
        (col("valid_to").isNull || col("valid_to") > col(probeTs)))

  /** Type-2 slowly-changing-dimension history from an append-only
    * changelog: collapses consecutive equal values of `attr` per key
    * (ordered by `tsCol`, ties by `tieCols`) into versioned validity
    * intervals — (version, valid_from, valid_to, is_current), `valid_to`
    * NULL on the open current row. Revisits re-open a new version (A→B→A
    * is three rows). Both windows partition on the entity key only. */
  def scd2History(log: DataFrame, keys: Seq[String], attr: String,
      tsCol: String, tieCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val starts = log
      .withColumn("__prev", lag(col(attr), 1).over(w))
      // first row per key has NULL __prev: IS DISTINCT FROM makes it a start
      .filter(!(col("__prev") <=> col(attr)))
    starts
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keys.map(col) ++ Seq(col(attr), col("version"),
        col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
