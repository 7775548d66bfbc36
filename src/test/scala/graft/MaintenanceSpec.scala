package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Maintenance

/** Changefeed row shape for the streaming CDC replay test. */
case class Chg(id: Long, change: String, new_name: Option[String],
               new_bal: Option[Double])

/** Table-maintenance operators: CDC diff, merge-apply, SCD2 history.
  * Covers the null-transition semantics, the diff→merge round-trip law,
  * revisit versioning, and the plan shapes the 100 TB story depends on
  * (one key join for the diff, entity-key-only windows for SCD2). */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def snap(rows: (Long, Option[String], Double)*) =
    rows.toDF("id", "name", "bal")

  test("snapshotDiff classifies inserts, deletes, updates; skips unchanged") {
    val old = snap((1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, Some("c"), 30.0))
    val neu = snap((2L, Some("b"), 20.0), (3L, Some("C"), 30.0), (4L, Some("d"), 40.0))
    val got = Maintenance.snapshotDiff(old, neu, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "D", 3L -> "U", 4L -> "I"))
  }

  test("snapshotDiff null semantics: NULL→value is an update, NULL→NULL is not") {
    val old = snap((1L, None, 1.0), (2L, None, 2.0))
    val neu = snap((1L, Some("x"), 1.0), (2L, None, 2.0))
    val got = Maintenance.snapshotDiff(old, neu, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "U"))
  }

  test("snapshotDiff carries old/new attribute values") {
    val old = snap((7L, Some("n"), 5.0))
    val neu = snap((7L, Some("n"), 6.5))
    val r = Maintenance.snapshotDiff(old, neu, Seq("id")).collect().head
    assert(r.getAs[Double]("old_bal") === 5.0 && r.getAs[Double]("new_bal") === 6.5)
    assert(r.getAs[String]("old_name") === "n" && r.getAs[String]("new_name") === "n")
  }

  test("round-trip law: applyChanges(old, snapshotDiff(old, new)) == new") {
    // deterministic pseudo-random snapshots, incl. null attrs and disjoint keys
    def h(i: Long, s: Long) = ((i * 2654435761L + s) >>> 7) % 100
    val old = snap((0L until 60L).filter(h(_, 1) < 80).map(i =>
      (i, if (h(i, 2) < 10) None else Some(s"n${h(i, 3)}"), h(i, 4).toDouble)): _*)
    val neu = snap((0L until 60L).filter(h(_, 5) < 80).map(i =>
      (i, if (h(i, 6) < 10) None else Some(s"n${h(i, 7)}"), h(i, 8).toDouble)): _*)
    val merged = Maintenance.applyChanges(old,
      Maintenance.snapshotDiff(old, neu, Seq("id")), Seq("id"))
    val want = neu.collect().map(_.toString).sorted
    val got = merged.collect().map(_.toString).sorted
    assert(got.toSeq === want.toSeq)
    assert(merged.columns.toSeq === neu.columns.toSeq)
  }

  test("evolving apply: new column lands NULL on untouched history, typed on touched rows") {
    val old = snap((1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, Some("c"), 30.0))
    // feed: update 2's bal and stamp a column the target never had;
    // insert 4 with it; 1 and 3 untouched
    val feed = Seq(
      (2L, "U", Some("b"), Some(25.0), Some("vip")),
      (4L, "I", Some("d"), Some(40.0), Some("fresh")))
      .toDF("id", "change", "new_name", "new_bal", "new_tier")
    val out = Maintenance.applyChangesEvolving(old, feed, Seq("id"))
    assert(out.columns.toSeq === Seq("id", "name", "bal", "tier"))
    val byId = out.collect().map(r => r.getLong(0) ->
      (r.getDouble(2), Option(r.getString(3)))).toMap
    assert(byId(1L) === ((10.0, None)), "untouched history must stay NULL")
    assert(byId(3L) === ((30.0, None)))
    assert(byId(2L) === ((25.0, Some("vip"))))
    assert(byId(4L) === ((40.0, Some("fresh"))))
    // with no new columns it degrades to plain applyChanges
    val plainFeed = feed.drop("new_tier")
    val plain = Maintenance.applyChangesEvolving(old, plainFeed, Seq("id"))
    assert(plain.columns.toSeq === old.columns.toSeq)
  }

  test("snapshotDiff plan: one key join, no cartesian / nested loop") {
    val old = snap((1L, Some("a"), 1.0)); val neu = snap((1L, Some("a"), 2.0))
    val plan = Maintenance.snapshotDiff(old, neu, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"non-key join in diff plan:\n$plan")
  }

  test("incrementalAgg: migrations move count+value, emptied groups vanish, new groups appear") {
    import org.apache.spark.sql.types.DecimalType
    val dec = (v: Long) => lit(v).cast(DecimalType(27, 0))
    val view = Seq(("A", 2L, 30L), ("B", 1L, 30L)).toDF("g", "cnt", "sv")
      .select(col("g"), col("cnt"), col("sv").cast(DecimalType(27, 0)).as("s"))
    // k1: A(10) -> B(15) migration; k2: A(20) deleted; k4: C(5) inserted
    val changes = Seq(
      ("U", Some("A"), Some("B"), Some(10L), Some(15L)),
      ("D", Some("A"), None, Some(20L), None),
      ("I", None, Some("C"), None, Some(5L)))
      .toDF("change", "old_g", "new_g", "old_q", "new_q")
      .select(col("change"), col("old_g"), col("new_g"),
        col("old_q").cast(DecimalType(27, 0)).as("old_q"),
        col("new_q").cast(DecimalType(27, 0)).as("new_q"))
    val got = Maintenance.incrementalAgg(view, changes)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).longValueExact())).toSet
    assert(got === Set(("B", 2L, 45L), ("C", 1L, 5L)))
  }

  test("q95 law: incremental view maintenance equals full recompute, bit-for-bit") {
    val d = "/root/testdata/sf0.001"
    val inc = graft.queries.MaintenanceQueries.incrementalRollup(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // independent recompute of the new snapshot through the same quantizer
    val full = Tables.orders(spark, d).filter(col("o_orderkey") % 13 =!= 5)
      .withColumn("p", when(col("o_orderkey") % 7 === 2, col("o_totalprice") + 50.0)
        .otherwise(col("o_totalprice")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("p") * 100.0)
          .cast(org.apache.spark.sql.types.DecimalType(27, 0))).cast("double") / 100.0).as("sp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc.nonEmpty && inc === full)
  }

  test("streaming CDC apply: chunked changefeed replay converges to the new snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = java.nio.file.Files.createTempDirectory("cdcstream").toString
    val targetDir = s"$base/target"; val ckpt = s"$base/ckpt"
    def h(i: Long, s: Long) = ((i * 2654435761L + s) >>> 7) % 100
    val old = snap((0L until 80L).filter(h(_, 1) < 85).map(i =>
      (i, Some(s"n${h(i, 2)}"), h(i, 3).toDouble)): _*)
    val neu = snap((0L until 80L).filter(h(_, 4) < 85).map(i =>
      (i, Some(s"n${h(i, 5)}"), h(i, 6).toDouble)): _*)
    old.write.parquet(targetDir)

    // feed the diff in key-disjoint chunks (each batch's merge must only
    // touch its own keys; ordering across chunks is irrelevant)
    val diff = Maintenance.snapshotDiff(old, neu, Seq("id"))
      .select(col("id"), col("change"), col("new_name"), col("new_bal"))
      .as[Chg].collect().toList
    val chunks = diff.groupBy(_.id % 3).values.toList

    val in = MemoryStream[Chg]
    val q = Maintenance.applyChangesStream(in.toDF(), targetDir, Seq("id"), ckpt)
    try {
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.read.parquet(targetDir).collect().map(_.toString).sorted
    val want = neu.collect().map(_.toString).sorted
    assert(got.toSeq === want.toSeq,
      "streamed CDC apply must converge to the new snapshot")
  }

  test("streaming CDC apply recovers a target stranded mid-swap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = java.nio.file.Files.createTempDirectory("cdcrecover").toString
    val targetDir = s"$base/target"; val ckpt = s"$base/ckpt"
    val old = snap((1L, Some("a"), 1.0), (2L, Some("b"), 2.0))
    val neu = snap((1L, Some("a"), 1.0), (2L, Some("B"), 2.5), (3L, Some("c"), 3.0))
    old.write.parquet(targetDir)

    // simulate a crash between the swap's two renames: the target has been
    // displaced to .old and a stale .next from the dead batch lingers
    val fs = new org.apache.hadoop.fs.Path(targetDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(targetDir),
      new org.apache.hadoop.fs.Path(targetDir + ".old"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(targetDir + ".next"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(targetDir)))

    // the replayed epoch must restore the pre-batch state, merge onto it,
    // and leave no sidecar directories behind
    val diff = Maintenance.snapshotDiff(old, neu, Seq("id"))
      .select(col("id"), col("change"), col("new_name"), col("new_bal"))
      .as[Chg].collect().toList
    val in = MemoryStream[Chg]
    val q = Maintenance.applyChangesStream(in.toDF(), targetDir, Seq("id"), ckpt)
    try { in.addData(diff); q.processAllAvailable() } finally q.stop()

    val got = spark.read.parquet(targetDir).collect().map(_.toString).sorted
    assert(got.toSeq === neu.collect().map(_.toString).sorted.toSeq)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(targetDir + ".old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(targetDir + ".next")))
  }

  private def log(rows: (Long, String, Long, Long)*) =
    rows.toDF("key", "status", "tsv", "tie")
      .withColumn("ts", timestamp_micros(col("tsv") * 1000000L)).drop("tsv")

  test("bucket fingerprints: identical snapshots yield an empty repair set") {
    val a = snap((1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, Some("c"), 30.0))
    val h = xxhash64(col("id"), col("name"), col("bal"))
    val fps = Maintenance.bucketFingerprints(a, col("id"), h, 8)
    assert(Maintenance.fingerprintDiff(fps, fps).count() === 0)
  }

  test("bucket fingerprints: one perturbed row flags exactly its own bucket") {
    val old = snap((1L to 64L).map(i => (i, Some(s"n$i"), i * 1.5)): _*)
    val neu = snap((1L to 64L).map(i =>
      (i, Some(s"n$i"), if (i == 37L) 999.0 else i * 1.5)): _*)
    val h = xxhash64(col("id"), col("name"), col("bal"))
    val diff = Maintenance.fingerprintDiff(
        Maintenance.bucketFingerprints(old, col("id"), h, 16),
        Maintenance.bucketFingerprints(neu, col("id"), h, 16))
      .collect()
    assert(diff.length === 1)
    assert(diff.head.getLong(0) === 37L % 16)
    // counts agree (it was an update) — ONLY the xor fingerprint caught it
    assert(diff.head.getLong(1) === diff.head.getLong(2))
  }

  test("bucket fingerprints: one-sided buckets surface with n=0 and NULL fp") {
    val old = snap((1L, Some("a"), 10.0))
    val neu = snap((1L, Some("a"), 10.0), (12L, Some("l"), 90.0)) // bucket 4 new-only
    val h = xxhash64(col("id"))
    val diff = Maintenance.fingerprintDiff(
        Maintenance.bucketFingerprints(old, col("id"), h, 8),
        Maintenance.bucketFingerprints(neu, col("id"), h, 8))
      .collect()
    assert(diff.length === 1)
    assert(diff.head.getLong(1) === 0L && diff.head.getLong(2) === 1L)
    assert(diff.head.isNullAt(3) && !diff.head.isNullAt(4))
  }

  test("bucket fingerprints are partitioning- and order-invariant") {
    val rows = (1L to 200L).map(i => (i, Some(s"n$i"), i * 0.25))
    val h = xxhash64(col("id"), col("name"), col("bal"))
    def fp(df: org.apache.spark.sql.DataFrame) =
      Maintenance.bucketFingerprints(df, col("id"), h, 32)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fp(snap(rows: _*).repartition(17)) ===
      fp(snap(rows.reverse: _*).repartition(3)))
  }

  test("q109 law: fingerprint-scoped diff equals the global diff") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(rows(graft.queries.MaintenanceQueries.scopedDiff(spark, sf)) ===
      rows(graft.queries.MaintenanceQueries.snapshotDiff(spark, sf)))
    // the repair-set semi-join must broadcast — the summaries are the
    // small side by construction, the snapshots must not shuffle for it
    val plan = graft.queries.MaintenanceQueries.scopedDiff(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"repair-set scoping is not a broadcast semi-join:\n$plan")
  }

  test("scd2History collapses runs, versions revisits, marks current") {
    // key 1: A,A,B,A — three versions; key 2: single run
    val l = log((1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L), (2L, "X", 10L, 5L))
    val got = Maintenance.scd2History(l, Seq("key"), "status", "ts", Seq("tie"))
      .select(col("key"), col("status"), col("version"),
        unix_timestamp(col("valid_from")).as("vf"),
        unix_timestamp(col("valid_to")).as("vt"), col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
      .toSet
    assert(got === Set(
      (1L, "A", 1, 10L, 30L, false),
      (1L, "B", 2, 30L, 40L, false),
      (1L, "A", 3, 40L, -1L, true),
      (2L, "X", 1, 10L, -1L, true)))
  }

  test("pointInTime: half-open intervals, exactly-one-version, pre-history probes drop") {
    // key 1 history: A [10, 30), B [30, open). Probes: 9 (before history:
    // no row), 10 (first instant of A), 29 (last instant of A), 30 (the
    // boundary belongs to B — [from, to) half-open), 99 (open row)
    val l = log((1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L))
    val hist = Maintenance.scd2History(l, Seq("key"), "status", "ts", Seq("tie"))
    val probes = Seq(9L, 10L, 29L, 30L, 99L)
      .toDF("pv").select(lit(1L).as("key"),
        timestamp_micros(col("pv") * 1000000L).as("probe_ts"), col("pv"))
    val got = Maintenance.pointInTime(hist, probes, Seq("key"))
      .select(col("pv"), col("status")).as[(Long, String)].collect().toMap
    assert(got === Map(10L -> "A", 29L -> "A", 30L -> "B", 99L -> "B"))
    // exactly one version per in-history probe: no duplicate pv keys
    assert(Maintenance.pointInTime(hist, probes, Seq("key")).count() === 4L)
  }

  test("scd2History ties on the same timestamp break by the tie column") {
    val l = log((1L, "A", 10L, 2L), (1L, "B", 10L, 1L))
    val got = Maintenance.scd2History(l, Seq("key"), "status", "ts", Seq("tie"))
      .select("status", "version").as[(String, Int)].collect().toSet
    assert(got === Set(("B", 1), ("A", 2)))
  }

  test("scd2 windows partition on the entity key only") {
    val df = graft.queries.MaintenanceQueries.defs("q91_scd2_history")
      .fn(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty)
    assert(windowLines.forall(_.contains("o_custkey")),
      s"window not keyed on o_custkey:\n${windowLines.mkString("\n")}")
  }
}
