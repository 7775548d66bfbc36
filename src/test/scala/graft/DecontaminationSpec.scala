package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.operators.Bloom
import graft.streaming.{CurationPipeline, Decontamination}

final case class BenchDoc(doc_id: Long, text: String)

/** Streaming decontamination: the benchmark state built from a replayed
  * changefeed must equal the one-shot build bit-for-bit (and survive a
  * replayed batch unchanged), and the row-local stage must reproduce
  * q123's exact (doc, probe, n_shared) output on a streamed corpus. */
class DecontaminationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  // sf0.01: the SF the q123 gate row runs at, for like-for-like pairs
  private val sf = "/root/testdata/sf0.01"

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")
  private def probeDocs = docs.filter(col("doc_id") % 97 === 0)
  private def corpusDocs = docs.filter(col("doc_id") % 97 =!= 0)

  private def freshStateDir() =
    java.nio.file.Files.createTempDirectory("decontam").toString

  /** Builds benchmark state from the probe docs in two explicit batches —
    * the changefeed shape without the stream plumbing. */
  private def buildState(dir: String): Unit = {
    val p = probeDocs.cache()
    try {
      Decontamination.applyBenchmarkBatch(
        p.filter(col("doc_id") % 2 === 0), "doc_id", "text", dir, 0L)
      Decontamination.applyBenchmarkBatch(
        p.filter(col("doc_id") % 2 === 1), "doc_id", "text", dir, 1L)
    } finally p.unpersist()
  }

  test("changefeed-built words equal the one-shot build; batch replay is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = freshStateDir()
    val feed = probeDocs.as[BenchDoc].collect().toList
    val in = MemoryStream[BenchDoc]
    val q = Decontamination.updateBenchmarkStream(
      in.toDF(), "doc_id", "text", s"$dir/state", s"$dir/ckpt")
    try {
      feed.grouped(2).foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val streamed = Decontamination.loadBenchmark(spark, s"$dir/state")
    // one-shot build over the full benchmark: identical words, bit for bit
    val oneShot = Bloom.build(
      probeDocs.select(explode(Decontamination.gramsOf(col("text"))).as("g")),
      TextFunctions.fingerprint(col("g")))
    assert(streamed.filter.toSeq === oneShot.toSeq,
      "stream-built Bloom words diverged from the one-shot build")
    assert(streamed.probes.nonEmpty)

    // a checkpoint replay re-delivers a batch: same batch id, same rows —
    // the overwrite + idempotent bit_or must leave the state identical
    val firstBatch = feed.take(2).toDF()
    Decontamination.applyBenchmarkBatch(firstBatch, "doc_id", "text", s"$dir/state", 0L)
    val replayed = Decontamination.loadBenchmark(spark, s"$dir/state")
    assert(replayed.filter.toSeq === streamed.filter.toSeq &&
      replayed.probes === streamed.probes,
      "replaying a delivered batch changed the benchmark state")
  }

  test("stream ≡ batch q123: row-local pairs equal decontaminateBloom exactly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = freshStateDir()
    buildState(dir)
    val b = Decontamination.loadBenchmark(spark, dir)

    val corpus = corpusDocs.as[BenchDoc].collect().toList
    val shuffled = new scala.util.Random(7).shuffle(corpus)
    val in = MemoryStream[BenchDoc]
    val q = Decontamination.contaminationPairs(in.toDF(), "doc_id", "text", b)
      .writeStream.format("memory").queryName("contam_pairs")
      .outputMode("append").start()
    try {
      shuffled.grouped(120).foreach { c => in.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("contam_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.queries.Curation.decontaminateBloom(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "fixture lost its planted contamination")
    assert(got === want,
      "streamed row-local contamination diverged from the batch q123 join")
  }

  test("null-text docs pass through uncontaminated; caller scratch-like columns survive") {
    import spark.implicits._
    val dir = freshStateDir()
    buildState(dir)
    val b = Decontamination.loadBenchmark(spark, dir)
    // a null text shares no grams: the join form emits no pairs, so the
    // row-local stage must KEEP the doc (a bare !exists(NULL,...) would
    // silently drop it); a column named like the old fixed scratch name
    // must ride through untouched
    val docs = Seq(
      (900001L, null.asInstanceOf[String], "keep-me"),
      (900002L, "zz qq ww ee rr tt yy uu", "also-keep"))
      .toDF("doc_id", "text", "__pids")
    val pairs = Decontamination.contaminationPairs(docs, "doc_id", "text", b)
    assert(pairs.count() === 0L)
    val out = Decontamination.decontaminate(docs, "text", b)
      .select("doc_id", "__pids").as[(Long, String)].collect().toMap
    assert(out === Map(900001L -> "keep-me", 900002L -> "also-keep"),
      "stage must pass null-text docs and caller columns through unchanged")
  }

  test("curate drops exactly the contaminated docs, batch and stream alike") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = freshStateDir()
    buildState(dir)
    val b = Decontamination.loadBenchmark(spark, dir)

    val timed = Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 =!= 0)
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("doc_id") % 300))
      .select("doc_id", "text", "lang", "source", "ts")

    val withoutIds = CurationPipeline.curate(timed, "ts")
      .select("doc_id").as[Long].collect().toSet
    val withIds = CurationPipeline.curate(timed, "ts", benchmark = Some(b))
      .select("doc_id").as[Long].collect().toSet
    val contaminated = Decontamination
      .contaminationPairs(timed, "doc_id", "text", b)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(withIds === withoutIds -- contaminated,
      "benchmark stage must remove exactly the contaminated survivors")

    // the streamed pipeline with the stage on agrees with its batch twin
    val rows = timed.as[CurDoc].collect().toList
    val in = MemoryStream[CurDoc]
    val q = CurationPipeline.curate(in.toDF(), "ts", benchmark = Some(b))
      .writeStream.format("memory").queryName("curated_decontam")
      .outputMode("append").start()
    try {
      rows.grouped(150).foreach { c => in.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val streamedIds = spark.table("curated_decontam")
      .select("doc_id").as[Long].collect().toSet
    assert(streamedIds === withIds,
      "streamed decontaminating curation diverged from the batch twin")
  }
}
