package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Cross-run (incremental) dedup: day-2 docs are checked against day-1's
  * PERSISTED signature index — day-1 text is never re-shingled (the operator
  * only reads its (id, band, hash) parquet; day-1 text is joined solely to
  * jaccard-verify the few candidate rows). */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("planted dup across two days is found from the persisted index, " +
    "matching the exhaustive cross-day answer") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val day1 = docs.filter(col("doc_id") % 2 === 0)
    val day2 = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("sigidx").toString

    Dedup.writeSignatureIndex(day1, dir)
    val got = Dedup.nearDuplicatesAgainst(spark, dir, day1, day2, minJaccard = 0.2)
      .select("id_old", "id_new").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // ground truth: exhaustive cross-parity jaccard over the full corpus
    val sh = docs.select(col("doc_id"), array_distinct(
        TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    val expected = sh.as("x").crossJoin(sh.as("y"))
      .filter(col("x.doc_id") % 2 === 0 && col("y.doc_id") % 2 === 1)
      .withColumn("j", size(array_intersect(col("x.sh"), col("y.sh"))).cast("double")
        / size(array_union(col("x.sh"), col("y.sh"))))
      .filter(col("j") >= 0.2)
      .select(col("x.doc_id"), col("y.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(expected.nonEmpty, "fixture must plant at least one cross-parity dup")
    assert(got === expected)
    docs.unpersist()
  }

  test("streaming exact dedup: later copies within the watermark are dropped, " +
    "first arrivals pass") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1600000000000L
    def ts(s: Long) = new java.sql.Timestamp(base + s * 1000)

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = Dedup.exactDedupStream(
      input.toDS().toDF("doc_id", "text", "ts"), "text", "ts", "1 minute")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData((1L, "alpha", ts(0)), (2L, "beta", ts(1)), (3L, "alpha", ts(2)))
      q.processAllAvailable()
      // a cross-batch copy inside the watermark is also dropped
      input.addData((4L, "beta", ts(5)), (5L, "gamma", ts(6)))
      q.processAllAvailable()
      assert(spark.table("dedup_out").columns.toSeq === Seq("doc_id", "text", "ts"),
        "output shape must match the input (no helper columns)")
      val got = spark.table("dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got === Set(1L, 2L, 5L))
    } finally q.stop()
  }

  test("appending a day rolls the index forward; a re-ingested doc is caught by both days") {
    import spark.implicits._
    val day1 = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val day2 = Seq((3L, "aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    // day-3 batch re-ingests day-1's doc 1 and day-2's doc 3 verbatim
    val day3 = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sigidx2").toString

    Dedup.writeSignatureIndex(day1, dir)
    Dedup.appendToSignatureIndex(day2, dir)
    val history = day1.unionByName(day2)
    val got = Dedup.nearDuplicatesAgainst(spark, dir, history, day3, minJaccard = 0.9)
      .select("id_old", "id_new").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (3L, 11L)))
  }
}
