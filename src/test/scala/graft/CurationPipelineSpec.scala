package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CurationPipeline

final case class CurDoc(doc_id: Long, text: String, lang: String,
                        source: String, ts: Timestamp)

class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fixtureDocs = {
    // real fixture docs with an arrival timestamp spread over 5 minutes
    Tables.documents(spark, sf)
      .withColumn("ts",
        timestamp_seconds(lit(1704067200L) + col("doc_id") % 300))
      .select("doc_id", "text", "lang", "source", "ts")
  }

  test("streamed curation equals the batch twin on a shuffled replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = fixtureDocs.as[CurDoc].collect().toList
    val shuffled = new scala.util.Random(13).shuffle(docs)

    val in = MemoryStream[CurDoc]
    val q = CurationPipeline.curate(in.toDF(), "ts", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("curated").outputMode("append")
      .start()
    try {
      shuffled.grouped(100).foreach { b => in.addData(b); q.processAllAvailable() }

      val got = spark.table("curated")
        .select("text", "lang", "split")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val want = CurationPipeline.curate(fixtureDocs, "ts")
        .select("text", "lang", "split")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

      assert(want.nonEmpty, "fixture must survive curation")
      assert(got === want,
        "streamed curated corpus must equal the batch-curated corpus by content")
    } finally q.stop()
  }

  test("running token counts: streaming state converges to the batch vocabulary") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = fixtureDocs.as[CurDoc].collect().toList
    val shuffled = new scala.util.Random(41).shuffle(docs)

    val in = MemoryStream[CurDoc]
    val q = CurationPipeline.runningTokenCounts(in.toDF())
      .writeStream.format("memory").queryName("vocab_stream")
      .outputMode("complete")
      .start()
    try {
      shuffled.grouped(77).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("vocab_stream")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = CurationPipeline.runningTokenCounts(fixtureDocs)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(want.nonEmpty)
      assert(got === want,
        "streamed running counts must converge to the batch vocabulary")
    } finally q.stop()
  }

  test("batch curation: stage contracts hold end-to-end") {
    val out = CurationPipeline.curate(fixtureDocs, "ts").cache()
    try {
      // only keep-verdict docs survive (no too_short/too_long/low_quality)
      assert(out.filter(col("n_tokens") < graft.queries.Curation.minTokens ||
        col("n_tokens") > graft.queries.Curation.maxTokens ||
        col("quality") < graft.queries.Curation.minQuality).count() === 0)
      // sample decision is content-keyed: every row's bucket < its stratum rate
      val rates = graft.queries.Curation.strataRates
      val overRate = out.filter(col("bucket") >=
        rates.foldLeft(lit(graft.queries.Curation.strataDefault)) {
          case (acc, (k, v)) => when(col("lang") === k, lit(v)).otherwise(acc)
        })
      assert(overRate.count() === 0)
      // dedup: one row per distinct text
      assert(out.groupBy("text").count().filter(col("count") > 1).count() === 0)
      // split is total and three-valued
      assert(out.filter(!col("split").isin("train", "val", "test")).count() === 0)
      // split decorrelated from sampling: the sampled survivors must not
      // collapse into a single split (the correlated-bucket failure mode)
      val splits = out.select("split").distinct().count()
      assert(splits >= 2, s"split must stay distributed after sampling, got $splits value(s)")
    } finally out.unpersist()
  }
}
