package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}
import graft.queries.Curation

/** The streaming corpus-ingest pipeline: the curation operators composed
  * into ONE declarative flow a training-data platform runs on live document
  * arrivals —
  *
  *   quality-route → keep → stratified sample → exact dedup (watermark
  *   horizon) → content-hash train/val/test split
  *
  * Every stage except the dedup is STATELESS (row-local column arithmetic),
  * so the composition adds exactly one stateful operator whose state is
  * 8 bytes per distinct kept doc inside the watermark. All decisions are
  * content-keyed (fingerprint buckets), so replaying the stream — in any
  * batch arrangement — reproduces the identical curated corpus:
  * CurationPipelineSpec asserts stream ≡ batch on shuffled replays.
  *
  * This is the pipeline-level counterpart of the reference's streaming
  * route→classify→fan-out flow
  * (/root/reference/src/main/scala/es/dmr/uimp/realtime/InvoicePipeline.scala:88-131)
  * re-aimed at corpus curation: same shape (stateless cascade around one
  * keyed state), different domain.
  */
object CurationPipeline {

  /** Apply the full curation cascade to a document frame with columns
    * (doc_id, text, lang, source, `eventTimeCol`). Works on a streaming OR
    * batch frame — the batch plan simply ignores the watermark, which is
    * what makes the replay-equivalence test possible.
    *
    * `benchmark` switches on the decontamination stage
    * ([[Decontamination.decontaminate]]): documents sharing grams with a
    * loaded benchmark state are dropped right after quality routing —
    * before sampling, so contaminated docs can't consume stratum budget.
    * The stage is row-local (filter + map as plan literals), so it adds
    * no streaming state: the pipeline keeps exactly one stateful
    * operator, the dedup. */
  def curate(docs: DataFrame, eventTimeCol: String,
             watermarkDelay: String = "10 minutes",
             rates: Map[String, Int] = Curation.strataRates,
             defaultPct: Int = Curation.strataDefault,
             benchmark: Option[Decontamination.Benchmark] = None): DataFrame = {
    val routed = docs
      .withColumn("n_tokens", size(TextFunctions.tokens(col("text"))).cast("long"))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("verdict",
        when(col("n_tokens") < Curation.minTokens, lit("too_short"))
          .when(col("n_tokens") > Curation.maxTokens, lit("too_long"))
          .when(col("quality") < Curation.minQuality, lit("low_quality"))
          .otherwise(lit("keep")))
      .filter(col("verdict") === "keep")
      .drop("verdict")
    val cleared = benchmark.fold(routed)(b =>
      Decontamination.decontaminate(routed, "text", b))
    val sampled = Sampling.stratifiedSample(cleared, "lang", "text", rates, defaultPct)
    val deduped =
      if (sampled.isStreaming)
        Dedup.exactDedupStream(sampled, "text", eventTimeCol, watermarkDelay)
      else // batch twin of dropDuplicatesWithinWatermark's keep-one contract
        Dedup.exactKeepFirst(sampled, "text", "doc_id")
    // The split hash must be INDEPENDENT of the sampling bucket: sampling
    // keeps only buckets below the stratum rate (a prefix of [0,100)), so
    // reusing that bucket would send every sampled doc to "train". Hashing
    // the REVERSED text gives a second content-keyed, duplicate-stable
    // coordinate uncorrelated with the first.
    deduped.withColumn("split_bucket",
      TextFunctions.fingerprint(reverse(col("text"))) % 100)
      .withColumn("split",
        when(col("split_bucket") < 80, lit("train"))
          .when(col("split_bucket") < 90, lit("val"))
          .otherwise(lit("test")))
  }

  /** Streaming twin of q85's incremental vocabulary maintenance: a running
    * `groupBy(token).count()` over the live document stream. The streaming
    * aggregation state is bounded by |vocabulary| (one long per distinct
    * token — the zipf ceiling, NOT corpus size), and Spark's partial
    * aggregation pre-combines each micro-batch map-side, so every trigger
    * shuffles at most |batch vocabulary| rows. Counts are a commutative
    * monoid, so any replay arrangement converges to the batch answer —
    * CurationPipelineSpec asserts stream ≡ batch recompute, the same
    * identity the q85 oracle pins for the persisted-index form. */
  def runningTokenCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
}
