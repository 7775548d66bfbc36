package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.TextFunctions
import graft.operators.Bloom
import graft.queries.Curation

/** Streaming test-set decontamination: q123's Bloom-screened gram match,
  * restructured so the BENCHMARK side updates from a changefeed while the
  * corpus streams through curation — the production shape, where eval
  * suites gain documents weekly but the corpus never stops arriving.
  *
  * Two halves, deliberately decoupled through persisted state:
  *
  *  - [[updateBenchmarkStream]] maintains the benchmark state from a
  *    changefeed: each micro-batch's distinct grams land under a
  *    batch-id-keyed directory (replay OVERWRITES the same directory —
  *    exactly-once effective), alongside that batch's Bloom word delta.
  *    Both stores are append-only across batches; nothing is ever
  *    rewritten, so a crash needs no swap protocol — and serving
  *    collapses the ≤ 2048-row-per-batch word deltas with one `bit_or`
  *    aggregate, which is idempotent, so even a REPLAYED delta merges to
  *    the identical filter (DecontaminationSpec pins stream-built state
  *    ≡ one-shot batch state bit-for-bit).
  *  - [[decontaminate]] / [[contaminationPairs]] apply a loaded
  *    [[Benchmark]] to a document frame ROW-LOCALLY: the 8 KB filter and
  *    the gram → probe-ids map travel as plan literals, so the stage is
  *    stateless and composes with the pipeline's one stateful operator
  *    (the dedup) without entering Spark's multi-stateful restrictions —
  *    it runs identically on a batch frame, which is what makes the
  *    stream ≡ batch q123 equivalence testable.
  *
  * Exactness: the Bloom screen has no false negatives, so every truly
  * shared gram survives it; the map lookup then matches the gram STRING
  * (not its fingerprint), so a screen false positive merely looks up an
  * absent key. The per-(doc, probe) distinct-shared-gram count is
  * therefore EXACTLY q123's `n_shared` — the spec asserts set equality
  * against `Curation.decontaminateBloom` on the same fixture.
  *
  * Scale note: benchmark suites are small by construction (the premise
  * of decontamination), so the gram map is driver metadata — the same
  * discipline as the IVF probed-cell set (`Similarity.scala`). Past
  * ~10⁵ benchmark grams the literal map outgrows the plan; there, run
  * the q123 JOIN form per micro-batch inside `foreachBatch` instead —
  * the persisted state layout here already serves both consumers.
  */
object Decontamination {

  /** Benchmark state in serving form: the dense Bloom words (8 KB) and
    * the gram → probe-ids map, both driver metadata. */
  final case class Benchmark(filter: Array[Long],
                             probes: Map[String, Seq[Long]],
                             minShared: Int)

  /** The q123 gram shape: distinct word 3-grams of the text. */
  private[graft] def gramsOf(text: Column): Column =
    array_distinct(TextFunctions.wordNgrams(TextFunctions.tokens(text), 3))

  /** Idempotent per-batch benchmark maintenance: batch `batchId`'s gram
    * rows and Bloom word delta each overwrite their own batch directory,
    * so a checkpoint replay rewrites identical bytes instead of
    * duplicating state. */
  def applyBenchmarkBatch(batch: DataFrame, idCol: String, textCol: String,
                          stateDir: String, batchId: Long): Unit = {
    val grams = batch
      .select(col(idCol).cast("long").as("probe_id"),
        explode(gramsOf(col(textCol))).as("g"))
    grams.write.mode("overwrite").parquet(s"$stateDir/probes/batch=$batchId")
    Bloom.state(grams, TextFunctions.fingerprint(col("g")))
      .write.mode("overwrite").parquet(s"$stateDir/words/batch=$batchId")
  }

  /** Maintains benchmark state from a streaming changefeed of
    * (`idCol`, `textCol`) document rows. */
  def updateBenchmarkStream(changes: DataFrame, idCol: String, textCol: String,
                            stateDir: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBenchmarkBatch(batch, idCol, textCol, stateDir, batchId)
      }
      .start()

  /** Loads the persisted state into serving form: one ≤ 2048-row
    * `bit_or` collapse for the filter, one distinct scan for the map. */
  def loadBenchmark(spark: SparkSession, stateDir: String,
                    minShared: Int = Curation.decontMinShared): Benchmark = {
    val arr = new Array[Long](Bloom.words)
    spark.read.parquet(s"$stateDir/words")
      .groupBy("word").agg(expr("bit_or(bits32)").as("bits32"))
      .collect().foreach(r =>
        arr(r.getAs[Long]("word").toInt) = r.getAs[Long]("bits32"))
    val probes = spark.read.parquet(s"$stateDir/probes")
      .select("g", "probe_id").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, ps) => g -> ps.map(_._2).toSeq.sorted }
    Benchmark(arr, probes, minShared)
  }

  /** Per-row probe-id multiset: every Bloom-screened gram looks up its
    * probe ids; a probe appearing `n` times shares `n` distinct grams
    * with this document. */
  private def probeHits(text: Column, b: Benchmark): Column = {
    val probeMap = typedlit(b.probes)
    flatten(transform(
      filter(gramsOf(text),
        g => Bloom.mightContain(TextFunctions.fingerprint(g), b.filter)),
      g => coalesce(element_at(probeMap, g), typedlit(Seq.empty[Long]))))
  }

  /** Exact (doc, probe, n_shared ≥ minShared) contamination pairs —
    * q123's output, computed statelessly row by row. */
  def contaminationPairs(docs: DataFrame, idCol: String, textCol: String,
                         b: Benchmark): DataFrame =
    docs.select(col(idCol), probeHits(col(textCol), b).as("__pids"))
      .select(col(idCol),
        explode(filter(
          transform(array_distinct(col("__pids")),
            p => struct(p.as("probe_id"),
              size(filter(col("__pids"), x => x === p)).cast("long").as("n_shared"))),
          s => s.getField("n_shared") >= b.minShared)).as("__pair"))
      .select(col(idCol), col("__pair.probe_id").as("probe_id"),
        col("__pair.n_shared").as("n_shared"))

  /** The curation stage: drops documents sharing ≥ minShared distinct
    * grams with ANY benchmark probe; all other columns pass through.
    * Stateless, so it runs unchanged on batch and streaming frames. */
  def decontaminate(docs: DataFrame, textCol: String, b: Benchmark): DataFrame =
    docs.withColumn("__pids", probeHits(col(textCol), b))
      .filter(!exists(array_distinct(col("__pids")),
        p => size(filter(col("__pids"), x => x === p)) >= b.minShared))
      .drop("__pids")
}
