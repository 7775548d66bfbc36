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
    * duplicating state.
    *
    * Write order is the FAIL-SAFE one: words first, probes second (and
    * [[loadBenchmark]] reads probes first, words second). A crash
    * between the two writes — or a batch committing between a loader's
    * two reads — can then only leave filter bits with no matching map
    * entry, which is a harmless lookup miss. The reverse order would
    * leave map entries whose bits are ABSENT from the filter: the
    * screen would reject those grams — a real false negative — and
    * contaminated documents would pass silently. */
  def applyBenchmarkBatch(batch: DataFrame, idCol: String, textCol: String,
                          stateDir: String, batchId: Long): Unit = {
    val grams = batch
      .select(col(idCol).cast("long").as("probe_id"),
        explode(gramsOf(col(textCol))).as("g"))
    Bloom.state(grams, TextFunctions.fingerprint(col("g")))
      .write.mode("overwrite").parquet(s"$stateDir/words/batch=$batchId")
    grams.write.mode("overwrite").parquet(s"$stateDir/probes/batch=$batchId")
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
    * `bit_or` collapse for the filter, one distinct scan for the map —
    * probes FIRST, words second (see [[applyBenchmarkBatch]]: with the
    * write order words-then-probes, any interleaving leaves at worst
    * extra filter bits, never map entries the filter would reject). */
  def loadBenchmark(spark: SparkSession, stateDir: String,
                    minShared: Int = Curation.decontMinShared): Benchmark = {
    val probes = spark.read.parquet(s"$stateDir/probes")
      .select("g", "probe_id").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, ps) => g -> ps.map(_._2).toSeq.sorted }
    val arr = new Array[Long](Bloom.words)
    spark.read.parquet(s"$stateDir/words")
      .groupBy("word").agg(expr("bit_or(bits32)").as("bits32"))
      .collect().foreach(r =>
        arr(r.getAs[Long]("word").toInt) = r.getAs[Long]("bits32"))
    Benchmark(arr, probes, minShared)
  }

  /** Per-call unique scratch-column namespace — the [[graft.operators
    * .Ranges]] discipline: a fixed name like `__pids` would silently
    * capture and then drop a caller column of the same name. */
  private val callSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-row probe-id multiset: every Bloom-screened gram looks up its
    * probe ids; a probe appearing `n` times shares `n` distinct grams
    * with this document. The per-gram string fingerprint is computed
    * ONCE into a struct field before the screen — inlining it into
    * [[Bloom.mightContain]] would embed the string walk in all k
    * position expressions (the q123 lesson, `Curation.scala`). NULL
    * text propagates a null grams array; coalesce makes that the empty
    * multiset, so null-text documents are uncontaminated, matching the
    * join form (explode of nothing emits no pairs). */
  private def probeHits(text: Column, b: Benchmark): Column = {
    val probeMap = typedlit(b.probes)
    coalesce(
      flatten(transform(
        filter(
          transform(gramsOf(text),
            g => struct(g.as("g"), TextFunctions.fingerprint(g).as("fp"))),
          s => Bloom.mightContain(s.getField("fp"), b.filter)),
        s => coalesce(element_at(probeMap, s.getField("g")),
          typedlit(Seq.empty[Long])))),
      typedlit(Seq.empty[Long]))
  }

  /** Exact (doc, probe, n_shared ≥ minShared) contamination pairs —
    * q123's output, computed statelessly row by row. */
  def contaminationPairs(docs: DataFrame, idCol: String, textCol: String,
                         b: Benchmark): DataFrame = {
    val ns = s"__graft_dc${callSeq.incrementAndGet()}"
    val (pids, pair) = (s"${ns}_pids", s"${ns}_pair")
    docs.select(col(idCol), probeHits(col(textCol), b).as(pids))
      .select(col(idCol),
        explode(filter(
          transform(array_distinct(col(pids)),
            p => struct(p.as("probe_id"),
              size(filter(col(pids), x => x === p)).cast("long").as("n_shared"))),
          s => s.getField("n_shared") >= b.minShared)).as(pair))
      .select(col(idCol), col(s"$pair.probe_id").as("probe_id"),
        col(s"$pair.n_shared").as("n_shared"))
  }

  /** The curation stage: drops documents sharing ≥ minShared distinct
    * grams with ANY benchmark probe; all other columns pass through
    * (null-text documents share no grams and pass). Stateless, so it
    * runs unchanged on batch and streaming frames. */
  def decontaminate(docs: DataFrame, textCol: String, b: Benchmark): DataFrame = {
    val pids = s"__graft_dc${callSeq.incrementAndGet()}_pids"
    docs.withColumn(pids, probeHits(col(textCol), b))
      .filter(!exists(array_distinct(col(pids)),
        p => size(filter(col(pids), x => x === p)) >= b.minShared))
      .drop(pids)
  }
}
