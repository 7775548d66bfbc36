package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic, content-keyed sampling for corpus curation.
  *
  * Training-mix construction needs samples that are (a) reproducible across
  * runs and re-shards, (b) stable under duplicate re-ingestion (a copy of a
  * kept document is kept again, a copy of a dropped one stays dropped), and
  * (c) tunable per stratum (language / source / quality tier) to rebalance
  * the mix. Hashing the CONTENT — not the row position — into a percent
  * bucket gives all three; `rand()`-based sampling gives none.
  *
  * Scale shape: pure row-local projection + filter — no shuffle, no state,
  * embarrassingly parallel at 100 TB. The bucket reuses the 31-bit
  * polynomial fingerprint ([[TextFunctions.fingerprint]]), which DuckDB
  * reproduces bit-identically, so sampling decisions are gate-checkable.
  *
  * Reference capability context: the reference pipeline has no sampler (its
  * simulator replays a CSV wholesale —
  * /root/reference/src/main/scala/es/dmr/uimp/simulation/InvoiceDataProducer.scala);
  * these are the corpus-side operators a training-data pipeline adds.
  */
object Sampling {

  /** Percent bucket in [0, 100) keyed on content. */
  def pctBucket(content: Column): Column =
    TextFunctions.fingerprint(content) % 100

  /** Keep ~pct% of rows, decided by content hash. */
  def uniformSample(df: DataFrame, contentCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct out of range: $pct")
    df.filter(pctBucket(col(contentCol)) < pct)
  }

  /** Per-stratum keep rates (percent), unknown strata fall back to
    * `defaultPct`. Emits the decision bucket so downstream audits can
    * recover WHY a row was kept. Rates are applied as a literal CASE chain
    * (codegen'd, no join): the rate table is config, not data. */
  def stratifiedSample(df: DataFrame, strataCol: String, contentCol: String,
                       rates: Map[String, Int], defaultPct: Int): DataFrame = {
    require((defaultPct +: rates.values.toSeq).forall(p => p >= 0 && p <= 100),
      s"rates out of range: $rates / $defaultPct")
    // sorted for a deterministic plan (Map iteration order is not stable)
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", pctBucket(col(contentCol)))
      .filter(col("bucket") < rate)
  }
}
