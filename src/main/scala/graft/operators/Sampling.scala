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

  /** Fibonacci multiplicative mixer for fine-grained buckets: SHORT keys
    * (doc ids, titles) never wrap the fingerprint modulus, so their raw
    * hash values are structured — on "text 1".."text 400" NOT ONE value
    * mod 10⁶ lands below 2·10⁵ — and any bucket space finer than the
    * percent scale inherits that bias. Multiplying by the odd constant
    * 2654435761 (⌊2³²/φ⌋, coprime to every power-of-two and 10⁶ bucket
    * count) before reducing spreads them: the same 400 keys then fill a
    * 20% bucket with 73 hits. The product stays < 2⁶² (fingerprint
    * < 2³⁰ · constant < 2³²), exact in 64-bit integers in both engines. */
  val mixC = 2654435761L

  /** Mixed bucket in [0, m) — the fine-grained sibling of [[pctBucket]]. */
  def mixedBucket(content: Column, m: Long): Column =
    (TextFunctions.fingerprint(content) * lit(mixC)) % m

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

  /** Temperature-rebalanced sampling (α = 0.5): keep each stratum at rate
    * ∝ n^(α−1) = k/√n (capped at 1), so sampled counts scale as √n — the
    * standard low-resource-language upweighting for multilingual training
    * mixes (exponentially-smoothed sampling): dominant strata are thinned
    * quadratically harder than rare ones without ever dropping a stratum.
    *
    * α = 0.5 is not just the common default — it is the point on the
    * temperature curve computable EXACTLY: √ is the one power IEEE 754
    * requires correctly rounded, and rate = k/√n is a single division of
    * exact inputs, so both engines derive bit-identical keep thresholds
    * (a general n^t needs libm pow, which carries no such contract).
    *
    * Decisions are content-hashed into [[mixedBucket]]'s million-bucket
    * space (percent buckets are too coarse for rates this unbalanced;
    * the Fibonacci mix is what makes the fine buckets uniform on short
    * keys), so they inherit [[uniformSample]]'s reproducibility under
    * re-sharding and re-ingest.
    *
    * Scale shape: one map-side-combined count per stratum (catalog-stats
    * sized — at 100 TB this comes from the source manifest, not a scan),
    * broadcast back, then a row-local filter. No corpus shuffle. */
  def temperatureSample(df: DataFrame, strataCol: String, contentCol: String,
                        k: Double): DataFrame = {
    require(k > 0, s"temperature scale must be positive: $k")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("graft_n"))
    val keepBelow = floor(lit(1000000.0) *
        least(lit(1.0), lit(k) / sqrt(col("graft_n").cast("double"))))
      .cast("long")
    df.join(broadcast(counts), strataCol)
      .filter(mixedBucket(col(contentCol), 1000000L) < keepBelow)
      .drop("graft_n")
  }

  /** Priority sampling (Duffield–Lund–Thorup): a weight-proportional
    * sample of k rows with unbiased per-item weight estimates, in ONE
    * pass with only top-(k+1) state. Each row gets priority w/u for a
    * deterministic content-hashed uniform u ∈ (0,1]; the sample is the
    * top k priorities, and every kept row's weight estimate is
    * max(w, τ) where τ is the (k+1)-th priority — the classic threshold
    * estimator (VLDB '04 / JACM '07), here made reproducible by hashing
    * the key instead of drawing randoms.
    *
    * This is the weighted companion to [[uniformSample]]: budget-capped
    * corpus subsets where heavy documents (tokens, spend, bytes) must be
    * overrepresented but totals must stay estimable from the sample.
    *
    * Exactness: u = h'/2^20 for h' = [[mixedBucket]](key) + 1 (the mix is
    * what makes u uniform on digit-string keys — raw fingerprints of
    * "1".."500" max out at 52470 of 2^20, collapsing u toward 0 and
    * inflating every priority ~20×), and w·2^20/h' is two IEEE operations
    * on exact inputs — bit-identical cross-engine; τ, max(w, τ) are exact
    * comparisons.
    *
    * Scale shape: TakeOrderedAndProject — per-partition top-(k+1) heaps,
    * merged once; no full sort, no shuffle of the corpus. The τ
    * derivation then runs a single-partition window over k+1 rows
    * (sample-sized, driver-scale by definition). One corpus pass total. */
  def prioritySample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"sample size must be positive: $k")
    val top = df
      .select(col(keyCol), col(weightCol),
        priority(keyCol, weightCol).as("graft_pr"))
      .orderBy(col("graft_pr").desc, col(keyCol))
      .limit(k + 1)
    // k+1 rows: the ungrouped window is a single exchange of a
    // sample-sized frame, not a corpus sort
    val tau = min(col("graft_pr"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    top.withColumn("graft_tau", tau)
      .filter(col("graft_pr") > col("graft_tau"))
      .select(col(keyCol), col(weightCol).as("w"),
        greatest(col(weightCol), col("graft_tau")).as("est_w"))
  }

  /** The shared DLT priority: w · 2²⁰ / (mix(key)+1) — two IEEE operations
    * on exact inputs (the mixed bucket < 2²⁰ is integer-exact, the weight
    * is integral), so Spark and DuckDB derive bit-identical priorities. */
  private def priority(keyCol: String, weightCol: String): Column = {
    val hashed =
      (mixedBucket(col(keyCol).cast("string"), 1048576L) + 1L).cast("double")
    col(weightCol) * lit(1048576.0) / hashed
  }

  /** Per-stratum weighted sample: the top k priorities WITHIN each group —
    * the grouped companion of [[prioritySample]], for per-language /
    * per-source budget caps where heavy rows must be overrepresented
    * inside every stratum independently (a global top-k would starve
    * small strata; a per-stratum uniform sample would ignore weight).
    * Priorities are the same hash-derived w/u, so the selection is
    * reproducible under re-sharding and duplicate re-ingest.
    *
    * Scale shape: one `row_number` window on (stratum, priority), which
    * Spark plans with a PARTIAL WindowGroupLimit below the exchange —
    * each input partition forwards at most k rows per stratum it has
    * seen, so the shuffle moves O(strata · k · partitions) rows, never
    * the corpus. No global sort, no driver state. */
  def groupPrioritySample(df: DataFrame, strataCol: String, keyCol: String,
                          weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"sample size must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("graft_pr").desc, col(keyCol))
    df.select(col(strataCol), col(keyCol), col(weightCol),
        priority(keyCol, weightCol).as("graft_pr"))
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") <= k)
      .select(col(strataCol), col(keyCol), col(weightCol))
  }
}
