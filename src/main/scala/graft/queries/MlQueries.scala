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

  private def sqdistSql(c: Seq[Double]): String =
    Seq("avg_unit_price", "min_unit_price", "max_unit_price", "time_hour", "number_items")
      .zip(c)
      .map { case (f, v) => s"($f - $v) * ($f - $v)" }
      .mkString(" + ")

  val anomaliesFixedSql: String = s"""
    SELECT invoice_no, score FROM (
      SELECT invoice_no,
             LEAST(${centers.map(c => s"(${sqdistSql(c)})").mkString(", ")}) AS score
      FROM (${Relational.validFeaturesSql.replace("\n", " ")}))
    WHERE score > ${fixedThreshold}"""

  /** M1+M5+P6 end-to-end: seeded KMeans on the invoice features, threshold
    * from the 2000th-largest training distance, emit anomalous invoices. */
  def kmeansAnomalies(s: SparkSession, d: String): DataFrame = {
    val feats = Relational.validFeatures(s, d).cache()
    try {
      val model = Anomaly.trainKMeans(feats, k = 4, seed = 42L, maxIter = 10)
      val ctrs = model.clusterCenters.toSeq.map(_.toArray.toSeq)
      val scored = feats.withColumn("score", Anomaly.minSqdist(ctrs))
      val thresh = Anomaly.threshold(scored, "score", 2000)
      scored.filter(col("score") > lit(thresh)).select(col("invoice_no"))
    } finally feats.unpersist()
  }

  /** M2 variant: BisectingKMeans, top-500 threshold. */
  def bisectingAnomalies(s: SparkSession, d: String): DataFrame = {
    val feats = Relational.validFeatures(s, d).cache()
    try {
      val model = Anomaly.trainBisecting(feats, k = 3, seed = 42L, maxIter = 5)
      val ctrs = model.clusterCenters.toSeq.map(_.toArray.toSeq)
      val scored = feats.withColumn("score", Anomaly.minSqdist(ctrs))
      val thresh = Anomaly.threshold(scored, "score", 500)
      scored.filter(col("score") > lit(thresh)).select(col("invoice_no"))
    } finally feats.unpersist()
  }

  /** M1+M3: the elbow sweep — (k, cost, selected?) for k in 2..6. */
  def kmeansElbow(s: SparkSession, d: String): DataFrame = {
    val feats = Relational.validFeatures(s, d)
    val results = Anomaly.sweep(feats, ks = 2 to 6, seed = 42L, maxIter = 5)
    val sel = Anomaly.elbowSelection(results.map(_._2))
    import s.implicits._
    results.zipWithIndex
      .map { case ((k, cost, _), i) => (k, cost, i == sel) }
      .toDF("k", "cost", "selected")
  }

  val defs: Map[String, QueryDef] = Map(
    "q16_anomalies_fixed"     -> QueryDef(anomaliesFixed _, anomaliesFixedSql),
    "q17_kmeans_anomalies"    -> QueryDef(kmeansAnomalies _, None),
    "q18_kmeans_elbow"        -> QueryDef(kmeansElbow _, None),
    "q19_bisecting_anomalies" -> QueryDef(bisectingAnomalies _, None))
}
