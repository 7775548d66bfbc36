package graft.ml

import org.apache.spark.sql.SparkSession

/** Regenerates the pinned-center constants used by the oracle-gated scoring
  * query (q51): fits the seed-pinned KMeans on a CANONICAL data layout and
  * prints the centers as Scala literals (Double.toString round-trips
  * exactly, so the printed decimal text parses back to the identical bits
  * in both Spark and DuckDB).
  *
  * The canonical layout matters: k-means|| initialization samples per RDD
  * partition, so a "seed-pinned" fit is only reproducible given identical
  * partition contents AND order. Hash-partitioning on the unique invoice_no
  * and sorting within partitions pins both, independent of the session's
  * core count or shuffle-partition setting.
  *
  * Usage: runMain graft.ml.PinCentersMain [sfDir] [k] [maxIter] [kmeans|bisecting]
  */
object PinCentersMain {

  /** Session-independent layout for reproducible fits. */
  def canonicalLayout(feats: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    feats.repartition(8, org.apache.spark.sql.functions.col("invoice_no"))
      .sortWithinPartitions("invoice_no")
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val k = if (args.length > 1) args(1).toInt else 4
    val maxIter = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bisecting = args.length > 3 && args(3) == "bisecting"
    val feats = canonicalLayout(
      graft.queries.Relational.validFeatures(spark, sfDir)).cache()
    val centers =
      if (bisecting)
        Anomaly.trainBisecting(feats, k, seed = 42L, maxIter = maxIter).clusterCenters
      else
        Anomaly.trainKMeans(feats, k, seed = 42L, maxIter = maxIter).clusterCenters
    println("PINNED_CENTERS = Seq(")
    centers.foreach { c =>
      println("  Seq(" + c.toArray.map(_.toString).mkString(", ") + "),")
    }
    println(")")
    spark.stop()
  }
}
