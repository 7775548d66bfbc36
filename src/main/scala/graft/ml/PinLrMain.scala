package graft.ml

import org.apache.spark.sql.SparkSession

/** Regenerates the pinned logistic-regression constants used by the
  * oracle-gated scoring query (q130): fits the seed-pinned classifier on
  * the canonical layout and prints the coefficients as Scala literals
  * (Double.toString round-trips exactly; the SQL twin re-parses them via
  * CAST('…' AS DOUBLE), the decimal-literal-safe DuckDB path).
  *
  * Usage: runMain graft.ml.PinLrMain [sfDir]
  */
object PinLrMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val feats = QualityLr.canonicalLayout(
      QualityLr.features(graft.Tables.documents(spark, sfDir))).cache()
    val (w, b) = QualityLr.train(feats)
    println("PINNED_LR_WEIGHTS = Seq(" + w.map(_.toString).mkString(", ") + ")")
    println("PINNED_LR_INTERCEPT = " + b.toString)
    feats.unpersist()
    spark.stop()
  }
}
