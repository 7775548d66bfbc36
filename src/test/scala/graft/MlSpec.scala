package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Anomaly

class MlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("elbowSelection picks first ratio-exceeding index, else last") {
    // Strictly improving fits: never exceeds 0.7 → last index
    assert(Anomaly.elbowSelection(Seq(100.0, 50.0, 25.0, 12.5)) === 3)
    // cost(2)/cost(1) = 0.9 > 0.7 → index 2
    assert(Anomaly.elbowSelection(Seq(100.0, 50.0, 45.0, 10.0)) === 2)
    // immediate plateau → index 1
    assert(Anomaly.elbowSelection(Seq(100.0, 90.0, 10.0)) === 1)
  }

  test("threshold equals the exact k-th order statistic") {
    import spark.implicits._
    val scores = Seq(5.0, 1.0, 9.0, 7.0, 3.0, 8.0, 2.0).toDF("score")
    // top-3 = {9,8,7} → min 7
    assert(Anomaly.threshold(scores, "score", 3) === 7.0)
    // topK larger than the dataset → global min
    assert(Anomaly.threshold(scores, "score", 100) === 1.0)
  }

  test("minSqdist equals hand-computed distance for a known row") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 3.0, 4.0, 5.0))
      .toDF(Anomaly.featureCols: _*)
    val centers = Seq(Seq(0.0, 0.0, 0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0, 4.0, 6.0))
    val d = df.select(Anomaly.minSqdist(centers).as("d")).head.getDouble(0)
    assert(d === 1.0) // nearest is second center: (5-6)^2
  }

  test("seeded kmeans is deterministic and anomalies are a strict subset") {
    val feats = graft.queries.Relational.validFeatures(spark, sf).cache()
    val m1 = Anomaly.trainKMeans(feats, k = 3, seed = 7L, maxIter = 5)
    val m2 = Anomaly.trainKMeans(feats, k = 3, seed = 7L, maxIter = 5)
    assert(m1.clusterCenters.map(_.toArray.toSeq).toSeq ===
      m2.clusterCenters.map(_.toArray.toSeq).toSeq)
    val ctrs = m1.clusterCenters.toSeq.map(_.toArray.toSeq)
    val scored = feats.withColumn("score", Anomaly.minSqdist(ctrs))
    val t = Anomaly.threshold(scored, "score", 100)
    val n = scored.filter(col("score") > t).count()
    assert(n > 0 && n < feats.count())
    feats.unpersist()
  }

  test("TopKMinAggregator matches orderBy/limit threshold, incl. per-group use") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    val rnd = new scala.util.Random(3)
    val scores = Seq.fill(5000)(rnd.nextDouble() * 1e6)
    val df = scores.zipWithIndex
      .map { case (s, i) => (i % 3, s) }.toDF("g", "score").cache()

    // global: same value as the TakeOrdered path
    val agg = udaf(new graft.ml.TopKMinAggregator(100))
    val viaAgg = df.select(agg(org.apache.spark.sql.functions.col("score")))
      .head.getDouble(0)
    val viaSort = Anomaly.threshold(df, "score", 100)
    assert(viaAgg === viaSort)

    // per-group: expressible only with the aggregator
    val perGroup = df.groupBy("g").agg(agg($"score").as("t"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val expected = scores.zipWithIndex.groupBy(_._2 % 3).map { case (g, vs) =>
      g -> vs.map(_._1).sorted(Ordering[Double].reverse).take(100).last
    }
    assert(perGroup === expected)
    df.unpersist()
  }

  test("threshold on empty input is NaN (no anomalies), not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("score")
    assert(Anomaly.threshold(empty, "score", 10).isNaN)
    // NaN threshold flags nothing
    val scored = Seq(1.0, 2.0).toDF("score")
    import org.apache.spark.sql.functions.{col, lit}
    assert(scored.filter(col("score") > lit(Double.NaN)).count() === 0)
  }

  test("threshold file roundtrip") {
    val p = java.nio.file.Files.createTempFile("thresh", ".txt").toString
    Anomaly.saveThreshold(p, 25089.874540632012)
    assert(Anomaly.loadThreshold(p) === 25089.874540632012)
  }

  test("bisecting kmeans trains and scores") {
    val feats = graft.queries.Relational.validFeatures(spark, sf)
    val m = Anomaly.trainBisecting(feats, k = 2, seed = 7L, maxIter = 5)
    assert(m.clusterCenters.length === 2)
  }
}
