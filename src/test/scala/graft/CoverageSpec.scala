package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.batch.InvoiceOps
import graft.ml.Anomaly

/** Covers the remaining SURVEY §2 inventory rows that have no oracle query:
  * S1 CSV batch scan, K3/S4 model persistence, ST8 event-time windows,
  * A-approx sketches. */
class CoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("S1: CSV batch scan with explicit schema parses the retail fixture shape") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/purchases.csv"),
      """invoice_no,stock_code,description,quantity,invoice_date,unit_price,customer_id,country
        |560537,23103,JINGLE BELL HEART DECORATION,24,7/19/2011 12:19,1.65,17779,United Kingdom
        |560538,21507,"ELEPHANT, BIRTHDAY CARD, ",12,7/19/2011 12:19,0.42,16128,United Kingdom
        |C560540,22553,PLASTERS IN TIN,-12,7/19/2011 12:30,1.65,17779,United Kingdom
        |""".stripMargin)
    val df = InvoiceOps.loadPurchasesCsv(spark, dir)
    assert(df.count() === 3)
    assert(df.schema.fieldNames.toSeq === InvoiceOps.purchaseSchema.fieldNames.toSeq)
    val quoted = df.filter(col("invoice_no") === "560538").head
    assert(quoted.getAs[String]("description") === "ELEPHANT, BIRTHDAY CARD, ")
    assert(quoted.getAs[Int]("quantity") === 12)
    assert(df.filter(InvoiceOps.isCancellation(col("invoice_no"))).count() === 1)
  }

  test("featurizePurchases aggregates the CSV schema, legacy flag flips short-date hours") {
    import spark.implicits._
    val purchases = Seq(
      ("I1", 2, "7/1/2011 12:19", 3.0, "c1", "ES"),
      ("I1", 3, "7/1/2011 12:30", 5.0, "c1", "ES"),
      ("I2", 1, "7/19/2011 9:05", 2.0, "c2", "UK"))
      .toDF("invoice_no", "quantity", "invoice_date", "unit_price", "customer_id", "country")
    val correct = InvoiceOps.featurizePurchases(purchases)
      .collect().map(r => r.getAs[String]("invoice_no") -> r.getAs[Double]("time_hour")).toMap
    assert(correct === Map("I1" -> 12.0, "I2" -> 9.0))
    val legacy = InvoiceOps.featurizePurchases(purchases, legacyHourQuirk = true)
      .collect().map(r => r.getAs[String]("invoice_no") -> r.getAs[Double]("time_hour")).toMap
    assert(legacy === Map("I1" -> 2.0, "I2" -> 9.0)) // quirk Q1 drops the tens digit
  }

  test("K3/S4: trained model save/load roundtrip preserves centers") {
    val feats = graft.queries.Relational.validFeatures(spark, sf)
    val m = Anomaly.trainKMeans(feats, k = 3, seed = 11L, maxIter = 5)
    val dir = java.nio.file.Files.createTempDirectory("model").toString + "/km"
    m.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.clustering.KMeansModel.load(dir)
    assert(loaded.clusterCenters.map(_.toArray.toSeq).toSeq ===
      m.clusterCenters.map(_.toArray.toSeq).toSeq)
  }

  test("ST8: event-time sliding cancellation window counts (streaming)") {
    implicit val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[java.sql.Timestamp]
    val counts = graft.streaming.InvoicePipeline.cancellationWindowCounts(
      input.toDF().withColumnRenamed("value", "event_time"),
      window_ = "8 minutes", slide = "1 minute", watermark = "1 minute")
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("cancel_counts").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData(ts(0), ts(1), ts(1), ts(9))
      q.processAllAvailable()
      val rows = spark.sql("SELECT window_start, n FROM cancel_counts")
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      // window [09:54,10:02) holds the 10:00 + both 10:01 events
      assert(rows("2024-01-01 09:54:00.0") === 3L)
      // [10:01,10:09) holds both 10:01 events only
      assert(rows("2024-01-01 10:01:00.0") === 2L)
      // [10:02,10:10) holds only the 10:09 event
      assert(rows("2024-01-01 10:02:00.0") === 1L)
    } finally q.stop()
  }

  test("HLL++ estimate lands within bound; exact column matches exact distinct") {
    val exact = graft.queries.Relational.distinctUsersByType(spark, sf)
      .select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = graft.queries.Relational.approxDistinctUsers(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.keySet === exact.keySet)
    rows.foreach { case (k, (n, ok)) =>
      assert(n === exact(k), s"$k: exact_users $n != ${exact(k)}")
      assert(ok, s"$k: estimate outside 3*rsd of $n")
    }
  }

  test("F1 vs F2: legacy batch hour disagrees with correct hour exactly on short dates") {
    import spark.implicits._
    val df = Seq("7/19/2011 12:19", "7/1/2011 12:19", "12/9/2011 7:45")
      .toDF("d")
      .select(
        InvoiceOps.legacyHour(col("d")).as("legacy"),
        InvoiceOps.hourOf(col("d")).as("correct"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    // "7/1/2011 12:19" has only 9 chars before the hour → legacy drops the
    // tens digit (quirk Q1); 10-char prefixes agree with the correct hour
    assert(df === Seq((12.0, 12.0), (2.0, 12.0), (7.0, 7.0)))
  }
}
