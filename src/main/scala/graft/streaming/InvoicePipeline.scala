package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ml.Anomaly

/** Where each of the four result streams goes (ST10/K1). In production each
  * is a Kafka topic; tests inject in-memory collectors. */
trait InvoiceSinks extends Serializable {
  def erroneous(batch: DataFrame, batchId: Long): Unit
  def cancellations(batch: DataFrame, batchId: Long): Unit
  def anomaliesKMeans(batch: DataFrame, batchId: Long): Unit
  def anomaliesBisecting(batch: DataFrame, batchId: Long): Unit
}

/** The real-time pipeline (SURVEY.md §3.2) on Structured Streaming.
  *
  * One stateful query, one `foreachBatch` router — NOT four independent
  * queries, which would each run their own copy of the session state store
  * (SURVEY.md §7 hard parts). The batch DataFrame is persisted across the
  * 4-way fan-out so the sessionizer output is computed once per trigger.
  */
object InvoicePipeline {

  /** Model bundle: centers + threshold per algorithm (ST9). Centers ride in
    * the task closure as plan literals — the modern form of the reference's
    * broadcast variables. */
  final case class Models(
      kmeansCenters: Seq[Seq[Double]], kmeansThreshold: Double,
      bisectingCenters: Seq[Seq[Double]], bisectingThreshold: Double)

  /** S2: Kafka source wrapper (connector jar required at runtime). */
  def kafkaLines(spark: SparkSession, brokers: String, topic: String): Dataset[String] = {
    import spark.implicits._
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .load()
      .selectExpr("CAST(value AS STRING)").as[String]
  }

  /** K1: Kafka sink for a single-column value batch. */
  def toKafka(batch: DataFrame, brokers: String, topic: String): Unit =
    batch.selectExpr("CAST(NULL AS STRING) AS key", "value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()

  /** Classify + score one micro-batch of finished invoices and fan out. */
  def routeBatch(models: Models, sinks: InvoiceSinks)(batch: Dataset[InvoiceResult], batchId: Long): Unit = {
    val df = batch.toDF().persist()
    try {
      // (a) erroneous: "invoiceNo,reason" wire shape (InvoicePipeline.scala:384)
      val erroneous = df.filter(col("status") === "error")
        .select(concat_ws(",", col("invoiceNo"), col("reason")).as("value"))
      if (!erroneous.isEmpty) sinks.erroneous(erroneous, batchId)

      val valid = df.filter(col("status") === "valid")

      // (b) cancellations: bare invoiceNo (P5)
      val cancels = valid.filter(col("invoiceNo").startsWith("C"))
        .select(col("invoiceNo").as("value"))
      if (!cancels.isEmpty) sinks.cancellations(cancels, batchId)

      // (c)/(d) anomaly candidates scored against both models (P6)
      val candidates = valid.filter(!col("invoiceNo").startsWith("C"))
        .select(col("invoiceNo"),
          col("avgUnitPrice").as("avg_unit_price"),
          col("minUnitPrice").as("min_unit_price"),
          col("maxUnitPrice").as("max_unit_price"),
          col("time").as("time_hour"),
          col("numberItems").as("number_items"))

      val km = candidates
        .filter(Anomaly.minSqdist(models.kmeansCenters) > models.kmeansThreshold)
        .select(col("invoiceNo").as("value"))
      if (!km.isEmpty) sinks.anomaliesKMeans(km, batchId)

      val bk = candidates
        .filter(Anomaly.minSqdist(models.bisectingCenters) > models.bisectingThreshold)
        .select(col("invoiceNo").as("value"))
      if (!bk.isEmpty) sinks.anomaliesBisecting(bk, batchId)
    } finally df.unpersist()
  }

  /** Single-pass router: tag every result row with its destination topic
    * and emit ONE (topic, value) DataFrame per micro-batch. One downstream
    * write serves all four destinations — the Kafka writer natively routes
    * on a `topic` column, and a parquet sink partitions by it — so each
    * trigger costs one job instead of the classic path's
    * persist + 4×(isEmpty + write). Rows that match no branch (valid,
    * non-cancellation, non-anomalous invoices) are dropped, exactly like
    * the 4-sink path. */
  def routeBatchUnified(models: Models)(batch: Dataset[InvoiceResult]): DataFrame = {
    val df = batch.toDF()
    val isErr = col("status") === "error"
    val isCancel = col("status") === "valid" && col("invoiceNo").startsWith("C")
    val candidate = col("status") === "valid" && !col("invoiceNo").startsWith("C")
    val features = Seq(
      col("avgUnitPrice").as("avg_unit_price"),
      col("minUnitPrice").as("min_unit_price"),
      col("maxUnitPrice").as("max_unit_price"),
      col("time").as("time_hour"),
      col("numberItems").as("number_items"))
    val scoredKm = Anomaly.minSqdist(models.kmeansCenters)
    val scoredBk = Anomaly.minSqdist(models.bisectingCenters)
    val tagged = df.select(
        (Seq(col("invoiceNo"), col("reason"), col("status")) ++ features): _*)
      .withColumn("topics", array(
        when(isErr, lit("facturas_erroneas")),
        when(isCancel, lit("cancelaciones")),
        when(candidate && scoredKm > models.kmeansThreshold, lit("anomalias_kmeans")),
        when(candidate && scoredBk > models.bisectingThreshold, lit("anomalias_bisect_kmeans"))))
      .withColumn("topic", explode(col("topics")))
      .filter(col("topic").isNotNull)
    tagged.select(col("topic"),
      when(col("topic") === "facturas_erroneas",
        concat_ws(",", col("invoiceNo"), col("reason")))
        .otherwise(col("invoiceNo")).as("value"))
  }

  /** Compatibility adapter: split a unified (topic, value) batch back into
    * the 4-sink API. Classification + scoring ran ONCE upstream in the
    * single-pass router; this only pays one persist + four cheap topic
    * filters over the already-tagged output. */
  def adaptUnified(sinks: InvoiceSinks)(batch: DataFrame, batchId: Long): Unit = {
    val df = batch.persist()
    try {
      def emit(topic: String, f: (DataFrame, Long) => Unit): Unit = {
        val sub = df.filter(col("topic") === topic).select(col("value"))
        if (!sub.isEmpty) f(sub, batchId)
      }
      emit("facturas_erroneas", sinks.erroneous)
      emit("cancelaciones", sinks.cancellations)
      emit("anomalias_kmeans", sinks.anomaliesKMeans)
      emit("anomalias_bisect_kmeans", sinks.anomaliesBisecting)
    } finally df.unpersist()
  }

  /** ST1/ST2: run the full pipeline over a raw-line stream. The DEFAULT
    * path is the unified single-pass router (one tagged projection per
    * trigger); the 4-sink API is served through adaptUnified. `routeBatch`
    * remains only as the classic per-sink formulation, equivalence-tested
    * in UnifiedRouterSpec. */
  def run(
      lines: Dataset[String],
      models: Models,
      sinks: InvoiceSinks,
      checkpointDir: String,
      sessionTimeout: String = Sessionizer.DefaultTimeout,
      trigger: Trigger = Trigger.ProcessingTime("20 seconds"))
      (implicit spark: SparkSession): StreamingQuery =
    runUnified(lines, models, adaptUnified(sinks), checkpointDir,
      sessionTimeout, trigger)

  /** Unified-sink variant of run: one (topic, value) DataFrame per trigger.
    * `relationalParse` selects the codegen from_csv parse (throughput) over
    * the typed univocity route (quirk-exact default). */
  def runUnified(
      lines: Dataset[String],
      models: Models,
      sink: (DataFrame, Long) => Unit,
      checkpointDir: String,
      sessionTimeout: String = Sessionizer.DefaultTimeout,
      trigger: Trigger = Trigger.ProcessingTime("20 seconds"),
      relationalParse: Boolean = false,
      // swap the sessionizer onto the transformWithState state machine
      // (SessionizerTws.ProcTimeSessionProcessor — ListState appends per
      // batch instead of GroupState blob rewrites); same semantics, used
      // by the throughput/state-scale rigs for the fMGWS-vs-TWS pair
      tws: Boolean = false)
      (implicit spark: SparkSession): StreamingQuery = {
    import spark.implicits._
    val sessions =
      if (!tws) Sessionizer.fromRawLines(lines, sessionTimeout, relationalParse)
      else {
        val events =
          if (relationalParse) PurchaseCsv.routeRelational(lines)
          else lines.flatMap(PurchaseCsv.route _)
        val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
          .stringToInterval(
            org.apache.spark.unsafe.types.UTF8String.fromString(sessionTimeout))
        val timeoutMs =
          iv.months * 2592000000L + iv.days * 86400000L + iv.microseconds / 1000L
        SessionizerTws.sessionizeProcTime(events, timeoutMs)
      }
    sessions.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: Dataset[InvoiceResult], batchId: Long) =>
        sink(routeBatchUnified(models)(batch), batchId))
      .start()
  }

  /** ST8: event-time rebuild of the 8-minute/1-minute sliding cancellation
    * count (the reference's windows are processing-time; we stamp ingest
    * time and window that — SURVEY.md §2.7 ST8). */
  def cancellationWindowCounts(cancellations: DataFrame,
                               window_ : String = "8 minutes",
                               slide: String = "1 minute",
                               watermark: String = "1 minute"): DataFrame =
    cancellations
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))
}
