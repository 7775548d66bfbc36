package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput measurement: pump N synthetic purchase lines
  * through parse → sessionize → classify fan-out and report lines/sec.
  * The reference's producer feeds ~100–200 lines/s (BASELINE.md); this
  * measures how far above that the Structured Streaming pipeline sits on
  * one node.
  *
  * Usage: runMain graft.streaming.ThroughputMain [nLines] [nInvoices]
  */
object ThroughputMain {
  def main(args: Array[String]): Unit = {
    val nLines = if (args.nonEmpty) args(0).toInt else 200000
    val nInvoices = if (args.length > 1) args(1).toInt else 20000

    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .appName("graft-throughput")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val emitted = new java.util.concurrent.atomic.AtomicLong()
    // unified sink: one count job per trigger over the tagged batch
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (b, _) => emitted.addAndGet(b.count())
    // threshold -1 ⇒ every valid invoice scores above it and reaches the
    // kmeans sink, so "all invoices emitted" is observable at the sinks
    val models = InvoicePipeline.Models(
      Seq(Seq(5.0, 1.0, 10.0, 12.0, 20.0)), -1.0,
      Seq(Seq(5.0, 1.0, 10.0, 12.0, 20.0)), 1e12)

    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("tp-ckpt").toString
    // typed univocity route: measured FASTER than the from_csv relational
    // parse on this stream (37.5k vs 23.9k lines/s same-load A/B) — the
    // relational path pays from_csv + the regex field-count guard per line,
    // while the typed flatMap is one tight parser call. Kept as default.
    val q = InvoicePipeline.runUnified(input.toDS(), models, sink, ckpt,
      sessionTimeout = "2 seconds",
      trigger = Trigger.ProcessingTime("1 second"),
      relationalParse = false)

    val lines = (0 until nLines).map { i =>
      val inv = i % nInvoices
      s"$inv,SC$i,ITEM,${i % 10 + 1},7/19/2011 ${i % 24}:15,${(i % 500) / 10.0 + 0.5},cust${inv % 997},Spain"
    }

    val t0 = System.nanoTime()
    lines.grouped(20000).foreach(batch => input.addData(batch))
    // wait until every invoice session has expired and been emitted
    val deadline = System.currentTimeMillis() + 300000
    while (emitted.get() < nInvoices && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()

    println(f"THROUGHPUT lines=$nLines invoices_emitted=${emitted.get()} " +
      f"secs=$secs%.1f lines_per_sec=${nLines / secs}%.0f")
    spark.stop()
  }
}
