package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Ops-parity analog of the reference's start_pipeline.sh + simulator
  * (SURVEY.md §7 step 4): replays purchase-line CSV through the file
  * streaming source into the sessionizing pipeline, fanning results out to
  * four parquet sink directories.
  *
  * Usage: runMain graft.streaming.DemoPipeline <workDir> [sessionTimeout] [runSeconds]
  */
object DemoPipeline {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft-demo")
    val sessionTimeout = if (args.length > 1) args(1) else "2 seconds"
    val runSeconds = if (args.length > 2) args(2).toInt else 20

    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo-pipeline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // production state-store provider: RocksDB keeps session state off
      // the executor heap — the 100 TB posture for long-running keyed state
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val inDir = s"$workDir/in"
    val outDir = s"$workDir/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))

    // unified sink: ONE topic-partitioned parquet write per trigger — the
    // parquet analog of the Kafka writer's native topic-column routing
    val sink: (DataFrame, Long) => Unit = (batch, _) =>
      batch.write.mode("append").partitionBy("topic").parquet(outDir)
    val models = InvoicePipeline.Models(
      kmeansCenters = Seq(Seq(5.0, 1.0, 10.0, 12.0, 20.0)), kmeansThreshold = 2500.0,
      bisectingCenters = Seq(Seq(5.0, 1.0, 10.0, 12.0, 20.0)), bisectingThreshold = 10000.0)

    val lines = spark.readStream.textFile(inDir)
    val query = InvoicePipeline.runUnified(
      lines, models, sink, s"$workDir/ckpt",
      sessionTimeout = sessionTimeout,
      trigger = Trigger.ProcessingTime("500 milliseconds"))

    // Replay a synthetic day of purchases: valid invoices, a parse error,
    // a cancellation, a missing-customer invoice.
    val replay = (1 to 50).flatMap { i =>
      val inv = 560000 + i
      Seq(
        s"$inv,S1,WIDGET,${i % 7 + 1},7/19/2011 ${i % 24}:10,${(i % 40) + 0.5},cust$i,Spain",
        s"$inv,S2,GADGET,${i % 5 + 1},7/19/2011 ${i % 24}:11,${(i % 90) + 1.5},cust$i,Spain")
    } ++ Seq(
      "560900,S1,BAD,notanint,7/19/2011 12:19,1.0,cust9,Spain",
      "C560901,S1,RET,-3,7/19/2011 12:19,5.0,cust10,Spain",
      "560902,S1,NOCUST,2,7/19/2011 12:19,5.0,,Spain")
    Simulator.replayToDir(replay.iterator, inDir, linesPerFile = 20)

    Thread.sleep(runSeconds * 1000L)
    query.stop()

    Seq("facturas_erroneas", "cancelaciones", "anomalias_kmeans",
        "anomalias_bisect_kmeans").foreach { s =>
      val n =
        try spark.read.parquet(outDir).filter(s"topic = '$s'").count()
        catch { case _: Exception => 0L }
      println(s"SINK $s: $n rows")
    }
    spark.stop()
  }
}
