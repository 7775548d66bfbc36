package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Serving entry point — the reference's start_pipeline.sh analog: load the
  * artifacts produced by graft.ml.TrainingMain (S4 model + S3 threshold),
  * then run the streaming pipeline over a line source.
  *
  * Usage: runMain graft.streaming.ServeMain <modelDir> <workDir>
  *        [sessionTimeout] [runSeconds]
  * where <modelDir> contains model/ and threshold from TrainingMain.
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val modelDir = args(0)
    val workDir = args(1)
    val sessionTimeout = if (args.length > 2) args(2) else "2 seconds"
    val runSeconds = if (args.length > 3) args(3).toInt else 15

    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // S4 + S3: load the trained centers and threshold once on the driver;
    // they ship to executors as plan literals (the broadcast-variable analog)
    val model = org.apache.spark.ml.clustering.KMeansModel.load(s"$modelDir/model")
    val centers = model.clusterCenters.toSeq.map(_.toArray.toSeq)
    val threshold = graft.ml.Anomaly.loadThreshold(s"$modelDir/threshold")
    println(s"SERVE loaded k=${centers.size} centers, threshold=$threshold")

    val models = InvoicePipeline.Models(centers, threshold, centers, threshold * 2)

    val inDir = s"$workDir/in"
    val outDir = s"$workDir/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    def sink(name: String): (DataFrame, Long) => Unit = (b, _) =>
      b.write.mode("append").parquet(s"$outDir/$name")
    val sinks = new InvoiceSinks {
      def erroneous(b: DataFrame, id: Long): Unit = sink("erroneous")(b, id)
      def cancellations(b: DataFrame, id: Long): Unit = sink("cancellations")(b, id)
      def anomaliesKMeans(b: DataFrame, id: Long): Unit = sink("anomalies_kmeans")(b, id)
      def anomaliesBisecting(b: DataFrame, id: Long): Unit = sink("anomalies_bisect")(b, id)
    }

    val query = InvoicePipeline.run(
      spark.readStream.textFile(inDir), models, sinks, s"$workDir/ckpt",
      sessionTimeout = sessionTimeout,
      trigger = Trigger.ProcessingTime("500 milliseconds"))

    // replay a burst shaped like the training data (per-invoice feature rows
    // land near/far from the learned centers)
    val rnd = new scala.util.Random(7)
    val lines = (1 to 200).flatMap { i =>
      val inv = 800000 + i
      val price = if (i % 17 == 0) 90000.0 + rnd.nextInt(10000) else 1.0 + rnd.nextInt(4000)
      Seq(s"$inv,S1,ITEM,${1 + i % 5},7/19/2011 ${i % 24}:10,$price,cust$i,Spain")
    }
    Simulator.replayToDir(lines.iterator, inDir, linesPerFile = 50)

    Thread.sleep(runSeconds * 1000L)
    query.stop()
    Seq("erroneous", "cancellations", "anomalies_kmeans", "anomalies_bisect").foreach { s0 =>
      val n = try spark.read.parquet(s"$outDir/$s0").count() catch { case _: Exception => 0L }
      println(s"SERVE SINK $s0: $n rows")
    }
    spark.stop()
  }
}
