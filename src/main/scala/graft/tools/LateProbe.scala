package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the q243 late-data gate: prints per-batch progress
  * (input rows, watermark, dropped counts) to diagnose batching. */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val dir = graft.queries.Extensions.probeLateReplay(spark, d)
    println(s"[probe] dir=$dir")
    new java.io.File(dir).listFiles().sortBy(_.getName).foreach(f =>
      println(s"[probe] ${f.getName} mtime=${f.lastModified()} len=${f.length()}"))
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val agg = src.withWatermark("ts", "100 seconds")
      .groupBy(window(col("ts"), "60 seconds"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("lateprobe")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.recentProgress.foreach { p =>
      val so = p.stateOperators.map(o =>
        s"dropped=${o.numRowsDroppedByWatermark} rowsTotal=${o.numRowsTotal}").mkString(";")
      println(s"[probe] batch=${p.batchId} in=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} $so")
    }
    q.explain(true)
    q.stop()
    spark.stop()
  }
}
