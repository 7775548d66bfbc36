package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling entry for stage-level timing during development. */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DEBUG $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val lines = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(concat_ws(",",
        col("l_orderkey").cast("string"),
        col("l_partkey").cast("string"),
        lit("ITEM"),
        when(col("l_linenumber") === 7, lit("x"))
          .otherwise(col("l_quantity").cast("long").cast("string")),
        date_format(col("o_orderdate"), "M/d/yyyy H:mm"),
        round(col("l_extendedprice")).cast("long").cast("string"),
        concat(lit("c"), col("o_custkey").cast("string")),
        lit("ES")).as("value"))
      .as[String]
    // warm the readers/codegen once
    time("warm full")(queries.PipelineReplay.pipelineReplay(spark, sfDir).count())
    time("manufacture only")(lines.count())
    val events = graft.streaming.PurchaseCsv.routeRelational(lines)
    time("manufacture+route")(events.count())
    time("manufacture+route relational again")(
      graft.streaming.PurchaseCsv.routeRelational(lines).count())
    time("manufacture+route typed")(
      lines.flatMap(graft.streaming.PurchaseCsv.route _).count())
    time("manufacture+route typed again")(
      lines.flatMap(graft.streaming.PurchaseCsv.route _).count())
    time("full replay") {
      queries.PipelineReplay.pipelineReplay(spark, sfDir).count()
    }
    time("full replay again") {
      queries.PipelineReplay.pipelineReplay(spark, sfDir).count()
    }
    spark.stop()
  }
}
