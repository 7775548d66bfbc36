package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiling entry for the TWS bootstrap gate (q234): runs the
  * same body as `PipelineReplay.pipelineTwsBootstrapGate` but dumps each
  * micro-batch's duration breakdown and state-operator custom metrics
  * (incl. initialStateProcessingTimeMs), at a caller-chosen state
  * partition count — the round-14 profiling harness for the q234 `weak`.
  * Usage: runMain graft.TwsProbe [partitions] [sfDir] [fmgws]
  */
object TwsProbe {
  def main(args: Array[String]): Unit = {
    val parts = if (args.nonEmpty) args(0).toInt else 8
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val useFmgws = args.length > 2 && args(2) == "fmgws"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("spark.graft.statePartitions") = parts.toString
    val name = if (useFmgws) "q224_pipeline_bootstrap" else "q234_pipeline_tws_bootstrap"
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        println(s"PROGRESS batch=${p.batchId} rows=${p.numInputRows} " +
          s"dur=${new java.util.TreeMap[String, java.lang.Long](dur)}")
        p.stateOperators.foreach { so =>
          val cm = new java.util.TreeMap[String, java.lang.Long](so.customMetrics)
          val keep = cm.entrySet().iterator()
          val sb = new StringBuilder
          while (keep.hasNext) {
            val e = keep.next()
            if (e.getValue != 0L && !e.getKey.startsWith("SnapshotLastUploaded"))
              sb.append(e.getKey).append('=').append(e.getValue).append(' ')
          }
          println(s"  OP ${so.operatorName} upd=${so.numRowsUpdated} " +
            s"total=${so.numRowsTotal} commitMs=${so.commitTimeMs} $sb")
        }
      }
    })
    // warm fixtures
    SparkEntry.queries("q216_pipeline_streaming")(spark, sfDir).count()
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROBE parts=$parts rep=$rep rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
