package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement instrument (guide §1: measure first, empirically): per
  * registered query, split wall time into PLANNING (analysis + optimization
  * + physical planning, driver-side single-threaded) and EXECUTION, and
  * attribute execution to cluster work via listener totals (jobs launched,
  * task count, summed task time, GC time, shuffle bytes). The gap between
  * wall-exec and max-concurrent task time is scheduling/driver overhead —
  * the quantity the per-query bench medians can't see.
  *
  * Usage: runMain graft.tools.ProfileQueries <name[,name…]|ALL> [sfDir]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPS (default 3).
  * Output: one PROFILE line per query with medians over reps.
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sel = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.Tuning.shufflePartitions(sfDir, cpus.toInt))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0)
    val gcTimeMs = new AtomicLong(0)
    val shufReadB = new AtomicLong(0)
    val shufWriteB = new AtomicLong(0)
    val inputB = new AtomicLong(0)
    val dumpStages = sys.env.get("PROFILE_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        tasks.addAndGet(sc.stageInfo.numTasks)
        taskTimeMs.addAndGet(m.executorRunTime)
        gcTimeMs.addAndGet(m.jvmGCTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputB.addAndGet(m.inputMetrics.bytesRead)
        if (dumpStages) {
          val wall = for {
            a <- sc.stageInfo.completionTime; b <- sc.stageInfo.submissionTime
          } yield a - b
          println(f"STAGE id=${sc.stageInfo.stageId} tasks=${sc.stageInfo.numTasks} " +
            f"wallMs=${wall.getOrElse(-1L)} taskMs=${m.executorRunTime} " +
            f"inMB=${m.inputMetrics.bytesRead / 1048576.0}%.1f " +
            f"srMB=${m.shuffleReadMetrics.totalBytesRead / 1048576.0}%.1f " +
            f"name=${sc.stageInfo.name.takeWhile(_ != '\n').take(90)}")
        }
      }
    })
    def snap(): Seq[Long] = Seq(jobs.get.toLong, tasks.get.toLong,
      taskTimeMs.get, gcTimeMs.get, shufReadB.get, shufWriteB.get, inputB.get)

    if (sys.env.get("PROFILE_STREAM").contains("1"))
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit =
            println(s"SQSTART ${e.name}")
          override def onQueryProgress(e: QueryProgressEvent): Unit = {
            val p = e.progress
            val dur = p.durationMs
            println(s"SQPROG ${p.name} batch=${p.batchId} rows=${p.numInputRows} " +
              s"durationMs=${dur}")
          }
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        })

    val ordered = graft.SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (n, _) => sel == "ALL" || sel.split(',').exists(n.contains)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    ordered.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warm: codegen, footers, fixtures
        val measured = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.queryExecution.executedPlan // force analysis+optimization+planning
          val t1 = System.nanoTime()
          val before = snap()
          df.count()
          val t2 = System.nanoTime()
          val after = snap()
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9, after.zip(before).map { case (a, b) => a - b })
        }
        val plan = median(measured.map(_._1))
        val exec = median(measured.map(_._2))
        val d = measured.map(_._3)
        def m(i: Int) = median(d.map(_(i).toDouble))
        println(f"PROFILE $name plan=$plan%.3f exec=$exec%.3f " +
          f"jobs=${m(0)}%.0f tasks=${m(1)}%.0f taskSec=${m(2) / 1000}%.2f " +
          f"gcSec=${m(3) / 1000}%.2f shufReadMB=${m(4) / 1048576}%.1f " +
          f"shufWriteMB=${m(5) / 1048576}%.1f inputMB=${m(6) / 1048576}%.1f")
      } catch { case e: Throwable =>
        println(s"PROFILE $name FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
