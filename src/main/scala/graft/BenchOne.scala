package graft

import org.apache.spark.sql.SparkSession

/** Time (and optionally explain) one or more registered queries in ONE
  * warm session — comma-separate names to co-measure a claim query with a
  * stable calibration row (the round-11 verdict-#3 discipline: never pin a
  * wall time without the same-session ratio that lets a later reader
  * normalize out the host window).
  * Usage: runMain graft.BenchOne <name[,name…]> [sfDir] [explain]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // same data-proportional default as Bench — BenchOne exists to
      // reproduce Bench rows, so the partitioning must match
      .config("spark.sql.shuffle.partitions", Tuning.shufflePartitions(sfDir, cpus.toInt))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (doExplain) df.explain("formatted")
      // warm pass per query (codegen/footers/memoized fixtures), untimed
      df.count()
    }
    // reps interleaved across the names, like Bench: a host burst lands on
    // different queries each pass, so medians stay comparable WITHIN the run
    (1 to reps).foreach { i =>
      names.foreach { name =>
        // re-invoke the query fn each rep so per-rep time includes plan
        // construction (what Bench measures), not just re-execution
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"BENCHONE $name rep=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
