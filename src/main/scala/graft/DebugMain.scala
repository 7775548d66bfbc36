package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling entry for stage-level timing during development. */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DEBUG $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    val buckets = time("buckets") {
      val b = graft.operators.Dedup.lshBuckets(docs, "doc_id", "text").persist()
      println(s"DEBUG bucket rows ${b.count()}"); b
    }
    val pairs = time("pairs") {
      val p = graft.operators.Dedup.lshCandidatePairs(docs, "doc_id", "text").persist()
      println(s"DEBUG candidate pairs ${p.count()}"); p
    }
    time("verify") {
      println("DEBUG verified " +
        graft.operators.Dedup.nearDuplicates(docs, "doc_id", "text", 0.2).count())
    }
    spark.stop()
  }
}
