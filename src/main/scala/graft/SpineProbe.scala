package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Scratch A/B for the round-13 verdict #5 question: does q204's eager
  * localCheckpoint cost anything vs the alternatives a registry function
  * could use? Variants, all fresh per rep:
  *   A eager (current): persist daily → build spine+fill → localCheckpoint
  *     result (materializes once) → release daily.
  *   B no-persist, no-checkpoint: the lazy plan recomputes daily twice
  *     (spine bounds + fill join) when the consumer acts.
  *   C leaky persist: persist daily, never release — what r11 measured on
  *     reps 2+ (reads the leaked cache; an executor-memory leak per call).
  */
object SpineProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def daily() = {
      val li = Tables.lineitem(spark, d).select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
          .cast(DecimalType(27, 0)).as("cents"))
      val o = Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderpriority"),
        datediff(col("o_orderdate").cast("date"), to_date(lit("1992-01-01")))
          .cast("long").as("x"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"), col("x"))
        .agg(sum(col("cents")).cast(DecimalType(27, 0)).as("y"))
        .select(col("o_orderpriority"), col("x"), col("y").cast("long").as("cents"))
    }
    def fill(dly: org.apache.spark.sql.DataFrame) = {
      val spine = dly.groupBy("o_orderpriority")
        .agg(min("x").as("lo"), max("x").as("hi"))
        .select(col("o_orderpriority"), explode(sequence(col("lo"), col("hi"))).as("x"))
      spine.join(dly, Seq("o_orderpriority", "x"), "left")
        .select(col("o_orderpriority"), col("x"),
          coalesce(col("cents"), lit(0L)).as("cents"))
    }
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"SPINE $label rep=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    // warm
    fill(daily()).count()
    time("A_eager_checkpoint") {
      val dl = daily().persist()
      try { val out = fill(dl).localCheckpoint(true); val n = out.count()
        out.unpersist(false); n }
      finally dl.unpersist(false)
    }
    time("B_lazy_recompute") { fill(daily()).count() }
    val leaked = daily().persist()
    time("C_leaky_persist") { fill(leaked).count() }
    spark.stop()
  }
}
