package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Scale-path behaviors: partition pruning and salted joins. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("date-partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val read = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"no partition filter in plan:\n$plan")
    // pruned read touches a single partition directory
    val expected = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(read.count() === expected && expected > 0)
  }

  test("salted join equals the plain join result") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, "l_orderkey")
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salts = 4)
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("l_quantity")).head.getDouble(0) ===
      plain.agg(sum("l_quantity")).head.getDouble(0))
  }
}
