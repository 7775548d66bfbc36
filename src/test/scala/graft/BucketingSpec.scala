package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("co-bucketed join plans without any shuffle exchange") {
    Bucketing.writeBucketed(Tables.lineitem(spark, sf)
      .withColumnRenamed("l_orderkey", "okey"), "graft_li_b", "okey", 4)
    Bucketing.writeBucketed(Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", "okey"), "graft_o_b", "okey", 4)

    val joined = Bucketing.bucketedJoin(spark, "graft_li_b", "graft_o_b", "okey")
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.toLowerCase.contains("bucket"),
      s"expected bucketed scan:\n$plan")

    // correctness: same row count as the plain join
    val plain = Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
      col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() === plain.count())
  }

  test("q197: the gate query's join is exchange-free on both fact sides") {
    val q = graft.queries.ScaleJoins.bucketedRevenue(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    val joinBlock = plan.split("SortMergeJoin")
    assert(joinBlock.length >= 2, s"expected a SortMergeJoin:\n$plan")
    // below the join: bucketed scans, no hash-partitioning exchange; the
    // only exchange in the whole plan is the tiny status aggregate's
    assert(joinBlock.last.split('\n')
      .count(_.contains("Exchange hashpartitioning")) === 0,
      s"bucketed join children must not shuffle:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.toLowerCase.contains("bucket"),
      s"expected bucketed scans:\n$plan")
    assert(q.count() > 0)
  }
}
