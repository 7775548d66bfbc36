package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every registered query returns rows on sf0.001 (except known-empty)") {
    // anti-join legitimately empty; near-dup scans legitimately empty on
    // random fixture data (planted-pair tests in ExtensionsSpec prove them)
    val mayBeEmpty = Set("q14_customers_without_orders",
      "q25_near_dup_minhash", "q30_embedding_near_dups")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("featurize: line counts sum to lineitem row count") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf).count()
    val sumLines = graft.queries.Relational.featurized(spark, sf)
      .agg(sum(col("line_count"))).head.getLong(0)
    assert(sumLines === li)
  }

  test("topk threshold is a positive scalar") {
    val t = graft.queries.Relational.topkThreshold(spark, sf).head.getDouble(0)
    assert(t > 0.0)
  }

  test("sessionize: per-session event counts sum to total events") {
    import org.apache.spark.sql.functions._
    val total = Tables.events(spark, sf).count()
    val agg = graft.queries.Relational.sessionizeGap(spark, sf)
      .agg(sum(col("n_events"))).head.getLong(0)
    assert(agg === total)
  }

  test("union preserves multiplicity (row count = events count)") {
    assert(graft.queries.Relational.unionBranches(spark, sf).count() ===
      Tables.events(spark, sf).count())
  }
}
