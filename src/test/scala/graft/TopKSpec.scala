package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.TopKRows

/** The native grouped top-k aggregate: exact agreement with the window
  * form it optimizes away, the ObjectHashAggregate partial/final plan
  * shape that makes it a k-rows-per-group exchange at scale, SQL-callable
  * registration, and the null/tie/degenerate edge semantics. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 40 groups × 250 rows with deliberate key ties inside every group
    * (key = i % 50 collides five ways per group). */
  private def fixture = (1L to 10000L)
    .map(i => (i % 40, (i % 50).toDouble, i))
    .toDF("g", "key", "id")

  private def windowTopK(k: Int) = {
    import org.apache.spark.sql.expressions.Window
    fixture.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("key").desc, col("id"))))
      .filter(col("rn") <= k)
      .select(col("g"), col("rn").cast("long").as("rank"),
        col("id").as("payload"), col("key"))
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy("g")
    .agg(TopKRows.topK(col("key"), col("id"), k).as("top"))
    .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
    .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
      col("e.payload").as("payload"), col("e.key").as("key"))

  test("agrees with the window form exactly, ties broken by payload") {
    val got = aggTopK(fixture, 7).collect().toSet
    val want = windowTopK(7).collect().toSet
    assert(got === want)
    assert(got.size === 40 * 7)
  }

  test("merge-order independent: pre-shuffled input yields the same set") {
    val got = aggTopK(fixture.repartition(13), 5).collect().toSet
    assert(got === windowTopK(5).collect().toSet)
  }

  test("plan shape: partial/final ObjectHashAggregate, one exchange") {
    val plan = fixture.groupBy("g")
      .agg(TopKRows.topK(col("key"), col("id"), 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size === 2,
      s"expected a partial/final split:\n$plan")
    assert(plan.contains("partial_graft_topk"),
      s"no map-side partial aggregation — the whole point at scale:\n$plan")
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"expected exactly one exchange (of k-row buffers):\n$plan")
  }

  test("SQL registration: graft_topk callable after GraftExtensions.register") {
    GraftExtensions.register(spark)
    fixture.createOrReplaceTempView("topk_fixture")
    val sql = spark.sql(
      """SELECT g, e.payload AS payload, e.key AS key
        |FROM (SELECT g, graft_topk(key, id, 4) AS top
        |      FROM topk_fixture GROUP BY g)
        |LATERAL VIEW explode(top) AS e""".stripMargin)
      .collect().toSet
    val api = aggTopK(fixture, 4).select("g", "payload", "key").collect().toSet
    assert(sql === api)
  }

  test("null keys and null payloads are skipped; all-null group vanishes") {
    val df = Seq[(Long, Option[Double], Option[Long])](
      (1L, Some(5.0), Some(10L)), (1L, None, Some(11L)),
      (1L, Some(7.0), None), (1L, Some(3.0), Some(12L)),
      (2L, None, Some(20L)), (2L, Some(1.0), None))
      .toDF("g", "key", "id")
    val got = aggTopK(df, 3).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // group 1 keeps only its two fully-non-null rows; group 2 has none
    assert(got === Set((1L, 1L, 10L, 5.0), (1L, 2L, 12L, 3.0)))
  }

  test("k past the group size keeps everything, still best-first") {
    val df = Seq((1L, 2.0, 7L), (1L, 9.0, 8L)).toDF("g", "key", "id")
    val rows = aggTopK(df, 100).orderBy("rank")
      .select("payload").as[Long].collect().toSeq
    assert(rows === Seq(8L, 7L))
  }

  test("streaming twin: incremental top-k state equals the batch aggregate") {
    // TypedImperativeAggregate buffers serialize into streaming aggregation
    // state, so the same expression runs incrementally: arrival-order- and
    // batch-boundary-independent because the kept set is (merge proves it)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = fixture.as[(Long, Double, Long)].collect().toList
    val shuffled = new scala.util.Random(7).shuffle(rows)

    val in = MemoryStream[(Long, Double, Long)]
    val q = in.toDF().toDF("g", "key", "id")
      .groupBy("g")
      .agg(TopKRows.topK(col("key"), col("id"), 5).as("top"))
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete")
      .start()
    try {
      shuffled.grouped(777).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("topk_stream")
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("g"), col("pos"), col("e.key"), col("e.payload"))
        .collect().toSet
      val want = fixture.groupBy("g")
        .agg(TopKRows.topK(col("key"), col("id"), 5).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("g"), col("pos"), col("e.key"), col("e.payload"))
        .collect().toSet
      assert(got === want)
      assert(got.size === 40 * 5)
    } finally q.stop()
  }

  test("string payload: graft_topk_str agrees with the window form on real docs") {
    import graft.expressions.TopKStrRows
    import graft.functions.TextFunctions
    val counts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("n")).cache()
    try {
      val got = counts.groupBy(col("doc_id"))
        .agg(TopKStrRows.topK(col("n").cast("double"), col("token"), 3).as("top"))
        .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("doc_id"), (col("pos") + 1).as("rank"),
          col("e.payload").as("token"), col("e.key").cast("long").as("n"))
        .collect().toSet
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        .orderBy(col("n").desc, col("token"))
      val want = counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("token"), col("n"))
        .collect().toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally counts.unpersist()
  }

  test("string payload: unicode ties break on byte order, matching binary collation") {
    import graft.expressions.TopKStrRows
    // same key everywhere: the kept pair is decided purely by the payload
    // tie order, which must be UTF-8 byte order ("Z" < "a" < "ä" < "涛")
    val df = Seq(("a", 1.0), ("ä", 1.0), ("Z", 1.0), ("涛", 1.0))
      .toDF("t", "k")
    val kept = df.groupBy(lit(1).as("g"))
      .agg(TopKStrRows.topK(col("k"), col("t"), 2).as("top"))
      .select(explode(col("top.payload")).as("t"))
      .as[String].collect().toSeq
    assert(kept === Seq("Z", "a"))
  }

  test("graft_topk_str callable from SQL and buffers survive serialization") {
    GraftExtensions.register(spark)
    (1L to 4000L).map(i => (i % 20, s"tok_${i % 97}", (i % 13).toDouble))
      .toDF("g", "t", "sc").createOrReplaceTempView("topk_str_fixture")
    // repartition forces partial buffers through serialize/deserialize
    val sql = spark.sql(
      """SELECT g, e.key AS key, e.payload AS payload
        |FROM (SELECT g, graft_topk_str(sc, t, 5) AS top
        |      FROM topk_str_fixture GROUP BY g)
        |LATERAL VIEW posexplode(top) AS pos, e""".stripMargin)
      .collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("sc").desc, col("t"))
    val want = spark.table("topk_str_fixture")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("g"), col("sc").as("key"), col("t").as("payload"))
      .collect().toSet
    assert(sql === want)
  }

  test("wrong argument types fail analysis, not runtime") {
    GraftExtensions.register(spark)
    fixture.createOrReplaceTempView("topk_fixture")
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_topk(key, id, 0) FROM topk_fixture GROUP BY g")
    }
    assert(ex.getMessage.contains("k must be in"), ex.getMessage)
  }
}
