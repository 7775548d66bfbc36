package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cms

/** Count-Min sketch (q94): one-sided estimate guarantee, cell-wise sum
  * merge, and the broadcast-lookup plan. Deterministic sketch — every
  * assertion is an exact pin. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Zipf-ish stream: key k appears ~1000/k times, keys 1..60. */
  private def stream = (1L to 60L).flatMap(k => Seq.fill((1000 / k).toInt)(k))

  test("estimates are one-sided: est >= true count for every key") {
    val items = stream.toDF("key")
    val sk = Cms.sketch(items, col("key"))
    val truth = items.groupBy("key").agg(count(lit(1)).as("cnt"))
    val est = Cms.lookup(sk, truth.select("key"), col("key"))
    val joined = truth.join(est, col("key") === col("probe_key"))
      .select("key", "cnt", "est")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(joined.length === 60)
    joined.foreach { case (k, cnt, est) =>
      assert(est >= cnt, s"key $k: est $est < true $cnt")
    }
    // 60 keys in 4x2048 cells: collisions are possible but the total
    // overestimate is pinned (deterministic hash) — here there are none
    assert(joined.forall { case (_, cnt, est) => est === cnt },
      "60 keys in 8192 cells should sketch exactly on this fixture")
  }

  test("an unseen key estimates 0 (absent cells count as empty)") {
    val sk = Cms.sketch(stream.toDF("key"), col("key"))
    val est = Cms.lookup(sk, Seq(424242L).toDF("key"), col("key"))
      .collect().head.getLong(1)
    assert(est === 0L)
  }

  test("merge = cell-wise sum: sketch(a union b) equals summed shard sketches") {
    val (a, b) = stream.splitAt(stream.size / 3)
    val whole = Cms.sketch(stream.toDF("key"), col("key"))
    val merged = Cms.sketch(a.toDF("key"), col("key"))
      .union(Cms.sketch(b.toDF("key"), col("key")))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells(whole) === cells(merged))
  }

  test("q94: top tokens carry est >= cnt, exact on the gate corpus") {
    val rows = graft.queries.Curation.cmsTokenFreq(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the sf0.001 corpus has ~31 distinct tokens — fewer than the top-100 cap
    assert(rows.length >= 30 && rows.length <= 100, s"got ${rows.length} rows")
    rows.foreach { case (t, cnt, est) =>
      assert(est >= cnt, s"token '$t': est $est < cnt $cnt")
    }
  }

  test("streaming build converges to the batch sketch (sum over micro-batches)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val shuffled = new scala.util.Random(31).shuffle(stream.toList)
    val in = MemoryStream[Long]
    val q = Cms.sketch(in.toDF().withColumnRenamed("value", "key"), col("key"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete")
      .start()
    try {
      shuffled.grouped(499).foreach { b => in.addData(b); q.processAllAvailable() }
      def cells(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val got = cells(spark.table("cms_stream"))
      val want = cells(Cms.sketch(stream.toDF("key"), col("key")))
      assert(got === want, "streamed cells must equal the batch sketch")
    } finally q.stop()
  }

  test("native graft_cms cells equal the composed sketch cell-for-cell (q162 ≡ q94)") {
    graft.GraftExtensions.register(spark)
    val items = stream.toDF("key")
    val composed = Cms.sketch(items, col("key"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cells = items.agg(graft.expressions.CmsCells.cms(col("key")).as("cells"))
      .collect()(0).getSeq[Long](0)
    assert(cells.length === Cms.depth * Cms.width)
    composed.foreach { case ((row, bucket), cnt) =>
      assert(cells(row * Cms.width + bucket.toInt) === cnt,
        s"cell ($row, $bucket) disagrees")
    }
    assert(cells.count(_ > 0L) === composed.size,
      "native sketch must not touch cells the composed sketch leaves empty")
    // total mass: every key increments exactly depth cells
    assert(cells.sum === stream.length.toLong * Cms.depth)
    // merge-order independence + SQL callability
    items.createOrReplaceTempView("cms_items_v")
    val viaSql = spark.sql("SELECT graft_cms(key) AS cells FROM cms_items_v")
      .collect()(0).getSeq[Long](0)
    val viaRepart = items.repartition(19)
      .agg(graft.expressions.CmsCells.cms(col("key")).as("cells"))
      .collect()(0).getSeq[Long](0)
    assert(viaSql === cells && viaRepart === cells)
  }

  test("native graft_cms streaming complete-mode replay equals the batch cells") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val shuffled = new scala.util.Random(53).shuffle(stream)
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("key")
      .agg(graft.expressions.CmsCells.cms(col("key")).as("cells"))
      .writeStream.format("memory").queryName("cms_native_stream")
      .outputMode("complete")
      .start()
    try {
      shuffled.grouped(487).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("cms_native_stream").collect()(0).getSeq[Long](0)
      val want = stream.toDF("key")
        .agg(graft.expressions.CmsCells.cms(col("key")).as("cells"))
        .collect()(0).getSeq[Long](0)
      assert(got === want, "streamed native cells must equal batch")
    } finally q.stop()
  }

  test("join-size estimate: one-sided guarantee and error bound (q117)") {
    // |A ⋈ B| from the two key sketches alone — min over depth rows of
    // the bucket-wise dot product. One-sided: collisions only ADD.
    val sf = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
    val a = Cms.sketch(orders, col("o_custkey"))
    val b = Cms.sketch(cust, col("c_custkey")).withColumnRenamed("cnt", "cnt_b")
    val est = a.join(b, Seq("row", "bucket"))
      .groupBy("row").agg(sum(col("cnt") * col("cnt_b")).as("dot"))
      .agg(min("dot")).collect().head.getLong(0)
    val truth = orders.join(cust, col("o_custkey") === col("c_custkey")).count()
    assert(est >= truth, s"inner-product estimate $est below true size $truth")
    // expected excess ≈ nA·nB/width per row; min over rows sits well
    // under 3× that on real key distributions
    val slack = 3.0 * orders.count() * cust.count() / Cms.width
    assert(est <= truth + slack, s"est $est vs true $truth + slack $slack")
  }

  test("plan: sketch builds in one exchange; lookup broadcasts the sketch") {
    val items = stream.toDF("key")
    val skPlan = Cms.sketch(items, col("key")).queryExecution.executedPlan.toString
    assert(skPlan.split("Exchange hashpartitioning").length - 1 === 1,
      s"sketch should shuffle exactly once:\n$skPlan")
    val lkPlan = Cms.lookup(Cms.sketch(items, col("key")),
        items.distinct(), col("key"))
      .queryExecution.executedPlan.toString
    assert(lkPlan.contains("BroadcastHashJoin"),
      s"lookup should broadcast the bounded sketch:\n$lkPlan")
    assert(!lkPlan.contains("CartesianProduct") && !lkPlan.contains("BroadcastNestedLoopJoin"))
  }
}
