package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Hll

case class HllEvent(event_type: String, user_id: Long)

/** The oracle-exact HLL sketch (q93): register determinism across
  * partitionings and replay orders, estimate accuracy in both the
  * linear-counting and raw regimes, and the streaming variant converging
  * to the batch registers. Everything here is deterministic — the sketch
  * has no RNG — so accuracy assertions are exact pins, not tolerances
  * around flaky sampling. */
class HllSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def regMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Int] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap

  test("registers are identical under repartitioning and row order (mergeable max)") {
    val ev = Tables.events(spark, sf)
    val a = regMap(Hll.registers(ev, Seq("event_type"), col("user_id")))
    val b = regMap(Hll.registers(ev.repartition(17), Seq("event_type"), col("user_id")))
    val c = regMap(Hll.registers(ev.orderBy(desc("value")), Seq("event_type"), col("user_id")))
    assert(a.nonEmpty && a === b && a === c)
  }

  test("registers are idempotent under duplicate delivery") {
    val ev = Tables.events(spark, sf)
    val once = regMap(Hll.registers(ev, Seq("event_type"), col("user_id")))
    val twice = regMap(Hll.registers(ev.union(ev), Seq("event_type"), col("user_id")))
    assert(once === twice)
  }

  test("corrected estimate is within the sketch error bound, both regimes") {
    // linear-counting regime: the real per-type user sets at the gate SF
    val ev = Tables.events(spark, sf)
    val sk = Hll.sketch(Hll.registers(ev, Seq("event_type"), col("user_id")),
      Seq("event_type")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val truth = ev.filter(col("user_id").isNotNull)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.keySet === truth.keySet)
    for ((t, (active, raw)) <- sk) {
      val est = Hll.correctedEstimate(active, raw)
      val err = math.abs(est - truth(t)) / truth(t)
      assert(err < 0.05, s"$t: est $est vs true ${truth(t)} (err $err)")
    }

    // raw regime: 200k sequential ids — the adversarial input for a weak
    // hash (an affine round failed this by 16-58%; the degree-4 poly passes)
    val big = (1L to 200000L).map(HllEvent("seq", _)).toDF()
    val r2 = Hll.sketch(Hll.registers(big, Seq("event_type"), col("user_id")),
      Seq("event_type")).collect().head
    val est2 = Hll.correctedEstimate(r2.getLong(1), r2.getDouble(3))
    val err2 = math.abs(est2 - 200000.0) / 200000.0
    assert(err2 < 0.05, s"sequential-id estimate $est2 (err $err2)")
  }

  test("negative keys hash into the valid (bucket, rank) domain and estimate accurately") {
    // the public API takes any BIGINT: the normalized field arithmetic must
    // keep buckets in [0, m) and ranks in [1, 51] for negative ids too, and
    // normalization must not disturb non-negative keys' hashes
    val neg = (1L to 50000L).map(i => HllEvent("neg", -i)).toDF()
    val regs = Hll.registers(neg, Seq("event_type"), col("user_id"))
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(regs.forall { case (b, _) => b >= 0L && b < Hll.m },
      "bucket out of [0, m)")
    assert(regs.forall { case (_, rk) => rk >= 1 && rk <= Hll.maxRank },
      "rank out of [1, 51]")
    val sk = Hll.sketch(Hll.registers(neg, Seq("event_type"), col("user_id")),
      Seq("event_type")).collect().head
    val est = Hll.correctedEstimate(sk.getLong(1), sk.getDouble(3))
    val err = math.abs(est - 50000.0) / 50000.0
    assert(err < 0.05, s"negative-id estimate $est (err $err)")
  }

  test("streaming registers converge to the batch registers on shuffled replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"))
      .filter(col("user_id").isNotNull)
      .as[HllEvent].collect().toList
    val shuffled = new scala.util.Random(43).shuffle(rows)

    val in = MemoryStream[HllEvent]
    val q = Hll.registers(in.toDF(), Seq("event_type"), col("user_id"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete")
      .start()
    try {
      shuffled.grouped(997).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = regMap(spark.table("hll_stream"))
      val want = regMap(Hll.registers(Tables.events(spark, sf),
        Seq("event_type"), col("user_id")))
      assert(got === want, "streamed registers must equal the batch sketch")
    } finally q.stop()
  }

  test("native graft_hll aggregate matches the composed sketch bit-for-bit (q159 ≡ q93)") {
    val a = graft.queries.Stats.hllSketch(spark, sf)
    val b = graft.queries.Stats.hllNativeSketch(spark, sf)
      .select("event_type", "active", "s_scaled", "raw_est")
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "native-aggregate sketch must equal the composed q93 sketch exactly")
    // and the raw REGISTERS agree with the composed register table: the
    // array slot j carries exactly max(rank) for bucket j, 0 when absent
    graft.GraftExtensions.register(spark)
    val nat = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(graft.expressions.HllRegisters.hll(col("user_id")).as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val composed = regMap(Hll.registers(Tables.events(spark, sf),
      Seq("event_type"), col("user_id")))
    composed.foreach { case ((et, bucket), rank) =>
      assert(nat(et)(bucket.toInt) === rank.toLong,
        s"register ($et, $bucket) disagrees")
    }
    assert(composed.size ===
      nat.toSeq.map { case (_, regs) => regs.count(_ > 0L) }.sum,
      "native sketch must not touch buckets the composed sketch leaves empty")
  }

  test("native graft_hll registers are merge-order independent and SQL-callable") {
    graft.GraftExtensions.register(spark)
    Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .createOrReplaceTempView("hll_ev_v")
    val sqlRes = spark.sql(
      "SELECT event_type, graft_hll(user_id) AS regs FROM hll_ev_v GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val repart = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .repartition(23)
      .groupBy("event_type")
      .agg(graft.expressions.HllRegisters.hll(col("user_id")).as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sqlRes.nonEmpty && sqlRes === repart)
  }

  test("native graft_hll streaming complete-mode replay equals the batch registers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.GraftExtensions.register(spark)

    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"))
      .filter(col("user_id").isNotNull)
      .as[HllEvent].collect().toList
    val shuffled = new scala.util.Random(47).shuffle(rows)

    val in = MemoryStream[HllEvent]
    val q = in.toDF().groupBy("event_type")
      .agg(graft.expressions.HllRegisters.hll(col("user_id")).as("regs"))
      .writeStream.format("memory").queryName("hll_native_stream")
      .outputMode("complete")
      .start()
    try {
      shuffled.grouped(499).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("hll_native_stream")
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val want = Tables.events(spark, sf).filter(col("user_id").isNotNull)
        .groupBy("event_type")
        .agg(graft.expressions.HllRegisters.hll(col("user_id")).as("regs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(got === want, "streamed native registers must equal batch")
    } finally q.stop()
  }

  test("plan: native aggregate runs as ObjectHashAggregate with no row-sized shuffle key") {
    graft.GraftExtensions.register(spark)
    val df = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(graft.expressions.HllRegisters.hll(col("user_id")).as("regs"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"graft_hll must plan as ObjectHashAggregate:\n$plan")
    // exchange is keyed on the GROUP alone (buffers move, not rows) —
    // unlike q93's composed form, whose exchange key is (group, bucket)
    assert(plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(event_type#") && !l.contains("bucket")),
      s"expected a group-keyed exchange carrying sketch buffers:\n$plan")
  }

  test("plan: one data-sized shuffle on (group, bucket), then a bounded finalize") {
    val df = graft.queries.Stats.hllSketch(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(event_type#") && l.contains("bucket#")),
      s"no composite (event_type, bucket) exchange:\n$plan")
    assert(plan.split("Exchange hashpartitioning").length - 1 === 2,
      s"expected exactly 2 hash exchanges (registers + finalize):\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
