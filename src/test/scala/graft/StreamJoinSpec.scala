package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamJoin

final case class AttrEv(event_id: Long, user_id: Long, ts: Timestamp, value: Double)

class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val base = 1600000000000L
  private def ev(id: Long, user: Long, offSec: Int, v: Double = 1.0) =
    AttrEv(id, user, new Timestamp(base + offSec * 1000L), v)

  test("streamed interval join equals the batch twin on the same replayed data") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rnd = new scala.util.Random(7)
    // 5 users, events spread over 5 minutes; lookback 60 s, watermark 5 min
    // (nothing late, whatever the batch schedule)
    val purchases = (1 to 60).map(i => ev(i, rnd.nextInt(5), rnd.nextInt(300)))
    val clicks = (1 to 60).map(i => ev(1000L + i, rnd.nextInt(5), rnd.nextInt(300)))

    val pIn = MemoryStream[AttrEv]
    val cIn = MemoryStream[AttrEv]
    val q = StreamJoin.attributionPairs(pIn.toDF(), cIn.toDF(),
        lookback = "60 seconds", delay = "5 minutes")
      .writeStream.format("memory").queryName("attr_out").outputMode("append")
      .start()
    try {
      val pShuffled = rnd.shuffle(purchases.toList)
      val cShuffled = rnd.shuffle(clicks.toList)
      pShuffled.grouped(20).zipAll(cShuffled.grouped(20), Nil, Nil).foreach {
        case (pb, cb) =>
          if (pb.nonEmpty) pIn.addData(pb)
          if (cb.nonEmpty) cIn.addData(cb)
          q.processAllAvailable()
      }

      val got = spark.table("attr_out")
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val want = StreamJoin.attributionPairs(
          purchases.toDF(), clicks.toDF(), lookback = "60 seconds")
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(want.nonEmpty, "fixture must produce at least one attributed pair")
      assert(got === want)
    } finally q.stop()
  }

  test("streamed LEFT-OUTER interval join: matured nulls equal the batch twin (q194)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rnd = new scala.util.Random(19)
    // half the users never click — their purchases must surface as null rows
    val purchases = (1 to 40).map(i => ev(i, rnd.nextInt(10), rnd.nextInt(200)))
    val clicks = (1 to 40).map(i => ev(1000L + i, rnd.nextInt(5), rnd.nextInt(200)))

    val pIn = MemoryStream[AttrEv]
    val cIn = MemoryStream[AttrEv]
    val q = StreamJoin.attributionPairsOuter(pIn.toDF(), cIn.toDF(),
        lookback = "60 seconds", delay = "30 seconds")
      .writeStream.format("memory").queryName("attr_outer").outputMode("append")
      .start()
    try {
      pIn.addData(rnd.shuffle(purchases.toList))
      cIn.addData(rnd.shuffle(clicks.toList))
      q.processAllAvailable()
      // outer rows for unmatched purchases emit only once the CLICK
      // watermark has passed their interval — push both watermarks far
      // beyond every fixture timestamp, then drop the sentinels
      pIn.addData(ev(9998L, 99, 100000))
      cIn.addData(ev(9999L, 99, 100000))
      q.processAllAvailable()

      def pairSet(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("purchase_id") < 9000)
        .select(col("purchase_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val got = pairSet(spark.table("attr_outer"))
      val want = pairSet(StreamJoin.attributionPairsOuter(
        purchases.toDF(), clicks.toDF(), lookback = "60 seconds"))
      assert(want.exists(_._2 == -1L), "fixture must leave purchases unattributed")
      assert(want.exists(_._2 > 0L), "fixture must attribute some purchases")
      assert(got === want)
    } finally q.stop()
  }

  test("watermark + interval bound evicts join state (no unbounded growth)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val pIn = MemoryStream[AttrEv]
    val cIn = MemoryStream[AttrEv]
    // tight bounds: 10 s lookback, 10 s watermark delay
    val q = StreamJoin.attributionPairs(pIn.toDF(), cIn.toDF(),
        lookback = "10 seconds", delay = "10 seconds")
      .writeStream.format("memory").queryName("attr_state").outputMode("append")
      .start()
    try {
      // 40 batches, each advancing event time 30 s — every batch's rows are
      // beyond eviction range of the previous batch's
      (0 until 40).foreach { b =>
        val t = b * 30
        pIn.addData(ev(b.toLong, user = 1, offSec = t))
        cIn.addData(ev(1000L + b, user = 1, offSec = t))
        q.processAllAvailable()
      }
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty, "interval join must run a stateful operator")
      val total = state.map(_.numRowsTotal).sum
      // 80 rows fed; bounded state keeps only the still-joinable tail
      assert(total < 20, s"state should stay bounded, holds $total rows")
    } finally q.stop()
  }

  test("q66 last-touch reduction: window bounds and latest-click-wins") {
    import spark.implicits._
    // purchase at t=100, lookback 60 s ⇒ window is (40, 100]:
    // t=40 excluded (strict lower bound), t=41 and t=100 included
    // (inclusive upper), t=101 excluded (after the purchase)
    val p = Seq(ev(1, 1, 100)).toDF()
    val c = Seq(ev(10, 1, 40), ev(11, 1, 41), ev(12, 1, 100), ev(13, 1, 101)).toDF()
    val pairs = StreamJoin.attributionPairs(p, c, lookback = "60 seconds")
    val rows = pairs.collect()
    assert(rows.map(_.getLong(3)).toSet === Set(11L, 12L),
      "interval bounds must be (purchase_ts - lookback, purchase_ts]")
    // the reduction in q66 (rank-1 on click_ts desc) picks id 12
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id"))
      .orderBy(col("click_ts").desc, col("click_id").desc)
    val last = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).head()
    assert(last.getLong(3) === 12L, "latest in-window click is the last touch")
  }
}
