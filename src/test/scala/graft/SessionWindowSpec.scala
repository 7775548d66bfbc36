package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SessionWindows
import graft.queries.Extensions

case class SessEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp)

/** Native session_window sessionization vs the q87 batch window form:
  * same sessions on real data, same boundary behavior at exactly-gap
  * spacing, and streaming convergence on shuffled replay. */
class SessionWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def sessSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("user_id", "n_events", "start_us", "span_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("session_window sessions equal the q87 window-form sessions on the gate data") {
    val native = sessSet(SessionWindows.userSessions(
      Tables.events(spark, sf), Extensions.sessionGapUs))
    val batch = sessSet(Extensions.eventSessions(spark, sf))
    assert(native.nonEmpty && native === batch)
  }

  test("q129 plan: one hash exchange on user_id, no sort-window pass") {
    // the scale contract vs q87's lag→cumsum form: the merging session
    // aggregate needs the user_id shuffle and NOTHING else — no Window
    // operator, no extra exchange. (Spark plans the merge as partial +
    // final aggregate around the single exchange.)
    val plan = graft.queries.SessionWindowGate
      .sessionWindowNative(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"q129 must shuffle exactly once:\n$plan")
    assert(!plan.contains("Window"), s"q129 must not use a window operator:\n$plan")
  }

  test("boundary: events exactly G apart share a session in BOTH forms") {
    val g = Extensions.sessionGapUs
    def ev(id: Long, us: Long) =
      SessEvent(id, 1L, new java.sql.Timestamp(us / 1000)) // ms precision is enough here
    // 0, G, 2G: all exactly at the keep-boundary -> ONE session of span 2G;
    // then 2G + (G+1): strictly beyond -> a second session
    val rows = Seq(ev(1, 0), ev(2, g), ev(3, 2 * g), ev(4, 3 * g + 1000))
    val df = rows.toDF()
    val native = sessSet(SessionWindows.userSessions(df, g))
    val batch = sessSet(Extensions.eventSessionsOn(df))
    assert(native === batch)
    assert(native === Set((1L, 3L, 0L, 2 * g), (1L, 1L, 3 * g + 1000, 0L)))
  }

  test("streaming session_window converges to the batch sessions on shuffled replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
      .as[SessEvent].collect().toList
    val shuffled = new scala.util.Random(47).shuffle(rows)

    val in = MemoryStream[SessEvent]
    val q = SessionWindows.userSessions(in.toDF(), Extensions.sessionGapUs)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("complete")
      .start()
    try {
      shuffled.grouped(1499).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = sessSet(spark.table("sess_stream"))
      val want = sessSet(Extensions.eventSessions(spark, sf))
      assert(got === want, "streamed sessions must converge to the batch result")
    } finally q.stop()
  }
}
