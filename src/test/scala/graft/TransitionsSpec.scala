package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Transitions

/** q210's operator laws: keyed-state transition extraction must equal the
  * batch lag window, including across micro-batch boundaries and at
  * timestamp ties. */
class TransitionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import Transitions.Ev

  private def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)

  test("cross-batch carry: the boundary pair is emitted exactly once") {
    import spark.implicits._
    // user 1's events straddle the two files; user 2 lives in file 1 only
    val f1 = Seq(Ev(1L, ts(10), 100L, "signup"), Ev(1L, ts(20), 101L, "view"),
      Ev(2L, ts(15), 102L, "signup"))
    val f2 = Seq(Ev(1L, ts(30), 103L, "click"), Ev(2L, ts(40), 104L, "view"))
    val dir = java.nio.file.Files.createTempDirectory("trans").toString
    val base = System.currentTimeMillis() - 60000L
    Seq(f1, f2).zipWithIndex.foreach { case (evs, i) =>
      graft.queries.Extensions.writeSingleParquet(
        evs.toDS().toDF(), dir, s"f$i.parquet", mtime = Some(base + i * 1000L))
    }
    val name = "trans_spec_gate"
    val src = spark.readStream.schema(f1.toDS().schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = Transitions.transitionPairs(src.as[Ev])
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    // (view -> click) and (signup -> view for user 2) ONLY exist if state
    // carried the last file-1 event into the file-2 batch
    assert(got === Seq((1L, "signup", "view"), (1L, "view", "click"),
      (2L, "signup", "view")))
  }

  test("batch twin equals the lag window, ties ordered by event_id") {
    import spark.implicits._
    // equal timestamps: order must fall back to event_id, as in q200
    val evs = Seq(Ev(7L, ts(5), 3L, "c"), Ev(7L, ts(5), 1L, "a"),
      Ev(7L, ts(5), 2L, "b"), Ev(7L, ts(9), 4L, "d")).toDS()
    val fromState = Transitions.transitionPairsBatch(evs.toDF())
      .collect().map(p => (p.prev_type, p.next_type)).sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val fromWindow = evs.toDF()
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("prev"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(fromState === Seq(("a", "b"), ("b", "c"), ("c", "d")))
    assert(fromState === fromWindow)
  }
}
