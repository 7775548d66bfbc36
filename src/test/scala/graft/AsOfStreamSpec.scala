package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{AsOfBuffer, AsOfEvent, AsOfJoined, AsOfStream}

final case class LeftEv(lid: Long)
final case class Tick(rid: Long, v: Double)

class AsOfStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def lev(key: String, tMs: Long, lid: Long) =
    AsOfEvent[LeftEv, Tick](key, new Timestamp(tMs), 0L, Some(LeftEv(lid)), None)
  private def rev(key: String, tMs: Long, rid: Long, v: Double) =
    AsOfEvent[LeftEv, Tick](key, new Timestamp(tMs), rid, None, Some(Tick(rid, v)))

  test("advance: emits only watermark-passed lefts, matches backward-inclusive with tie-break") {
    val empty = AsOfBuffer[LeftEv, Tick](Nil, Nil)
    val events = Seq(
      rev("k", 1000, 1, 1.0), rev("k", 1000, 2, 2.0), // tie at t=1000 → rid 2
      lev("k", 1000, 10),                             // inclusive at equal time
      lev("k", 5000, 11),                             // still pending at wm=2000
      rev("k", 4000, 3, 3.0))
    val (st, out) = AsOfStream.advance(empty, events, watermarkMs = 2000, key = "k")
    assert(out.map(j => (j.left.lid, j.asof.map(_.rid))) === List((10L, Some(2L))))
    assert(st.lefts.map(_._2.lid) === List(11L))
    // right at t=4000 is still live; of the settled t=1000 pair only the
    // winner (rid 2) survives pruning
    assert(st.rights.map(_._2).sorted === List(2L, 3L))
  }

  test("advance: left with no prior right emits None; state empties at high watermark") {
    val empty = AsOfBuffer[LeftEv, Tick](Nil, Nil)
    val (st1, out1) = AsOfStream.advance(empty, Seq(lev("k", 1000, 7)), 5000, "k")
    assert(out1.map(j => (j.left.lid, j.asof)) === List((7L, None)))
    assert(st1.lefts.isEmpty)
    // a lone settled right is retained (it may match a future left)…
    val (st2, _) = AsOfStream.advance(st1, Seq(rev("k", 2000, 5, 1.0)), 5000, "k")
    assert(st2.rights.map(_._2) === List(5L))
    // …and a younger settled right replaces it
    val (st3, _) = AsOfStream.advance(st2, Seq(rev("k", 3000, 6, 1.0)), 5000, "k")
    assert(st3.rights.map(_._2) === List(6L))
  }

  test("streaming as-of equals the batch as-of on the same replayed data") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rnd = new scala.util.Random(11)
    val base = 1600000000000L
    // event times span 40 s; watermark delay 40 s ⇒ nothing in the replay
    // is ever late, whatever order the batches arrive in
    val lefts = (1 to 80).map { i =>
      (s"k${rnd.nextInt(5)}", base + rnd.nextInt(40) * 1000L, i.toLong)
    }
    val rights = (1 to 80).map { i =>
      (s"k${rnd.nextInt(5)}", base + rnd.nextInt(40) * 1000L, 1000L + i, rnd.nextInt(100).toDouble)
    }

    val events = rnd.shuffle(
      lefts.map { case (k, t, lid) => lev(k, t, lid) } ++
        rights.map { case (k, t, rid, v) => rev(k, t, rid, v) }).toList

    val input = MemoryStream[AsOfEvent[LeftEv, Tick]]
    val q = AsOfStream.asOfBackwardStream(input.toDS(), "40 seconds")
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    try {
      events.grouped(40).foreach { batch => input.addData(batch); q.processAllAvailable() }
      // sentinel right far in the future pushes the watermark past every
      // left; the engine then runs a no-data batch that fires the timeouts
      input.addData(rev("zz", base + 120000L, 9999L, 0.0))
      q.processAllAvailable()

      val got = spark.table("asof_out").as[AsOfJoined[LeftEv, Tick]]
        .collect().map(j => j.left.lid -> j.asof.map(_.rid)).toMap

      val batchOut = graft.operators.AsOf.asOfBackward(
        lefts.toDF("k", "t", "lid"), rights.toDF("k", "t", "rid", "v"),
        keyCol = "k", leftTimeCol = "t", rightTimeCol = "t",
        carry = Seq("rid"), tieBreak = "rid")
        .collect().map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

      assert(got.size === lefts.size, s"streamed ${got.size} of ${lefts.size} lefts")
      assert(got === batchOut)
    } finally q.stop()
  }
}
