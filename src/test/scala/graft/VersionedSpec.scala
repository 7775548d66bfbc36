package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Versioned

/** Versioned keyed table (q192): time-travel reads, tombstone and
  * re-insert semantics, the compaction law, and the one-shuffle plan. */
class VersionedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("vlog").toString + "/log"

  private def log3(): String = {
    val root = freshRoot()
    // v0: keys 1..4
    Versioned.commit(Seq((1L, "a", "u"), (2L, "b", "u"), (3L, "c", "u"),
      (4L, "d", "u")).toDF("k", "val", "_op"), root, "k", 0)
    // v1: update 2, delete 3
    Versioned.commit(Seq((2L, "B", "u"), (3L, "c", "d"))
      .toDF("k", "val", "_op"), root, "k", 1)
    // v2: re-insert 3 (after delete), insert 5, delete 1
    Versioned.commit(Seq((3L, "C", "u"), (5L, "e", "u"), (1L, "a", "d"))
      .toDF("k", "val", "_op"), root, "k", 2)
    root
  }

  private def state(root: String, v: Int): Map[Long, String] =
    Versioned.readAt(spark, root, "k", v).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("time travel: every version reconstructs exactly") {
    val root = log3()
    assert(state(root, 0) === Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    assert(state(root, 1) === Map(1L -> "a", 2L -> "B", 4L -> "d"))
    assert(state(root, 2) === Map(2L -> "B", 3L -> "C", 4L -> "d", 5L -> "e"))
  }

  test("compaction law: compacted base at v0 equals the original at vN") {
    val root = log3()
    val compacted = freshRoot()
    Versioned.compact(spark, root, "k", 2, compacted)
    assert(state(compacted, 0) === state(root, 2))
    // and the compacted log keeps evolving: one more delta on top
    Versioned.commit(Seq((4L, "D", "u")).toDF("k", "val", "_op"),
      compacted, "k", 1)
    assert(state(compacted, 1) === state(root, 2) + (4L -> "D"))
  }

  test("change feed: I/U/D classification with old and new values") {
    val root = log3()
    def feed(a: Int, b: Int) = Versioned.changeFeed(spark, root, "k", a, b)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(feed(0, 1) === Set(
      (2L, "U", Some("b"), Some("B")), (3L, "D", Some("c"), None)))
    assert(feed(1, 2) === Set(
      (1L, "D", Some("a"), None), (3L, "I", None, Some("C")),
      (5L, "I", None, Some("e"))))
    assert(feed(0, 2) === Set(
      (1L, "D", Some("a"), None), (2L, "U", Some("b"), Some("B")),
      (3L, "U", Some("c"), Some("C")), (5L, "I", None, Some("e"))))
  }

  test("change feed law: equals the diff of reconstructed states; no-ops drop") {
    val root = log3()
    // v3: a NO-OP re-upsert of 4 (same value) plus a genuine update of 5 —
    // the no-op must not surface in any feed ending at 3
    Versioned.commit(Seq((4L, "d", "u"), (5L, "E", "u"))
      .toDF("k", "val", "_op"), root, "k", 3)
    for (a <- 0 to 2; b <- a + 1 to 3) {
      val sa = state(root, a); val sb = state(root, b)
      val want: Set[(Long, String, Option[String], Option[String])] =
        (sa.keySet ++ sb.keySet).flatMap { k =>
          (sa.get(k), sb.get(k)) match {
            case (None, Some(n)) => Some((k, "I", None, Some(n)))
            case (Some(o), None) => Some((k, "D", Some(o), None))
            case (Some(o), Some(n)) if o != n => Some((k, "U", Some(o), Some(n)))
            case _ => None
          }
        }
      val got = Versioned.changeFeed(spark, root, "k", a, b).collect()
        .map(r => (r.getLong(0), r.getString(1),
          Option(r.getString(2)), Option(r.getString(3)))).toSet
      assert(got === want, s"feed($a, $b)")
    }
  }

  test("CDC apply law: old state + change feed = new state") {
    // the consumer contract: a downstream copy at version a that applies
    // the feed (delete D keys, upsert I/U values) lands exactly at b
    val root = log3()
    for (a <- 0 to 1; b <- a + 1 to 2) {
      val feed = Versioned.changeFeed(spark, root, "k", a, b).collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(3))))
      val applied = feed.foldLeft(state(root, a)) {
        case (st, (k, "D", _)) => st - k
        case (st, (k, _, Some(v))) => st + (k -> v)
        case (st, _) => st
      }
      assert(applied === state(root, b), s"apply($a -> $b)")
    }
  }

  test("a commit with duplicate keys fails loudly") {
    val root = freshRoot()
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(Seq((1L, "a", "u"), (1L, "b", "u"))
        .toDF("k", "val", "_op"), root, "k", 0)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("plan: readAt is one aggregate exchange, no join chain, no window") {
    val root = log3()
    val plan = Versioned.readAt(spark, root, "k", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"readAt must not plan a per-commit join chain:\n$plan")
    assert(!plan.contains("Window"), s"readAt must not plan a window:\n$plan")
    val exchanges = plan.split('\n').count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"readAt should shuffle once on the key:\n$plan")
  }

  test("optimistic concurrency: the second writer of a version loses cleanly") {
    val root = log3()
    // v=2 is already committed: a stale writer re-commits it and must get
    // the contract exception — and the live log is untouched
    val before = state(root, 2)
    intercept[java.util.ConcurrentModificationException] {
      Versioned.commit(Seq((9L, "z", "u")).toDF("k", "val", "_op"),
        root, "k", 2)
    }
    assert(state(root, 2) === before, "the losing commit must not mutate v=2")
    // no temp debris left behind
    val leftover = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("_tmp_"))
    assert(leftover.isEmpty, s"temp dirs leaked: ${leftover.mkString(",")}")
    // and a RACING pair on the NEXT slot: exactly one wins
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val results = Await.result(Future.sequence((1 to 2).map { i =>
      Future {
        try { Versioned.commit(Seq((10L + i, "w", "u")).toDF("k", "val", "_op"),
          root, "k", 3); true }
        catch { case _: java.util.ConcurrentModificationException => false }
      }
    }), Duration.Inf).toList
    assert(results.count(identity) === 1,
      s"exactly one racing commit must win, got $results")
    assert(state(root, 3).size === before.size + 1)
  }

  test("gapped commits and gapped reads fail loudly") {
    val root = freshRoot()
    Versioned.commit(Seq((1L, "a", "u")).toDF("k", "val", "_op"), root, "k", 0)
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(Seq((2L, "b", "u")).toDF("k", "val", "_op"), root, "k", 2)
    }
    assert(e.getMessage.contains("gap"))
    val e2 = intercept[IllegalArgumentException] {
      Versioned.readAt(spark, root, "k", 1)
    }
    assert(e2.getMessage.contains("not contiguous"))
  }

  test("checkpoint-served feed ≡ uncompacted feed on every version pair") {
    val root = log3()
    for (a <- 0 to 1; b <- a + 1 to 2) {
      val ck = freshRoot()
      Versioned.compact(spark, root, "k", a, ck)
      val live = Versioned.changeFeed(spark, root, "k", a, b).collect()
        .map(_.toSeq).toSet
      val served = Versioned
        .changeFeedFromCheckpoint(spark, ck, root, "k", a, b).collect()
        .map(_.toSeq).toSet
      assert(served === live, s"checkpoint feed($a, $b)")
    }
  }

  test("q192 gate query matches its closed-form oracle shape at sf0.001") {
    val out = graft.queries.MaintenanceQueries
      .timeTravelSummary(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    // V2 rows exist (the re-insert-after-delete class is non-empty)
    assert(out.exists(_.getString(1) == "V2"))
  }

  test("q220 erasure laws: feed(2,3) is all-D on the erased keys; v2 still serves them (legal hold)") {
    val sf = "/root/testdata/sf0.001"
    // materialize the erasure commit via the gate itself
    assert(graft.queries.MaintenanceQueries
      .gdprErasureSummary(spark, sf).count() > 0)
    val root = graft.queries.MaintenanceQueries.versionedOrdersRoot(spark, sf)
    val feed = Versioned.changeFeed(spark, root, "o_orderkey", 2, 3)
      .collect()
    assert(feed.nonEmpty)
    assert(feed.forall(_.getAs[String]("op") == "D"),
      "the erasure version must surface as pure deletions")
    assert(feed.forall(_.getAs[Long]("o_orderkey") % 17 == 3))
    // erased keys: gone at v3, still present at v2 (time travel = legal hold)
    import org.apache.spark.sql.functions.col
    val at3 = Versioned.readAt(spark, root, "o_orderkey", 3)
      .filter(col("o_orderkey") % 17 === 3).count()
    val at2 = Versioned.readAt(spark, root, "o_orderkey", 2)
      .filter(col("o_orderkey") % 17 === 3).count()
    assert(at3 === 0L, "erased keys must not be servable at v3")
    assert(at2 === feed.length.toLong,
      "pre-erasure version must still serve exactly the erased keys")
    // and compaction AT v3 physically drops them: the checkpoint base
    // contains no tombstones and no erased keys - actual destruction
    val ck = freshRoot()
    Versioned.compact(spark, root, "o_orderkey", 3, ck)
    val ckRows = spark.read.parquet(s"$ck/v=0")
    assert(ckRows.filter(col("o_orderkey") % 17 === 3).count() === 0L)
    assert(ckRows.filter(col("_op") =!= "u").count() === 0L)
  }
}
