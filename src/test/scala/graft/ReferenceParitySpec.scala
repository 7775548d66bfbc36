package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{PurchaseCsv, SessionState, Sessionizer}

/** Distilled-golden parity against the reference's own development.csv
  * fixture (read-only at /root/reference/src/main/resources/): every line
  * routed through our parser and classified per invoice with the stream
  * semantics. The pinned numbers were computed once from this code and act
  * as a regression tripwire for parser/classifier changes. */
class ReferenceParitySpec extends AnyFunSuite {
  private val fixture = "/root/reference/src/main/resources/development.csv"

  test("development.csv routes and classifies stably") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
    val lines = scala.io.Source.fromFile(fixture).getLines().toSeq
    val events = lines.flatMap(PurchaseCsv.route)

    val good = events.count(_.purchase.isDefined)
    val errors = events.count(_.errorReason.isDefined)
    val dropped = lines.size - events.size

    // per-invoice batch replay through the library's batch sessionizer
    // (error events are sticky: quirk Q3 collapses to "any error wins"
    // when the whole file is one batch)
    implicit val spark = SparkTestSession.spark
    import spark.implicits._
    val classified = Sessionizer.sessionizeBatch(events.toDS()).collect().toSeq

    val statusCounts = classified.groupBy(_.status).view.mapValues(_.size).toMap
    val reasonCounts = classified.filter(_.status == "error")
      .groupBy(_.reason).view.mapValues(_.size).toMap
    val cancellations = classified.count(r => r.invoiceNo.startsWith("C"))

    info(s"lines=${lines.size} good=$good errors=$errors dropped=$dropped")
    info(s"status=$statusCounts reasons=$reasonCounts cancellations=$cancellations")

    assert(lines.size === 366)
    assert(good + errors + dropped === lines.size)
    assert(events.forall(e => e.purchase.isDefined != e.errorReason.isDefined))
    assert(classified.map(_.lineCount).sum >= good - errors)
    // distilled goldens (pinned from first run; update deliberately only)
    assert(good === GOLD_GOOD, s"good=$good")
    assert(errors === GOLD_ERRORS, s"errors=$errors")
    assert(dropped === GOLD_DROPPED, s"dropped=$dropped")
    assert(statusCounts === GOLD_STATUS, s"status=$statusCounts")
    assert(cancellations === GOLD_CANCELS, s"cancellations=$cancellations")
  }

  private val GOLD_GOOD = 366
  private val GOLD_ERRORS = 0
  private val GOLD_DROPPED = 0
  private val GOLD_STATUS: Map[String, Int] = Map("error" -> 1, "valid" -> 4)
  private val GOLD_CANCELS = 1
}
