package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{LineEvent, PurchaseCsv}

/** Equivalence of the typed univocity route and the relational from_csv
  * route on the classes where they are specified to agree. */
class RelationalParseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val agreeingLines = Seq(
    // plain valid
    "560537,23103,JINGLE BELL,24,7/19/2011 12:19,1.65,17779,United Kingdom",
    // quoted embedded commas
    """560538,21507,"ELEPHANT, BIRTHDAY CARD, ",12,7/19/2011 12:19,0.42,16128,United Kingdom""",
    // numeric failure → parse error event
    "560998,21507,WIDGET,twelve,7/19/2011 12:19,0.42,16128,United Kingdom",
    // bad price → parse error event
    "560997,21507,WIDGET,12,7/19/2011 12:19,cheap,16128,United Kingdom",
    // cancellation
    "C560823,21507,WIDGET,-12,7/19/2011 12:19,0.42,16128,United Kingdom",
    // 8 fields with EMPTY country (still a good purchase; classification
    // turns it into "missing country" at session close)
    "560996,21507,WIDGET,12,7/19/2011 12:19,0.42,16128,",
    // 8 fields with empty customer id
    "564754,DOT,DOTCOM POSTAGE,1,8/30/2011 10:29,186.87,,United Kingdom",
    // 8th field is an empty QUOTED string — still 8 fields present; both
    // routes must keep it (classified as missing-country at session close)
    "560995,21507,WIDGET,12,7/19/2011 12:19,0.42,16128,\"\"",
    // short line → dropped by both
    "560999,21507,WIDGET,12",
    // SEVEN fields ending in an empty quoted string → still short; both
    // routes must drop it (field count, not suffix shape, decides)
    "560994,21507,WIDGET,12,7/19/2011 12:19,0.42,\"\"",
    // empty → dropped by both
    "")

  private def key(ev: LineEvent): (String, Option[(String, Int, String, Double, String, String)], Boolean) =
    (ev.invoiceNo,
      ev.purchase.map(p => (p.invoiceNo, p.quantity, p.invoiceDate, p.unitPrice, p.customerID, p.country)),
      ev.errorReason.isDefined)

  test("typed and relational routes agree on valid/parse-error/drop classes") {
    implicit val s = spark
    import s.implicits._
    val typed = agreeingLines.flatMap(PurchaseCsv.route).map(key)
    val relational = PurchaseCsv.routeRelational(agreeingLines.toDS())
      .collect().toSeq.map(key)
    assert(relational.toSet === typed.toSet)
    assert(relational.size === typed.size)
  }

  test("relational route feeds the sessionizer batch path") {
    implicit val s = spark
    import s.implicits._
    val events = PurchaseCsv.routeRelational(agreeingLines.toDS())
    // 6 good purchases + 2 parse-error events; short/empty lines dropped
    assert(events.filter(_.purchase.isDefined).count() === 6)
    assert(events.filter(_.errorReason.isDefined).count() === 2)
  }
}
