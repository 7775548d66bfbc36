package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.streaming.{InvoiceResult, LineEvent, PurchaseCsv, Sessionizer, SessionState, Purchase}

/** Property-based coverage (SURVEY §5.5): parser totality, quirk routing,
  * hour-extraction equivalence, elbow bounds, classification totality. */
object ParserProperties extends Properties("PurchaseCsv") {

  private val anyLine: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const("\"x,y\""), Gen.numStr))
      .map(_.mkString(",")),
    Gen.const(null).map(_.asInstanceOf[String]))

  property("parse is total: never throws on arbitrary input") = forAll(anyLine) { line =>
    PurchaseCsv.parse(line)
    true
  }

  property("route only admits good purchases or 'parse error:' reasons") =
    forAll(anyLine) { line =>
      PurchaseCsv.route(line) match {
        case None => true
        case Some(ev) =>
          ev.purchase.isDefined != ev.errorReason.isDefined &&
            ev.errorReason.forall(_.startsWith("parse error:"))
      }
    }

  private val hourGen = Gen.choose(0, 23)
  private val dateGen: Gen[(String, Int)] = for {
    m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    y <- Gen.choose(2000, 2030); h <- hourGen; mi <- Gen.choose(0, 59)
  } yield (s"$m/$d/$y $h:$mi", h)

  property("extractHour recovers the generated hour for M/d/yyyy H:mm") =
    forAll(dateGen) { case (s, h) => PurchaseCsv.extractHour(s) == h.toDouble }

  property("valid 8-field numeric lines always parse as Good") = forAll(
    for {
      inv <- Gen.alphaNumStr.suchThat(_.nonEmpty)
      qty <- Gen.choose(-999, 999)
      price <- Gen.choose(0, 100000).map(_ / 100.0)
      (date, _) <- dateGen
    } yield (inv, qty, date, price)) { case (inv, qty, date, price) =>
    PurchaseCsv.parse(s"$inv,SC,DESC,$qty,$date,$price,CUST,Country") match {
      case PurchaseCsv.Good(p) =>
        p.invoiceNo == inv && p.quantity == qty && p.unitPrice == price
      case _ => false
    }
  }
}

object ElbowProperties extends Properties("Anomaly.elbow") {
  private val costsGen = Gen.nonEmptyListOf(Gen.choose(1.0, 1e9))

  property("selection index is always in range") = forAll(costsGen) { cs =>
    val i = graft.ml.Anomaly.elbowSelection(cs)
    i >= 0 && i < cs.length
  }

  property("a plateau at position 1 selects index 1") =
    forAll(Gen.choose(1.0, 1e6)) { c =>
      graft.ml.Anomaly.elbowSelection(Seq(c, c * 0.9, c * 0.1)) == 1
    }
}

object SessionizerProperties extends Properties("Sessionizer.classify") {
  private val purchaseGen: Gen[Purchase] = for {
    inv <- Gen.alphaNumStr
    qty <- Gen.choose(-99, 99)
    date <- Gen.oneOf("7/19/2011 12:19", "garbage", "")
    price <- Gen.choose(0.0, 1000.0)
    cust <- Gen.oneOf("", "c1", "c2")
    country <- Gen.oneOf("", "ES", "UK")
  } yield Purchase(inv, qty, date, price, cust, country)

  private val stateGen: Gen[SessionState] = for {
    lines <- Gen.listOf(purchaseGen)
    err <- Gen.option(Gen.const("parse error: x"))
  } yield SessionState(lines, err)

  property("classify is total and status matches reason nullability") =
    forAll(stateGen) { st =>
      val r = Sessionizer.classify("I", st)
      (r.status == "error" && r.reason != null) ||
        (r.status == "valid" && r.reason == null)
    }

  property("valid results only from clean states, with exact fold") =
    forAll(stateGen) { st =>
      val r = Sessionizer.classify("I", st)
      if (r.status == "valid") {
        val prices = st.lines.map(_.unitPrice)
        st.errorReason.isEmpty && st.lines.nonEmpty &&
          r.minUnitPrice == prices.min && r.maxUnitPrice == prices.max &&
          r.numberItems == st.lines.map(_.quantity).sum.toDouble
      } else true
    }

  // price generator deliberately includes NaN and both signed zeros — the
  // fold must reproduce List.min/max's IEEE TOTAL ordering bit-for-bit
  private val trickyPriceGen: Gen[Double] = Gen.oneOf(
    Gen.choose(0.0, 1000.0), Gen.const(Double.NaN),
    Gen.const(0.0), Gen.const(-0.0))
  private val eventGen: Gen[LineEvent] = Gen.oneOf(
    for { p <- purchaseGen; price <- trickyPriceGen }
      yield LineEvent(p.invoiceNo, Some(p.copy(unitPrice = price)), None),
    Gen.oneOf("parse error: a", "parse error: b")
      .map(r => LineEvent("I", None, Some(r))),
    Gen.const(LineEvent("I", None, None)))

  private def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
  private def same(a: InvoiceResult, b: InvoiceResult): Boolean =
    a.invoiceNo == b.invoiceNo && a.status == b.status && a.reason == b.reason &&
      bits(a.avgUnitPrice) == bits(b.avgUnitPrice) &&
      bits(a.minUnitPrice) == bits(b.minUnitPrice) &&
      bits(a.maxUnitPrice) == bits(b.maxUnitPrice) &&
      bits(a.time) == bits(b.time) &&
      bits(a.numberItems) == bits(b.numberItems) &&
      a.lineCount == b.lineCount && a.customerId == b.customerId

  property("classifyFold ≡ materialize-then-classify on every event order") =
    forAll(Gen.listOf(eventGen)) { evs =>
      val err = evs.collectFirst { case LineEvent(_, _, Some(r)) => r }
      val lines = if (err.isDefined) Nil else evs.flatMap(_.purchase).toList
      val viaState = Sessionizer.classify("I", SessionState(lines, err))
      val viaFold = Sessionizer.classifyFold("I", evs.iterator)
      same(viaState, viaFold)
    }
}

/** The streaming as-of state machine is a pure fold (AsOfStream.advance):
  * its defining invariant is BATCH-SCHEDULE INVARIANCE — however events are
  * spread over micro-batches and however the watermark climbs between
  * them, the emissions are identical, PROVIDED no event arrives late
  * (time ≤ the watermark current at its arrival). Late events are dropped
  * by the engine before the state function runs, so schedules that respect
  * the watermark contract are exactly the reachable ones; this is what
  * makes the streaming operator equal the batch as-of join. */
object AsOfStreamProperties extends Properties("AsOfStream.advance") {
  import java.sql.Timestamp
  import graft.streaming.{AsOfBuffer, AsOfEvent, AsOfStream}

  private case class L(lid: Long)
  private case class R(rid: Long)

  // watermarks current at each arrival batch (batch 1 has seen no data →
  // watermark 0), then a final flush past every event time
  private val wms = List(0L, 2000L, 4000L, 8000L)
  private val flushWm = 10000L

  private val eventsGen: Gen[List[(AsOfEvent[L, R], Int)]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      t <- Gen.choose(1000L, 9000L)
      id <- Gen.choose(1L, 10000L)
      isLeft <- Gen.oneOf(true, false)
      slot <- Gen.choose(0, wms.size - 1)
    } yield {
      val ev =
        if (isLeft) AsOfEvent[L, R]("k", new Timestamp(t), 0L, Some(L(id)), None)
        else AsOfEvent[L, R]("k", new Timestamp(t), id, None, Some(R(id)))
      // arrival batch restricted to those whose watermark is below the
      // event time — the no-late-data contract the engine enforces
      val valid = wms.indices.filter(i => wms(i) < t)
      (ev, valid(slot % valid.size))
    })
  } yield evs

  private def run(assigned: List[(AsOfEvent[L, R], Int)],
                  schedule: List[Long]): List[(Long, Long, Option[Long])] = {
    var buf = AsOfBuffer[L, R](Nil, Nil)
    var out = List.empty[(Long, Long, Option[Long])]
    schedule.indices.foreach { i =>
      val batch = assigned.collect { case (ev, b) if b == i => ev }
      val (b2, emitted) = AsOfStream.advance(buf, batch, schedule(i), "k")
      buf = b2
      out ++= emitted.map(j => (j.eventTime.getTime, j.left.lid, j.asof.map(_.rid)))
    }
    val (_, fin) = AsOfStream.advance(buf, Nil, flushWm, "k")
    out ++ fin.map(j => (j.eventTime.getTime, j.left.lid, j.asof.map(_.rid)))
  }

  property("emissions are invariant across watermark-respecting schedules") =
    forAll(eventsGen) { assigned =>
      val oneShot = run(assigned.map { case (ev, _) => (ev, 0) }, List(0L))
      val staged = run(assigned, wms)
      // MULTISET equality — set+size would let a duplicate-emit of one
      // tuple mask the drop of another
      staged.sortBy(x => (x._1, x._2)) == oneShot.sortBy(x => (x._1, x._2))
    }

  property("every left emits exactly once, matched to the max (time, tie) prior right") =
    forAll(eventsGen) { assigned =>
      val evs = assigned.map(_._1)
      val out = run(assigned, wms)
      val lefts = evs.filter(_.left.isDefined)
      val rights = evs.filter(_.right.isDefined)
      out.size == lefts.size && lefts.forall { l =>
        val t = l.eventTime.getTime
        val lid = l.left.get.lid
        val expected = rights.filter(_.eventTime.getTime <= t)
          .sortBy(r => (r.eventTime.getTime, r.tie)).lastOption.map(_.tie)
        // match on the left's OWN id too — a wildcard would let one left's
        // duplicate emission stand in for another's at the same time
        out.exists { case (ot, ol, m) => ot == t && ol == lid && m == expected }
      }
    }
}

/** The banded edit-distance verify ([[graft.expressions.BoundedLevenshtein]])
  * against a textbook full-table reference: exact wherever the true
  * distance is ≤ τ, the sentinel τ+1 wherever it is not — over arbitrary
  * unicode strings (code-point semantics) and every τ the join family
  * uses. */
object BoundedLevenshteinProperties extends Properties("BoundedLevenshtein") {
  import graft.expressions.BoundedLevenshtein

  private def reference(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val dp = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to x.length; j <- 1 to y.length)
      dp(i)(j) = math.min(
        math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    dp(x.length)(y.length)
  }

  // small alphabet + bounded length keeps many pairs inside τ; a few
  // astral-plane code points exercise surrogate handling
  private val strGen: Gen[String] = for {
    n <- Gen.choose(0, 10)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.oneOf("ab".toList.map(_.toString)),
      1 -> Gen.oneOf("xyz".toList.map(_.toString)),
      1 -> Gen.const(new String(Character.toChars(0x1F600)))))
  } yield cs.mkString

  property("≡ min(reference, τ+1) for τ in 0..3") =
    forAll(strGen, strGen, Gen.choose(0, 3)) { (a, b, tau) =>
      BoundedLevenshtein.compute(a, b, tau) == math.min(reference(a, b), tau + 1)
    }
}

/** Round-14: the warm-start snapshot encoding must be a bijection on the
  * session-state domain — a lossy pack would corrupt every migrated
  * session silently (the q234/q235/q240 gates would catch it as a hash
  * break, but only at their fixture's value distribution; the property
  * covers arbitrary strings incl. nulls, surrogates, and non-finite
  * doubles). */
object PackInitProperties extends Properties("SessionizerTws.packInit") {
  import graft.streaming.{EventSessionState, Purchase, SessionizerTws}

  private val anyStr: Gen[String] = Gen.oneOf(
    Gen.const(null: String), Gen.const(""),
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString.take(64)))
  private val anyDouble: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e9, 1e9), Gen.const(Double.NaN),
    Gen.const(Double.PositiveInfinity), Gen.const(-0.0))
  private val purchase: Gen[Purchase] = for {
    inv <- anyStr; q <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    date <- anyStr; price <- anyDouble; cust <- anyStr; c <- anyStr
  } yield Purchase(inv, q, date, price, cust, c)
  private val state: Gen[EventSessionState] = for {
    lines <- Gen.listOfN(5, purchase).flatMap(l =>
      Gen.chooseNum(0, 5).map(l.take))
    err <- Gen.option(anyStr.suchThat(_ != null))
    ms <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
  } yield EventSessionState(lines, err, ms)

  property("unpack(pack(s)) == s, field-exact incl. NaN") = forAll(state) { st =>
    val back = SessionizerTws.unpackInit(SessionizerTws.packInit(st))
    def dEq(a: Double, b: Double) =
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
    back.errorReason == st.errorReason &&
      back.maxEventMs == st.maxEventMs &&
      back.lines.size == st.lines.size &&
      back.lines.zip(st.lines).forall { case (b, a) =>
        b.invoiceNo == a.invoiceNo && b.quantity == a.quantity &&
          b.invoiceDate == a.invoiceDate && dEq(b.unitPrice, a.unitPrice) &&
          b.customerID == a.customerID && b.country == a.country
      }
  }
}
