package graft.streaming

import com.univocity.parsers.csv.{CsvParser, CsvParserSettings}

/** A single retail purchase line (realtime/InvoicePipeline.scala:25-32). */
final case class Purchase(
    invoiceNo: String,
    quantity: Int,
    invoiceDate: String,
    unitPrice: Double,
    customerID: String,
    country: String)

/** One routed stream element: either a good purchase or an invoice-keyed
  * parse error. Flat struct-with-nulls instead of a sealed trait so the
  * Dataset encoder stays Catalyst-native (SURVEY.md §1.1). */
final case class LineEvent(
    invoiceNo: String,
    purchase: Option[Purchase],
    errorReason: Option[String])

/** CSV parse + routing for the raw purchase-line wire format (F3, quirk Q4).
  *
  * Wire format: headerless 8-field CSV, quoted fields may embed commas
  * (FIXTURES.md §1). Field positions 0,3,4,5,6,7 feed the pipeline
  * (realtime/InvoicePipeline.scala:86-101).
  *
  * Routing faithfully reproduces quirk Q4 (InvoicePipeline.scala:161-181):
  * only failures whose reason starts with "parse error:" enter the pipeline
  * as error events; empty lines, short rows ("malformed purchase line") and
  * parser exceptions are silently dropped.
  *
  * This is genuine per-record imperative logic (try/catch classification on
  * a hand-rolled wire format), so it runs as a typed `Dataset.flatMap` — the
  * one deliberate non-codegen stage in the stream; everything downstream is
  * relational again.
  */
object PurchaseCsv {

  sealed trait Parsed
  final case class Good(purchase: Purchase) extends Parsed
  /** `routed=false` failures are quirk-Q4 silent drops. */
  final case class Bad(key: String, reason: String, routed: Boolean) extends Parsed

  // One parser per JVM; univocity parsers are not thread-safe, so give each
  // executor thread its own.
  private val parserTl: ThreadLocal[CsvParser] = ThreadLocal.withInitial { () =>
    val settings = new CsvParserSettings()
    settings.getFormat.setLineSeparator("\n")
    settings.setIgnoreLeadingWhitespaces(true)
    settings.setIgnoreTrailingWhitespaces(true)
    settings.setQuoteDetectionEnabled(true)
    new CsvParser(settings)
  }

  def parse(line: String): Parsed = {
    if (line == null || line.trim.isEmpty) return Bad("UNKNOWN", "empty line", routed = false)
    val fields =
      try parserTl.get.parseLine(line)
      catch { case e: Exception => return Bad("UNKNOWN", s"parser exception: ${e.getMessage}", routed = false) }
    if (fields == null || fields.length < 8) {
      val key = if (fields != null && fields.nonEmpty && fields(0) != null) fields(0) else "UNKNOWN"
      return Bad(key, "malformed purchase line", routed = false)
    }
    try Good(Purchase(
      invoiceNo = fields(0),
      quantity = fields(3).toInt,
      invoiceDate = fields(4),
      unitPrice = fields(5).toDouble,
      customerID = fields(6),
      country = fields(7)))
    catch {
      case e: Exception => Bad(fields(0), s"parse error: ${e.getMessage}", routed = true)
    }
  }

  /** Q4 routing: Good → purchase event; routed Bad → error event;
    * silent-drop Bad → None. */
  def route(line: String): Option[LineEvent] = parse(line) match {
    case Good(p)                  => Some(LineEvent(p.invoiceNo, Some(p), None))
    case Bad(key, reason, true)   => Some(LineEvent(key, None, Some(reason)))
    case Bad(_, _, false)         => None
  }

  /** Fully-relational parse + route via the Catalyst `from_csv` expression
    * (CsvToStructs) — the whole stage codegens, no typed closure.
    *
    * Trade-off vs `route`: univocity exposes the raw field COUNT, which
    * quirk Q4 needs to distinguish "<8 fields" (silent drop) from "8 fields
    * with empty trailing values"; from_csv pads missing trailing fields with
    * nulls, so this path treats rows with a missing mandatory tail position
    * as drops too. For well-formed 8-field lines (including quoted commas)
    * and numeric-failure lines the two paths agree exactly — property-tested
    * in ParserProperties. Use this one for throughput, `route` for
    * quirk-exact parity.
    */
  def routeRelational(lines: org.apache.spark.sql.Dataset[String])
                     (implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[LineEvent] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val raw = lines.toDF("value")
    val schema = "f0 STRING, f1 STRING, f2 STRING, f3 STRING, f4 STRING, f5 STRING, f6 STRING, f7 STRING"
    raw
      .filter(length(trim(col("value"))) > 0)
      .withColumn("p", from_csv(col("value"), org.apache.spark.sql.types.StructType.fromDDL(schema),
        Map("mode" -> "PERMISSIVE")))
      // all-8-positions-present analog of univocity's field COUNT: strip
      // quoted segments (commas inside quotes are not separators, and `""`
      // empty-quoted fields vanish cleanly), then require >= 7 top-level
      // commas. This accepts 8-field lines whatever their trailing field
      // looks like (empty, `""`, quoted-with-commas) and drops shorter ones
      // — from_csv alone can't distinguish "8th field empty" from "8th
      // field missing" because it null-pads trailing positions.
      // f7 non-null already implies 8 fields, and codegen short-circuits
      // the OR, so the regex count only runs on the rare empty-tail lines.
      .filter(col("p.f0").isNotNull &&
        (col("p.f7").isNotNull ||
          size(split(regexp_replace(col("value"), "\"[^\"]*\"", ""), ",", -1)) >= 8))
      .withColumn("qty", expr("try_cast(p.f3 AS INT)"))
      .withColumn("price", expr("try_cast(p.f5 AS DOUBLE)"))
      .select(
        col("p.f0").as("invoiceNo"),
        when(col("qty").isNotNull && col("price").isNotNull,
          struct(
            col("p.f0").as("invoiceNo"),
            col("qty").as("quantity"),
            col("p.f4").as("invoiceDate"),
            col("price").as("unitPrice"),
            col("p.f6").as("customerID"),
            col("p.f7").as("country"))).as("purchase"),
        when(col("qty").isNull || col("price").isNull,
          concat(lit("parse error: "),
            when(col("qty").isNull, concat(lit("For input string: \""), coalesce(col("p.f3"), lit("")), lit("\"")))
              .otherwise(concat(lit("For input string: \""), coalesce(col("p.f5"), lit("")), lit("\""))))).as("errorReason"))
      .as[LineEvent]
  }

  /** F2: hour of "M/d/yyyy H:mm", -1.0 when unparsable
    * (InvoicePipeline.scala:495-498). */
  def extractHour(invoiceDate: String): Double = {
    if (invoiceDate == null) return -1.0
    val parts = invoiceDate.split(" ")
    if (parts.length < 2) return -1.0
    val hour = parts(1).split(":")(0)
    try hour.toDouble
    catch { case _: Exception => -1.0 }
  }
}
