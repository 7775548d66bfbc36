package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.streaming.{PurchaseCsv, Sessionizer}

/** End-to-end STREAM-SEMANTICS oracle: manufacture raw purchase-line CSV
  * from lineitem⋈orders (integer prices so the string round-trip is exact,
  * a parse-poisoned quantity on every linenumber-7 line), push it through
  * the real pipeline — relational CSV routing → batch sessionization →
  * classification — and check the classified invoices against a DuckDB
  * query that replays the same state machine relationally:
  * any poisoned line ⇒ the whole invoice errors with the parse reason
  * (quirk Q3), otherwise the A2 fold over the surviving lines.
  */
object PipelineReplay {

  def pipelineReplay(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    import spark.implicits._

    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val lines = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(concat_ws(",",
        col("l_orderkey").cast("string"),
        col("l_partkey").cast("string"),
        lit("ITEM"),
        when(col("l_linenumber") === 7, lit("x"))
          .otherwise(col("l_quantity").cast("long").cast("string")),
        date_format(col("o_orderdate"), "M/d/yyyy H:mm"),
        round(col("l_extendedprice")).cast("long").cast("string"),
        concat(lit("c"), col("o_custkey").cast("string")),
        lit("ES")).as("value"))
      .as[String]

    // typed univocity route, not routeRelational: measured 2× faster at
    // this row width (from_csv's CsvToStructs is a non-codegen expression;
    // the primitive univocity loop wins) — the two are parity-tested
    // equal on well-formed and numeric-failure lines (RelationalParseSpec)
    val events = lines.flatMap(PurchaseCsv.route _)
    Sessionizer.sessionizeBatch(events).toDF()
      .select(
        col("invoiceNo").as("invoice_no"),
        col("status"),
        col("reason"),
        when(col("status") === "valid", col("avgUnitPrice")).as("avg_unit_price"),
        when(col("status") === "valid", col("minUnitPrice")).as("min_unit_price"),
        when(col("status") === "valid", col("maxUnitPrice")).as("max_unit_price"),
        when(col("status") === "valid", col("numberItems")).as("number_items"),
        col("lineCount").cast("long").as("line_count"))
  }

  /** DuckDB replay of the same semantics. Poisoned invoices report the
    * parse reason with line_count 0 (the error event empties the session);
    * valid invoices fold avg/min/max over integer-rounded prices — all
    * exact integer arithmetic, so the hash compare is bit-stable. */
  val pipelineReplaySql: String = """
    SELECT CAST(l_orderkey AS VARCHAR) AS invoice_no,
      CASE WHEN bool_or(l_linenumber = 7) THEN 'error' ELSE 'valid' END AS status,
      CASE WHEN bool_or(l_linenumber = 7)
           THEN 'parse error: For input string: "x"' END AS reason,
      CASE WHEN NOT bool_or(l_linenumber = 7)
           THEN CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS DOUBLE) / count(*)
      END AS avg_unit_price,
      CASE WHEN NOT bool_or(l_linenumber = 7)
           THEN CAST(min(CAST(round(l_extendedprice) AS BIGINT)) AS DOUBLE)
      END AS min_unit_price,
      CASE WHEN NOT bool_or(l_linenumber = 7)
           THEN CAST(max(CAST(round(l_extendedprice) AS BIGINT)) AS DOUBLE)
      END AS max_unit_price,
      CASE WHEN NOT bool_or(l_linenumber = 7)
           THEN CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
      END AS number_items,
      CASE WHEN bool_or(l_linenumber = 7) THEN 0 ELSE count(*) END AS line_count
    FROM lineitem GROUP BY l_orderkey"""

  val defs: Map[String, QueryDef] = Map(
    "q43_pipeline_replay" -> QueryDef(pipelineReplay _, pipelineReplaySql))
}
