package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward-inclusive AS-OF join — for each left row, the right row with the
  * same key and the greatest right-time ≤ left-time (ties on time broken by
  * the largest `tieBreak` value; left rows with no prior right row keep
  * nulls, like a left join).
  *
  * Spark has no native as-of join (the reference engine has none either —
  * this is a training-pipeline extension, e.g. "attach the latest model
  * snapshot / price tick / feature row at or before each event"). The naive
  * formulation — equi-join on key plus `r.t <= l.t`, then a per-pair
  * row_number — materializes every (left, right-before-it) pair: quadratic
  * per key, a scale-killer on dense keys.
  *
  * This implementation is the UNION + running-window form: tag both sides,
  * union them, and take `last(carry, ignoreNulls)` over
  * (partition by key order by time, side, tie rows unbounded preceding →
  * current). Right rows sort before left rows at equal time (inclusive
  * semantics), and each left row reads the latest right values seen so far.
  * Cost: ONE shuffle of |L| + |R| rows and one sort per key partition —
  * linear, and exactly how you'd run it over 100 TB of events.
  */
object AsOf {

  def asOfBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTimeCol: String, rightTimeCol: String,
                   carry: Seq[String], tieBreak: String,
                   prefix: String = "asof_"): DataFrame = {
    // Null semantics, pinned explicitly (Spark windows sort NULL FIRST,
    // DuckDB sorts NULL LAST — leaving nulls to the sort order would give
    // engine-dependent matches): a right row with a null key, time, or
    // tie-break value is dropped (key/time can never be "at or before"
    // anything; a null tie would make equal-time winner selection
    // sort-order-dependent); a left row with a null key or time is kept
    // with all-null carries (left-join contract).
    val leftNullable = left.schema(keyCol).nullable || left.schema(leftTimeCol).nullable
    val leftOk =
      if (leftNullable) left.filter(col(keyCol).isNotNull && col(leftTimeCol).isNotNull)
      else left
    val rightOk = right.filter(
      col(keyCol).isNotNull && col(rightTimeCol).isNotNull && col(tieBreak).isNotNull)
    val leftStructType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rightSchema = right.schema
    val tieType = rightSchema(tieBreak).dataType

    // carry travels as ONE struct per right row: last(..., ignoreNulls) then
    // skips whole left rows (null struct) but never mixes fields from
    // different right rows — a per-column window would stitch a phantom row
    // whenever one carried column is null in the matched row
    val carryStructType = org.apache.spark.sql.types.StructType(
      carry.map(c => rightSchema(c).copy(name = c)))

    val lTagged = leftOk.select(
      col(keyCol).as("__k"),
      col(leftTimeCol).as("__t"),
      lit(1).as("__side"),
      // -1 sorts before any real (non-negative) tie value; only ordering
      // among RIGHT rows matters, left rows carry nothing
      lit(-1L).cast(tieType).as("__tie"),
      struct(left.columns.map(col).toSeq: _*).as("__lrow"),
      lit(null).cast(carryStructType).as("__carry"))

    val rTagged = rightOk.select(
      col(keyCol).as("__k"),
      col(rightTimeCol).as("__t"),
      lit(0).as("__side"),
      col(tieBreak).cast(tieType).as("__tie"),
      lit(null).cast(leftStructType).as("__lrow"),
      struct(carry.map(col): _*).as("__carry"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__carry"), ignoreNulls = true).over(w))

    val outCols: Seq[Column] =
      left.columns.toSeq.map(c => col(s"__lrow.$c").as(c)) ++
        carry.map(c => col(s"__m.$c").as(s"$prefix$c"))
    val joined = matched.filter(col("__side") === 1).select(outCols: _*)
    if (!leftNullable) joined
    else {
      val passthrough = left
        .filter(col(keyCol).isNull || col(leftTimeCol).isNull)
        .select(left.columns.toSeq.map(col) ++
          carry.map(c => lit(null).cast(rightSchema(c).dataType).as(s"$prefix$c")): _*)
      joined.unionByName(passthrough)
    }
  }
}
