package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass every training-data pipeline
  * runs before a corpus is trusted: per column, the row count, null count,
  * exact distinct count, and min/max rendered as strings so one schema
  * covers every column type.
  *
  * Plan shape: ONE scan. All 4·k statistics are computed in a single
  * aggregate (Spark plans the multiple DISTINCT aggregates via Expand —
  * k+1 streams over one pass of the data, no per-column rescans), then the
  * 1×(4k+1) result row is unpivoted driver-free with `stack`. Profiling
  * 100 TB costs one read however many columns are profiled.
  *
  * Caveat for cross-engine exactness: render only columns whose
  * string-cast is engine-stable (integers, strings, dates) — double
  * formatting differs between engines (see graft.functions.Exact).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val aggs =
      count(lit(1)).as("n_rows") +:
        cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
            count_distinct(col(c)).as(s"__dist_$c"),
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
        }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__null_$c`, `__dist_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    wide.selectExpr(
      "n_rows",
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, n_distinct, min_value, max_value)")
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
