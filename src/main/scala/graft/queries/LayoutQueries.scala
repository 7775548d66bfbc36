package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.expressions.ZOrderKey

/** Storage-layout query surface (see [[graft.operators.Layout]]). */
object LayoutQueries {

  /** Interleave width: 21 bits per key covers TPC-H partkey up to SF ~100
    * (2M parts) with headroom; the gate fixtures use a fraction of it. */
  val zorderBits = 21

  /** Bucket = z-value with the low `zbucketShift` bits dropped — i.e. the
    * z-curve cell formed by the keys' bits above `zbucketShift/2`. Each
    * bucket is what one clustered FILE would hold after a z-ordered write. */
  val zbucketShift = 14

  /** q76: per-z-bucket key-range statistics over lineitem's
    * (l_partkey, l_suppkey). The point of the layout in one result set:
    * within every z-bucket, BOTH keys' min..max spans are narrow slices of
    * their global domains — the per-file min/max stats a reader's
    * data-skipping consults. Row-local key computation, one count-style
    * aggregate shuffle on the bucket id; all arithmetic is exact integer
    * bit manipulation, identical in both engines by construction. */
  def zorderStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        shiftright(ZOrderKey.zorder(col("l_partkey"), col("l_suppkey"), zorderBits),
          zbucketShift).as("zbucket"),
        col("l_partkey"), col("l_suppkey"))
      .groupBy("zbucket")
      .agg(
        count(lit(1)).as("n"),
        min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"),
        min("l_suppkey").as("sk_min"), max("l_suppkey").as("sk_max"))

  val zorderStatsSql: String = {
    val z = ZOrderKey.interleaveSql("l_partkey", "l_suppkey", zorderBits)
    s"""
    SELECT ($z >> $zbucketShift) AS zbucket,
           count(*) AS n,
           min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
           min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
    FROM lineitem
    GROUP BY 1"""
  }

  val defs: Map[String, QueryDef] = Map(
    "q76_zorder_stats" -> QueryDef(zorderStats _, zorderStatsSql))
}
