package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.ZOrderKey

/** Storage-layout operators: how a 100 TB table should be WRITTEN so later
  * scans can skip most of it. The engine's query surface is read-mostly;
  * this is the write-side counterpart — the step a curation pipeline runs
  * before publishing a corpus snapshot.
  */
object Layout {

  /** Z-order-cluster a frame on two bounded integer keys: compute the
    * Morton key ([[graft.expressions.ZOrderKey]]), range-partition on it
    * (each output partition = one file's worth of a contiguous z-range),
    * and sort within partitions so row groups inside a file stay
    * z-contiguous too.
    *
    * Scale shape: one row-local key computation + ONE range exchange
    * (sampled global ranges, no skew pile-up because the z-curve spreads
    * both dimensions), then an in-partition sort — exactly the plan
    * `OPTIMIZE ZORDER BY` runs per file group. After `.write.parquet`,
    * per-file min/max stats are tight on BOTH keys: a reader filtering on
    * either one prunes ~sqrt-fraction of files instead of all-but-none.
    *
    * The Morton key is an internal clustering artifact: it is computed
    * under a collision-safe name and DROPPED once partitioning and
    * in-partition order are fixed, so `.write.parquet` publishes the
    * caller's schema unchanged (and a user column named "zval" survives).
    */
  private val zKey = "__graft_zval"

  def zorderCluster(df: DataFrame, x: Column, y: Column, bits: Int,
                    numPartitions: Int): DataFrame =
    df.withColumn(zKey, ZOrderKey.zorder(x.cast("long"), y.cast("long"), bits))
      .repartitionByRange(numPartitions, col(zKey))
      .sortWithinPartitions(col(zKey))
      .drop(zKey)
}
