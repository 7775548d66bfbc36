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

  /** Compacts a directory of small parquet files into ~`targetBytes`-sized
    * ones — the `OPTIMIZE` half of table maintenance (streaming sinks and
    * over-parallel writes leave thousands of footer-dominated files; scans
    * then pay per-file open cost and planners per-file listing cost).
    *
    * Output file count is sized from the INPUT's on-disk bytes (driver-side
    * file-status listing — bounded metadata, no data read): parquet in ≈
    * parquet out, the same estimate real compactors use. With `orderBy`
    * keys the rewrite range-partitions + sorts so clustering (e.g. a prior
    * z-order) SURVIVES compaction and per-file min/max stats stay tight;
    * without, a round-robin shuffle equalizes file sizes exactly.
    *
    * Returns (filesBefore, filesAfter). One shuffle of the compacted data
    * total; at 100 TB this runs per partition / file group, not globally —
    * pass the subdirectory being compacted as `inDir`. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
              outDir: String, targetBytes: Long,
              orderBy: Seq[Column] = Nil): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val repart =
      if (orderBy.nonEmpty)
        df.repartitionByRange(nOut, orderBy: _*).sortWithinPartitions(orderBy: _*)
      else df.repartition(nOut)
    repart.write.mode("overwrite").parquet(outDir)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outDir)).toSeq
      .count(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        f.getLen > 0)
    (files.size, outFiles)
  }
}
