package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities — the shuffle-elimination path for repeated
  * fact-fact joins at 100 TB.
  *
  * A lineitem⋈orders join shuffles both sides on the order key every run.
  * Writing both tables bucketed (and sorted) by that key makes the join a
  * zip of co-located buckets: Spark plans a SortMergeJoin whose children
  * read pre-bucketed files with NO Exchange. At warehouse scale this is the
  * difference between moving 100 TB per join and moving nothing.
  * BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed + sorted managed table. Table names MUST be
    * graft-owned (`graft_` prefix) — enforced, because of the cleanup below.
    *
    * A killed JVM can leave the managed location on disk while the
    * in-memory catalog is fresh; CTAS then refuses with
    * LOCATION_ALREADY_EXISTS. If the table has no catalog entry, its
    * warehouse directory is stale debris — clear it before writing. The
    * cleanup is scoped to the enforced `graft_` namespace so a concurrent
    * session sharing the warehouse directory can never lose an unrelated
    * live table to this recovery path, and the warehouse location is
    * resolved with Hadoop Path (handles unencoded spaces and plain local
    * paths where java.net.URI throws). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(table.toLowerCase.startsWith("graft_"),
      s"writeBucketed owns only graft_-prefixed tables, got: $table")
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir")).toUri.getPath
      val loc = new java.io.File(wh, table.toLowerCase)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(loc)
      }
    }
    df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two tables bucketed on the same key with the same bucket count.
    * Broadcast is disabled for the call so the planner demonstrates the
    * bucket-join (in production you'd simply leave it to cost-based choice). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r.hint("merge"), key)
  }
}
