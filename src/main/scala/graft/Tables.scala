package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver testdata star schema (TESTDATA.md).
  *
  * All engine queries read these via `spark.read.parquet` so the scan is a
  * vectorized `FileSourceScanExec` with column pruning + predicate pushdown —
  * at 100 TB the same call reads a partitioned table and Catalyst prunes
  * partitions/row-groups for free.
  */
object Tables {
  /** Parquet schema cache, keyed by file path + (mtime, size) so a
    * regenerated testdata file is re-inferred. Without it EVERY
    * `spark.read.parquet` call re-lists and re-reads the footer at
    * ANALYSIS time — driver-side, single-threaded, per query-plan
    * construction (the bench builds each query's plan fresh per rep, so
    * footer inference was paid ~245 × reps times per run). Passing the
    * cached schema explicitly skips inference; the scan itself is
    * unchanged (same columns, same pushdown). */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val f = new java.io.File(path)
    val key = s"$path@${f.lastModified()}:${f.length()}"
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** Schema-adaptive loader for `events.ts`: the testdata generator has
    * written this column as TIMESTAMP(NANOS), as timestamp[us] with a UTC
    * annotation, and as naive timestamp[us] across regenerations. Normalize
    * every physical layout to the engine-facing TimestampType:
    *  - NANOS (surfaces as LongType under `nanosAsLong`): truncate to
    *    micros — never crosses a second boundary, so hour/window/second-diff
    *    semantics match DuckDB's native ns handling;
    *  - naive timestamp[us] (surfaces as TimestampNTZType, which
    *    `unix_micros`/`session_window` reject): cast to TimestampType —
    *    with the UTC session timezone every main/test pins, the epoch is
    *    byte-identical to DuckDB's naive-as-UTC `epoch_us`;
    *  - UTC-annotated timestamp[us] (TimestampType): pass through.
    * TestdataSchemaSpec is the canary that fails FIRST, by name, if a
    * future regeneration invents a fourth layout. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The TimestampNTZ→Timestamp cast below is oracle-correct ONLY under a
    // UTC session timezone (DuckDB reads naive micros as UTC epochs). Every
    // entry point pins it already; pin it here too so a future main that
    // forgets the conf cannot silently shift every ts epoch.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already TimestampType
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  /** documents with the narrow-scan spread (guide §2.5: a one-file,
    * single-row-group table is unsplittable, so per-row token work runs
    * one task per file): token-HEAVY queries read this so the tokenize/
    * shingle/hash pass uses every core; a multi-file production table
    * makes it identical to [[documents]] (Tuning.spreadNarrowScan no-op).
    * Light projections should keep reading [[documents]] — the extra
    * exchange only pays for itself when per-row compute dominates. */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    Tuning.spreadNarrowScan(documents(s, d), s"$d/documents.parquet",
      org.apache.spark.sql.functions.col("doc_id"))
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
