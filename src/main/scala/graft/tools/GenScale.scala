package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: replicates a driver testdata SF dir
  * (TESTDATA.md star schema) by an integer factor with key offsets, so a
  * 10× replica of sf0.1 stands in for sf1 — the round-14 verdict's
  * "scale-up proof" dataset. DuckDB computes oracles over the SAME output
  * parquet, so the whole Verify/check_oracle gate machinery runs
  * unchanged at the new SF.
  *
  * Replication contract (replica r of F, r = 0 is byte-identical source):
  *  - `region`/`nation`: fixed dimensions, copied once (TPC-H semantics —
  *    the driver's own SFs share them).
  *  - `customer`/`supplier`/`part`/`orders`/`lineitem`/`events`: replica
  *    rows get every key column offset by r × (source key cardinality);
  *    key-embedding names (`Customer#%09d`, `Supplier#%09d`) are rewritten
  *    from the new key so name↔key consistency survives. Foreign keys
  *    offset by the REFERENCED table's cardinality, preserving the dense
  *    0..N-1 keyspace and every join fan-out exactly. Timestamps are kept:
  *    F× rows in the same window = F× temporal density, which is what a
  *    larger deployment's day actually looks like (windows get F× heavier,
  *    window COUNT stays constant — scan-bound queries scale in rows).
  *  - `documents`: doc_id offset; for r > 0 each word is independently
  *    replaced (p ≈ 0.3, splitmix-hash decided, fully deterministic) by a
  *    vocab word drawn from the SOURCE corpus vocabulary, and n_chars is
  *    recomputed. This keeps token/length/vocab statistics near-identical
  *    while destroying cross-replica shingle overlap — replicas are
  *    independent corpora, not 10-cliques of exact duplicates that would
  *    turn every near-dup component into a star F× its true size.
  *  - `embeddings`: vec_id offset; for r > 0 deterministic per-dimension
  *    hash noise (±0.1) then re-normalized to unit length — cluster/label
  *    structure survives, vectors are distinct, IVF cells stay balanced.
  *
  * Usage: runMain graft.tools.GenScale <srcSfDir> <outDir> <factor>
  */
object GenScale {

  /** splitmix64 finalizer — the same public-domain mix every hash tool
    * uses; deterministic across JVMs, no RNG object state. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0,1) from a hash. */
  def unit(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorStr) = args
    val factor = factorStr.toInt
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, src, out, factor)
    finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
               factor: Int): Unit = {
    import spark.implicits._
    new java.io.File(out).mkdirs()

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // single-file outputs keep the layout identical in kind to the driver's
    // testdata (one parquet per table); row-group parallelism still gives
    // the scan 32-way splits at this size
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")

    // fixed dimensions: copy once
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    // replica index as a lateral explode: one scan, F output rows per
    // source row, no driver-side loop
    val reps = (0 until factor).toArray
    def replicate(df: DataFrame): DataFrame =
      df.withColumn("_r", explode(lit(reps)))

    val nCust = read("customer").count()
    val nSupp = read("supplier").count()
    val nPart = read("part").count()
    val nOrd  = read("orders").count()
    val nEvt  = read("events").count()
    val nUser = read("events").agg(max("user_id")).as[Long].head() + 1L
    val nDoc  = read("documents").count()
    val nVec  = read("embeddings").count()

    write(replicate(read("customer"))
      .withColumn("c_custkey", col("c_custkey") + col("_r") * nCust)
      .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
      .drop("_r"), "customer", factor)

    write(replicate(read("supplier"))
      .withColumn("s_suppkey", col("s_suppkey") + col("_r") * nSupp)
      .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))
      .drop("_r"), "supplier", 1)

    write(replicate(read("part"))
      .withColumn("p_partkey", col("p_partkey") + col("_r") * nPart)
      .drop("_r"), "part", factor)

    write(replicate(read("orders"))
      .withColumn("o_orderkey", col("o_orderkey") + col("_r") * nOrd)
      .withColumn("o_custkey", col("o_custkey") + col("_r") * nCust)
      .drop("_r"), "orders", factor)

    write(replicate(read("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("_r") * nOrd)
      .withColumn("l_partkey", col("l_partkey") + col("_r") * nPart)
      .withColumn("l_suppkey", col("l_suppkey") + col("_r") * nSupp)
      .drop("_r"), "lineitem", 4 * factor)

    write(replicate(read("events"))
      .withColumn("event_id", col("event_id") + col("_r") * nEvt)
      .withColumn("user_id", col("user_id") + col("_r") * nUser)
      .drop("_r"), "events", factor)

    // documents: deterministic vocab-preserving word substitution for r>0
    val vocab: Array[String] = read("documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().orderBy("w").as[String].collect() // small fixed vocab
    val vocabB = spark.sparkContext.broadcast(vocab)
    val perturbText = udf { (text: String, docId: Long, r: Int) =>
      if (r == 0 || text == null) text
      else {
        val v = vocabB.value
        val words = text.split(" ", -1)
        var i = 0
        while (i < words.length) {
          val h = mix(mix(docId * 1000003L + i) ^ (r * 0x9e3779b9L))
          if (unit(h) < 0.3 && words(i).nonEmpty)
            words(i) = v(((mix(h) >>> 33) % v.length).toInt)
          i += 1
        }
        words.mkString(" ")
      }
    }
    write(replicate(read("documents"))
      .withColumn("text", perturbText(col("text"), col("doc_id"), col("_r")))
      .withColumn("doc_id", col("doc_id") + col("_r") * nDoc)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_r"), "documents", factor)

    // embeddings: hash-noise + renormalize for r>0
    val perturbVec = udf { (emb: Seq[Float], vecId: Long, r: Int) =>
      if (r == 0 || emb == null) emb
      else {
        val a = emb.toArray
        var i = 0
        while (i < a.length) {
          val h = mix(mix(vecId * 10007L + i) ^ (r * 0x85ebca6bL))
          a(i) = a(i) + ((unit(h) - 0.5) * 0.2).toFloat
          i += 1
        }
        val norm = math.sqrt(a.foldLeft(0.0)((s, x) => s + x.toDouble * x)).toFloat
        if (norm > 0f) { var j = 0; while (j < a.length) { a(j) /= norm; j += 1 } }
        a.toSeq
      }
    }
    write(replicate(read("embeddings"))
      .withColumn("embedding",
        perturbVec(col("embedding"), col("vec_id"), col("_r")))
      .withColumn("vec_id", col("vec_id") + col("_r") * nVec)
      .drop("_r"), "embeddings", 1)

    println(s"[genscale] wrote $out at factor $factor from $src")
  }
}
