package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Scale-safe per-group top-k selection.
  *
  * The naive plan for "keep the k best rows per group" is
  * `row_number() OVER (PARTITION BY group ORDER BY priority)` — which
  * shuffles the WHOLE table into one partition per group and fully sorts
  * there. For low-cardinality groups (a handful of sources, 5 event
  * types) that is a full-table sort at parallelism |groups| — the same
  * scale-killer class the q81 p99 rewrite removed (see
  * [[graft.queries.Stats.p99PerType]]).
  *
  * [[capPerGroup]] replaces it with distributed selection over a coarse
  * pre-bucketed priority (the content-hash bucket the curation queries
  * already rank on):
  *
  *   1. per-(group, bucket) counts — ONE map-side-combined aggregate; the
  *      combined output is ≤ |groups|·|buckets| rows regardless of input
  *      size.
  *   2. cumulative counts over that bounded table find each group's
  *      cutoff bucket b*: every row with bucket < b* is kept outright
  *      (fewer than k of them by construction), and only bucket == b*
  *      needs tie-breaking.
  *   3. the b* rows feed a BOUNDED bottom-k aggregate ([[BottomKLongs]]:
  *      buffer ≤ k ids, partially aggregatable, so map-side combine keeps
  *      at most k ids per task — a hot group never materializes).
  *   4. the ≤ k survivors per group get their final rank from a window
  *      over ≤ k rows per group — the bounded-table window pattern.
  *
  * Two columnar scans of the input, no input-sized sort, no
  * group-partitioned shuffle of raw rows. Output matches the naive window
  * row-for-row (asserted in CurationSpec against the window formulation).
  */
object Selection {

  /** Bounded bottom-k: retains the k smallest longs seen, sorted
    * ascending. The buffer never exceeds k elements, and merge is a
    * sorted-merge + truncate — safe as a partial aggregate on any
    * group size. */
  class BottomKLongs(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], v: Long): Array[Long] = {
      if (buf.length < k) insertSorted(buf, v)
      else if (v < buf(k - 1)) insertSorted(java.util.Arrays.copyOfRange(buf, 0, k - 1), v)
      else buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var m = 0
      while (m < out.length) {
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { out(m) = a(i); i += 1 }
        else { out(m) = b(j); j += 1 }
        m += 1
      }
      out
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    private def insertSorted(buf: Array[Long], v: Long): Array[Long] = {
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid) <= v) lo = mid + 1 else hi = mid
      }
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = v
      System.arraycopy(buf, lo, out, lo + 1, buf.length - lo)
      out
    }
  }

  /** Bounded-memory Misra-Gries frequency summary over a string stream:
    * at most k counters per buffer, partially aggregatable (the merge
    * combines counts then subtracts the (k+1)-th largest, the standard
    * mergeable-summaries result), with the classic guarantee that any
    * element with true frequency > n/k survives to the final summary —
    * undercounted, but never absent. Candidates only; an exact second
    * pass over the candidate set turns the sketch into an exact
    * heavy-hitter answer (no false negatives by the guarantee, false
    * positives die on the exact counts). */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Array[String]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
      buf.get(v) match {
        case Some(c) => buf.updated(v, c + 1L)
        case None if buf.size < k => buf.updated(v, 1L)
        case None => // decrement-all step: drop zeros, v itself is absorbed
          buf.collect { case (t, c) if c > 1L => t -> (c - 1L) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val comb = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
      if (comb.size <= k) comb
      else {
        // subtract the (k+1)-th largest count from everything, keep positive
        val counts = comb.values.toArray
        java.util.Arrays.sort(counts)
        val sub = counts(comb.size - k - 1)
        comb.collect { case (t, c) if c > sub => t -> (c - sub) }
      }
    }

    override def finish(buf: Map[String, Long]): Array[String] = buf.keys.toArray.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** Keep the k smallest (bucketCol, idCol) rows per groupCol, with their
    * 1-based rank as `keep_rank` — equivalent to
    * `row_number() OVER (PARTITION BY group ORDER BY bucket, id) <= k`
    * without the input-sized per-group sort. `bucketCol` must be a coarse
    * integer priority (bounded domain, e.g. a content-hash percent
    * bucket); `idCol` a unique long tie-break. */
  def capPerGroup(df: DataFrame, groupCol: String, bucketCol: String,
                  idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val g = col(groupCol); val b = col(bucketCol); val id = col(idCol)

    val overBuckets = Window.partitionBy(groupCol).orderBy(bucketCol)
    // bounded: ≤ |groups|·|buckets| rows after the map-side-combined agg
    val cut = df.groupBy(g, b).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(overBuckets))
      .filter(col("cum") - col("cnt") < k && lit(k) <= col("cum"))
      .select(g.as("cut_group"), b.as("cut_bucket"),
        (col("cum") - col("cnt")).as("below"))

    val joined = df.join(broadcast(cut), g === col("cut_group"), "left")
    // strictly before the cutoff bucket (or no cutoff at all: the whole
    // group has fewer than k rows) — kept outright, < k per group
    val whole = joined
      .filter(col("cut_bucket").isNull || b < col("cut_bucket"))
      .select(g, b, id)
    // the cutoff bucket: bounded bottom-k over ids, then take the
    // remaining k − below slots in ascending order
    val bottomK = udaf(new BottomKLongs(k), Encoders.scalaLong)
    val border = joined.filter(b === col("cut_bucket"))
      .groupBy(col("cut_group"), col("cut_bucket"), col("below"))
      .agg(bottomK(id).as("ids"))
      .select(col("cut_group").as(groupCol), col("cut_bucket").as(bucketCol),
        explode(slice(col("ids"), lit(1), (lit(k) - col("below")).cast("int"))).as(idCol))

    // final rank over ≤ k survivors per group — bounded-table window
    val overSurvivors = Window.partitionBy(groupCol).orderBy(bucketCol, idCol)
    whole.unionByName(border)
      .withColumn("keep_rank", row_number().over(overSurvivors))
  }
}
