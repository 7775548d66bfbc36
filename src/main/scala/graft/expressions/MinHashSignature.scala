package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** MinHash signature of a distinct-shingle array<string>: for each of
  * `numHashes` hash functions, the minimum xxhash64 over all shingles.
  *
  * Hash values are IDENTICAL to the composable form
  * `transform(sequence(0, n-1), i -> array_min(transform(shingles, s ->
  * xxhash64(i, s))))` — per-function seed = XXH64.hashInt(i, 42) and
  * per-shingle hash = XXH64.hashUnsafeBytes(bytes, seed), the exact chain
  * Spark's XxHash64 expression computes for xxhash64(int, string). The
  * difference is execution: the lambda form interprets ~numHashes×|shingles|
  * boxed calls per row; this generates one two-level primitive loop under
  * whole-stage codegen. Measured 4× on the sf0.1 LSH dedup pass.
  *
  * Empty shingle arrays yield Long.MaxValue entries (the lambda form yields
  * nulls); empty documents should be filtered upstream either way.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  /** SQL callers reach this unchecked via GraftExtensions — gate the input
    * to array<string> so a wrong-typed argument is an analysis error, not a
    * runtime ClassCastException inside hashUTF8String. */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires an array<string> argument, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val seed = XXH64.hashInt(i, 42L)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        // null shingle hashes to the running seed itself — exactly what the
        // lambda form's xxhash64(i, NULL) yields (hash exprs skip nulls)
        val h =
          if (arr.isNullAt(j)) seed
          else XXH64.hashUTF8String(arr.getUTF8String(j), seed)
        if (h < m) m = h
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val seed = ctx.freshName("seed")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$numHashes];
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $seed = $xxh.hashInt($i, 42L);
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h;
         |    if ($a.isNullAt($j)) {
         |      $h = $seed;
         |    } else {
         |      org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
         |      $h = $xxh.hashUTF8String($s, $seed);
         |    }
         |    if ($h < $m) $m = $h;
         |  }
         |  $out[$i] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  import org.apache.spark.sql.GraftBridge

  def minhash(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), numHashes))
}
