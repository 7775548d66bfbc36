package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization kernels ([[graft.operators.Pq]]).
  *
  * The composable forms — one `aggregate(zip_with(...))` fold per
  * (subspace, centroid) — are correct but plan-hostile at 64 centroids:
  * the encode side alone is 512 interpreted higher-order subtrees, the
  * ADC scan carries ~1024, and analysis + interpretation dominated the
  * q169 wall-clock (10+ s at sf0.1 where the arithmetic itself is
  * milliseconds). These expressions generate tight fused loops inside
  * whole-stage codegen with the codebooks as one flat double[] reference
  * object. Same arithmetic, same order: sub-distances accumulate
  * left-to-right over the 8 dims, the ADC total accumulates s = 0..7 —
  * bit-identical to the fold forms and to the DuckDB oracle's
  * list_reduce (the swap cannot change any query result; PqSpec's JVM
  * recomputation and the q168/q169 oracle rows both pin it).
  */
object PqExpressions {
  import org.apache.spark.sql.GraftBridge

  /** Flatten books(s)(j)(i) to [((s·centroids) + j)·subDim + i]. */
  private[expressions] def flatten(books: Seq[Seq[Seq[Double]]]): Array[Double] =
    books.flatten.flatten.toArray

  def encode(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqEncodeCodes(GraftBridge.expression(vec), books))

  def adcDist(qvec: Column, codes: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqAdcDist(
      GraftBridge.expression(qvec), GraftBridge.expression(codes), books))
}

/** codes(s) = 1-based argmin over subspace s's centroids of the fold-order
  * squared distance, first-minimum tie-break — exactly
  * `array_position(dists, array_min(dists))` over per-centroid folds.
  * NULL for a NULL vector, a dimension mismatch, or a NULL element. */
case class PqEncodeCodes(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val subspaces = books.length
  private val centroids = books.head.length
  private val subDim = books.head.head.length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires array<double>, got ${t.sql}")
  }

  @transient private lazy val flat = PqExpressions.flatten(books)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != subspaces * subDim) return null
    val codes = new Array[Int](subspaces)
    var s = 0
    while (s < subspaces) {
      var best = Double.PositiveInfinity
      var bj = 0
      var j = 0
      while (j < centroids) {
        var d = 0.0
        val base = (s * centroids + j) * subDim
        var i = 0
        while (i < subDim) {
          if (a.isNullAt(s * subDim + i)) return null
          val x = a.getDouble(s * subDim + i) - flat(base + i)
          d += x * x
          i += 1
        }
        if (d < best) { best = d; bj = j }
        j += 1
      }
      codes(s) = bj + 1
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val best = ctx.freshName("best")
      val bj = ctx.freshName("bj")
      val base = ctx.freshName("base")
      val codes = ctx.freshName("codes")
      s"""
         |if ($a.numElements() != ${subspaces * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$subspaces];
         |  for (int $s = 0; $s < $subspaces && !${ev.isNull}; $s++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bj = 0;
         |    for (int $j = 0; $j < $centroids && !${ev.isNull}; $j++) {
         |      double $d = 0.0;
         |      int $base = ($s * $centroids + $j) * $subDim;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        if ($a.isNullAt($s * $subDim + $i)) { ${ev.isNull} = true; break; }
         |        double $x = $a.getDouble($s * $subDim + $i) - $booksRef[$base + $i];
         |        $d += $x * $x;
         |      }
         |      if (!${ev.isNull} && $d < $best) { $best = $d; $bj = $j; }
         |    }
         |    $codes[$s] = $bj + 1;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The ADC estimate: sum over subspaces (s = 0..7, left-associated) of the
  * fold-order squared distance between the query's sub-vector and the
  * CODED centroid — the identical doubles a per-query lookup table would
  * hold, recomputed per pair inside codegen (64 multiply-adds; a LUT
  * precompute becomes worthwhile only at ~10⁶ candidates per query, and
  * would produce the same bits). NULL for NULL/malformed inputs. */
case class PqAdcDist(left: Expression, right: Expression,
                     books: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {

  private val subspaces = books.length
  private val centroids = books.head.length
  private val subDim = books.head.head.length

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc requires (array<double>, array<int>), got ${l.sql} and ${r.sql}")
    }

  @transient private lazy val flat = PqExpressions.flatten(books)

  override def nullSafeEval(q: Any, c: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    if (qa.numElements() != subspaces * subDim ||
        ca.numElements() != subspaces) return null
    var total = 0.0
    var s = 0
    while (s < subspaces) {
      if (ca.isNullAt(s)) return null
      val code = ca.getInt(s)
      if (code < 1 || code > centroids) return null
      var d = 0.0
      val base = (s * centroids + (code - 1)) * subDim
      var i = 0
      while (i < subDim) {
        if (qa.isNullAt(s * subDim + i)) return null
        val x = qa.getDouble(s * subDim + i) - flat(base + i)
        d += x * x
        i += 1
      }
      total += d
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (qa, ca) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val code = ctx.freshName("code")
      val base = ctx.freshName("base")
      val total = ctx.freshName("total")
      s"""
         |if ($qa.numElements() != ${subspaces * subDim} ||
         |    $ca.numElements() != $subspaces) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $total = 0.0;
         |  for (int $s = 0; $s < $subspaces && !${ev.isNull}; $s++) {
         |    if ($ca.isNullAt($s)) { ${ev.isNull} = true; break; }
         |    int $code = $ca.getInt($s);
         |    if ($code < 1 || $code > $centroids) { ${ev.isNull} = true; break; }
         |    double $d = 0.0;
         |    int $base = ($s * $centroids + ($code - 1)) * $subDim;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      if ($qa.isNullAt($s * $subDim + $i)) { ${ev.isNull} = true; break; }
         |      double $x = $qa.getDouble($s * $subDim + $i) - $booksRef[$base + $i];
         |      $d += $x * $x;
         |    }
         |    if (!${ev.isNull}) { $total += $d; }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $total; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
