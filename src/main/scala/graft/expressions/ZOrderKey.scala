package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of the low `bits` bits of two non-negative
  * long keys: output bit 2i is bit i of `left`, bit 2i+1 is bit i of
  * `right`. Sorting by the result clusters rows that are close in BOTH
  * dimensions, which is the standard multi-column data-skipping layout for
  * 100 TB tables (Delta/Iceberg `OPTIMIZE ZORDER BY`, and the same curve
  * the classic UB-tree literature uses): after a z-ordered write, per-file
  * min/max stats are tight on every interleaved column at once, so a scan
  * filtered on EITHER key prunes most files — a plain lexicographic sort
  * only prunes on its leading column.
  *
  * This is a row-local, shuffle-free key computation (the partitioning work
  * belongs to repartitionByRange on the result — see
  * [[graft.operators.Layout]]). Implemented as a native codegen expression:
  * one primitive loop inside whole-stage codegen, no boxing.
  *
  * Inputs must already be range-reduced to `bits` bits (ranks, bucket ids,
  * or naturally bounded keys); higher bits are ignored by construction
  * (masked by the interleave), which this expression makes explicit rather
  * than silently wrapping: callers own the quantization step.
  *
  * Reference scope note: the reference never manages storage layout (its
  * batch input is a single CSV — /root/reference
  * src/main/scala/es/dmr/uimp/clustering/Clustering.scala:35-39); this
  * belongs to the training-data extension surface.
  */
case class ZOrderKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder requires two bigint arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = ZOrderKey.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.interleave($x, $y, $bits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Shared by interpreted and generated paths. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  import org.apache.spark.sql.GraftBridge

  def zorder(x: Column, y: Column, bits: Int): Column =
    GraftBridge.column(ZOrderKey(
      GraftBridge.expression(x), GraftBridge.expression(y), bits))

  /** The same interleave as portable SQL (DuckDB oracle mirror): the OR of
    * disjoint bit positions is a plain sum, so each term is
    * `((k >> i) & 1) << p` and the expression is engine-neutral integer
    * arithmetic — bit-identical to the codegen loop by construction. */
  def interleaveSql(x: String, y: String, bits: Int): String = {
    val terms =
      (0 until bits).map(i => s"((($x) >> $i) & 1) << ${2 * i}") ++
      (0 until bits).map(i => s"((($y) >> $i) & 1) << ${2 * i + 1}")
    terms.map(t => s"($t)").mkString("(", " + ", ")")
  }
}
