package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.operators.Cms

/** Native Count-Min sketch aggregate: folds BIGINT keys into the engine's
  * oracle-exact CMS cell counts ([[graft.operators.Cms]] — the same
  * degree-4 field-polynomial rows as the Column/SQL forms) inside one
  * ObjectHashAggregate partial/final pass.
  *
  * Same 100 TB rationale as [[HllRegisters]]: the DataFrame composition
  * (q94) explodes `depth` (row, bucket) tuples PER INPUT KEY into the cell
  * groupBy — correct, but the exchange carries depth× the stream. Here
  * each task folds its keys into one depth×width count buffer per group
  * and only those 64 KB buffers cross the wire. Merge is cell-wise SUM —
  * commutative/associative — so any partitioning or replay batching gives
  * identical cells, and streaming complete-mode replay ≡ batch (CmsSpec).
  *
  * Output: `array<bigint>` of length depth·width, cell (row i, bucket j)
  * at index i·width + j; zero = untouched. Exploding the non-zero slots
  * reproduces q94's sparse cell table exactly, which is how the q162 gate
  * row hash-matches q94's DuckDB oracle verbatim. NULL keys are skipped.
  *
  * SQL: `graft_cms(key)` via [[graft.GraftExtensions]].
  */
case class CmsCells(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_cms"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cms requires a bigint argument, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Cms.depth * Cms.width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var i = 0
      while (i < Cms.depth) {
        buf(i * Cms.width + Cms.bucketOfLong(key, i)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCells =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCells =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsCells =
    copy(child = newChild)
}

object CmsCells {
  import org.apache.spark.sql.GraftBridge

  /** Column-API form: `df.agg(CmsCells.cms(col("key")))`. */
  def cms(key: Column): Column =
    GraftBridge.column(CmsCells(GraftBridge.expression(key))
      .toAggregateExpression())
}
