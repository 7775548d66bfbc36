package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.operators.Hll

/** Native HyperLogLog register aggregate: folds BIGINT ids into the
  * engine's oracle-exact HLL state ([[graft.operators.Hll]] — the same
  * cross-engine polynomial hash, bucket, and rank arithmetic as the
  * Column/SQL forms) inside ONE ObjectHashAggregate partial/final pass.
  *
  * This is the 100 TB shape for sketch building. The DataFrame
  * composition (q93) shuffles a (group, bucket) pair PER INPUT ROW to the
  * register groupBy — correct, but the exchange carries the fact table.
  * As a TypedImperativeAggregate the registers fold map-side: each task
  * reduces its rows into m-byte buffers per group, and only those buffers
  * (4 KB each, one per group per task) cross the wire — the exchange
  * carries sketches, not rows, exactly like the `graft_topk` family
  * ([[TopKRows]]). Merge is elementwise register max — commutative,
  * associative, idempotent — so ANY partitioning, merge order, or
  * duplicate delivery converges to identical registers, and the streaming
  * complete-mode replay is bit-equal to batch (HllSpec asserts both).
  *
  * Output: `array<bigint>` of length [[Hll.m]] — register j's max rank,
  * 0 for never-touched buckets. Plan-level `filter`/`aggregate` lambdas
  * derive q93's (active, s_scaled, raw_est) from it with the same exact
  * integer arithmetic, which is how the q160 gate row hash-matches q93's
  * DuckDB oracle verbatim. NULL ids are skipped (SQL aggregate
  * semantics); a group with no non-null input yields the all-zero
  * register array (an empty sketch, estimating 0), never NULL.
  *
  * SQL: `graft_hll(id)` via [[graft.GraftExtensions]].
  */
case class HllRegisters(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_hll"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hll requires a bigint argument, got ${t.sql}")
  }

  /** One byte per register (ranks are ≤ [[Hll.maxRank]] = 51): the buffer
    * IS its own serialized form. */
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Hll.hashLong(v.asInstanceOf[Long])
      val b = Hll.bucketOfLong(h)
      val r = Hll.rankOfLong(h).toByte
      if (r > buf(b)) buf(b) = r
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < Hll.m) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Long](Hll.m)
    var i = 0
    while (i < Hll.m) { out(i) = buf(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}

object HllRegisters {
  import org.apache.spark.sql.GraftBridge

  /** Column-API form: `df.groupBy(g).agg(HllRegisters.hll(col("id")))`. */
  def hll(id: Column): Column =
    GraftBridge.column(HllRegisters(GraftBridge.expression(id))
      .toAggregateExpression())
}
