package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k aggregate over struct rows: keeps the k lexicographically
  * smallest inputs (field order = sort order, all ascending — callers encode
  * a descending field by negating it) and evaluates to them as a sorted
  * array.
  *
  * This is the aggregation-shaped top-k-per-group: a size-k bounded heap per
  * group with map-side partial aggregation, so each partition ships at most
  * k rows per group to the shuffle and NOTHING is ever sorted beyond k
  * elements. The window formulation it replaces
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`) must sort every
  * group's full row set — at 100 TB that is a full shuffle + sort of the
  * fact table versus this aggregate's k-rows-per-partition-per-group
  * exchange. Runs under ObjectHashAggregate (TypedImperativeAggregate), so
  * the group count, not the row count, bounds memory.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[InternalRow]] {

  require(k > 0, s"top_k_structs needs k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_k_structs requires a non-empty struct argument, got $other")
  }

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val fieldTypes = structType.fields.map(_.dataType).toSeq
  private lazy val ord = RowOrdering.createNaturalAscendingOrdering(fieldTypes)
  // max-heap: the WORST (largest) kept row sits at the head for eviction
  private lazy val cmp: Comparator[InternalRow] = ord.reversed()
  private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "top_k_structs"

  override def createAggregationBuffer(): PriorityQueue[InternalRow] =
    new PriorityQueue[InternalRow](k + 1, cmp)

  private def offer(buf: PriorityQueue[InternalRow], row: InternalRow): Unit =
    if (buf.size < k) buf.add(row.copy())
    else if (ord.compare(row, buf.peek()) < 0) { buf.poll(); buf.add(row.copy()) }

  override def update(buf: PriorityQueue[InternalRow], input: InternalRow): PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(buf: PriorityQueue[InternalRow], other: PriorityQueue[InternalRow]): PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: PriorityQueue[InternalRow]): Any = {
    val arr = buf.toArray(new Array[InternalRow](buf.size))
    java.util.Arrays.sort(arr, ord)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val u = toUnsafe(it.next())
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(child = newChildren.head)
}

object TopKStructs {
  /** Column-level entry point: `top_k_structs(structCol, k)` — aggregate
    * column yielding the k smallest structs, sorted ascending. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(TopKStructs(Bridge.expression(c), k).toAggregateExpression())
}
