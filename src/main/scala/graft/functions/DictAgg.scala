package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mutable buffer for [[BoundedDistinct]]: the distinct values seen so
  * far, or an OVERFLOW flag once the cap is crossed (the set is
  * cleared at that point, so a high-cardinality column costs O(cap)
  * memory per task, never O(NDV) — the property that lets this ride a
  * 100 TB write job's CollectMetrics observation safely). */
final class BoundedDistinctBuffer(var overflow: Boolean,
    val set: java.util.TreeSet[UTF8String])

/** Distinct-set aggregate with a HARD cardinality cap — the
  * zone-manifest "dictionary" collector (VERDICT r13 #2): evaluates to
  * the SORTED exact distinct non-null values when there are at most
  * `cap` of them, and to NULL (overflow) otherwise. Unlike
  * `collect_set`, whose buffer grows with the true NDV (a driver/task
  * memory hazard inside an observation over an unbounded column),
  * this buffer clears itself at cap+1 and only carries the flag —
  * bounded memory by construction, no pre-pass needed to decide
  * whether a column is low-cardinality.
  *
  * Values sort by UTF8String's byte-wise comparison (the same UTF-8
  * BINARY order the zone manifests use), so eval is deterministic
  * given the input multiset — the CollectMetrics contract. */
case class BoundedDistinct(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedDistinctBuffer] {
  require(cap > 0, s"cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): BoundedDistinctBuffer =
    new BoundedDistinctBuffer(false, new java.util.TreeSet[UTF8String]())

  override def update(b: BoundedDistinctBuffer,
      input: InternalRow): BoundedDistinctBuffer = {
    if (!b.overflow) {
      val v = child.eval(input)
      if (v != null) {
        // copy: the input UTF8String points into a reused row buffer
        b.set.add(v.asInstanceOf[UTF8String].copy())
        if (b.set.size > cap) { b.overflow = true; b.set.clear() }
      }
    }
    b
  }

  override def merge(b: BoundedDistinctBuffer,
      o: BoundedDistinctBuffer): BoundedDistinctBuffer = {
    if (o.overflow) { b.overflow = true; b.set.clear() }
    else if (!b.overflow) {
      b.set.addAll(o.set)
      if (b.set.size > cap) { b.overflow = true; b.set.clear() }
    }
    b
  }

  override def eval(b: BoundedDistinctBuffer): Any =
    if (b.overflow) null
    else new GenericArrayData(b.set.toArray.asInstanceOf[Array[Any]])

  override def serialize(b: BoundedDistinctBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(b.overflow)
    out.writeInt(b.set.size)
    b.set.forEach { s =>
      val bytes = s.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedDistinctBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val overflow = in.readBoolean()
    val n = in.readInt()
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      set.add(UTF8String.fromBytes(arr))
      i += 1
    }
    new BoundedDistinctBuffer(overflow, set)
  }

  override def withNewMutableAggBufferOffset(n: Int): BoundedDistinct =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedDistinct =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedDistinct =
    copy(child = newChildren.head)
  override def prettyName: String = "bounded_distinct"
}
