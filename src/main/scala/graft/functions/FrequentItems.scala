package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items (heavy-hitters) sketch as a mergeable
  * TypedImperativeAggregate (Misra & Gries 1982; mergeability per
  * Agarwal et al. 2013, "Mergeable Summaries" — pointwise counter
  * add, then subtract the (capacity+1)-th largest and drop ≤0).
  *
  * The buffer keeps at most `capacity` counters plus the EXACT total
  * decrement `maxErr` applied so far, giving the two theorems the
  * self-validating q57 oracle pins to `true`:
  *   1. bound:    est ≤ true_count ≤ est + maxErr  for tracked items;
  *   2. coverage: every item with true_count > maxErr IS tracked
  *      (its estimate would still be positive after all decrements).
  * maxErr ≤ n/(capacity+1) where n is the stream length, and merge
  * preserves both (errors add).
  *
  * Why this shape for 100 TB: per-partition sketches combine map-side
  * (the merge IS the combine), the buffer is O(capacity), and stored
  * daily per-key sketches re-aggregate without rescanning raw data —
  * the standard "trending entities" primitive.
  *
  * Output struct: (items: array<struct<item string, est long>>,
  * max_err long), items sorted by est desc then item for determinism. */
case class FrequentItemsSketch(
    child: Expression,
    capacity: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FrequentItemsSketch.Buffer] with CodegenFallback {
  require(capacity >= 1, "capacity must be positive")

  import FrequentItemsSketch.Buffer

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = FrequentItemsSketch.schema

  override def createAggregationBuffer(): Buffer = new Buffer()

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    v match {
      case null => ()
      case s: UTF8String =>
        // transient lookup, clone only when a NEW key is inserted —
        // repeat hitters (the common case for a heavy-hitters stream)
        // cost zero allocations; the buffer must clone because `s`
        // may alias reused row memory
        buf.add(s, 1L, capacity)
      case other => buf.add(UTF8String.fromString(other.toString), 1L, capacity)
    }
    buf
  }

  override def merge(a: Buffer, b: Buffer): Buffer = {
    b.counters.foreach { case (k, c) => a.add(k, c, Int.MaxValue) }
    a.maxErr += b.maxErr
    a.shrinkTo(capacity)
    a
  }

  override def eval(buf: Buffer): Any = {
    // est desc, then item in UTF8String (byte-lexicographic) order —
    // deterministic; consumers re-sort on column values anyway
    val items = buf.counters.toArray
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0))
      .map { case (k, c) => InternalRow(k, java.lang.Long.valueOf(c)) }
    InternalRow(new GenericArrayData(items.asInstanceOf[Array[Any]]),
      java.lang.Long.valueOf(buf.maxErr))
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.maxErr)
    out.writeInt(buf.counters.size)
    // length-prefixed UTF-8 (writeUTF caps items at 64 KB — too small
    // for a generic Column API that may track long strings)
    buf.counters.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Buffer()
    buf.maxErr = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counters(UTF8String.fromBytes(b)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object FrequentItemsSketch {
  val schema: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("max_err", LongType, nullable = false)))

  final class Buffer {
    /** Keyed by UTF8String so the per-row update path needs no String
      * materialization: lookups use the (possibly memory-aliased)
      * input value directly, and only a NEW key pays a defensive
      * `clone()` on insert. */
    val counters: scala.collection.mutable.HashMap[UTF8String, Long] =
      scala.collection.mutable.HashMap.empty
    var maxErr: Long = 0L

    /** Misra–Gries step: count if tracked or free slot, else decrement
      * everyone (amortized O(1): each decrement pays for an increment). */
    def add(item: UTF8String, weight: Long, capacity: Int): Unit = {
      counters.get(item) match {
        case Some(c) => counters(item) = c + weight
        case None if counters.size < capacity => counters(item.clone()) = weight
        case None =>
          // decrement-all by min(weight, current minimum) steps; for
          // unit weights this is the classic subtract-1 pass (the new
          // item is "absorbed" when its weight is consumed entirely)
          var remaining = weight
          while (remaining > 0 && counters.size >= capacity) {
            val dec = math.min(remaining, counters.values.min)
            counters.keys.toArray.foreach { k =>
              val nv = counters(k) - dec
              if (nv <= 0) counters.remove(k) else counters(k) = nv
            }
            maxErr += dec
            remaining -= dec
          }
          if (remaining > 0) counters(item.clone()) = counters.getOrElse(item, 0L) + remaining
      }
    }

    /** Post-merge shrink (Agarwal et al.): subtract the (capacity+1)-th
      * largest counter value from all, drop non-positive. */
    def shrinkTo(capacity: Int): Unit = {
      if (counters.size > capacity) {
        val sorted = counters.values.toArray.sortBy(-_)
        val sub = sorted(capacity)
        maxErr += sub
        counters.keys.toArray.foreach { k =>
          val nv = counters(k) - sub
          if (nv <= 0) counters.remove(k) else counters(k) = nv
        }
      }
    }
  }

  /** Column API: freq_items(col, capacity) → (items, max_err). */
  def freq_items(c: Column, capacity: Int = 64): Column =
    GraftColumnBridge.column(
      FrequentItemsSketch(GraftColumnBridge.expression(c), capacity).toAggregateExpression())
}
