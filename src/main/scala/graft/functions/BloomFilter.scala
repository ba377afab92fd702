package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.util.hashing.MurmurHash3

/** Bloom-filter membership sketch (Bloom 1970; the double-hashing
  * scheme of Kirsch & Mitzenmacher 2006: bit_i = h1 + i·h2, which
  * preserves the asymptotic false-positive rate with two hash
  * evaluations per key).
  *
  * The 100 TB use is the BLOCKLIST SEMI-JOIN: instead of shuffling a
  * petabyte fact table against a membership list (or broadcasting a
  * list too large to broadcast), build this fixed-size sketch over
  * the list with ONE aggregation (map-side partial ORs — the merge is
  * a word-wise OR), ship the ~128 KB byte array to every task as an
  * expression literal, and pre-filter map-side. No false negatives
  * ever; false positives bounded by the sizing, so the exact join
  * that follows (if exactness is required) touches only the
  * surviving fraction. This mirrors Spark's own runtime row-group
  * filters, but as a first-class, storable, re-usable sketch.
  *
  * Default sizing: 2^20 bits (128 KB) with k=6 keeps fpp below 1%
  * up to ~90k distinct keys and degrades gracefully past it.
  * Duplicate inserts are idempotent, so the input needs NO distinct
  * pass — the build aggregates the raw filtered scan.
  */
object BloomUtil {
  /** splitmix64 finalizer — a full-avalanche bijection on Long. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Native-type hash (no per-row toString boxing), same dispatch
    * rule as [[HllDistinct.update]]. */
  def hashOf(v: Any): Long = v match {
    case l: java.lang.Long => mix(l ^ 0x0b100f117e3aL)
    case i: java.lang.Integer => mix(i.toLong ^ 0x0b100f117e3aL)
    case s: UTF8String =>
      val b = s.getBytes
      val h1 = MurmurHash3.bytesHash(b, 0x5ca1ab1e).toLong & 0xffffffffL
      val h2 = MurmurHash3.bytesHash(b, 0xca11ab1e).toLong & 0xffffffffL
      mix((h1 << 32) | h2)
    case d: java.lang.Double => mix(java.lang.Double.doubleToLongBits(d))
    case other =>
      mix(MurmurHash3.stringHash(other.toString, 0x5ca1ab1e).toLong)
  }

  def set(words: Array[Long], numBits: Int, numHashes: Int, h: Long): Unit = {
    val h1 = h
    val h2 = mix(h + 0x9e3779b97f4a7c15L) | 1L // odd => full-period stride
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  def test(words: Array[Long], numBits: Int, numHashes: Int, h: Long): Boolean = {
    val h1 = h
    val h2 = mix(h + 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Codegen entry point for [[BloomContains]]. */
  def testValue(words: Array[Long], numBits: Int, numHashes: Int, v: Long): Boolean =
    test(words, numBits, numHashes, hashOf(java.lang.Long.valueOf(v)))

  /** Header word tagging a SERIALIZED filter: magic in the high
    * bytes, numHashes in the low byte — so a probe can never run
    * with a k different from the build's (a silent k mismatch would
    * produce false negatives, violating the structure's core
    * contract). */
  private val Magic = 0x424C4F4F4D5F00L
  private val MagicMask = 0xFFFFFFFFFFFFFF00L

  /** Serialize a BUILT filter: header + words. */
  def toBytes(words: Array[Long], numHashes: Int): Array[Byte] = {
    require(numHashes > 0 && numHashes < 256, s"numHashes out of range: $numHashes")
    val bb = java.nio.ByteBuffer.allocate((words.length + 1) * 8)
    val lb = bb.asLongBuffer()
    lb.put(Magic | numHashes.toLong)
    lb.put(words)
    bb.array()
  }

  /** Parse a serialized filter back to (words, numHashes). */
  def fromBytes(bytes: Array[Byte]): (Array[Long], Int) = {
    require(bytes.length >= 16 && bytes.length % 8 == 0,
      s"not a serialized bloom filter (${bytes.length} bytes)")
    val lb = java.nio.ByteBuffer.wrap(bytes).asLongBuffer()
    val header = lb.get()
    require((header & MagicMask) == Magic,
      f"not a serialized bloom filter (header 0x$header%016x)")
    val words = new Array[Long](bytes.length / 8 - 1)
    lb.get(words)
    (words, (header & 0xFFL).toInt)
  }

  /** Raw word-array codec for the aggregation BUFFER (internal
    * shuffle format — headerless; the header is only stamped on the
    * final eval output). */
  def bufferToBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def bufferFromBytes(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(words)
    words
  }
}

/** `bloom_build(col)` — aggregates a column into a serialized Bloom
  * filter (BinaryType). Mergeable: the combine step is a word-wise
  * OR, so map-side partials and stored per-day sketches re-aggregate
  * without rescanning (union of blocklists = OR of their filters). */
case class BloomBuild(
    child: Expression,
    numBits: Int = 1 << 20,
    numHashes: Int = 6,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with CodegenFallback {

  require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // mirror BloomContains: a filter BUILT over a non-integral type
  // (double, decimal) would hash through a different path than the
  // integral-only probe and silently produce false negatives — make
  // the type mismatch loud at analysis time instead
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires an integral key (the probe side hashes " +
        s"through the integral path only), got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buf, numBits, numHashes, BloomUtil.hashOf(v))
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.toBytes(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomUtil.bufferToBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomUtil.bufferFromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomBuild = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuild = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** `bloom_contains(col, bytes)` — membership probe against a BUILT
  * filter carried as an expression parameter (the driver collects the
  * one-row build result — bounded at numBits/8 bytes — exactly like
  * Spark's own runtime bloom filters and the IVF centroid literals).
  * A parameter, not a column: a per-row BinaryType column would copy
  * the 128 KB array per probe; here the words deserialize once per
  * task. numHashes comes from the serialized header, so a probe can
  * never disagree with its build. Codegen'd via a static helper;
  * null in → null out. */
case class BloomContains(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val (words: Array[Long], numHashes: Int) =
    BloomUtil.fromBytes(bloomBytes)
  private def numBits: Int = (bloomBytes.length - 8) * 8

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires an integral argument, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    java.lang.Boolean.valueOf(
      BloomUtil.testValue(words, numBits, numHashes, v))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomUtil.testValue($w, $numBits, $numHashes, (long)($c))")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomFilter {
  def bloom_build(c: Column, numBits: Int = 1 << 20, numHashes: Int = 6): Column =
    GraftColumnBridge.column(
      BloomBuild(GraftColumnBridge.expression(c), numBits, numHashes).toAggregateExpression())

  def bloom_contains(c: Column, bloom: Array[Byte]): Column =
    GraftColumnBridge.column(
      BloomContains(GraftColumnBridge.expression(c), bloom))
}
