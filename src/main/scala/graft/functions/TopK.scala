package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a mergeable TypedImperativeAggregate —
  * the scale-correct replacement for the classic
  * `Window.partitionBy(lowCardKey) + row_number <= k` anti-pattern
  * (reference query shape: top-N per sentiment class,
  * sentiment_analysis.py:640-652, expressed there as SQLite
  * `ORDER BY ... LIMIT`).
  *
  * Why this shape for 100 TB: a rank window partitioned on a
  * low-cardinality key funnels EVERY row of a key into one task for a
  * full sort (even with WindowGroupLimit, each map task still sorts
  * its whole partition before the per-group limit). This aggregate
  * keeps an O(k) heap per group per task, combines map-side (the
  * merge IS the combine), and ships only ≤ k rows per (group, task)
  * through the exchange — no sort of the data anywhere, O(n log k)
  * total comparisons. Parallelism stays at the task count, not the
  * group count.
  *
  * Ordering contract: greatest `ord` first; ties broken by SMALLEST
  * `tie` (the deterministic-ranking idiom `ORDER BY v DESC, id ASC`).
  * Null `ord`/`tie` inputs are skipped by default — a null can never
  * be a top-k value under DESC NULLS LAST unless the group has fewer
  * than k non-null rows, which callers that allow nulls must handle
  * upstream. A caller REPLACING a rank window (q17) passes
  * `strict = true` to ENFORCE that precondition: a null input then
  * fails the query loudly instead of silently dropping rows the
  * window's NULLS LAST ordering would have kept.
  *
  * Output: array<struct<ord double, tie long>> sorted best-first, so
  * `posexplode` yields the rank as `pos + 1`. */
case class TopKBy(
    ord: Expression,
    tie: Expression,
    k: Int,
    strict: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBy.Buffer] with CodegenFallback {
  require(k >= 1, "k must be positive")

  import TopKBy.Buffer

  override def children: Seq[Expression] = Seq(ord, tie)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKBy.schema

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    // children are Cast-wrapped to (double, long) by the Column/SQL
    // constructors, so eval yields exactly those runtime types
    val o = ord.eval(input)
    val t = tie.eval(input)
    if (o != null && t != null) {
      buf.add(o.asInstanceOf[Double], t.asInstanceOf[Long])
    } else if (strict) {
      throw new IllegalStateException(
        "top_k_by(strict): null ord/tie input — NULLS LAST window padding is " +
          "not implemented; coalesce or filter nulls upstream, or drop strict " +
          "to skip them")
    }
    buf
  }

  override def merge(a: Buffer, b: Buffer): Buffer = {
    var i = 0
    while (i < b.size) { a.add(b.ords(i), b.ties(i)); i += 1 }
    a
  }

  override def eval(buf: Buffer): Any = {
    val rows = buf.sortedBestFirst.map { case (o, t) =>
      InternalRow(java.lang.Double.valueOf(o), java.lang.Long.valueOf(t))
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf.ords(i)); out.writeLong(buf.ties(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Buffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKBy =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKBy =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(ord = c(0), tie = c(1))
}

object TopKBy {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("tie", LongType, nullable = false))), containsNull = false)

  /** Flat-array bounded buffer: parallel double/long arrays of ≤ k
    * entries, worst entry found by linear scan on insert-when-full.
    * For the k this aggregate targets (top-5 … top-100) a scan beats
    * heap pointer-chasing and keeps (de)serialization allocation-free;
    * entries are UNORDERED until [[sortedBestFirst]]. */
  final class Buffer(k: Int) {
    val ords: Array[Double] = new Array[Double](k)
    val ties: Array[Long] = new Array[Long](k)
    var size: Int = 0

    /** a beats b under (ord DESC, tie ASC)? Double.compare, not raw
      * `>`: raw comparisons make NaN un-displaceable once inserted
      * (NaN > x and x > NaN are both false) and break the sort
      * contract below; Double.compare totals the order with NaN as
      * the LARGEST value — exactly how Spark SQL and DuckDB rank NaN
      * under DESC, so the aggregate stays window-parity even on NaN
      * inputs. */
    @inline private def beats(oa: Double, ta: Long, ob: Double, tb: Long): Boolean = {
      val c = java.lang.Double.compare(oa, ob)
      c > 0 || (c == 0 && ta < tb)
    }

    def add(o: Double, t: Long): Unit = {
      if (size < k) {
        ords(size) = o; ties(size) = t; size += 1
      } else {
        // locate the current worst; replace it iff the candidate beats it
        var worst = 0
        var i = 1
        while (i < size) {
          if (beats(ords(worst), ties(worst), ords(i), ties(i))) worst = i
          i += 1
        }
        if (beats(o, t, ords(worst), ties(worst))) { ords(worst) = o; ties(worst) = t }
      }
    }

    def sortedBestFirst: Array[(Double, Long)] =
      (0 until size).map(i => (ords(i), ties(i))).toArray
        .sorted(new Ordering[(Double, Long)] {
          // total order (NaN-safe): ord DESC via reversed
          // Double.compare, then tie ASC — a raw `>` sortWith would
          // violate the TimSort contract on NaN and throw
          def compare(a: (Double, Long), b: (Double, Long)): Int = {
            val c = java.lang.Double.compare(b._1, a._1)
            if (c != 0) c else java.lang.Long.compare(a._2, b._2)
          }
        })
  }

  /** Column API: top_k_by(ord, tie, k) → array<struct<ord, tie>>,
    * best-first under (ord DESC, tie ASC). Inputs are cast to
    * (double, long) — the numeric-ranking shape this aggregate serves.
    * `strict = true` rejects null inputs loudly (rank-window
    * replacement callers; see the class contract). */
  def top_k_by(ord: Column, tie: Column, k: Int, strict: Boolean = false): Column =
    GraftColumnBridge.column(
      TopKBy(Cast(GraftColumnBridge.expression(ord), DoubleType),
        Cast(GraftColumnBridge.expression(tie), LongType), k, strict)
        .toAggregateExpression())
}
