package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.util.hashing.MurmurHash3

/** Custom Catalyst expressions for the similarity/dedup operators the
  * built-in function set can't express efficiently (SURVEY §7 north
  * star; preference tier (b) of the build rules: native Expression
  * over UDF).
  *
  * - [[CosineSimilarity]]: full codegen (`doGenCode`) — stays inside
  *   WholeStageCodegen, no boxing, single pass over both arrays.
  * - [[MinHashSignature]] / [[SimHash64]]: interpreted eval (JVM-speed
  *   loop; CodegenFallback). They run once per document in a
  *   projection ahead of a shuffle, so the fallback boundary costs one
  *   virtual call per row, not per element.
  */

/** cosine(a, b) over two array<float|double> columns, accumulated in
  * double, evaluated left-to-right — numerically identical to the
  * DuckDB oracle's list_cosine_similarity on ::DOUBLE[] casts (both
  * are sequential double sums; verified to 1e-6 by the q45 oracle).
  * Null or zero-norm input → null. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i);
         |  double $yi = $y.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** MinHash signature: array<string> tokens → array<long> of k minimum
  * hash values under k independent permutations
  * h_i(t) = (a_i·m(t) + b_i) mod p, with m = MurmurHash3 over the
  * token shingle and (a_i, b_i) derived deterministically from the
  * seed. Standard MinHash (Broder 1997) as used for near-dup doc
  * detection in web-scale corpora. Empty input → signature of
  * Long.MaxValue. */
case class MinHashSignature(child: Expression, k: Int, seed: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Prime = 2038074743L // large prime < sqrt(Long.MaxValue)/2 scale-safe
  @transient private lazy val coefs: Array[(Long, Long)] = {
    val rnd = new java.util.Random(seed.toLong)
    Array.fill(k)((1L + math.abs(rnd.nextLong()) % (Prime - 1), math.abs(rnd.nextLong()) % Prime))
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val h = MurmurHash3.bytesHash(t.getBytes, seed).toLong & 0xffffffffL
        var j = 0
        while (j < k) {
          val (a, b) = coefs(j)
          val v = (a * h + b) % Prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash (Charikar 2002) over array<string> tokens: each
  * token hashes to 64 bits; bit positions vote ±1; the sign vector is
  * the fingerprint. Near-dups have small Hamming distance. */
case class SimHash64(child: Expression, seed: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val bytes = t.getBytes
        val h1 = MurmurHash3.bytesHash(bytes, seed).toLong & 0xffffffffL
        val h2 = MurmurHash3.bytesHash(bytes, seed + 0x9e3779b9).toLong & 0xffffffffL
        val h = (h1 << 32) | h2
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object expressions {
  /** Column API for [[CosineSimilarity]]; casts float arrays up. */
  def cosine_similarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a.cast(ArrayType(DoubleType))),
      GraftColumnBridge.expression(b.cast(ArrayType(DoubleType)))))

  def minhash_signature(tokens: Column, k: Int = 64, seed: Int = 42): Column =
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(tokens), k, seed))

  def simhash64(tokens: Column, seed: Int = 42): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens), seed))
}
