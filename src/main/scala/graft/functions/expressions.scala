package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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
  * All three are fully codegen'd (`doGenCode`) — they stay inside
  * WholeStageCodegen with no boxing and no per-row virtual-call
  * fallback (verified under spark.sql.codegen.factoryMode=CODEGEN_ONLY).
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

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch or null elements → null (DuckDB errors on the
    // former and propagates NULL on the latter; null is our safe
    // common denominator — never a silently-truncated similarity)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
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
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  boolean anyNull = false;
         |  for (int $i = 0; $i < $n && !anyNull; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { anyNull = true; }
         |    else {
         |      double $xi = $x.getDouble($i);
         |      double $yi = $y.getDouble($i);
         |      $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |    }
         |  }
         |  if (anyNull || $nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** JVM-static hashing helpers shared by the interpreted and
  * generated-code paths (Scala object methods surface as Java static
  * forwarders, callable from Janino-compiled codegen). */
object MinHashUtil {
  val Prime = 2038074743L // large prime; a*h+b stays well under Long overflow

  def tokenHash(t: UTF8String, seed: Int): Long =
    MurmurHash3.bytesHash(t.getBytes, seed).toLong & 0xffffffffL

  def tokenHash64(t: UTF8String, seed: Int): Long = {
    val bytes = t.getBytes
    val h1 = MurmurHash3.bytesHash(bytes, seed).toLong & 0xffffffffL
    val h2 = MurmurHash3.bytesHash(bytes, seed + 0x9e3779b9).toLong & 0xffffffffL
    (h1 << 32) | h2
  }

  /** (a_i, b_i) interleaved, derived deterministically from the seed. */
  def coefficients(k: Int, seed: Int): Array[Long] = {
    val rnd = new java.util.Random(seed.toLong)
    val out = new Array[Long](2 * k)
    var j = 0
    while (j < k) {
      out(2 * j) = 1L + math.abs(rnd.nextLong()) % (Prime - 1)
      out(2 * j + 1) = math.abs(rnd.nextLong()) % Prime
      j += 1
    }
    out
  }
}

/** MinHash signature: array<string> tokens → array<long> of k minimum
  * hash values under k independent permutations
  * h_i(t) = (a_i·m(t) + b_i) mod p, with m = MurmurHash3 over the
  * token shingle and (a_i, b_i) derived deterministically from the
  * seed. Standard MinHash (Broder 1997) as used for near-dup doc
  * detection in web-scale corpora. Empty input → signature of
  * Long.MaxValue. Fully codegen'd (`doGenCode`) — the signature
  * projection ahead of the LSH shuffle stays in WholeStageCodegen. */
case class MinHashSignature(child: Expression, k: Int, seed: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string> tokens, got ${other.sql}")
  }

  @transient private lazy val coefs: Array[Long] = MinHashUtil.coefficients(k, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val h = MinHashUtil.tokenHash(t, seed)
        var j = 0
        while (j < k) {
          val v = (coefs(2 * j) * h + coefs(2 * j + 1)) % MinHashUtil.Prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coefsRef = ctx.addReferenceObj("coefs", coefs, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = graft.functions.MinHashUtil.tokenHash($arr.getUTF8String($i), $seed);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($coefsRef[2 * $j] * $h + $coefsRef[2 * $j + 1]) % ${MinHashUtil.Prime}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash (Charikar 2002) over array<string> tokens: each
  * token hashes to 64 bits; bit positions vote ±1; the sign vector is
  * the fingerprint. Near-dups have small Hamming distance. Fully
  * codegen'd like [[MinHashSignature]]. */
case class SimHash64(child: Expression, seed: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string> tokens, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val h = MinHashUtil.tokenHash64(t, seed)
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val h = ctx.freshName("h"); val fp = ctx.freshName("fp")
      s"""
         |int $n = $arr.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = graft.functions.MinHashUtil.tokenHash64($arr.getUTF8String($i), $seed);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })
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

  def codepoint_rolling_hash(c: Column): Column =
    GraftColumnBridge.column(CodepointRollingHash(GraftColumnBridge.expression(c)))
}

/** Codepoint-level polynomial rolling hash:
  * fold(codepoints, 0)((acc, cp) => (acc*31 + cp) mod 1e9+7) —
  * matches DuckDB's per-character `unicode()` fold exactly, including
  * non-ASCII text (Spark's `split(str, "")` mangles multi-byte chars
  * into U+FFFD replacement bytes, which collides distinct non-ASCII
  * documents; this iterates real codepoints). Null → null; empty → 0.
  * Fully codegen'd via a static helper. */
case class CodepointRollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"codepoint_rolling_hash requires a string argument, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      CodepointRollingHash.hash(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CodepointRollingHash.hash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CodepointRollingHash {
  final val Mod = 1000000007L

  /** JVM-static fold over real codepoints (callable from codegen). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
