package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Multi-pattern exact-substring matching via an Aho–Corasick
  * automaton — the engine side of exact eval-set decontamination
  * (q182). Given a BOUNDED pattern set (an eval benchmark's probe
  * strings — thousands to low millions of short strings, the one
  * frame in this family that is small by construction), the automaton
  * is built ONCE on the driver and rides to every task as a codegen
  * reference object; each corpus document is then scanned in a single
  * O(len(text)) pass that reports WHICH patterns occur, independent
  * of the pattern count.
  *
  * Why this shape at 100 TB: the alternative engines are (a) one
  * `contains` scan per pattern — O(|patterns|) passes over the
  * corpus, (b) an n-gram equi-join — a corpus-sized shuffle of gram
  * fingerprints (q79's shape, right for APPROXIMATE overlap, wasteful
  * when the question is exact substring hits against a small probe
  * set), or (c) a BroadcastNestedLoopJoin on `contains` — one
  * in-memory pass but O(|patterns| · len) per row. The automaton is
  * one corpus pass, zero shuffle before the final projection, and
  * per-row cost O(len + hits).
  *
  * Matching is over UTF-16 char sequences (Java string semantics).
  * Substring containment agrees across the UTF-8 oracle (DuckDB
  * `contains`) and this UTF-16 scan: a valid UTF-8 encoding of a
  * pattern can only occur at a codepoint boundary of a valid UTF-8
  * document (continuation bytes cannot begin a character), so
  * byte-level and char-level containment coincide on well-formed
  * text.
  *
  * The classic construction: Aho & Corasick, "Efficient string
  * matching: an aid to bibliographic search", CACM 1975.
  */
object AhoCorasick {

  /** Compiled automaton. Children are per-node hash maps (pattern
    * alphabets are unbounded unicode — a dense array per node would
    * be 64 KiB/node); fail links and merged output lists are flat
    * arrays indexed by node id. Serializable: the whole structure is
    * primitive arrays + char-keyed maps, broadcast-friendly. */
  final class Automaton private[AhoCorasick] (
      private[AhoCorasick] val children: Array[mutable.HashMap[Char, Int]],
      private[AhoCorasick] val fail: Array[Int],
      // merged dictionary output per node: ids of every pattern ending
      // at this node OR at any fail-chain ancestor (precomputed so the
      // scan never walks fail chains on a hit)
      private[AhoCorasick] val out: Array[Array[Long]])
      extends Serializable {

    def nNodes: Int = children.length

    /** Distinct ids of every pattern occurring in `text`, ascending. */
    def matchIds(text: UTF8String): ArrayData = {
      val s = text.toString
      val hits = mutable.SortedSet.empty[Long]
      var state = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        var st = state
        var next = children(st).getOrElse(c, -1)
        while (next < 0 && st != 0) {
          st = fail(st)
          next = children(st).getOrElse(c, -1)
        }
        state = if (next >= 0) next else 0
        val o = out(state)
        var j = 0
        while (j < o.length) { hits += o(j); j += 1 }
        i += 1
      }
      new GenericArrayData(hits.toArray)
    }
  }

  /** Build the automaton from (patternId, pattern) pairs. Pattern ids
    * need not be unique (several probe windows may carry the same
    * eval-doc id — matches dedup at scan time) and empty patterns are
    * ignored. Driver-side, O(Σ len(pattern)). */
  def build(patterns: Iterable[(Long, String)]): Automaton = {
    val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])
    for ((id, p) <- patterns if p.nonEmpty) {
      var node = 0
      var i = 0
      while (i < p.length) {
        node = children(node).getOrElseUpdate(p.charAt(i), {
          children += mutable.HashMap.empty[Char, Int]
          ends += mutable.ArrayBuffer.empty[Long]
          children.length - 1
        })
        i += 1
      }
      ends(node) += id
    }
    val n = children.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Long]](n)
    out(0) = ends(0).distinct.sorted.toArray
    // BFS: fail(child of root) = root; fail(v via c from u) = the
    // deepest proper suffix state with a c-transition; out merges down
    val queue = mutable.Queue.empty[Int]
    for ((_, v) <- children(0)) { fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) = (ends(u) ++ out(fail(u))).distinct.sorted.toArray
      for ((c, v) <- children(u)) {
        var f = fail(u)
        var next = children(f).getOrElse(c, -1)
        while (next < 0 && f != 0) {
          f = fail(f)
          next = children(f).getOrElse(c, -1)
        }
        fail(v) = if (next >= 0 && next != v) next else 0
        queue += v
      }
    }
    new Automaton(children.toArray, fail.toArray, out)
  }

  /** Static entry the generated code calls (the Vader/Bpe pattern:
    * interpreted eval and codegen share ONE scoring loop). */
  def matchIds(text: UTF8String, ac: Automaton): ArrayData = ac.matchIds(text)

  /** `ac_match_ids(text)` → ARRAY<BIGINT> of the distinct pattern ids
    * occurring in `text`, ascending (empty array on no hit; null in →
    * null out). */
  def ac_match_ids(text: Column, ac: Automaton): Column =
    GraftColumnBridge.column(AcMatchIds(GraftColumnBridge.expression(text), ac))
}

/** Codegen'd multi-pattern match: the automaton rides as a reference
  * object; generated code calls the same static scan loop as
  * interpreted eval, so the expression stays inside whole-stage
  * codegen (no UDF, no serialization per row). */
case class AcMatchIds(child: Expression, ac: AhoCorasick.Automaton)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ac_match_ids requires a string argument, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    AhoCorasick.matchIds(v.asInstanceOf[UTF8String], ac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AhoCorasick.Automaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AhoCorasick.matchIds($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
