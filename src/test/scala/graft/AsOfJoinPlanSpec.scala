package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.plans.{AsOfJoin, AsOfJoinExec}

/** The native AS-OF join operator (custom LogicalPlan + Strategy +
  * merge-scan SparkPlan): semantics on synthetic edges the fixture
  * can't produce, parity with the q59 window formulation, and the
  * physical plan shape (our exec node, fed by key exchanges). */
class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:00"), 10.0),
    (2L, "A", ts("2024-01-01 10:05:00"), 11.0),
    (3L, "B", ts("2024-01-01 10:01:00"), 20.0),
    (4L, "C", ts("2024-01-01 09:00:00"), 30.0) // before every quote
  ).toDF("trade_id", "sym", "t_ts", "px")

  private def quotes = Seq(
    ("A", ts("2024-01-01 09:59:00"), 9.8),
    ("A", ts("2024-01-01 10:05:00"), 10.9), // tied with trade 2 → inclusive
    ("A", ts("2024-01-01 10:30:00"), 12.0), // after every trade
    ("B", ts("2024-01-01 10:00:30"), 19.9),
    ("D", ts("2024-01-01 08:00:00"), 1.0)   // key with no trades
  ).toDF("q_sym", "q_ts", "bid")

  private def joined = AsOfJoin.asofJoin(trades, quotes,
    leftKeys = Seq("sym"), rightKeys = Seq("q_sym"),
    leftTimeCol = "t_ts", rightTimeCol = "q_ts")

  test("tolerance: boundary-inclusive, older matches null out, unmatched rows unchanged") {
    // trade 1 @10:00 ← quote A@09:59 (gap 60 s): kept at tol=60 s
    // (boundary inclusive, rTime ≥ lTime − tol), dropped at tol=59 s;
    // trade 2 @10:05 ← quote A@10:05 (gap 0): always kept;
    // trade 3 @10:01 ← quote B@10:00:30 (gap 30 s): kept at 60, dropped at 29;
    // trade 4 (no match): null either way.
    def bids(tolSec: Int): Map[Long, Option[Double]] =
      AsOfJoin.asofJoin(trades, quotes,
          leftKeys = Seq("sym"), rightKeys = Seq("q_sym"),
          leftTimeCol = "t_ts", rightTimeCol = "q_ts",
          tolerance = Some(expr(s"INTERVAL $tolSec SECONDS")))
        .select($"trade_id", $"bid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val at60 = bids(60)
    assert(at60(1L).contains(9.8), "60 s gap kept at tol=60 (inclusive boundary)")
    assert(at60(2L).contains(10.9) && at60(3L).contains(19.9))
    assert(at60(4L).isEmpty)
    val at59 = bids(59)
    assert(at59(1L).isEmpty, "60 s gap must drop at tol=59")
    assert(at59(2L).contains(10.9) && at59(3L).contains(19.9))
    val at29 = bids(29)
    assert(at29(3L).isEmpty, "30 s gap drops at tol=29")
    assert(at29(2L).contains(10.9))
  }

  test("forward as-of picks the EARLIEST right row at-or-after; tolerance bounds look-ahead") {
    def next(tolSec: Option[Int]): Map[Long, Option[Double]] =
      AsOfJoin.asofJoinForward(trades, quotes,
          leftKeys = Seq("sym"), rightKeys = Seq("q_sym"),
          leftTimeCol = "t_ts", rightTimeCol = "q_ts",
          tolerance = tolSec.map(t => expr(s"INTERVAL $t SECONDS")))
        .select($"trade_id", $"bid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val fwd = next(None)
    assert(fwd == Map(
      1L -> Some(10.9), // next A quote at 10:05 — not the earlier 09:59 one
      2L -> Some(10.9), // tie at 10:05 matches (inclusive ≥)
      3L -> None,       // B's only quote precedes the trade
      4L -> None))      // C: 09:00 trade has no later C quote at all
    // look-ahead bound: trade 1's next quote is 300 s ahead — dropped
    // at tol=299, kept at tol=300 (inclusive boundary)
    val at299 = next(Some(299))
    assert(at299(1L).isEmpty && at299(2L).contains(10.9))
    val at300 = next(Some(300))
    assert(at300(1L).contains(10.9))
    // helper negation columns must not leak into the output
    val cols = AsOfJoin.asofJoinForward(trades, quotes, Seq("sym"), Seq("q_sym"),
      "t_ts", "q_ts").columns.toSet
    assert(cols == (trades.columns ++ quotes.columns).toSet, s"got $cols")
  }

  test("nearest as-of picks the closer side; exact ties go backward (pandas rule)") {
    val got = AsOfJoin.asofJoinNearest(trades, quotes,
        leftKeys = Seq("sym"), rightKeys = Seq("q_sym"),
        leftTimeCol = "t_ts", rightTimeCol = "q_ts")
      .select($"trade_id", $"bid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(
      1L -> Some(9.8),  // bwd gap 60 s beats fwd gap 300 s
      2L -> Some(10.9), // exact hit (gap 0)
      3L -> Some(19.9), // only a backward candidate exists
      4L -> None))      // no candidate either direction
    // equidistant construction: left@10:02 between rights 10:01/10:03
    // (60 s each way) — the tie must resolve BACKWARD
    val l = Seq((1L, "K", ts("2024-01-01 10:02:00"))).toDF("id", "k", "lt")
    val r = Seq(("K", ts("2024-01-01 10:01:00"), "before"),
                ("K", ts("2024-01-01 10:03:00"), "after")).toDF("rk", "rt", "which")
    val tie = AsOfJoin.asofJoinNearest(l, r, Seq("k"), Seq("rk"), "lt", "rt")
      .select($"which").head().getString(0)
    assert(tie == "before", s"equidistant tie must go backward, got $tie")
  }

  test("backward as-of picks the latest right row at-or-before each left time") {
    val got = joined.select($"trade_id", $"bid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      1L -> Some(9.8),   // 09:59 quote, not the 10:05 one
      2L -> Some(10.9),  // equal timestamps match (inclusive ≤)
      3L -> Some(19.9),
      4L -> None))       // C has no quote at or before 09:00 → left outer null
  }

  test("strict mode (allow_exact_matches=False) skips equal-time rows without consuming them") {
    // trade 2 @10:05 ties quote A@10:05: inclusive matches the tied
    // quote, strict must fall back to the 09:59 one
    val strict = AsOfJoin.asofJoin(trades, quotes,
        leftKeys = Seq("sym"), rightKeys = Seq("q_sym"),
        leftTimeCol = "t_ts", rightTimeCol = "q_ts", allowExact = false)
      .select($"trade_id", $"bid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(strict == Map(
      1L -> Some(9.8),
      2L -> Some(9.8),  // tie excluded → previous quote, NOT 10.9
      3L -> Some(19.9),
      4L -> None))
    // the buffering property: an equal-time right row must not be
    // CONSUMED when skipped — a later left row past it still matches it.
    // left @10:01 (ties right) then @10:02 (strictly after right)
    val l = Seq((1L, "K", ts("2024-01-01 10:01:00")),
                (2L, "K", ts("2024-01-01 10:02:00"))).toDF("id", "k", "lt")
    val r = Seq(("K", ts("2024-01-01 10:01:00"), 7L)).toDF("rk", "rt", "rv")
    val got = AsOfJoin.asofJoin(l, r, Seq("k"), Seq("rk"), "lt", "rt",
        allowExact = false)
      .select($"id", $"rv").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got == Map(1L -> None, 2L -> Some(7L)),
      "the tied row must stay buffered for the next left row")
  }

  test("strict forward/nearest exclude exact ties") {
    val fwd = AsOfJoin.asofJoinForward(trades, quotes,
        leftKeys = Seq("sym"), rightKeys = Seq("q_sym"),
        leftTimeCol = "t_ts", rightTimeCol = "q_ts", allowExact = false)
      .select($"trade_id", $"bid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(fwd(2L).contains(12.0), s"strict forward must skip the 10:05 tie, got ${fwd(2L)}")
    assert(fwd(1L).contains(10.9), "non-tied forward matches unchanged")
    val near = AsOfJoin.asofJoinNearest(trades, quotes,
        leftKeys = Seq("sym"), rightKeys = Seq("q_sym"),
        leftTimeCol = "t_ts", rightTimeCol = "q_ts", allowExact = false)
      .select($"trade_id", $"bid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // trade 2 @10:05: strict bwd → 09:59 (gap 360 s), strict fwd →
    // 10:30 (gap 1500 s) — backward is closer
    assert(near(2L).contains(9.8), s"strict nearest must exclude the tie, got ${near(2L)}")
  }

  test("every left row survives; unmatched right columns are null") {
    assert(joined.count() == 4)
    assert(joined.filter($"q_ts".isNull && $"bid".isNull && $"q_sym".isNull).count() == 1)
  }

  test("multi-row keys advance the buffered match monotonically") {
    // ten left rows at increasing times over one key; right rows every
    // other tick — each left row must match the closest earlier tick
    val l = (1 to 10).map(i => (i.toLong, "K", ts(f"2024-01-01 10:$i%02d:00")))
      .toDF("id", "k", "lt")
    val r = (1 to 10 by 2).map(i => (s"K", ts(f"2024-01-01 10:$i%02d:00"), i.toLong))
      .toDF("rk", "rt", "rv")
    val got = AsOfJoin.asofJoin(l, r, Seq("k"), Seq("rk"), "lt", "rt")
      .select($"id", $"rv").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L,
      6L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 9L, 10L -> 9L))
  }

  test("parity with the q59 union+window formulation on the fixture") {
    val viaWindow = graft.queries.EventQueries.asofJoin(spark, sf).collect().toSeq
    val viaNative = graft.queries.EventQueries.asofJoinNative(spark, sf).collect().toSeq
    assert(viaNative == viaWindow)
  }

  test("plans as AsOfJoinExec over key-clustered exchanges") {
    def collectPlan(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectPlan(a.executedPlan)
      case other => other +: other.children.flatMap(collectPlan)
    }
    val df = joined
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    val nodes = collectPlan(df.queryExecution.executedPlan)
    val execs = nodes.collect { case e: AsOfJoinExec => e }
    assert(execs.size == 1, s"expected one AsOfJoinExec, plan:\n${df.queryExecution.executedPlan}")
    // EnsureRequirements must have inserted a hash exchange per side
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size >= 2, s"expected both sides exchanged, got ${shuffles.size}")
    // and the merge invariant: both children sorted by (key, time)
    execs.head.children.foreach { child =>
      assert(child.outputOrdering.size == 2,
        s"child must be sorted by (key, time), got ${child.outputOrdering}")
    }
  }

  test("filters above the custom node push into BOTH children (key mirror)") {
    // key predicate above the join: without PushFilterThroughAsOfJoin
    // the custom node is a pushdown barrier and both inputs scan fully
    val filtered = joined.filter($"sym" === "A" && $"px" > 10.0)
    val optimized = filtered.queryExecution.optimizedPlan
    // no Filter may remain above the AsOfJoin node…
    assert(!optimized.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter],
      s"filter not pushed:\n$optimized")
    // …and both children must now carry one
    val aj = optimized.collectFirst { case a: graft.plans.AsOfJoin => a }.get
    def hasFilter(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }.nonEmpty
    assert(hasFilter(aj.left), s"left child unfiltered:\n${aj.left}")
    assert(hasFilter(aj.right), s"right child (key mirror) unfiltered:\n${aj.right}")
    // px > 10.0 is not a key predicate: it pushes left only, so the
    // right filter must reference only the mirrored key
    val rightFilter = aj.right.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }.get
    assert(rightFilter.references.map(_.name).toSet == Set("q_sym"))
    // semantics unchanged
    assert(filtered.select($"trade_id", $"bid").collect().map(r =>
      r.getLong(0) -> r.getDouble(1)).toMap == Map(2L -> 10.9))
  }

  test("right-column predicates stay above the join (null-producing side)") {
    val filtered = joined.filter($"bid" > 10.0)
    val optimized = filtered.queryExecution.optimizedPlan
    // the Filter must NOT descend into the right child
    val aj = optimized.collectFirst { case a: graft.plans.AsOfJoin => a }.get
    assert(aj.right.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }.isEmpty,
      s"right-side filter wrongly pushed:\n$optimized")
    assert(filtered.select($"trade_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("ambiguous output names are refused") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(trades, trades, Seq("sym"), Seq("sym"), "t_ts", "t_ts")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("mismatched key/time types are refused (merge compares raw bytes)") {
    val r2 = quotes.select($"q_sym", unix_micros($"q_ts").as("q_ts"), $"bid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(trades, r2, Seq("sym"), Seq("q_sym"), "t_ts", "q_ts")
    }
    assert(e.getMessage.contains("time type mismatch"))
  }

  test("NULL keys and NULL times never match (SQL equality semantics)") {
    val l = Seq(
      (1L, Option("A"), Option(ts("2024-01-01 10:00:00"))),
      (2L, None, Option(ts("2024-01-01 10:00:00"))),       // null key
      (3L, Option("A"), None)                              // null time
    ).toDF("id", "k", "lt")
    val r = Seq(
      (Option("A"), Option(ts("2024-01-01 09:00:00")), 1L),
      (None, Option(ts("2024-01-01 09:00:00")), 2L),       // null key
      (Option("A"), None, 3L)                              // null time
    ).toDF("rk", "rt", "rv")
    val got = AsOfJoin.asofJoin(l, r, Seq("k"), Seq("rk"), "lt", "rt")
      .select($"id", $"rv").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .toMap
    // only the fully-non-null pair matches; null-key/null-time rows
    // on either side never pair with anything
    assert(got == Map(1L -> Some(1L), 2L -> None, 3L -> None))
  }

  test("projections above the custom node prune both children to used columns") {
    val narrow = joined.select($"trade_id", $"bid")
    val optimized = narrow.queryExecution.optimizedPlan
    val aj = optimized.collectFirst { case a: graft.plans.AsOfJoin => a }.get
    // left: trade_id + key + time; right: bid + key + time — px, head
    // payloads and unreferenced columns must be gone below the node
    assert(aj.left.output.map(_.name).toSet == Set("trade_id", "sym", "t_ts"),
      s"left not pruned: ${aj.left.output.map(_.name)}")
    assert(aj.right.output.map(_.name).toSet == Set("bid", "q_sym", "q_ts"),
      s"right not pruned: ${aj.right.output.map(_.name)}")
    assert(narrow.collect().length == 4)
  }
}
