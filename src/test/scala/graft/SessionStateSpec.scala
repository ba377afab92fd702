package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.SessionState

/** flatMapGroupsWithState sessionization: gap-close, timeout-close,
  * state boundedness semantics. */
class SessionStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming sessionize: gap closes a session, watermark closes stragglers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sessions = SessionState.sessionize(
      mem.toDF().toDF("user_id", "ts", "value"), gapMs = 30 * 60 * 1000L,
      watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("fmgws_test")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then an event
      // 2 hours later (gap-close → emits first session, opens second)
      mem.addData(
        (1L, ts("2025-09-01 10:00:00"), 1.0),
        (1L, ts("2025-09-01 10:10:00"), 2.0),
        (2L, ts("2025-09-01 10:05:00"), 5.0))
      q.processAllAvailable()
      mem.addData((1L, ts("2025-09-01 12:10:00"), 3.0))
      q.processAllAvailable()
      // advance watermark far past everyone → timeout-close all open
      mem.addData((99L, ts("2025-09-01 20:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData((98L, ts("2025-09-02 10:00:00"), 0.0))
      q.processAllAvailable()

      val rows = spark.table("fmgws_test")
        .select($"user_id", $"n_events", $"sum_value", $"closed_by_timeout")
        .as[(Long, Long, Double, Boolean)].collect().toSet
      // user 1 session A: 2 events sum 3.0 closed by gap
      assert(rows.contains((1L, 2L, 3.0, false)), s"missing gap-closed session: $rows")
      // user 1 session B (1 event, 3.0) and user 2 (1 event, 5.0) closed by timeout
      assert(rows.contains((1L, 1L, 3.0, true)), s"missing timeout session u1: $rows")
      assert(rows.contains((2L, 1L, 5.0, true)), s"missing timeout session u2: $rows")
    } finally q.stop()
  }

  test("out-of-order events: within-gap extends session backwards, too-old closes alone") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sessions = SessionState.sessionize(
      mem.toDF().toDF("user_id", "ts", "value"), gapMs = 30 * 60 * 1000L,
      watermark = "2 hours") // wide watermark lets late rows through
    val q = sessions.writeStream.format("memory").queryName("ooo_test")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2025-09-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // late but within gap of session start → extends backwards
      mem.addData((1L, ts("2025-09-01 09:45:00"), 2.0))
      q.processAllAvailable()
      // older than start-gap (09:45-30min = 09:15) but still inside
      // the 2h watermark → own single-event session, closed immediately
      // (events BEHIND the watermark never reach the operator at all)
      mem.addData((1L, ts("2025-09-01 09:00:00"), 5.0))
      q.processAllAvailable()
      // flush remaining state
      mem.addData((99L, ts("2025-09-02 10:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData((98L, ts("2025-09-03 10:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("ooo_test").filter($"user_id" === 1)
        .select($"session_start", $"n_events", $"sum_value")
        .as[(Timestamp, Long, Double)].collect().toSet
      assert(rows.contains((ts("2025-09-01 09:00:00"), 1L, 5.0)),
        s"too-old event must close as its own session: $rows")
      assert(rows.contains((ts("2025-09-01 09:45:00"), 2L, 3.0)),
        s"late within-gap event must extend the session backwards: $rows")
    } finally q.stop()
  }

  test("batch q28 and a replay through the same gap logic agree on session counts") {
    // the driver-side fold of updateUser over a single user's events
    // must equal the window-function sessionization for that user
    val events = Tables.events(spark, sf)
      .filter($"user_id" === 7).orderBy($"ts")
      .select($"ts", $"value").collect()
      .map(r => SessionState.Event(7L, r.getTimestamp(0), r.getDouble(1)))
    // gap measured in integer MICROS exactly like q28 (ms truncation
    // here would disagree with the query near the 30-minute boundary)
    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
    var sessions = 0
    var last: Option[Long] = None
    events.foreach { e =>
      if (last.forall(l => micros(e.ts) - l > 1800000000L)) sessions += 1
      last = Some(micros(e.ts))
    }
    val q28 = graft.queries.EventQueries.sessionize(spark, sf)
      .filter($"user_id" === 7).count()
    assert(q28 == sessions, s"batch=$q28 fold=$sessions")
  }

  test("streaming trending: MG state accumulates across batches with valid bounds") {
    implicit val sqlCtx = spark.sqlContext
    // Option[Long] → nullable user_id: NULL events must be dropped by
    // the guard, not kill the query at the typed decode (ADVICE r02)
    val mem = MemoryStream[(String, Option[Long])]
    val trends = graft.streaming.TrendingState.trending(
      mem.toDF().toDF("event_type", "user_id"), capacity = 4, k = 2)
    val q = trends.writeStream.format("memory").queryName("trending_test")
      .outputMode("update").start()
    try {
      // batch 1: user 7 dominates clicks; one NULL user must be ignored
      mem.addData(("click", Some(7L)), ("click", Some(7L)), ("click", Some(7L)),
        ("click", Some(1L)), ("click", Some(2L)), ("click", None))
      q.processAllAvailable()
      // batch 2: more of user 7 plus churn that forces decrements (cap 4)
      mem.addData(("click", Some(7L)), ("click", Some(7L)), ("click", Some(3L)),
        ("click", Some(4L)), ("click", Some(5L)), ("click", Some(6L)),
        ("click", Some(8L)))
      q.processAllAvailable()
      import org.apache.spark.sql.functions.col
      val last = spark.table("trending_test").filter(col("event_type") === "click")
        .orderBy(col("n_events").desc).limit(1)
        .select("top_items", "top_ests", "max_err", "n_events", "n_tracked")
        .collect().head
      val items = last.getSeq[String](0)
      val ests = last.getSeq[Long](1)
      val maxErr = last.getLong(2)
      assert(last.getLong(3) == 12L, "state must accumulate across batches")
      assert(last.getInt(4) <= 4, "state bounded by capacity")
      assert(items.head == "7", s"dominant user must lead the trend: $items")
      // bound theorem: est <= true(=5 for user 7) <= est + max_err
      assert(ests.head <= 5L && ests.head + maxErr >= 5L,
        s"est ${ests.head} + err $maxErr must bracket true 5")
    } finally q.stop()
  }

  test("streaming trending bound-parity on the fixture under SHUFFLED replay") {
    // The MG sketch's counters are order-dependent, so exact
    // batch↔stream value parity is not a theorem — the BOUNDS are.
    // Replay the whole events fixture in arbitrary order across 3
    // micro-batches and check, per event type, against exact counts:
    // n_events is exact, every emitted estimate brackets its true
    // count within max_err, and state stays capacity-bounded.
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select($"event_type", $"user_id").as[(String, Long)].collect().toSeq
    val delivered = new scala.util.Random(41).shuffle(rows)
      .map { case (t, u) => (t, Option(u)) }
    val chunks = delivered.grouped(delivered.length / 3 + 1).map(_.toSeq).toSeq
    assert(chunks.length == 3)
    val mem = MemoryStream[(String, Option[Long])]
    val trends = graft.streaming.TrendingState.trending(
      mem.toDF().toDF("event_type", "user_id"), capacity = 16, k = 5)
    val q = trends.writeStream.format("memory").queryName("trending_parity")
      .outputMode("update").start()
    try {
      chunks.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val perType = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val finals = spark.table("trending_parity").collect()
        .map { r => (r.getString(0), r.getSeq[String](1), r.getSeq[Long](2),
          r.getLong(3), r.getLong(4), r.getInt(5)) }
        .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._5) }
      assert(finals.map(_._1).toSet == perType.keySet)
      finals.foreach { case (tpe, items, ests, maxErr, n, tracked) =>
        assert(n == perType(tpe), s"$tpe: n_events $n != exact ${perType(tpe)}")
        assert(tracked <= 16, s"$tpe: state exceeded capacity")
        items.zip(ests).foreach { case (item, est) =>
          val truth = exact((tpe, item.toLong))
          assert(est <= truth && truth <= est + maxErr,
            s"$tpe/$item: est $est + err $maxErr must bracket true $truth")
        }
      }
    } finally q.stop()
  }
}
