package graft

import java.lang.Double.doubleToLongBits
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.TopKBy
import graft.streaming.TopKState

/** Streaming bounded top-k: batch↔stream parity with the q17 TopKBy
  * aggregate (the q28/q90 discipline, VERDICT r11 #1) under batch
  * splits AND arbitrary delivery order, plus the Update-mode emission
  * contract. NaN ords are compared by bit pattern — `==` on NaN would
  * vacuously fail the very case the buffer's Double.compare ordering
  * exists to get right. */
class TopKStateSpec extends SparkSpec {
  import spark.implicits._

  /** Final (top, n_events) per group after replaying `batches`; the
    * latest row per group is the one with the largest monotone
    * n_events (Update mode emits one row per touched group per
    * trigger, so no trigger bookkeeping is needed). */
  private def runStream(batches: Seq[Seq[(String, Double, Long)]], k: Int,
                        name: String): Map[String, (Seq[(Long, Long)], Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long)]
    val q = TopKState.topk(mem.toDF().toDF("group", "ord", "tie"), k)
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map { r => (r.getString(0),
          r.getSeq[Row](1).map(e => (doubleToLongBits(e.getDouble(0)), e.getLong(1))),
          r.getLong(2)) }
        .groupBy(_._1).map { case (g, rs) =>
          val last = rs.maxBy(_._3)
          g -> (last._2, last._3)
        }
    } finally q.stop()
  }

  /** The batch aggregate over the whole corpus, same comparison shape. */
  private def runBatch(rows: Seq[(String, Double, Long)], k: Int)
  : Map[String, (Seq[(Long, Long)], Long)] =
    rows.toDF("group", "ord", "tie")
      .groupBy($"group")
      .agg(TopKBy.top_k_by($"ord", $"tie", k).as("top"), count(lit(1)).as("n"))
      .collect()
      .map { r => r.getString(0) ->
        ((r.getSeq[Row](1).map(e => (doubleToLongBits(e.getDouble(0)), e.getLong(1))),
          r.getLong(2))) }
      .toMap

  test("fixture parity: shuffled replay across 4 micro-batches equals batch q17 aggregate") {
    val rows = Tables.events(spark, sf)
      .select($"event_type", $"value".cast("double"), $"event_id")
      .as[(String, Double, Long)].collect().toSeq
    val delivered = new scala.util.Random(17).shuffle(rows)
    val chunks = delivered.grouped(delivered.length / 4 + 1).map(_.toSeq).toSeq
    assert(chunks.length >= 4, s"harness must span >=4 micro-batches, got ${chunks.length}")
    val streamed = runStream(chunks, k = 5, name = "topk_parity")
    val batch = runBatch(rows, k = 5)
    assert(streamed == batch,
      s"diff groups: ${(streamed.keySet ++ batch.keySet).filter(g => streamed.get(g) != batch.get(g)).take(3)}")
  }

  test("parity fuzz: random corpora (duplicates, NaN), random k, splits, arbitrary order") {
    val rnd = new scala.util.Random(23)
    (1 to 8).foreach { trial =>
      val k = 1 + rnd.nextInt(7)
      val groups = Seq("a", "b", "c").take(1 + rnd.nextInt(3))
      val rows = (0 until 40 + rnd.nextInt(200)).map { i =>
        // small value range forces ord ties (tie column decides);
        // occasional NaN exercises the largest-value NaN ranking;
        // duplicate (ord, tie) pairs exercise multiset retention
        val ord = if (rnd.nextInt(20) == 0) Double.NaN else rnd.nextInt(6).toDouble
        val tie = (i % (10 + rnd.nextInt(30))).toLong
        (groups(rnd.nextInt(groups.length)), ord, tie)
      }
      val delivered = rnd.shuffle(rows)
      val chunks = delivered.grouped(
        math.max(1, delivered.length / (2 + rnd.nextInt(4)) + 1)).map(_.toSeq).toSeq
      val streamed = runStream(chunks, k, name = s"topk_fuzz_$trial")
      val batch = runBatch(rows, k)
      assert(streamed == batch,
        s"trial $trial (k=$k): " +
          s"diff=${(streamed.keySet ++ batch.keySet).filter(g => streamed.get(g) != batch.get(g))}")
    }
  }

  test("null semantics: n_events counts only rankable (non-null) events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Option[Double], Option[Long])]
    val q = TopKState.topk(mem.toDF().toDF("group", "ord", "tie"), 2)
      .writeStream.format("memory").queryName("topk_nulls").outputMode("update").start()
    try {
      mem.addData(("a", Some(1.0), Some(1L)), ("a", None, Some(2L)),
        ("a", Some(3.0), None), ("a", Some(2.0), Some(4L)))
      q.processAllAvailable()
      val aLast = spark.table("topk_nulls").collect().maxBy(_.getLong(2))
      // null-ord / null-tie rows can never rank (DESC NULLS LAST) and are
      // dropped before the typed decode, so n_events is 2, not 4 — the
      // DOCUMENTED divergence from batch count(lit(1)) on null-bearing
      // input (TopKState.topk Scaladoc; ADVICE r12)
      assert(aLast.getLong(2) == 2L, s"n_events must count non-null events only: $aLast")
      assert(aLast.getSeq[Row](1).map(e => (e.getDouble(0), e.getLong(1))) ==
        Seq((2.0, 4L), (1.0, 1L)), s"nulls must not enter the buffer: $aLast")
    } finally q.stop()
  }

  test("Update-mode emission: only touched groups emit; n_events is monotone") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long)]
    val q = TopKState.topk(mem.toDF().toDF("group", "ord", "tie"), 2)
      .writeStream.format("memory").queryName("topk_emit").outputMode("update").start()
    try {
      mem.addData(("a", 1.0, 1L), ("b", 2.0, 2L)); q.processAllAvailable()
      val afterFirst = spark.table("topk_emit").collect()
      assert(afterFirst.map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
      // second trigger touches only "a": no new "b" row, and a's
      // count advances while its top-2 absorbs the better value
      mem.addData(("a", 5.0, 3L)); q.processAllAvailable()
      val rows = spark.table("topk_emit").collect()
      assert(rows.count(_.getString(0) == "b") == 1, "untouched group must not re-emit")
      val aLast = rows.filter(_.getString(0) == "a").maxBy(_.getLong(2))
      assert(aLast.getLong(2) == 2L, s"n_events must count all a-events: $aLast")
      assert(aLast.getSeq[Row](1).map(e => (e.getDouble(0), e.getLong(1))) ==
        Seq((5.0, 3L), (1.0, 1L)), s"running top-2 wrong: $aLast")
    } finally q.stop()
  }
}
