package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.BudgetState

/** Streaming token-budget admission: batch↔stream parity under
  * in-order arrival, and the order-independent invariants (budget
  * bound, prefix admission, conservation) under shuffled arrival. */
class BudgetStateSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 1000L

  /** The batch model: q70's cum rule in the given order. */
  private def batchModel(docs: Seq[(String, Long, Long)]): Map[(String, Long), (Long, Boolean)] =
    docs.groupBy(_._1).flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._2).map { case (_, id, n) =>
        cum += n
        (src, id) -> (cum, cum <= budget)
      }
    }

  private def runStream(batches: Seq[Seq[(String, Long, Long)]], name: String): Map[(String, Long), (Long, Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val out = BudgetState.admit(
      mem.toDF().toDF("source", "doc_id", "n_tokens"), budget)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[BudgetState.Admit].collect()
      .map(a => (a.source, a.doc_id) -> (a.cum_tokens, a.admitted)).toMap
  }

  test("in-order arrival across batches ≡ the batch cum rule (state carries over)") {
    val docs = for (s <- Seq("a", "b", "c"); i <- 1L to 12L)
      yield (s, i, 70L + 13L * ((i + s.hashCode.abs) % 7))
    // two batches, doc_id order within each source preserved
    val (b1, b2) = docs.partition(_._2 <= 6L)
    val got = runStream(Seq(b1, b2), "budget_inorder")
    assert(got == batchModel(docs))
    // the budget BINDS: some admitted, some rejected, per source
    for (s <- Seq("a", "b", "c")) {
      val rows = got.collect { case ((`s`, id), v) => (id, v) }
      assert(rows.exists(_._2._2) && rows.exists(!_._2._2), s"budget must bind for $s")
    }
  }

  test("shuffled arrival: budget bound, prefix admission, conservation hold for ANY order") {
    val rnd = new scala.util.Random(13L)
    val docs = for (s <- Seq("x", "y"); i <- 1L to 20L)
      yield (s, i, 60L + rnd.nextInt(120).toLong)
    val shuffled = rnd.shuffle(docs)
    val batches = shuffled.grouped(7).toSeq
    val got = runStream(batches, "budget_shuffled")
    assert(got.size == docs.size, "every document gets an admission row")
    // (a) admitted ⟺ its running total fits — on every row
    got.foreach { case ((s, id), (cum, adm)) =>
      assert(adm == (cum <= budget), s"($s,$id) cum=$cum admitted=$adm")
    }
    for (s <- Seq("x", "y")) {
      val cums = got.collect { case ((`s`, _), (c, _)) => c }.toSeq.sorted
      // (b) cum is strictly monotone in processing order (positive
      // costs) ⇒ admission is a PREFIX of processing order
      assert(cums.distinct.size == cums.size)
      // (c) conservation: the final total is the source's full cost
      assert(cums.last == docs.filter(_._1 == s).map(_._3).sum)
    }
  }

  test("an exhausted source stays exhausted; other sources are unaffected") {
    val b1 = Seq(("hot", 1L, 900L), ("cold", 1L, 100L))
    val b2 = Seq(("hot", 2L, 200L), ("cold", 2L, 100L))  // hot would exceed
    val b3 = Seq(("hot", 3L, 1L), ("cold", 3L, 100L))    // even 1 token: rejected
    val got = runStream(Seq(b1, b2, b3), "budget_exhaust")
    assert(got(("hot", 1L))._2 && !got(("hot", 2L))._2 && !got(("hot", 3L))._2)
    assert(Seq(1L, 2L, 3L).forall(i => got(("cold", i))._2))
  }
}
