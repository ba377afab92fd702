package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming TOKEN-BUDGET ADMISSION gate — the streaming face of the
  * batch budget family (q70/q85/q98): admit documents per source while
  * the running token total stays within budget, as one stateful
  * operator with O(1) state per source, forever (no watermark needed —
  * the [[TopKState]]/[[TrendingState]] bounded-state property).
  *
  * SEMANTICS — honest about what a stream can and cannot promise:
  * q85/q98's QUALITY-RANKED selection is inherently batch (it needs a
  * global per-source sort by quality before any admission decision);
  * the streaming form is the PREFIX gate in processing order, the
  * q70 cum rule: every document advances the running total, and it is
  * admitted iff the total through itself is ≤ budget. Because the
  * total is monotone, admission has the PREFIX property — once a
  * source exhausts its budget, every later document is rejected —
  * and the batch sibling is exactly `cum ≤ budget` over the same
  * order (parity pinned in StreamingPipelineSpec for doc_id-ordered
  * arrival; under arbitrary arrival the ADMITTED SET legitimately
  * depends on arrival order, but the budget invariant and the prefix
  * property hold for every order — also spec'd).
  *
  * Within a micro-batch, documents are processed in doc_id order
  * (deterministic under Spark's unordered group iterator); ACROSS
  * batches, order is arrival — the ingest-gate semantics a 100 TB
  * collection pipeline actually runs ("stop taking from this source
  * once its budget is spent").
  */
object BudgetState {

  final case class Doc(source: String, doc_id: Long, n_tokens: Long)
  /** O(1) per-source state: the running token total. */
  final case class BState(cum: Long)
  final case class Admit(source: String, doc_id: Long, n_tokens: Long,
      cum_tokens: Long, admitted: Boolean)

  private[streaming] def updateKey(budget: Long)(
      key: String, events: Iterator[Doc], state: GroupState[BState]): Iterator[Admit] = {
    var cum = state.getOption.map(_.cum).getOrElse(0L)
    val out = events.toArray.sortBy(_.doc_id).map { d =>
      // q70's cum rule: EVERY doc advances the total (monotone ⇒
      // prefix admission ⇒ a batch filter reproduces the decision)
      cum += d.n_tokens
      Admit(key, d.doc_id, d.n_tokens, cum, cum <= budget)
    }
    state.update(BState(cum))
    out.iterator
  }

  /** docs(source, doc_id, n_tokens) stream → one admission row per
    * document (Append mode). Null keys/costs are dropped before the
    * typed decode (they can never be admitted; a non-nullable decode
    * would kill the query — the TopKState rule). */
  def admit(docs: DataFrame, budget: Long = 2048L): Dataset[Admit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("source").cast("string"), col("doc_id").cast("long"),
        col("n_tokens").cast("long"))
      .filter(col("source").isNotNull && col("doc_id").isNotNull &&
        col("n_tokens").isNotNull).as[Doc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[BState, Admit](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateKey(budget))
  }
}
