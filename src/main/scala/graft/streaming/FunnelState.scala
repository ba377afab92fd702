package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING sibling of the q90 sessionized funnel (reference intent:
  * the continuously-maintained `sentiment_summary` rollup,
  * sentiment_analysis.py:196-209, applied to the newest stateful
  * operator — q28's batch↔stream parity discipline): per 30-minute-gap
  * session, did the user progress view → click → purchase in STRICT
  * time order? Sessions close on gap or watermark timeout and emit one
  * row with the three step times, so a downstream aggregation over the
  * closed-session stream reproduces q90's conversion rollup
  * incrementally — no rescan of history.
  *
  * Strict-order step semantics are IDENTICAL to the batch query
  * (EventQueries.sessionSteps, pinned by the parity spec), on integer
  * MICROS: t_view = min view time; t_click = min click time > t_view;
  * t_purchase = min purchase time > t_click.
  *
  * State boundedness with out-of-order arrivals: a late view can LOWER
  * t_view, which can retroactively qualify an earlier click (and that
  * can re-qualify an earlier purchase), so the state must remember
  * more than the three current step times. It does NOT need the whole
  * session: t_view only decreases as events arrive, so the qualifying
  * click set only GROWS, so t_click only decreases — a click later
  * than the current t_click can never become the minimum. The state
  * therefore keeps only clicks ≤ current t_click and purchases ≤
  * current t_purchase (everything, while the step is still open).
  * In-order traffic keeps both lists at size ≤ 1; the lists grow only
  * with step-type events that PRECEDE their qualifying predecessor —
  * bounded by the session's out-of-order prefix, purged with the
  * session by the watermark. */
object FunnelState {

  final case class FEvent(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)

  final case class OpenFunnel(
      startUs: Long, lastUs: Long, nEvents: Long,
      minView: Option[Long], clicks: List[Long], purchases: List[Long])

  /** Session bounds and step times in epoch micros (the batch frame's
    * exact unit, so parity is integer equality, never fp formatting). */
  final case class ClosedFunnel(
      user_id: Long, t_start: Long, t_end: Long, n_events: Long,
      t_view: Option[Long], t_click: Option[Long], t_purchase: Option[Long],
      closed_by_timeout: Boolean)

  private[graft] def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** Current strict-order step times from the (pruned) state. */
  private[streaming] def steps(f: OpenFunnel): (Option[Long], Option[Long], Option[Long]) = {
    val tv = f.minView
    val tc = tv.flatMap(v => f.clicks.filter(_ > v).minOption)
    val tp = tc.flatMap(c => f.purchases.filter(_ > c).minOption)
    (tv, tc, tp)
  }

  /** Fold one event into an open session, preserving the pruning
    * invariant (keep clicks ≤ t_click, purchases ≤ t_purchase; keep
    * all while the step is unresolved). */
  private[streaming] def addEvent(f: OpenFunnel, eventType: String, tUs: Long): OpenFunnel = {
    val grown = eventType match {
      case "view" => f.copy(minView = Some(f.minView.fold(tUs)(math.min(_, tUs))))
      case "click" => f.copy(clicks = tUs :: f.clicks)
      case "purchase" => f.copy(purchases = tUs :: f.purchases)
      case _ => f
    }
    val (_, tc, tp) = steps(grown)
    grown.copy(
      startUs = math.min(f.startUs, tUs), lastUs = math.max(f.lastUs, tUs),
      nEvents = f.nEvents + 1,
      clicks = grown.clicks.filter(c => tc.forall(c <= _)),
      purchases = grown.purchases.filter(p => tp.forall(p <= _)))
  }

  private def fresh(eventType: String, tUs: Long): OpenFunnel =
    addEvent(OpenFunnel(tUs, tUs, 0L, None, Nil, Nil), eventType, tUs)

  private[streaming] def updateFunnel(
      gapUs: Long)(
      userId: Long, events: Iterator[FEvent], state: GroupState[OpenFunnel])
  : Iterator[ClosedFunnel] = {
    def close(f: OpenFunnel, byTimeout: Boolean): ClosedFunnel = {
      val (tv, tc, tp) = steps(f)
      ClosedFunnel(userId, f.startUs, f.lastUs, f.nEvents, tv, tc, tp, byTimeout)
    }

    if (state.hasTimedOut) {
      val out = state.getOption.map(close(_, byTimeout = true)).iterator
      state.remove()
      return out.toSeq.iterator
    }

    // same per-batch order as the batch window spec: (ts, event_id)
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedFunnel]
    sorted.foreach { e =>
      val t = micros(e.ts)
      open match {
        // merge window is [start-gap, last+gap]: a within-watermark
        // late event extends the session backwards (SessionState's rule)
        case Some(s) if t >= s.startUs - gapUs && t <= s.lastUs + gapUs =>
          open = Some(addEvent(s, e.event_type, t))
        case Some(s) if t > s.lastUs + gapUs =>
          closed += close(s, byTimeout = false)
          open = Some(fresh(e.event_type, t))
        case Some(_) => // t < start-gap: an earlier, already-complete session
          closed += close(fresh(e.event_type, t), byTimeout = false)
        case None =>
          open = Some(fresh(e.event_type, t))
      }
    }
    open.foreach { s =>
      state.update(s)
      // timeout once the watermark passes last-seen + gap (ceil to ms:
      // truncation would let the timeout fire inside the gap window)
      state.setTimeoutTimestamp((s.lastUs + gapUs + 999L) / 1000L)
    }
    closed.result().iterator
  }

  /** events(user_id, ts, event_id, event_type) stream → closed
    * session-funnel stream. The caller must watermark `ts`; output is
    * append-mode. One shuffle on user_id; state is per active user,
    * purged by the watermark. */
  def funnelize(events: DataFrame, gapMs: Long = SessionState.DefaultGapMs,
                watermark: String = "1 hour"): Dataset[ClosedFunnel] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select($"user_id".cast("long"), $"ts",
        $"event_id".cast("long"), $"event_type".cast("string"))
      .withWatermark("ts", watermark)
      .as[FEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenFunnel, ClosedFunnel](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateFunnel(gapMs * 1000L))
  }
}
