package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (the
  * KeyValueGroupedDataset state API named in the build spec): event
  * sessionization — group events per user, close a session once the
  * **watermark** passes `last_event + gap` (event-time timeout), emit
  * one summary row per closed session.
  *
  * Event-time (not processing-time) timeouts on purpose: session
  * boundaries depend on the data, not on wall-clock scheduling — runs
  * are deterministic and replayable, and late events within the
  * watermark still join their session.
  *
  * The state per key is a fixed-size accumulator (count, sum, bounds) —
  * O(1) memory per active user regardless of event volume, the shape
  * that scales to 10⁸ concurrent keys with the RocksDB state store.
  *
  * `total` follows the SAME fixed-point contract as [[sessionsBatch]]
  * (per-event `round(value·scale)` accumulated exactly, divided back on
  * emit): the streaming and batch twins — and the external SQL oracle —
  * produce bit-identical totals regardless of fold/aggregation order.
  */
object Sessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(count: Long, sum: Double, start: Long, last: Long)
  case class Session(user_id: Long, n_events: Long, total: Double,
                     start_millis: Long, end_millis: Long)

  /** @param watermarkMs late-data tolerance; defaults to `gapMs`. Raising
    *   it past the gap admits events that precede an open session by more
    *   than a gap — those fold into their own earlier session (see the
    *   stray handling below) instead of corrupting the open one. */
  def sessions(events: Dataset[Event], gapMs: Long,
               watermarkMs: Long = -1L,
               valueScale: Long = 1000000L): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    val delay = if (watermarkMs >= 0) watermarkMs else gapMs
    events
      .withWatermark("ts", s"$delay milliseconds")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.count, s.sum / valueScale, s.start, s.last))
          } else {
            // fold in event-time order, CLOSING a session whenever the
            // gap to the previous event exceeds gapMs — new data for a
            // key suppresses its timeout callback, so the gap check must
            // also happen here or sessions would merge across gaps
            // (matching sessionsBatch, the oracle twin)
            val closed = scala.collection.mutable.ArrayBuffer[Session]()
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            val start = state.getOption
            def fold(evts: Seq[Event], init: Option[SessionState]): Option[SessionState] =
              evts.foldLeft(init) { (acc, e) =>
                val t = e.ts.getTime
                val fx = Math.round(e.value * valueScale).toDouble
                acc match {
                  case Some(s) if t - s.last > gapMs =>
                    closed += Session(user, s.count, s.sum / valueScale, s.start, s.last)
                    Some(SessionState(1L, fx, t, t))
                  case Some(s) =>
                    Some(SessionState(s.count + 1, s.sum + fx,
                      math.min(s.start, t), math.max(s.last, t)))
                  case None => Some(SessionState(1L, fx, t, t))
                }
              }
            // Events BEFORE the open session's start (admissible when the
            // watermark lags this key) may belong to earlier, already
            // complete sessions — or may chain, event to event, back into
            // the open one. Split the prefix into gap-separated segments:
            // every segment but the last is > gap from its successor and
            // transitively from the open session, so it closes on its own;
            // the last segment merges into the open session iff its final
            // event is within gap of the open start (chaining through
            // in-batch events, not just distance-to-start — a 19100,19600
            // prefix with gap 500 and open start 20000 is ONE chain).
            // (If a stray would have bridged via an intermediate event
            // inside the open session's span, the O(1) aggregate state
            // cannot see that event — that residual divergence from a
            // full-log sort is the price of bounded state.)
            val (pre, rest) = start match {
              case Some(s0) => sorted.span(_.ts.getTime < s0.start)
              case None => (Seq.empty[Event], sorted)
            }
            val segments = pre.foldLeft(Vector.empty[Vector[Event]]) { (acc, e) =>
              acc.lastOption match {
                case Some(seg) if e.ts.getTime - seg.last.ts.getTime <= gapMs =>
                  acc.init :+ (seg :+ e)
                case _ => acc :+ Vector(e)
              }
            }
            val (toClose, toMerge) = start match {
              case Some(s0) if segments.nonEmpty &&
                  s0.start - segments.last.last.ts.getTime <= gapMs =>
                (segments.init, segments.last)
              case _ => (segments, Vector.empty[Event])
            }
            toClose.foreach(seg => fold(seg, None).foreach(s =>
              closed += Session(user, s.count, s.sum / valueScale, s.start, s.last)))
            val open = fold(toMerge ++ rest, start)
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.last + gapMs)
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }

  /** Batch-mode sessionization (same semantics as the streaming path):
    * a new session starts when the gap to the previous event exceeds
    * `gapMs` (strictly — an event exactly `gapMs` later stays in the
    * session); summary row per session. Used as the oracle-checkable
    * twin of the streaming path.
    *
    * Plan shape: ONE exchange — `session_window` grouping sorts each
    * user's events once and merges adjacent windows in the same pass
    * (`MergingSessionsExec`). The previous lag-flag + running-sum +
    * regroup spelling carried every event through a window exchange AND
    * an aggregation exchange. Two rewrites make the semantics exact:
    * the gap contract here is `unix_millis(ts2) − unix_millis(ts1) >
    * gapMs` (MILLISECOND-truncated difference, strict), while Spark's
    * session merge rule is half-open on the raw µs timestamps
    * (`next.ts < prev.ts + gap` merges, equality splits). Feeding the
    * window an ms-TRUNCATED copy of `ts` (truncation is monotonic, so
    * per-user event order and therefore session membership is
    * unchanged) with one extra millisecond of gap gives new-session ⇔
    * `trunc_diff ≥ gapMs + 1` ⇔ `trunc_diff > gapMs` — the contract
    * exactly; `start_ts`/`end_ts` still aggregate the raw timestamps.
    *
    * `total` is computed as a fixed-point scaled-LONG sum (exact,
    * order-independent under partial aggregation) divided back to DOUBLE
    * — `valueScale` sets the retained precision (1e6 ≈ six decimals). */
  def sessionsBatch(events: DataFrame, gapMs: Long,
                    userCol: String = "user_id", tsCol: String = "ts",
                    valueCol: String = "value",
                    valueScale: Long = 1000000L): DataFrame =
    events
      .groupBy(col(userCol),
        session_window(timestamp_millis(unix_millis(col(tsCol))),
          s"${gapMs + 1} milliseconds"))
      .agg(count(lit(1)).alias("n_events"),
        (sum(round(col(valueCol) * valueScale).cast("long")) / valueScale.toDouble)
          .alias("total"),
        min(col(tsCol)).alias("start_ts"),
        max(col(tsCol)).alias("end_ts"))
      .drop("session_window")
}
