package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.AnalyticsOps.decayedAgg]]: a per-key
  * half-life-decayed counter maintained incrementally over an unbounded
  * stream — the real-time trending/recency primitive (decay-weighted event
  * rates, trending topics, adaptive rate limits). Built on
  * `flatMapGroupsWithState`, the custom-state tier below the built-in
  * stateful aggregates (SURVEY.md §7.3).
  *
  * The half-life form is time-shift-invariant, which is what makes the
  * incremental update exact: advancing a key's clock by Δ multiplies its
  * whole accumulated sum by `2^(−Δ/halfLife)` — no window buffer, no
  * re-scan. State per key is ONE row (clock + two micro-unit longs);
  * at 100 TB/day the state store is O(|keys|), independent of volume.
  * Each micro-batch sorts only its own slice of a key's events
  * (batch-local, bounded) and emits the key's refreshed counter once per
  * batch (update-mode shape).
  *
  * Determinism: state is quantized to micro-units (longs) after every
  * fold step, so a given sequence of (ts, id)-ordered events produces
  * identical state on every replay; per-step quantization means the
  * streaming counter can differ from the batch [[graft.operators
  * .AnalyticsOps.decayedAgg]] by at most ~1e-6 × events-per-key (each
  * step rounds once) — asserted in StreamingSpec. Cross-batch ordering
  * caveat: an event arriving a batch late but time-stamped before the
  * key's clock decays NEGATIVELY (its weight exceeds 1 relative to the
  * stale clock) — the same last-state approximation every streaming
  * state machine makes; the batch operator is the exact-order semantics.
  *
  * State eviction: `EventTimeTimeout` past the watermark by `ttl`; an
  * evicted key restarts from zero (documented state-bounding trade-off,
  * acceptable because an evicted key's counter had decayed to noise by
  * construction if ttl ≫ halfLife).
  */
object DecayedCounter {

  /** (key, event time, value). */
  case class Event(key: Long, ts: Timestamp, value: Double)

  /** Per-key state: decay clock (ms) + micro-unit decayed sum/count. */
  case class Decayed(clockMillis: Long, sumMicro: Long, cntMicro: Long)

  /** (key, as-of clock, decayed_sum, decayed_count) — one row per key per
    * micro-batch that touched it. */
  case class Counter(key: Long, asOf: Timestamp, decayed_sum: Double,
                     decayed_count: Double)

  private val Micro = 1000000.0

  /** Advance `s` to `tsMillis` (decay), then fold in `value`. */
  private[streaming] def step(s: Decayed, tsMillis: Long, value: Double,
                              halfLifeSeconds: Long): Decayed = {
    val f = math.pow(2.0, -((tsMillis - s.clockMillis) / 1000.0) / halfLifeSeconds)
    Decayed(tsMillis,
      math.round(s.sumMicro * f + value * Micro),
      math.round(s.cntMicro * f + Micro))
  }

  def count(ds: Dataset[Event], halfLifeSeconds: Long,
            ttlMillis: Long = 24 * 3600 * 1000L): Dataset[Counter] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Decayed, Counter](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, events: Iterator[Event], state: GroupState[Decayed]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // batch-local slice in (event time, value) order — ties fold
            // deterministically
            val sorted = events.toArray.sortBy(e => (e.ts.getTime, e.value))
            var s = state.getOption.getOrElse(
              Decayed(sorted.head.ts.getTime, 0L, 0L))
            sorted.foreach { e =>
              s = step(s, e.ts.getTime, e.value, halfLifeSeconds)
            }
            state.update(s)
            val floor = math.max(s.clockMillis, state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(floor + ttlMillis)
            Iterator.single(Counter(key, new Timestamp(s.clockMillis),
              s.sumMicro / Micro, s.cntMicro / Micro))
          }
      }
  }
}
