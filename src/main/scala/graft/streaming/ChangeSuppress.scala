package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TemporalOps.suppressUnchanged]]:
  * per-key consecutive-change suppression over an unbounded stream, built on
  * `flatMapGroupsWithState` — the custom-state tier below `session_window`
  * when no built-in stateful operator fits (SURVEY.md §7.3).
  *
  * State per key is ONE row (the last seen value + its event time), not a
  * buffer: each micro-batch sorts only its own slice of a key's events
  * (micro-batch-local, bounded), emits the transitions, and folds the last
  * value back into state. At 100 TB/day the state store size is O(|keys|),
  * independent of event volume.
  *
  * State eviction: `EventTimeTimeout` — a key silent for `ttl` past the
  * watermark is dropped. A late-arriving event for an evicted key is then
  * treated as a first observation (emitted); that is the documented
  * trade-off of bounding state, same as the reference's rolling-window
  * metric resets.
  *
  * Cross-batch ordering caveat: events are compared in (micro-batch,
  * event-time) order; an event that arrives a batch late but time-stamped
  * earlier than the held state is compared against the newer held value.
  * The batch operator is the exact-order semantics; this is the streaming
  * approximation every last-value state machine makes.
  */
object ChangeSuppress {

  /** (key, event time, observed value). */
  case class Event(key: Long, ts: Timestamp, value: String)

  /** Per-key state: last emitted-or-seen value and its event time. */
  case class LastSeen(value: String, tsMillis: Long)

  def suppress(ds: Dataset[Event], ttlMillis: Long = 6 * 3600 * 1000L)
      : Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[LastSeen, Event](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, events: Iterator[Event], state: GroupState[LastSeen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // batch-local slice of this key, in event-time order (ties by
            // value for determinism within a batch)
            val sorted = events.toArray.sortBy(e => (e.ts.getTime, e.value))
            var last = state.getOption
            val out = sorted.flatMap { e =>
              val changed = last.forall(_.value != e.value)
              last = Some(LastSeen(e.value, e.ts.getTime))
              if (changed) Some(e) else None
            }
            last.foreach { l =>
              state.update(l)
              // timeout must sit past the current watermark; anchor it to
              // the newest event this key has seen plus the ttl
              val floor = math.max(l.tsMillis, state.getCurrentWatermarkMs())
              state.setTimeoutTimestamp(floor + ttlMillis)
            }
            out.iterator
          }
      }
  }
}
