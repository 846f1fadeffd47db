package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.AnalyticsOps.funnel]]: per-user
  * ordered-step funnel over an unbounded, OUT-OF-ORDER event stream.
  *
  * The batch funnel folds a user's step events in (ts, tie) order — order
  * the stream cannot provide per micro-batch. The streaming twin therefore
  * BUFFERS a user's step events in state and replays the greedy fold only
  * when the user goes quiet (`EventTimeTimeout` fires once the watermark
  * passes the user's newest event + `quietMillis`), emitting one final
  * (user, stage) row. Buffering is what makes the result equal to the
  * batch operator on the same data regardless of arrival order — a
  * fold-on-arrival variant would advance stages on whatever order the
  * network produced (asserted equal to the batch fold in StreamingSpec).
  *
  * State per user is its STEP events only (non-step events are filtered
  * before `groupByKey`, so the unbounded bulk of the stream never touches
  * state) — bounded by the funnel's own selectivity, the same monster-user
  * caveat as the batch operator. Eviction is total: emit-on-timeout
  * removes the buffer, so state size is O(active users × step events in
  * the quiet horizon).
  */
object StreamingFunnel {

  /** (user, event time, tie-break id, step index 0..k-1). */
  case class StepEvent(user: Long, ts: Timestamp, tie: Long, step: Int)

  /** (user, furthest stage reached 1..k). */
  case class FunnelResult(user: Long, stage: Int)

  /** Buffered step events per user. */
  case class Buffer(events: List[StepEvent])

  def funnelStages(ds: Dataset[StepEvent], quietMillis: Long)
      : Dataset[FunnelResult] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user)
      .flatMapGroupsWithState[Buffer, FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[StepEvent], state: GroupState[Buffer]) =>
          if (state.hasTimedOut) {
            // the user went quiet: replay the batch fold over the full
            // buffer in (ts, tie) order and emit the final stage
            val all = state.get.events.sortBy(e => (e.ts.getTime, e.tie))
            state.remove()
            var stage = 0
            all.foreach { e => if (e.step == stage) stage += 1 }
            if (stage > 0) Iterator.single(FunnelResult(user, stage))
            else Iterator.empty
          } else {
            val buffered = state.getOption.map(_.events).getOrElse(Nil) ++
              events
            state.update(Buffer(buffered))
            val newest = buffered.iterator.map(_.ts.getTime).max
            val floor = math.max(newest, state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(floor + quietMillis)
            Iterator.empty
          }
      }
  }
}
