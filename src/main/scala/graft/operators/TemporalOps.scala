package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark has no built-in for — keyed as-of join — plus a
  * thin session-window wrapper. Both are batch/streaming-agnostic shapes a
  * tourism-analytics pipeline needs (attach the latest prior quote/weather
  * reading to a booking; sessionize per-visitor event streams).
  *
  * These extend the reference surface (its pandas pipelines do single-node
  * merge_asof-style work implicitly via sorted frames) — see SURVEY.md §2E.
  */
object TemporalOps {

  /** Keyed as-of join: for every left row, attach the payload of the newest
    * right row with the same key and `right.ts <= left.ts` (strictly earlier
    * with `inclusive = false`); null payload when no such row exists
    * (left-outer semantics).
    *
    * NOT an inequality join: both sides are unioned with a side marker and
    * sorted once per key by (ts, side, tieBreak); a running
    * `last(payload_struct, ignoreNulls)` carries the newest right payload
    * forward onto each left row. One shuffle on the key, one per-partition
    * sort, zero candidate explosion — at 100 TB this is a single sort-merge
    * pass, versus the O(|left| × |right-per-key|) blowup of the naive
    * `l.key = r.key AND r.ts <= l.ts` join followed by a per-row argmax.
    * The payload rides in a struct so a legitimately-NULL payload column on
    * the matched row is preserved (the struct itself is never null on right
    * rows, so ignoreNulls only skips left rows).
    *
    * `tieBreak` orders right rows that share (key, ts): the maximum wins,
    * making the result deterministic (DuckDB's ASOF JOIN leaves the
    * same-timestamp tie unspecified — the oracle twin pre-dedups on the
    * same rule).
    *
    * Skew caveat: one key's rows must sort within a single task; for a
    * monster key, pre-split by coarse time bucket, as-of join per bucket,
    * and patch bucket boundaries with a second pass over the per-bucket
    * last rows. */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               tsCol: String, payload: Seq[String], tieBreak: Column,
               inclusive: Boolean = true): DataFrame = {
    // inclusive: right rows at the same ts sort BEFORE left rows (visible);
    // strict: after (invisible to same-ts left rows)
    val (rightMark, leftMark) = if (inclusive) (0, 1) else (1, 0)
    val keyCols = key.map(col)
    val payloadType = right.select(payload.map(col): _*).schema
    val leftRowType = left.schema
    // tie-break keeps its NATIVE type (a long cast would null out string
    // ids and silently break the determinism guarantee)
    val tieType = right.select(tieBreak.as("__tie")).schema.head.dataType
    // equi-join semantics: a null key matches nothing. Window.partitionBy
    // would group null keys into one partition and match them to each
    // other, so null-key right rows are dropped up front; null-key left
    // rows keep flowing and come out with a null payload (left-outer).
    val rightKeyed = key.foldLeft(right)((d, k) => d.filter(col(k).isNotNull))
    val lSide = left.select(
      keyCols ++ Seq(
        col(tsCol).as("__ts"),
        lit(leftMark).as("__side"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(payloadType).as("__p"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__row")): _*)
    val rSide = rightKeyed.select(
      keyCols ++ Seq(
        col(tsCol).as("__ts"),
        lit(rightMark).as("__side"),
        tieBreak.as("__tie"),
        struct(payload.map(col): _*).as("__p"),
        lit(null).cast(leftRowType).as("__row")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftMark && col("__row").isNotNull)
      .select(left.columns.map(c => col(s"__row.$c").as(c)).toIndexedSeq ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p")): _*)
  }

  /** Consecutive-change suppression: per key, ordered by (`tsCol`,
    * `tieBreak`), keep only the rows whose `valueCol` differs from the
    * previous row's value (the first row per key always survives). The
    * metrics-pipeline "report on change" compaction: a sensor/status feed
    * that mostly repeats itself compresses to its transition points.
    *
    * One shuffle on the key + a per-key sort — the same cost envelope as
    * any keyed window. Comparison is null-safe (`<=>` on a carrier struct):
    * null→value and value→null transitions are changes; the carrier struct
    * distinguishes "no previous row" from "previous value was null".
    * Streaming twin: [[graft.streaming.ChangeSuppress]] keeps the last
    * value per key in flatMapGroupsWithState state instead of a sort.
    */
  def suppressUnchanged(df: DataFrame, key: Seq[String], tsCol: String,
                        tieBreak: Column, valueCol: Column): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(tsCol).asc, tieBreak.asc)
    val prev = lag(struct(valueCol.as("v")), 1).over(w)
    df.withColumn("__prev", prev)
      .filter(col("__prev").isNull || !(valueCol <=> col("__prev.v")))
      .drop("__prev")
  }

  /** Session windows: group by `session_window(ts, gap)` plus `keys`.
    * Spark merges events closer than `gap`; a session spans
    * [first event ts, last event ts + gap). Works identically over a batch
    * frame and a watermarked stream (the session-window state store merges
    * across micro-batches) — the same call sits in both paths. */
  def sessionize(df: DataFrame, tsCol: String, gap: String, keys: Seq[Column],
                 aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Time-series resampling with last-observation-carried-forward: per key,
    * an `interval`-spaced grid from `date_trunc(truncUnit, min(ts))` to
    * `max(ts)`, each grid point carrying the newest payload at-or-before it
    * (same-ts ties resolved by max `tieBreak`, the [[asofJoin]] rule; grid
    * points before the key's first observation come back null).
    *
    * Built as grid generation + [[asofJoin]]: a tiny per-key bounds
    * aggregate explodes into the grid (rows = Σ span/interval — the
    * OUTPUT size, there is no intermediate bigger than that), then the
    * one-sort-merge as-of pass attaches values. No inequality join, no
    * per-grid-point scans; the gap-filling favorite that usually gets
    * written as a correlated subquery becomes two linear passes. */
  def resampleLocf(df: DataFrame, key: Seq[String], tsCol: String,
                   payload: Seq[String], interval: String, truncUnit: String,
                   tieBreak: Column): DataFrame = {
    val keyCols = key.map(col)
    val bounds = df.groupBy(keyCols: _*)
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    val grid = bounds.select(keyCols :+ explode(sequence(
      date_trunc(truncUnit, col("__lo")), col("__hi"),
      expr(s"INTERVAL $interval"))).as(tsCol): _*)
    asofJoin(grid, df, key, tsCol, payload, tieBreak)
  }

  /** E55 at scale: [[resampleLocf]] with the GRID GENERATED AFTER THE SORT
    * — identical output (TemporalSpec asserts row-for-row equality), a
    * fundamentally different cost shape. resampleLocf unions the dense
    * grid with the observations and pushes the UNION through the as-of
    * window (shuffle + sort of grid+events: at sf100 the 1.08 B-row grid
    * is ~2 orders of magnitude bigger than the events that define it, and
    * that sort's spill is exactly why a36 was excluded from the sf100
    * record in r14/r15). Here only the OBSERVATIONS shuffle and sort: per
    * key in ts order, each observation claims the half-open interval
    * [its ts, next ts) via `lead`, and the grid points inside each
    * interval are emitted by a map-side `sequence` explode AFTER the
    * window — the dense grid exists only as generated output streaming
    * into the consumer (at scale, a partitioned sink), never crossing an
    * exchange and never sorting. Cost: one shuffle+sort of n_events plus
    * O(grid) generation; resampleLocf pays shuffle+sort of
    * n_events + grid.
    *
    * Semantics replicated exactly from the resampleLocf/ASOF convention:
    * same-ts observations dedup to max `tieBreak` first; the grid runs
    * from trunc(min ts) to max ts per key at `stepSec` spacing; a grid
    * point matches the greatest observation ts ≤ it (inclusive); the one
    * possible sub-step head point before the first observation carries a
    * null. Grid instants are step-aligned integer seconds; observation
    * timestamps keep micro precision through the interval arithmetic
    * (`unix_micros`), so an observation exactly ON a grid instant claims
    * it and one a microsecond later does not. */
  def resampleLocfStream(df: DataFrame, key: Seq[String], tsCol: String,
                         valueCol: String, stepSec: Long,
                         tieBreak: Column): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive: $stepSec")
    val keyCols = key.map(col)
    val stepUs = stepSec * 1000000L
    // same-ts dedup to max tieBreak (the a28 ASOF convention)
    val dw = Window.partitionBy(keyCols :+ col(tsCol): _*).orderBy(tieBreak.desc)
    val vd = df.withColumn("__rn", row_number().over(dw))
      .filter(col("__rn") === 1)
      .select(keyCols ++ Seq(col(tsCol), col(valueCol).as("__v")): _*)
    val ow = Window.partitionBy(keyCols: _*).orderBy(col(tsCol))
    val aw = Window.partitionBy(keyCols: _*)
    val us = unix_micros(col(tsCol))
    val onGrid = pmod(us, lit(stepUs)) === 0
    // step-floor in SECONDS via exact integer ops: us − pmod is a long
    // multiple of stepUs (pmod floors correctly for any sign), and the
    // /1e6 strips an exact factor — NOT floor(us / stepUs), whose
    // double division rounds UP for timestamps within ~0.2 ms below a
    // step boundary at micro precision. The division is INTEGRAL (SQL
    // `div`), not Column `/` (double): a double round-trip is exact only
    // below 2^53 µs (~year 2255), integral division has no such
    // representability precondition. Truncation == exact here because
    // the numerator is an exact multiple of 1 000 000 (stepUs = stepSec·10⁶).
    def stepFloorSec(u: Column): Column =
      call_function("div", u - pmod(u, lit(stepUs)), lit(1000000L))
    // first step-aligned instant covered by this observation (its own ts
    // when aligned, else the next grid instant)
    val start = when(onGrid, stepFloorSec(us))
      .otherwise(stepFloorSec(us) + stepSec)
    // last covered instant: just below the next observation (its own
    // instant steps back a full step when aligned — inclusive semantics
    // hand it to the NEXT observation), or trunc(max ts) for the last
    val nextUs = lead(us, 1).over(ow)
    val maxUs = max(us).over(aw)
    val end = when(nextUs.isNull, stepFloorSec(maxUs))
      .otherwise(when(pmod(nextUs, lit(stepUs)) === 0,
          stepFloorSec(nextUs) - stepSec)
        .otherwise(stepFloorSec(nextUs)))
    // the sub-step head point before the first observation (null-valued);
    // exists only when the first ts is not grid-aligned
    val isFirst = row_number().over(ow) === 1
    val headArr = when(isFirst && !onGrid, array(stepFloorSec(us)))
      .otherwise(array().cast("array<long>"))
    // window expressions must resolve in their own projection before the
    // generator consumes them (an explode over a windowspec is an
    // unresolvable operator) — materialize interval bounds first, explode
    // from plain columns second
    val iv = vd
      .withColumn("__start", start)
      .withColumn("__end", end)
      .withColumn("__head", headArr)
    val gridArr = when(col("__start") <= col("__end"),
        sequence(col("__start"), col("__end"), lit(stepSec)))
      .otherwise(array().cast("array<long>"))
    iv.select(
        keyCols ++ Seq(explode(concat(
          transform(col("__head"), g => struct(g.as("g"),
            lit(null).cast(df.schema(valueCol).dataType).as("v"))),
          transform(gridArr, g => struct(g.as("g"), col("__v").as("v")))))
          .as("__gv")): _*)
      .select(keyCols ++ Seq(
        timestamp_seconds(col("__gv.g")).as(tsCol),
        col("__gv.v").as(s"asof_$valueCol")): _*)
  }

  /** OHLC downsampling: per (interval window × keys), the first (open) and
    * last (close) values in (ts, tieBreak) order plus min (low) and max
    * (high) — the time-series bar aggregation. ONE hash aggregate with
    * map-side partial combine: `min_by`/`max_by` on the (ts, tieBreak)
    * struct merge like any other min/max, so the raw series never sorts
    * and never shuffles more than its aggregate summaries. The tie-break
    * makes first/last deterministic when timestamps collide (struct
    * ordering is lexicographic). All four outputs are VALUES from the
    * input (no arithmetic), so they hash-compare unrounded. */
  def ohlcBars(df: DataFrame, tsCol: String, interval: String,
               keys: Seq[Column], valueCol: Column,
               tieBreak: Column): DataFrame = {
    val ord = struct(col(tsCol), tieBreak)
    df.groupBy(window(col(tsCol), interval) +: keys: _*)
      .agg(
        min_by(valueCol, ord).as("open"),
        max(valueCol).as("high"),
        min(valueCol).as("low"),
        max_by(valueCol, ord).as("close"),
        count(lit(1)).as("n_obs"))
  }
}
