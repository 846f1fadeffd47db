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
