package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.Exprs._

/** §2A operator library: pure `DataFrame => DataFrame` functions usable on
  * both batch and streaming frames (Structured Streaming shares the batch
  * DSL — only watermark/sink wiring is stream-specific, see graft.streaming).
  *
  * Every operator cites its reference counterpart in
  * /root/reference/spark/kafka_to_metrics.py. Design rules for scale:
  * no collect(), no UDFs on hot paths, aggregation is partial+final
  * (map-side combine free from hash aggregate), joins either broadcast
  * (small dims) or shuffle on the group keys already produced by the
  * upstream aggregate (no extra exchange).
  */
object StreamOps {

  // --- A2: JSON decode + flatten (kafka_to_metrics.py:174-179) -------------
  /** Parse a Kafka-style frame (key, value:String, kafka_ts) into typed
    * columns: from_json(value, schema) flattened alongside key + kafka_ts. */
  def parseJson(df: DataFrame, schema: StructType): DataFrame =
    df.withColumn("js", from_json(col("value"), schema))
      .select(col("key") +: col("js.*") +: col("kafka_ts") +: Nil: _*)

  // --- A3: robust timestamp projection (kafka_to_metrics.py:181-188) ------
  /** event_time = coalesce(to_timestamp(event_ts), kafka_ts);
    * ingest_time = kafka_ts when ingest_ts is null or earlier than kafka_ts
    * (i.e. max of the two clocks), else ingest_ts. Must run BEFORE any
    * watermark is applied (SURVEY.md §7.4.4). */
  def repairTimestamps(df: DataFrame,
                       eventTs: String = "event_ts",
                       ingestTs: String = "ingest_ts",
                       kafkaTs: String = "kafka_ts"): DataFrame = {
    val ev = to_timestamp(col(eventTs))
    val ing = to_timestamp(col(ingestTs))
    df.withColumn("event_time", coalesce(ev, col(kafkaTs)))
      .withColumn("ingest_time",
        when(ing.isNull || ing < col(kafkaTs), col(kafkaTs)).otherwise(ing))
  }

  // --- A4: derived-column enrichment (kafka_to_metrics.py:195-202) ---------
  /** Booking enrichment: spend_eur, arrival_day, event_day. */
  def enrichBooking(df: DataFrame): DataFrame =
    df.withColumn("spend_eur", spendEur(col("adr_proxy"), col("rooms"), col("nights")))
      .withColumn("arrival_day", to_date(col("checkin_date")))
      .withColumn("event_day", to_date(col("event_time")))

  // --- A7: global count, no key (kafka_to_metrics.py:217-221) --------------
  def globalCount(df: DataFrame, alias: String = "n"): DataFrame =
    df.groupBy().agg(count(lit(1)).as(alias))

  // --- A8: tumbling-window count agg (kafka_to_metrics.py:224-234) ---------
  /** groupBy(window(tsCol, dur)).agg(count, avg(valueCol)). */
  def windowCountAvg(df: DataFrame, tsCol: String, dur: String,
                     valueCol: String): DataFrame =
    df.groupBy(window(col(tsCol), dur))
      .agg(count(lit(1)).as("msgs"), avg(col(valueCol)).as("value_avg"))

  // --- A9: conditional agg — filtered count / CASE-sum (:227-230) ----------
  /** Per-window: total count, cancelled sum(when), avg(when not-null-ish). */
  def conditionalAgg(df: DataFrame, tsCol: String, dur: String,
                     isCancelled: Column, delay: Column): DataFrame =
    df.groupBy(window(col(tsCol), dur))
      .agg(
        count(lit(1)).as("total"),
        sum(when(isCancelled, 1).otherwise(0)).as("cancelled"),
        avg(when(delay.isNotNull, delay)).as("delay_avg"))

  // --- A10: windowed multi-key agg (:237-244) ------------------------------
  def windowKeyedCount(df: DataFrame, tsCol: String, dur: String,
                       keys: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), dur) +: keys: _*)
      .agg(count(lit(1)).as("cnt"))

  // --- A11: filter vs a reference date (:265) ------------------------------
  def filterOnDay(df: DataFrame, dayCol: String, day: Column): DataFrame =
    df.filter(col(dayCol) === day)

  // --- A12: un-windowed keyed agg — running totals (:266-270) --------------
  /** groupBy(keys).agg(count, sum(spend)). In streaming this is unbounded
    * state (update mode, no watermark) — reference semantics preserved;
    * state-growth caveat documented in SURVEY.md §7.4.2. */
  def runningTotals(df: DataFrame, keys: Seq[Column], spend: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("arrivals"), sum(spend).as("spend_sum"))

  /** Output row of [[runningTotalsTtl]]. */
  case class KeyTotals(key: String, arrivals: Long, spend_sum: Double)

  /** [[runningTotals]] with a state TTL — the SURVEY.md §7.4.2 escape hatch
    * for the reference's unbounded-state running totals: when a key receives
    * no events for `ttl` past the watermark, its state is evicted
    * (flatMapGroupsWithState + EventTimeTimeout), so an unbounded key domain
    * (e.g. user ids at 100 TB) cannot grow state forever. Totals restart
    * from zero if an evicted key reappears — the documented trade-off vs the
    * reference's keep-everything semantics. Requires an upstream
    * withWatermark on `tsCol` when streaming; in batch mode it degrades to
    * plain per-key totals (timeouts never fire). */
  def runningTotalsTtl(df: DataFrame, keyCol: String, valueCol: String,
                       tsCol: String, ttl: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val ttlMillis = scala.concurrent.duration.Duration(ttl).toMillis
    val streaming = df.isStreaming
    val spark = df.sparkSession
    import spark.implicits._
    // the key is grouped through its string form (injective for the numeric /
    // string / temporal keys this accepts) and cast back to the input type on
    // output — a non-numeric key (e.g. a string city id) must keep its
    // identity, not silently null-collapse through a long cast
    val keyType = df.schema(keyCol).dataType
    // tsCol is selected untouched: a cast would project away the watermark
    // metadata tag and EventTimeTimeout analysis would reject the plan
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double"), col(tsCol))
      .as[(String, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), KeyTotals](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            // eviction: drop the state silently; the running total simply
            // stops being updated (matches Prometheus-sink semantics where a
            // stale series ages out)
            state.remove()
            Iterator.empty
          } else {
            var (n, s) = state.getOption.getOrElse((0L, 0.0))
            var maxTs = Long.MinValue
            rows.foreach { r =>
              n += 1; s += r._2
              if (r._3 != null && r._3.getTime > maxTs) maxTs = r._3.getTime
            }
            state.update((n, s))
            // TTL anchored to the key's newest event (not the watermark —
            // which is 0 on the first batch and would evict everything):
            // the key survives as long as events keep arriving within ttl
            // of each other on the stream's event-time clock
            if (streaming)
              state.setTimeoutTimestamp(
                math.max(maxTs + ttlMillis, state.getCurrentWatermarkMs() + 1L))
            Iterator.single(KeyTotals(key, n, s))
          }
      }
      .toDF("key", "arrivals", "spend_sum")
      .select(col("key").cast(keyType).as(keyCol), col("arrivals"), col("spend_sum"))
  }

  // --- A13: long tumbling windows "rolling" 30d/365d (:303-311) ------------
  def longWindowCount(df: DataFrame, tsCol: String, dur: String,
                      keys: Seq[Column]): DataFrame =
    windowKeyedCount(df, tsCol, dur, keys)

  // --- A14: season mapping — see Exprs.seasonOf (:315-323) -----------------

  // --- A15: calendar-month rollup (:325-333) -------------------------------
  def monthRollup(df: DataFrame, tsCol: String, dur: String, dayCol: Column,
                  spend: Column): DataFrame =
    df.withColumn("arr_month", month(dayCol))
      .groupBy(window(col(tsCol), dur), col("arr_month"))
      .agg(count(lit(1)).as("bookings"), sum(spend).as("spend_sum"))

  // --- A16: season rollup (:348-355) ---------------------------------------
  def seasonRollup(df: DataFrame, tsCol: String, dur: String, dayCol: Column,
                   spend: Column): DataFrame =
    df.withColumn("season", seasonOf(dayCol))
      .groupBy(window(col(tsCol), dur), col("season"))
      .agg(count(lit(1)).as("bookings"), sum(spend).as("spend_sum"))

  // --- A17: stream-static broadcast left join (:394-400) -------------------
  /** Left join against a small dimension with an explicit broadcast hint —
    * at 100 TB the fact side never shuffles for this join. */
  def broadcastLookupJoin(fact: DataFrame, dim: DataFrame,
                          on: Seq[String]): DataFrame =
    fact.join(broadcast(dim), on, "left")

  // --- A18/A21: multi-key equi left join incl. window struct (:451-455,474) -
  def multiKeyLeftJoin(l: DataFrame, r: DataFrame, on: Seq[String]): DataFrame =
    l.join(r, on, "left")

  // --- E: stream-stream interval join (beyond reference — the reference
  // only joins stream-to-static; correlating two live streams, e.g.
  // bookings to weather readings within a time window, needs this) ----------
  /** Keyed interval join of two streams: rows pair when keys match and
    * |left.ts − right.ts| ≤ `within`. The time bound is what makes this
    * viable on unbounded streams — with BOTH sides watermarked, Spark
    * evicts join state older than watermark − within, so state is bounded
    * by the interval, not the stream history. Works identically on batch
    * frames (plain range-condition join). Callers disambiguate shared
    * column names before joining (`withColumnRenamed`); `keys` maps
    * leftCol → rightCol. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
                         keys: Seq[(String, String)],
                         leftTs: String, rightTs: String,
                         within: String,
                         joinType: String = "inner"): DataFrame = {
    val interval = expr(s"INTERVAL $within")
    val cond = keys.map { case (lk, rk) => left(lk) === right(rk) }.reduce(_ && _) &&
      right(rightTs) >= left(leftTs) - interval &&
      right(rightTs) <= left(leftTs) + interval
    left.join(right, cond, joinType)
  }

  // --- A19: per-(window,key) seasonal stats (:424-448) ---------------------
  /** Guarded rate: cancel_rate = cancelled/total only when total > 0. */
  def guardedRate(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den).otherwise(lit(null))

  // --- A20: approximate percentiles (:458-472) -----------------------------
  /** percentile_approx for the scale path; exact percentile for
    * oracle-checked runs (flip with `exact`). At 100 TB the approx
    * (ApproximatePercentile sketch, mergeable, single pass) is the only
    * viable plan; exact percentile sorts each group. */
  def pct(c: Column, p: Double, exact: Boolean): Column =
    if (exact) percentile(c, lit(p)) else percentile_approx(c, lit(p), lit(10000))

  // --- E: streaming dedup (beyond reference — SURVEY.md §2A "not present"
  // list; a training-data ingest needs it) ----------------------------------
  /** Drop duplicate events by key on a stream: state is bounded by the
    * watermark (dropDuplicatesWithinWatermark), so late re-deliveries inside
    * the watermark window dedup exactly and state evicts after it. In batch
    * mode this degrades to a plain dropDuplicates (same result set). */
  def streamDedup(df: DataFrame, keys: Seq[String]): DataFrame =
    if (df.isStreaming) df.dropDuplicatesWithinWatermark(keys)
    else df.dropDuplicates(keys)

  // --- A24: top-K (:249,274,294,405,511) -----------------------------------
  /** orderBy(desc(metric), tiebreak).limit(k) → TakeOrderedAndProject:
    * the limit is pushed into the plan so only k rows ever reach the
    * driver (SURVEY.md §7.4.6 — bounded driver memory at any scale). */
  def topK(df: DataFrame, metric: Column, k: Int, tiebreak: Column*): DataFrame =
    df.orderBy(metric.desc +: tiebreak.map(_.asc): _*).limit(k)

  // --- A25: global sum over batch (:257-260) -------------------------------
  def globalSum(df: DataFrame, c: Column, alias: String): DataFrame =
    df.agg(sum(c).as(alias))

  // --- A26: null-safe filter (:404) ----------------------------------------
  def notNullFilter(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.filter(col(c).isNotNull))
}
