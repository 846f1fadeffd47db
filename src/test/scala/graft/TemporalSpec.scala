package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.TemporalOps

/** Unit coverage for the temporal operators (as-of join, session windows)
  * on planted fixtures; sf-scale behavior is covered by the a28/a29 oracle
  * rows. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:05")),
    (2L, "A", ts("2024-01-01 10:00:30")),
    (3L, "B", ts("2024-01-01 10:00:10")),
    (4L, "C", ts("2024-01-01 10:00:10")) // no quotes at all for C
  ).toDF("trade_id", "sym", "ts")

  private lazy val quotes = Seq(
    (10L, "A", ts("2024-01-01 10:00:00"), 1.0),
    (11L, "A", ts("2024-01-01 10:00:20"), 2.0),
    (12L, "B", ts("2024-01-01 10:00:10"), 5.0), // same-ts as trade 3
    (13L, "B", ts("2024-01-01 10:00:10"), 6.0), // same (sym, ts): max id wins
    (14L, "A", ts("2024-01-01 10:00:40"), 9.0) // later than every trade
  ).toDF("quote_id", "sym", "ts", "px")

  test("asofJoin: newest right row at or before each left ts, per key") {
    val out = TemporalOps.asofJoin(trades, quotes, Seq("sym"), "ts",
        payload = Seq("quote_id", "px"), tieBreak = col("quote_id"))
      .orderBy("trade_id")
      .select("trade_id", "asof_quote_id", "asof_px")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(out.toSeq === Seq(
      (1L, Some(10L), Some(1.0)), // 10:00 quote, not the 10:20 one
      (2L, Some(11L), Some(2.0)),
      (3L, Some(13L), Some(6.0)), // inclusive same-ts; tie -> max quote_id
      (4L, None, None))) // no quote for C -> left-outer nulls
  }

  test("asofJoin strict: same-ts right rows are invisible") {
    val out = TemporalOps.asofJoin(trades, quotes, Seq("sym"), "ts",
        payload = Seq("quote_id"), tieBreak = col("quote_id"),
        inclusive = false)
      .filter(col("trade_id") === 3L).collect().head
    assert(out.isNullAt(out.fieldIndex("asof_quote_id"))) // B has only same-ts quotes
  }

  test("asofJoin: null payload on the matched row is preserved, not skipped") {
    val q2 = Seq((20L, "A", ts("2024-01-01 10:00:20"), Option.empty[Double]))
      .toDF("quote_id", "sym", "ts", "px")
      .unionByName(quotes.filter(col("quote_id") === 10L))
    val out = TemporalOps.asofJoin(
        trades.filter(col("trade_id") === 2L), q2, Seq("sym"), "ts",
        payload = Seq("quote_id", "px"), tieBreak = col("quote_id"))
      .collect().head
    // the matched row IS the null-px quote 20 — the struct carrier must not
    // fall back to the older non-null quote 10
    assert(out.getAs[Long]("asof_quote_id") === 20L)
    assert(out.isNullAt(out.fieldIndex("asof_px")))
  }

  test("asofJoin: empty right side yields all-null payloads, empty left yields no rows") {
    val noQuotes = quotes.filter(lit(false))
    val out = TemporalOps.asofJoin(trades, noQuotes, Seq("sym"), "ts",
        payload = Seq("quote_id", "px"), tieBreak = col("quote_id"))
      .collect()
    assert(out.length === 4)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("asof_quote_id"))))
    val none = TemporalOps.asofJoin(trades.filter(lit(false)), quotes,
      Seq("sym"), "ts", payload = Seq("px"), tieBreak = col("quote_id"))
    assert(none.count() === 0)
  }

  test("sessionize batch: gap merges and splits, end = last event + gap") {
    val ev = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1.0),
      ("u1", ts("2024-01-01 10:10:00"), 2.0), // within 30m -> same session
      ("u1", ts("2024-01-01 11:00:00"), 4.0), // 50m gap -> new session
      ("u2", ts("2024-01-01 10:00:00"), 8.0)
    ).toDF("user_id", "ts", "v")
    val out = TemporalOps.sessionize(ev, "ts", "30 minutes", Seq(col("user_id")),
        Seq(count(lit(1)).as("n"), sum(col("v")).as("s")))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("st"),
        unix_timestamp(col("session_window.end")).as("en"),
        col("n"), col("s"))
      .orderBy("user_id", "st")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val base = ts("2024-01-01 10:00:00").getTime / 1000
    assert(out.toSeq === Seq(
      ("u1", base, base + 600 + 1800, 2L, 3.0), // end = last event (10:10) + gap
      ("u1", base + 3600, base + 3600 + 1800, 1L, 4.0),
      ("u2", base, base + 1800, 1L, 8.0)))
  }

  test("sessionize streaming: the same call runs over a watermarked stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val agg = TemporalOps.sessionize(
      mem.toDF().toDF("user_id", "ts", "v").withWatermark("ts", "0 seconds"),
      "ts", "30 minutes", Seq(col("user_id")),
      Seq(count(lit(1)).as("n")))
    // session-window streaming aggregation emits in append mode: a session
    // row is final once the watermark passes its end
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      mem.addData(("u1", ts("2024-01-01 10:00:00"), 1.0),
        ("u1", ts("2024-01-01 10:10:00"), 2.0),
        ("u1", ts("2024-01-01 12:00:00"), 3.0))
      q.processAllAvailable() // watermark after batch: 12:00
      mem.addData(("u2", ts("2024-01-01 13:00:00"), 1.0))
      q.processAllAvailable() // emits u1 [10:00, 10:40) (end <= 12:00)
      mem.addData(("u2", ts("2024-01-01 15:00:00"), 1.0))
      q.processAllAvailable() // watermark 13:00 -> emits u1 [12:00, 12:30)
      val rows = spark.table("sess_out")
        .select(col("user_id"), col("n")).as[(String, Long)].collect().toSeq
      // finalized: both u1 sessions (the merged 10:00/10:10 pair, the 12:00
      // singleton) and u2's 13:00 singleton (closed by the no-data batch
      // after the watermark reached 15:00); u2's 15:00 session is still open
      assert(rows.sorted === Seq(("u1", 1L), ("u1", 2L), ("u2", 1L)))
    } finally q.stop()
  }

  test("suppressUnchanged: keeps first row and transitions only, per key") {
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00"), "on"),
      (2L, "u1", ts("2024-01-01 10:01:00"), "on"), // repeat -> dropped
      (3L, "u1", ts("2024-01-01 10:02:00"), "off"), // transition
      (4L, "u1", ts("2024-01-01 10:03:00"), "on"), // back again: a change
      (5L, "u2", ts("2024-01-01 10:00:30"), "on") // other key: independent
    ).toDF("event_id", "user_id", "ts", "st")
    val kept = TemporalOps.suppressUnchanged(ev, Seq("user_id"), "ts",
        col("event_id"), col("st"))
      .select("event_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L, 5L))
  }

  test("suppressUnchanged: null-safe — null→value and value→null are changes, null→null is not") {
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00"), Option.empty[String]),
      (2L, "u1", ts("2024-01-01 10:01:00"), Option.empty[String]), // null repeat
      (3L, "u1", ts("2024-01-01 10:02:00"), Some("x")), // null -> x
      (4L, "u1", ts("2024-01-01 10:03:00"), Option.empty[String]) // x -> null
    ).toDF("event_id", "user_id", "ts", "st")
    val kept = TemporalOps.suppressUnchanged(ev, Seq("user_id"), "ts",
        col("event_id"), col("st"))
      .select("event_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L))
  }

  test("suppressUnchanged: same-ts rows order by the tie-break") {
    val ev = Seq(
      (2L, "u1", ts("2024-01-01 10:00:00"), "b"), // tie: id 1 comes first
      (1L, "u1", ts("2024-01-01 10:00:00"), "a"),
      (3L, "u1", ts("2024-01-01 10:01:00"), "b") // change vs id 2's "b"? no — prev is id 2
    ).toDF("event_id", "user_id", "ts", "st")
    val kept = TemporalOps.suppressUnchanged(ev, Seq("user_id"), "ts",
        col("event_id"), col("st"))
      .select("event_id").as[Long].collect().toSet
    // order is 1(a), 2(b), 3(b): 3 repeats 2's value -> dropped
    assert(kept === Set(1L, 2L))
  }

  test("resampleLocf: hourly grid, LOCF carry, null before first observation") {
    val ev = Seq(
      (1L, "u1", "2024-01-01 00:05:00", 10.0),
      (2L, "u1", "2024-01-01 02:30:00", 20.0),
      (3L, "u2", "2024-01-01 01:00:00", 5.0)
    ).toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = TemporalOps.resampleLocf(ev, Seq("user_id"), "ts",
        Seq("value"), "1 hour", "hour", col("event_id"))
      .select(col("user_id"), date_format(col("ts"), "HH:mm").as("g"),
        col("asof_value"))
      .orderBy("user_id", "g").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.get(2))))
    // u1: grid 00:00 (before first obs -> null), 01:00, 02:00 (both carry
    // 10.0; the 02:30 event is past the last grid point)
    // u2: grid starts AND ends at 01:00 (lo == hi truncation)
    assert(out.toSeq === Seq(
      ("u1", "00:00", None), ("u1", "01:00", Some(10.0)), ("u1", "02:00", Some(10.0)),
      ("u2", "01:00", Some(5.0))))
  }

  test("resampleLocfStream == resampleLocf row-for-row on real events " +
      "(the grid-after-the-sort rewrite changes the plan, not the output)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val dense = TemporalOps.resampleLocf(ev, Seq("user_id"), "ts",
        Seq("value"), "1 hour", "hour", col("event_id"))
      .select(col("user_id"), col("ts"), col("asof_value"))
    val stream = TemporalOps.resampleLocfStream(ev, Seq("user_id"), "ts",
      "value", stepSec = 3600L, tieBreak = col("event_id"))
    assert(stream.columns.toSeq === dense.columns.toSeq)
    assert(dense.count() > 0)
    assert(dense.exceptAll(stream).isEmpty && stream.exceptAll(dense).isEmpty,
      "stream-shaped LOCF grid diverges from the union-window grid")
  }

  test("resampleLocfStream: head null, on-grid claims, sub-step ties — the " +
      "micro-precision edges") {
    val ev = Seq(
      // u1: first obs exactly ON the hour (claims its own instant, no
      // null head); second a microsecond past the next hour (02:00 stays
      // with obs 1, 03:00 carries obs 2 - wait, grid ends at max ts)
      (1L, "u1", "2024-01-01 01:00:00", 1.0),
      (2L, "u1", "2024-01-01 02:00:00.000001", 2.0),
      (3L, "u1", "2024-01-01 03:00:00", 3.0),
      // u2: sub-hour head (00:00 null), then on-hour boundary handoff:
      // the 01:00 instant belongs to the 01:00 observation (inclusive
      // asof), not the 00:30 one
      (4L, "u2", "2024-01-01 00:30:00", 7.0),
      (5L, "u2", "2024-01-01 01:00:00", 8.0)
    ).toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = TemporalOps.resampleLocfStream(ev, Seq("user_id"), "ts",
        "value", stepSec = 3600L, tieBreak = col("event_id"))
      .select(col("user_id"), date_format(col("ts"), "HH:mm").as("g"),
        col("asof_value"))
      .orderBy("user_id", "g").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.get(2))))
    assert(out.toSeq === Seq(
      ("u1", "01:00", Some(1.0)), ("u1", "02:00", Some(1.0)),
      ("u1", "03:00", Some(3.0)),
      ("u2", "00:00", None), ("u2", "01:00", Some(8.0))))
    // cross-check the micro-edge rows against the union-window operator
    val dense = TemporalOps.resampleLocf(ev, Seq("user_id"), "ts",
        Seq("value"), "1 hour", "hour", col("event_id"))
      .select(col("user_id"), col("ts"), col("asof_value"))
    val stream = TemporalOps.resampleLocfStream(ev, Seq("user_id"), "ts",
      "value", stepSec = 3600L, tieBreak = col("event_id"))
    assert(dense.exceptAll(stream).isEmpty && stream.exceptAll(dense).isEmpty)
  }

  test("resampleLocf: same-ts ties resolve to the max tieBreak") {
    val ev = Seq(
      (1L, "u", "2024-01-01 00:10:00", 1.0),
      (2L, "u", "2024-01-01 00:10:00", 2.0), // same ts, higher id wins
      (3L, "u", "2024-01-01 01:30:00", 9.0)  // extends the grid past 01:00
    ).toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = TemporalOps.resampleLocf(ev, Seq("user_id"), "ts",
        Seq("value"), "1 hour", "hour", col("event_id"))
      .orderBy("ts").collect()
    // grid: 00:00 (null), 01:00 (carries the tie-resolved 00:10 value)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_value")))
    assert(out(1).getAs[Double]("asof_value") === 2.0)
  }

  test("ohlcBars: open/close follow (ts, tie) order, ties deterministic") {
    val ev = Seq(
      (1L, "a", "2024-01-01 00:05:00", 10.0),
      (2L, "a", "2024-01-01 00:05:00", 11.0), // same ts as 1: higher id
      (3L, "a", "2024-01-01 00:40:00", 3.0),
      (4L, "a", "2024-01-01 00:20:00", 99.0),
      (5L, "a", "2024-01-01 01:10:00", 7.0)   // next bar
    ).toDF("event_id", "k", "ts", "v").withColumn("ts", to_timestamp(col("ts")))
    val out = TemporalOps.ohlcBars(ev, "ts", "1 hour", Seq(col("k")),
        col("v"), col("event_id"))
      .orderBy("window.start").collect()
      .map(r => (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"), r.getAs[Long]("n_obs")))
    // bar 1: open = id1's 10.0 (lowest tie at earliest ts), close = 00:40's 3.0
    assert(out(0) === ((10.0, 99.0, 3.0, 3.0, 4L)))
    assert(out(1) === ((7.0, 7.0, 7.0, 7.0, 1L)))
  }
}
