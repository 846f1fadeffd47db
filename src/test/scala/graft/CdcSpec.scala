package graft

import org.apache.spark.sql.functions._
import graft.operators.CdcOps

/** Unit coverage for the CDC changelog merge (E35) on planted fixtures;
  * sf-scale behavior is covered by the b34 oracle row. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, Some("alice"), Some(10.0)),
    (2L, Some("bob"), Some(20.0)),
    (3L, Some("carol"), Some(30.0))
  ).toDF("k", "name", "bal")

  private def merge(ch: org.apache.spark.sql.DataFrame) =
    CdcOps.mergeChangelog(base, ch, "k", "seq", "op")
      .orderBy("k")
      .as[(Long, Option[String], Option[Double])].collect().toSeq

  test("mergeChangelog: upsert overwrites, insert adds, delete removes, untouched survives") {
    val ch = Seq(
      (1L, 10L, "U", Some("alice2"), Some(11.0)), // overwrite key 1
      (4L, 11L, "I", Some("dave"), Some(40.0)), // brand-new key
      (2L, 12L, "D", Option.empty[String], Option.empty[Double]) // tombstone key 2
    ).toDF("k", "seq", "op", "name", "bal")
    assert(merge(ch) === Seq(
      (1L, Some("alice2"), Some(11.0)),
      (3L, Some("carol"), Some(30.0)),
      (4L, Some("dave"), Some(40.0))))
  }

  test("mergeChangelog: latest seq wins within a key; delete of an absent key is a no-op") {
    val ch = Seq(
      (1L, 1L, "U", Some("old"), Some(1.0)),
      (1L, 9L, "U", Some("new"), Some(9.0)), // newer seq must win
      (99L, 5L, "D", Option.empty[String], Option.empty[Double]) // absent key
    ).toDF("k", "seq", "op", "name", "bal")
    assert(merge(ch) === Seq(
      (1L, Some("new"), Some(9.0)),
      (2L, Some("bob"), Some(20.0)),
      (3L, Some("carol"), Some(30.0))))
  }

  test("mergeChangelog: a null payload column on an upsert overwrites (no coalesce resurrection)") {
    val ch = Seq((1L, 10L, "U", Option.empty[String], Some(11.0)))
      .toDF("k", "seq", "op", "name", "bal")
    assert(merge(ch).head === ((1L, None, Some(11.0))))
  }

  test("mergeChangelog: same-seq tie resolves to D deterministically") {
    val ch = Seq(
      (2L, 7L, "U", Some("zombie"), Some(1.0)),
      (2L, 7L, "D", Option.empty[String], Option.empty[Double])
    ).toDF("k", "seq", "op", "name", "bal")
    assert(merge(ch).map(_._1) === Seq(1L, 3L)) // key 2 is gone
  }

  test("diffSnapshots: minimal I/U/D rows, null payload diffs detected, unchanged rows absent") {
    val newer = Seq(
      (1L, Some("alice"), Some(10.0)), // unchanged -> no row
      (2L, Some("bob"), Option.empty[Double]), // bal 20.0 -> null: a change
      (4L, Some("dave"), Some(40.0)) // new key; key 3 (carol) deleted
    ).toDF("k", "name", "bal")
    val diff = CdcOps.diffSnapshots(base, newer, "k")
      .orderBy("k")
      .as[(Long, Long, String, Option[String], Option[Double])].collect().toSeq
    assert(diff === Seq(
      (2L, 0L, "U", Some("bob"), None),
      (3L, 0L, "D", None, None),
      (4L, 0L, "I", Some("dave"), Some(40.0))))
  }

  test("diffSnapshots round-trip law: merge(old, diff(old, new)) == new") {
    val newer = Seq(
      (1L, Some("alice2"), Some(11.0)),
      (2L, Some("bob"), Some(20.0)),
      (5L, Option.empty[String], Some(50.0))
    ).toDF("k", "name", "bal")
    val diff = CdcOps.diffSnapshots(base, newer, "k")
    val rebuilt = CdcOps.mergeChangelog(base, diff, "k", "seq", "op")
      .as[(Long, Option[String], Option[Double])].collect().toSet
    val want = newer.as[(Long, Option[String], Option[Double])].collect().toSet
    assert(rebuilt === want)
  }

  test("diffSnapshots of identical snapshots is empty") {
    assert(CdcOps.diffSnapshots(base, base, "k").count() === 0)
  }

  test("mergeChangelog: idempotent — re-applying the same changelog is a fixpoint") {
    val ch = Seq(
      (1L, 10L, "U", Some("alice2"), Some(11.0)),
      (2L, 12L, "D", Option.empty[String], Option.empty[Double]),
      (4L, 11L, "I", Some("dave"), Some(40.0))
    ).toDF("k", "seq", "op", "name", "bal")
    val once = CdcOps.mergeChangelog(base, ch, "k", "seq", "op")
    val twice = CdcOps.mergeChangelog(once, ch, "k", "seq", "op")
      .orderBy("k").as[(Long, Option[String], Option[Double])].collect().toSeq
    assert(twice === merge(ch))
  }

  test("mergeAggState: merge(agg(base), agg(delta)) == agg(base union delta)") {
    import graft.operators.CdcOps
    val base = Seq((1L, 10.0, 3), (1L, 20.0, 5), (2L, 7.0, 1)).toDF("k", "v", "m")
    val delta = Seq((1L, 5.0, 9), (3L, 2.0, 2)).toDF("k", "v", "m")
    def aggOf(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("k")).agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,4)")).as("s"), max(col("m")).as("mx"))
    val merged = CdcOps.mergeAggState(aggOf(base), aggOf(delta), Seq("k"),
        Seq(("n", (n: String) => sum(col(n))),
          ("s", (n: String) => sum(col(n))),
          ("mx", (n: String) => max(col(n)))))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue, r.getInt(3)))
    val full = aggOf(base.unionByName(delta)).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue, r.getInt(3)))
    assert(merged.toSeq === full.toSeq)
    // new key (3) appears, existing key (1) merges across both inputs
    assert(merged.map(_._1).toSeq === Seq(1L, 2L, 3L))
  }

  test("scd2History: intervals chain, deletes close without opening, last version current") {
    val changelog = Seq(
      (1L, 10L, "U", "a"), (1L, 20L, "U", "b"), (1L, 30L, "D", "x"),
      (1L, 40L, "U", "c"),                       // re-inserted after delete
      (2L, 5L, "U", "only"),                     // single current version
      (3L, 7L, "U", "gone"), (3L, 9L, "D", "x")  // deleted, no current row
    ).toDF("k", "seq", "op", "v")
    val got = CdcOps.scd2History(changelog, Seq("k"), "seq", "op", Seq("v"))
      .orderBy("k", "seq_from").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(3), r.getString(4)))
    assert(got.toSeq === Seq(
      (1L, 10L, Some(20L), false, "a"),
      (1L, 20L, Some(30L), false, "b"),   // closed by the delete
      (1L, 40L, None, true, "c"),
      (2L, 5L, None, true, "only"),
      (3L, 7L, Some(9L), false, "gone"))) // closed, never current again
  }

  test("pointInTime: inclusive boundary, mid-interval, pre-history and post-delete nulls") {
    // key A: v1 valid [1, 5), v2 valid [5, 9), delete at 9
    val changelog = Seq(
      (1L, 1L, "U", "v1"), (1L, 5L, "U", "v2"), (1L, 9L, "D", "x")
    ).toDF("k", "seq", "op", "name")
    val hist = CdcOps.scd2History(changelog, Seq("k"), "seq", "op",
      Seq("name"))
    val facts = Seq((10L, 1L, 0L), (11L, 1L, 1L), (12L, 1L, 4L),
      (13L, 1L, 5L), (14L, 1L, 10L), (15L, 2L, 3L))
      .toDF("fact_id", "k", "seq")
    val got = CdcOps.pointInTime(facts, hist, Seq("k"), "seq", Seq("name"))
      .orderBy("fact_id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3)))
    assert(got.toSeq === Seq(
      10L -> None,          // before any version
      11L -> Some("v1"),    // inclusive at its own seq_from
      12L -> Some("v1"),    // mid-interval
      13L -> Some("v2"),    // boundary: v2 takes effect AT 5
      14L -> None,          // after the delete tombstone
      15L -> None))         // key with no history at all
  }

  test("pointInTimeHashed: row-for-row equal to the as-of pointInTime, " +
      "sort-free hash-join plan") {
    // the same edge fixture as pointInTime (boundaries, tombstone gap,
    // pre-history, unknown key) plus a second key with interleaved facts
    val changelog = Seq(
      (1L, 1L, "U", "v1"), (1L, 5L, "U", "v2"), (1L, 9L, "D", "x"),
      (2L, 3L, "U", "w1"), (2L, 7L, "U", "w2")
    ).toDF("k", "seq", "op", "name")
    val hist = CdcOps.scd2History(changelog, Seq("k"), "seq", "op",
      Seq("name"))
    val facts = Seq((10L, 1L, 0L), (11L, 1L, 1L), (12L, 1L, 4L),
      (13L, 1L, 5L), (14L, 1L, 10L), (15L, 3L, 3L),
      (16L, 2L, 3L), (17L, 2L, 6L), (18L, 2L, 7L), (19L, 2L, 100L))
      .toDF("fact_id", "k", "seq")
    val asOf = CdcOps.pointInTime(facts, hist, Seq("k"), "seq", Seq("name"))
    val hashed = CdcOps.pointInTimeHashed(facts, hist, Seq("k"), "seq",
      Seq("name"))
    assert(asOf.columns.toSeq === hashed.columns.toSeq)
    val a = asOf.orderBy("fact_id").collect().map(_.toString).toSeq
    val h = hashed.orderBy("fact_id").collect().map(_.toString).toSeq
    assert(a === h, "hashed PIT diverged from the as-of PIT")
    // multiplicity: disjoint intervals -> exactly one output row per fact
    assert(hashed.count() === facts.count())
    // the plan is the point: a shuffled-hash join, no sort on either side
    // the plan is the point: the JOIN is a shuffled-hash join, not a
    // sort-merge — the only Sort left in the tree is scd2History's own
    // delta-sized lead window, which both variants pay identically
    val plan = hashed.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"hash hint ignored:\n$plan")
  }
}
