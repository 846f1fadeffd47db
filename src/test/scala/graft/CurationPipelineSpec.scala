package graft

import org.apache.spark.sql.functions._
import graft.jobs.CurationPipeline

/** The composition gate for the curation recipe: each stage is
  * oracle-checked on its own; this pins that the STAGES COMPOSE — planted
  * exact dups, near dups, and contaminated docs fall out at the right
  * stage, and the survivors carry a complete, deterministic
  * split/shard assignment. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // filler docs so every source has enough rows to split
    val filler = (100L until 140L).map { i =>
      (i, s"filler document number $i with some distinct words w$i x$i y$i z$i q$i r$i", s"s${i % 2}")
    }
    (Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight", "s0"),
      (2L, "THE  QUICK   brown fox jumps over the lazy dog tonight", "s0"), // exact dup of 1 mod case/ws
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu", "s1"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu", "s1"), // near dup of 3
      (5L, "leaked benchmark question about spark shuffles appears verbatim here", "s0")
    ) ++ filler).toDF("doc_id", "text", "source")
  }

  private val bench =
    Seq((900L, "a leaked benchmark question about spark shuffles and more"))
      .toDF("bench_id", "text")

  test("stages compose: dups and contamination fall out, survivors fully assigned") {
    val r = CurationPipeline.run(corpus, bench, qualityQuantile = 1.0,
      nShards = 2)
    val counts = r.stageCounts.toMap
    assert(counts("input") === 45L)
    assert(counts("exact_dedup") === 44L)     // 2 merged into 1
    assert(counts("near_dedup") === 43L)      // one of 3/4 survives
    assert(counts("decontaminated") === 42L)  // 5 shares a 5-gram with bench
    assert(counts("quality") === 42L)         // q = 1.0 keeps everything
    val rows = r.curated.collect()
    assert(rows.length === 42)
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids.contains(1L) && !ids.contains(2L) && !ids.contains(5L))
    assert(Seq(3L, 4L).count(ids.contains) === 1) // exactly one near-dup kept
    // every survivor has a split; every train row has a shard in range
    val splitIdx = r.curated.columns.indexOf("split")
    val shardIdx = r.curated.columns.indexOf("shard")
    assert(rows.forall(!_.isNullAt(splitIdx)))
    val train = rows.filter(_.getString(splitIdx) == "train")
    assert(train.nonEmpty &&
      train.forall(r => !r.isNullAt(shardIdx) && Set(0, 1)(r.getInt(shardIdx))))
    assert(rows.filterNot(_.getString(splitIdx) == "train")
      .forall(_.isNullAt(shardIdx)))
    // deterministic: a second run reproduces the identical assignment
    val again = CurationPipeline.run(corpus, bench, qualityQuantile = 1.0,
      nShards = 2)
    assert(again.curated.orderBy("doc_id").collect().map(_.toString).toSeq ===
      r.curated.orderBy("doc_id").collect().map(_.toString).toSeq)
  }

  test("quality gate engages below q = 1.0 and only ever shrinks the corpus") {
    val r = CurationPipeline.run(corpus, bench, qualityQuantile = 0.5,
      nShards = 2)
    val counts = r.stageCounts.toMap
    assert(counts("quality") < counts("decontaminated"))
    assert(r.curated.count() === counts("quality"))
  }
}
