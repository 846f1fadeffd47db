package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column — the mergeable frequency summary for
  * corpus-scale counting where the exact per-key table is itself too big to
  * ship (token frequencies across shards, per-key rates in a stream, join
  * cardinality planning).
  *
  * The sketch is `depth` rows × `width` buckets of exact long counts; row j
  * buckets a key by the portable 60-bit md5 hash of `"cms<j>_" || key`
  * ([[Hashing.hash60]]), so — unlike Spark's engine-private xxhash — any
  * engine (or the DuckDB oracle) rebuilds the identical sketch bit-for-bit.
  * Point estimates are the classic min over rows of the bucket count:
  * always ≥ the true count, over by ≤ 2·N/width per row with probability
  * ≥ 1/2 per independent row (Cormode–Muthukrishnan bounds).
  *
  * Scale shape: the build is ONE hash aggregate over depth×|rows| exploded
  * pairs with map-side combine — the shuffle carries at most depth·width
  * partial rows per map task, never the data. The sketch (≤ depth·width
  * rows) broadcasts everywhere, and [[merge]] is a bucket-wise sum: build
  * per shard / per micro-batch, merge at read time, never rescan. That
  * mergeability is the whole point at 100 TB — it is asserted EXACTLY
  * (not approximately) in CountMinSpec.
  */
object CountMin {

  val DefaultDepth = 4
  val DefaultWidth = 1024

  private def bucketOf(j: Column, key: Column, width: Int): Column =
    pmod(Hashing.hash60(
      concat(lit("cms"), j.cast("string"), lit("_"), key.cast("string"))),
      lit(width.toLong))

  /** Build the sketch: (j, bucket, cnt) with one row per non-empty bucket.
    * `weight` is the per-row increment (lit(1L) for plain counts). Null
    * keys are excluded (a null key is no observation). */
  def build(df: DataFrame, keyCol: Column, weight: Column = lit(1L),
            depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame = {
    require(depth >= 1 && width >= 1, s"cms: bad depth=$depth width=$width")
    df.filter(keyCol.isNotNull)
      .select(keyCol.cast("string").as("__k"), weight.cast("long").as("__w"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), bucketOf(col("j"), col("__k"), width).as("bucket"),
        col("__w"))
      .groupBy("j", "bucket").agg(sum(col("__w")).as("cnt"))
  }

  /** Bucket-wise sum of independently built sketches (same depth/width) —
    * the shard/micro-batch merge law: merge(build(A), build(B)) equals
    * build(A ∪ B) exactly. */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "cms: nothing to merge")
    sketches.reduce(_ unionByName _)
      .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))
  }

  /** Point estimates for a key frame: est(k) = min over rows j of the
    * bucket count (0 if a bucket was never touched). The sketch side is
    * ≤ depth·width rows and broadcasts; the keys frame stays distributed. */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: Column,
               depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame =
    keys.filter(keyCol.isNotNull)
      .select(keyCol.cast("string").as("key"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("key"), col("j"),
        bucketOf(col("j"), col("key"), width).as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Join-cardinality estimate from two sketches over the two join keys:
    * |A ⋈ B| ≈ min over rows j of Σ_bucket cntA·cntB (the AMS-style inner
    * product; always ≥ the true size for exact sketches, tight when the
    * width swallows collisions). Runs entirely on the two ≤ depth·width-row
    * sketches — the decision input for broadcast-vs-salt-vs-merge BEFORE
    * paying for a 100 TB join. Products are summed in DECIMAL(38,0): two
    * petabyte-scale counts can multiply past int64. Returns one row
    * (est DECIMAL(38,0)). */
  def innerProduct(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("j"), col("bucket"), col("cnt").as("__ca"))
      .join(b.select(col("j"), col("bucket"), col("cnt").as("__cb")),
        Seq("j", "bucket"))
      .groupBy("j")
      .agg(sum(col("__ca").cast("decimal(19,0)") *
        col("__cb").cast("decimal(19,0)")).as("__ip"))
      .agg(min(col("__ip")).as("est"))
}
