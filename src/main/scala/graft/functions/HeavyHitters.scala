package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: the frequent items in one bounded-memory
  * aggregation pass, as a typed Spark [[Aggregator]] (mergeable — map-side
  * partial aggregation applies, so the full term stream is NEVER shuffled;
  * only ≤ `k`-entry summaries move).
  *
  * Guarantees (standard MG): every item with true frequency > n/(k+1) is
  * present in the output, and each reported count underestimates the true
  * count by at most n/(k+1). Counts are NOT exact and the reported set for
  * borderline items depends on merge order — this operator is inherently
  * not oracle-hashable (documented; the guarantees are property-tested in
  * HeavyHitterSpec instead). Exact counting of a skewed term domain at
  * 100 TB means shuffling every token; this is the bounded-memory
  * alternative when the tail doesn't matter.
  */
object HeavyHitters {

  /** MG summary combine: sum counters, then decrement all by the
    * (k+1)-largest until ≤ k survive — the standard mergeable reduction
    * (Agarwal et al., "Mergeable Summaries"). */
  private[graft] def shrink(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      // decrement by the (k+1)-th largest count; drops at least one entry
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (t, c) =>
        val nc = c - cut
        if (nc > 0) Some(t -> nc) else None
      }
    }

  private final class MgAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      shrink(b.updated(t, b.getOrElse(t, 0L) + 1L), k)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      shrink(b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }, k)
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** MG summary + total element count in one pass (the count makes the
    * share threshold of [[exactHeavyHitters]] free — no second scan). */
  private final class MgCountAgg(k: Int)
      extends Aggregator[String, (Map[String, Long], Long), (Map[String, Long], Long)] {
    override def zero: (Map[String, Long], Long) = (Map.empty, 0L)
    override def reduce(b: (Map[String, Long], Long), t: String): (Map[String, Long], Long) =
      (shrink(b._1.updated(t, b._1.getOrElse(t, 0L) + 1L), k), b._2 + 1L)
    override def merge(a: (Map[String, Long], Long), b: (Map[String, Long], Long)): (Map[String, Long], Long) =
      (shrink(b._1.foldLeft(a._1) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }, k), a._2 + b._2)
    override def finish(r: (Map[String, Long], Long)): (Map[String, Long], Long) = r
    override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
      Encoders.kryo[(Map[String, Long], Long)]
    override def outputEncoder: Encoder[(Map[String, Long], Long)] =
      Encoders.kryo[(Map[String, Long], Long)]
  }

  /** The MG summary as a typed aggregation column — usable in batch AND
    * streaming aggregations (the state the stream engine keeps per group is
    * the ≤ k-entry summary itself, merged incrementally per micro-batch;
    * asserted in HeavyHitterSpec). */
  def sketchAgg(k: Int): org.apache.spark.sql.TypedColumn[String, Map[String, Long]] = {
    require(k > 0, s"k must be positive: $k")
    new MgAgg(k).toColumn
  }

  /** Heavy hitters of a string column: (item, est_count) rows, largest
    * first, at most `k` rows. One aggregation pass; summaries merge
    * map-side. */
  def heavyHitters(df: DataFrame, c: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(c.cast("string")).as[String]
    val summary = ds.select(new MgAgg(k).toColumn).head()
    summary.toSeq.toDF("item", "est_count")
      .orderBy(col("est_count").desc, col("item"))
  }

  /** EXACT heavy hitters — every item with frequency > `minShare` of the
    * stream, with exact counts — via the standard two-pass sketch-then-
    * verify plan: pass 1 builds an MG summary with k = ceil(1/minShare)
    * counters (its keys are a guaranteed SUPERSET of all qualifying items,
    * since n/(k+1) ≤ minShare·n) plus the exact element count; pass 2
    * recounts ONLY the ≤ k candidates (broadcast `isin` filter → tiny hash
    * agg) and keeps those above the threshold.
    *
    * Unlike [[heavyHitters]] the output is deterministic and engine-
    * portable — the sketch only PRUNES, the reported rows and counts equal
    * the plain `GROUP BY ... HAVING count > n·minShare` answer, which is
    * what lets this be oracle-gated (t10). At 100 TB this is 2 scans and a
    * k-row shuffle instead of shuffling every distinct term of the full
    * GROUP BY. The driver-side candidate list is bounded by k. */
  def exactHeavyHitters(df: DataFrame, c: Column, minShare: Double): DataFrame = {
    require(minShare > 0 && minShare < 1, s"minShare in (0,1): $minShare")
    val k = math.ceil(1.0 / minShare).toInt
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(c.cast("string")).as[String]
    val (summary, n) = ds.select(new MgCountAgg(k).toColumn).head()
    val cands = summary.keys.toSeq
    if (cands.isEmpty)
      return df.select(c.cast("string").as("term"), lit(0L).as("cnt")).limit(0)
    df.select(c.cast("string").as("term"))
      .filter(col("term").isin(cands: _*))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(n.toDouble * minShare))
  }
}
