package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.AnalyticsOps

/** Streaming co-occurrence monitor at a real decade (VERDICT r16 task 6):
  * b55's `coOccurrencePairCounts` partial is proven batch-equal at fixture
  * scale in StreamingSpec; this main drives the same E86/E87/E93 monitor
  * pattern over a decade's lineitem table, trigger by trigger, and then
  * asserts the merged monitor state reproduces the one-shot batch report
  * row for row.
  *
  * Per trigger (baskets arrive WHOLE — the shard key is the basket id,
  * exactly the Kafka-keyed-by-order-id deployment assumption the operator
  * documents):
  *   - the trigger's baskets reduce to their distinct (basket, item) rows
  *     and oversized baskets drop (the b55 kept-frame rules),
  *   - pair-count/item-count partials fold into the additive monitor
  *     state by (key)-sum; the basket count adds as a scalar,
  *   - measured: partial+merge wall, state rows (pairs table).
  *
  * After the last trigger the full batch `coOccurrence` runs over the same
  * table and the two reports are compared with exceptAll both ways — the
  * monitor's lift chain (coOccurrenceFromCounts) is the same fixed-shape
  * IEEE arithmetic, so equality is exact, not approximate.
  *
  * Usage: runMain graft.tools.StreamingCooccurDemo [sfDir] [nShards]
  */
object StreamingCooccurDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata_sf1")
    val nShards = if (args.length > 1) args(1).toInt else 8
    val minPairCount = 2L
    val maxBasketSize = 10000L
    val spark = graft.GraftSession.build("cooccur-stream-demo")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val items = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
    val ids = items.select(min("basket"), max("basket")).head()
    val (loId, hiId) = (ids.getLong(0), ids.getLong(1))
    val span = hiId - loId + 1
    // integer DIV shard of the BASKET id: a basket's rows always land in
    // one shard, the whole-basket-per-trigger contract
    def shardOf = expr(
      s"CAST(((basket - ${loId}L) * $nShards) DIV ${span}L AS INT)")
    val nRows = items.count()
    println(s"[cooccur-stream] dir=$dir rows=$nRows shards=$nShards")

    // additive monitor state
    var pairs = Seq.empty[(Long, Long, Long)].toDF("item_a", "item_b", "n_ab")
    var itemCounts = Seq.empty[(Long, Long)].toDF("item", "n_i")
    var nBaskets = 0L

    val mem = MemoryStream[Int]
    val q = mem.toDS().toDF("shard").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val shards = batch.collect().map(_.getInt(0))
        shards.foreach { s =>
          // the trigger's kept frame: distinct rows, oversized baskets out
          val it = items.filter(shardOf === s).distinct()
          val keptB = it.groupBy(col("basket"))
            .agg(count(lit(1)).as("__sz"))
            .filter(col("__sz") <= maxBasketSize)
            .select("basket")
          val kept = it.join(keptB, "basket").localCheckpoint(true)
          pairs = pairs.union(AnalyticsOps.coOccurrencePairCounts(kept))
            .groupBy(col("item_a"), col("item_b"))
            .agg(sum(col("n_ab")).as("n_ab"))
            .localCheckpoint(true)
          itemCounts = itemCounts
            .union(kept.groupBy(col("item")).agg(count(lit(1)).as("n_i")))
            .groupBy(col("item")).agg(sum(col("n_i")).as("n_i"))
            .localCheckpoint(true)
          nBaskets += kept.select(col("basket")).distinct().count()
          kept.unpersist(false)
        }
      }.start()
    try {
      (0 until nShards).foreach { s =>
        val t0 = System.nanoTime()
        mem.addData(s)
        q.processAllAvailable()
        val trigSec = (System.nanoTime() - t0) / 1e9
        val stateRows = pairs.count()
        println(f"[cooccur-stream] trigger=$s%2d wall=${trigSec}%6.1f s" +
          f"  state_pairs=$stateRows%,12d  baskets_seen=$nBaskets%,d")
      }
    } finally q.stop()

    // the monitor's report vs the one-shot batch report — exact equality
    val streamed = AnalyticsOps.coOccurrenceFromCounts(pairs, itemCounts,
      nBaskets, minPairCount).localCheckpoint(true)
    val batch = AnalyticsOps.coOccurrence(
        graft.Tables.lineitem(spark, dir), col("l_orderkey"),
        col("l_partkey"), minPairCount = minPairCount)
      .localCheckpoint(true)
    val diff = streamed.exceptAll(batch).count() +
      batch.exceptAll(streamed).count()
    println(s"[cooccur-stream] streamed rows=${streamed.count()} " +
      s"batch rows=${batch.count()} diff=$diff " +
      (if (diff == 0) "(EQUIVALENT)" else "(MISMATCH!)"))
    spark.stop()
    if (diff != 0) sys.exit(1)
  }
}
