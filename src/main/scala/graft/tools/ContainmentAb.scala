package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d17 scale A/B: exact containment-pairs cost as a function of corpus
  * KEY DENSITY, on the same corpus. The sf1.0 sweep measured d17 (k=3)
  * superlinear; hypothesis: the synthetic corpus's FIXED ~31-word
  * vocabulary caps the k=3 shingle space at 31³ ≈ 30k keys, so every
  * key's df grows linearly with corpus size and the inverted-index pair
  * enumeration (Σ df²/2) grows quadratically — a corpus-density property,
  * not a plan defect. At k=5 the space is 31⁵ ≈ 28.6M, dfs stay low, and
  * the same plan should scale linearly. Also measures the maxDf knob.
  *
  * Usage: runMain graft.tools.ContainmentAb <sfDir> <k|auto> [maxDf]
  * (`auto` = the density-adaptive width containmentPairsAuto picks —
  * prints the chosen k, then profiles at it). */
object ContainmentAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxDf = if (args.length > 2) args(2).toLong else Long.MaxValue
    val spark = graft.GraftSession.build("graft-containment-ab")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val k =
      if (args(1) == "auto") {
        val auto = graft.operators.DedupOps.autoShingleWidth(docs,
          col("text"))
        println(s"""{"metric":"auto_shingle_width","sf":"$sfDir","k":$auto}""")
        auto
      } else args(1).toInt
    // df distribution diagnostic (one cheap agg)
    val keys = graft.operators.DedupOps.docKeySet(docs, col("doc_id"),
      col("text"), k)
    val dfStats = keys.groupBy("key").agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("n_keys"), avg("df").as("mean_df"),
        max("df").as("max_df"),
        sum(col("df") * (col("df") - 1) / 2).as("pair_volume"))
      .collect()(0)
    val t0 = System.nanoTime()
    val n = graft.operators.DedupOps.containmentPairs(docs, col("doc_id"),
      col("text"), k, thresholdPpm = 600000L, maxDf = maxDf).count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"containment_ab","sf":"$sfDir","k":$k,"maxDf":$maxDf,"n_keys":${dfStats.getLong(0)},"mean_df":${dfStats.getDouble(1)}%.1f,"max_df":${dfStats.getLong(2)},"pair_volume":${dfStats.getAs[Any](3)},"out_pairs":$n,"sec":$elapsed%.3f}""")
    spark.stop()
  }
}
