package graft.tools

import org.apache.spark.sql.functions._

/** SimHash banding stage profile: where does a simhashPairs consumer
  * spend its time, and what candidate volume does the band scheme
  * actually generate? Times the fingerprint stage and the pair join in
  * isolation over the m03 demo-BMP corpus (the pair-miner input with the
  * most within-group near-dup structure), and counts the pre-distinct
  * candidate rows the band join emits — the number the n²·bands/2^bits
  * analysis predicts, so a scheme change can be judged against measured
  * volume, not estimated volume.
  *
  * Usage: runMain graft.tools.BandAb <sfDir>
  */
object BandAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.GraftSession.build("graft-band-ab")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{DedupOps, Multimodal}

    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"stage":"$label","sec":$s%.3f}""")
      s
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.demoBmpCorpus(docs, col("doc_id"))

    // stage 1: render + decode + aHash, materialized once
    val fp = Multimodal.imageHashes(media, col("doc_id"), col("payload"))
      .localCheckpoint(true)
    timed("render_decode_ahash") { fp.count() }

    // stage 2: the band join alone — BOTH the pre-distinct candidate
    // volume (what the n²·bands/2^bits analysis predicts: Σ over
    // (chunk, ck) buckets of n·(n−1)/2, exactly the a<b rows the bucket
    // self-join emits before distinct/hamming filtering) and the verified
    // pair count. multiIndex=false throughout: that is the scheme the m03
    // image miner actually runs (imageNearDupPairs passes false — uniform
    // md5-derived fingerprints measured 2-4x slower under multi-index).
    var nCand = 0L
    var nVerified = 0L
    timed("band_join_count") {
      nCand = DedupOps.chunkBuckets(fp, "doc_id", "h", 3,
          multiIndex = false)
        .groupBy(col("chunk"), col("ck")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)))
        .collect()(0).getLong(0)
      nVerified = DedupOps.simhashPairs(fp, 3, multiIndex = false).count()
    }
    println(s"""{"pre_distinct_candidates":$nCand,"verified_pairs":$nVerified}""")

    // stage 3: end-to-end pairs on the UNcheckpointed fingerprints —
    // exactly what m03 runs (both join sides recompute the lineage)
    timed("pairs_end_to_end_uncached") {
      Multimodal.imageNearDupPairs(media, col("doc_id"), col("payload"), 3)
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
