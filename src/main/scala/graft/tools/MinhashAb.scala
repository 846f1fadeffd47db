package graft.tools

import org.apache.spark.sql.functions._

/** d03 stage profile: where does the minhash-LSH pipeline spend its time
  * at scale? Times each stage of [[graft.operators.DedupOps.minhashLshPairs]]
  * in isolation (shingle+hash materialization, signature aggregate, band
  * bucketing, end-to-end pairs) so a signature-path change can be judged
  * against the stage it actually touches, not the whole-key number.
  *
  * Usage: runMain graft.tools.MinhashAb <sfDir>
  */
object MinhashAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.GraftSession.build("graft-minhash-ab")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.DedupOps

    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"stage":"$label","sec":$s%.3f}""")
      s
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = DedupOps.shingleSets(docs, col("doc_id"), col("text"), 3)

    // stage 1: shingling + md5 hashing, materialized (what the eager
    // persist inside minhashLshPairs pays once)
    val hashed = DedupOps.hashedShingleSets(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("shingle_hash_persist") { hashed.count() }

    // stage 2: the 128-min hash aggregate (explode + shuffle + agg)
    timed("signatures_agg") {
      DedupOps.minhashSignatures(hashed, 128)
        .write.format("noop").mode("overwrite").save()
    }

    // stage 3: signatures + banding to (doc_id, band, bsig)
    timed("band_buckets") {
      DedupOps.lshBuckets(hashed, 32, 4)
        .write.format("noop").mode("overwrite").save()
    }

    hashed.unpersist()
    // end-to-end, as d03 runs it (own internal persist)
    timed("pairs_end_to_end") {
      DedupOps.minhashLshPairs(sh, 0.8).count()
    }
    spark.stop()
  }
}
