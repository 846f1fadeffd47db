package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps}

/** Stage-timing probe for the d12_canonical chain at a given sf dir —
  * written for the r14 investigation of d12's 18×/decade isolated ratio
  * at sf100 (every other subset-record key is ≤10×/decade isolated).
  * Prints per-stage wall times and the candidate/verified/cluster-path
  * cardinalities that decide the plan shape (candidate mass carries the
  * n²/2¹⁵ chunk-collision term; verified pairs vs LocalPairThreshold
  * decides local-union-find vs distributed CC rounds).
  *
  * Usage: runMain graft.tools.D12Probe [sfDir]
  */
object D12Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata_sf100")
    val spark = graft.GraftSession.build("d12-probe")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d12probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    val fp = DedupOps.simhash60(docs, col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("simhash60")(println(s"[d12probe]   fingerprints = ${fp.count()}"))
    // candidate mass BEFORE the hamming verify (the n²/2¹⁵ chunk-collision
    // birthday term): sum of C(c,2) over the (chunk, ck) bucket sizes —
    // counts every candidate the bucket join would emit (incl. multi-chunk
    // re-collisions, exactly what the join pays) without running the join.
    t("candidate mass (pre-verify)") {
      val mass = DedupOps.chunkBuckets(fp, "doc_id", "h", maxHamming = 3,
          multiIndex = true)
        .groupBy("chunk", "ck").agg(count(lit(1)).as("c"))
        .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")).as("mass"))
        .head().getLong(0)
      println(s"[d12probe]   candidate pairs (with multi-chunk dups) = $mass")
    }
    val pairs = DedupOps.simhashPairs(fp, maxHamming = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("simhashPairs (verified)")(
      println(s"[d12probe]   verified pairs = ${pairs.count()} " +
        s"(LocalPairThreshold = ${DedupOps.LocalPairThreshold})"))
    val (clusters, rounds) = t("dedupClusters")(
      DedupOps.dedupClustersWithRounds(docs.select("doc_id"), pairs,
        strict = true))
    println(s"[d12probe]   distributed rounds = $rounds (0 = local UF)")
    t("clusters materialize")(println(
      s"[d12probe]   cluster rows = ${clusters.count()}"))
    val scores = docs.select(col("doc_id"),
      round(TextOps.qualityScore(col("text")) * lit(1000000.0))
        .cast("long").as("q_micro"))
    val canon = DedupOps.canonicalPerCluster(clusters, scores,
      col("doc_id"), col("q_micro"))
    t("canonicalPerCluster")(
      canon.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
