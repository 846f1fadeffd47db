package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end curation-pipeline timing at an arbitrary sf dir — the
  * composition half of the scale sweep (individual heavy keys go through
  * `graft.Bench` with a prefix filter). Benchmark set = every 997th doc
  * (deterministic, corpus-proportional), which also exercises the
  * decontamination stage with real hits (those docs drop as exact
  * self-matches of the bench).
  *
  * Usage: runMain graft.tools.CurationSweep <sfDir> */
object CurationSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("graft-curation-sweep")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 997 === 0).select(col("text"))
    // the embeddings table covers a doc_id prefix — enough to exercise
    // the optional semantic stage at scale (uncovered docs pass through)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val t0 = System.nanoTime()
    val r = graft.jobs.CurationPipeline.run(docs, bench,
      embeddings = Some(emb))
    val n = r.curated.count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    val stages = r.stageCounts.map { case (s, c) => s""""$s":$c""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"curation_pipeline","value":$elapsed%.3f,"unit":"sec","curated":$n,"stages":$stages,"sf":"$sfDir"}""")
    spark.stop()
  }
}
