package graft.tools

import org.apache.spark.sql.functions._

import graft.jobs.{CurationPipeline, PackingPipeline}

/** Decade driver for the two composition recipes (VERDICT r14 task 3):
  * E117 CurationPipeline and E126 PackingPipeline are spec-gated at
  * fixture scale; this main runs them against a real testdata decade and
  * prints one JSON line per pipeline with wall time and the per-stage
  * survivor counts — the audit trail a production curation run reports.
  * Stage semantics are untouched: this is the jobs' public `run` surface
  * driven at sf1/sf10, nothing bench-special.
  *
  * The decontamination benchmark is a deterministic ~0.1% slice of the
  * corpus itself (doc_id % 997 == 0) — a realistic regime where benchmark
  * members (and their near-duplicates) exist in the pool and must fall
  * out. The semantic stage runs when the dir carries an embeddings table
  * (vec_id-keyed, the d18-family pairing convention).
  *
  * Usage: runMain graft.tools.PipelineBench [sfDir] [curation,packing]
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata_sf1")
    val which = (if (args.length > 1) args(1) else "curation,packing")
      .split(',').map(_.trim).filter(_.nonEmpty).toSet
    val spark = graft.GraftSession.build("pipeline-bench")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))

    if (which("curation")) {
      val bench = docs.filter(col("doc_id") % 997 === 0)
        .select(col("doc_id").as("bench_id"), col("text"))
      val emb =
        if (new java.io.File(s"$dir/embeddings.parquet").exists())
          Some(graft.Tables.embeddings(spark, dir)
            .select(col("vec_id").as("doc_id"), col("embedding")))
        else None
      val t0 = System.nanoTime()
      val r = CurationPipeline.run(docs, bench, embeddings = emb)
      r.curated.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val finalN = r.curated.count()
      val stages = (r.stageCounts :+ ("curated" -> finalN))
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      println(s"""{"pipeline":"curation","sf":"$dir","sec":${f"$sec%.1f"},""" +
        s""""semantic_stage":${emb.isDefined},"stages":$stages}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }

    if (which("packing")) {
      val t0 = System.nanoTime()
      val r = PackingPipeline.run(docs, col("doc_id"), col("text"))
      r.packed.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val stats = r.stats.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
      println(s"""{"pipeline":"packing","sf":"$dir","sec":${f"$sec%.1f"},""" +
        s""""num_merges":${r.merges.length},"stats":$stats}""")
    }
    spark.stop()
  }
}
