package graft.tools

import org.apache.spark.sql.functions._

/** t08/t38 native-scan candidacy A/B (VERDICT r11 task 7): is the
  * interpreted array-HOF in `stripStopwords` (filter + array_contains
  * lambda per token) the key's dominant term, or is the cost in the
  * split/reassemble/sort that any formulation pays?
  *
  * Three timed plans over the sf dir's documents, all materialized via
  * noop:
  *  - strip:    the shipped stripStopwords (HOF filter + concat_ws)
  *  - hof_noop: identical plan with an always-true lambda — same
  *              interpreted-HOF machinery, zero contains work
  *  - no_hof:   tokens + concat_ws only (no filter at all) — the floor
  *              every formulation pays
  * strip − hof_noop ≈ the contains scans; hof_noop − no_hof ≈ the HOF
  * interpretation tax a native expression could remove.
  *
  * Usage: runMain graft.tools.HofAb <sfDir> [trials]
  */
object HofAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val trials = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.build("graft-hof-ab")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sw = array(graft.operators.TextOps.DefaultStopwords.map(lit): _*)
    val base = docs.select(col("doc_id").as("id"),
      graft.operators.TextOps.tokens(col("text")).as("__toks"))

    def timed(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"plan":"$label","median_sec":${secs(secs.size / 2)}%.3f}""")
    }

    timed("strip") {
      graft.operators.CurationOps.stripStopwords(docs, col("doc_id"),
        col("text"))
    }
    timed("hof_noop") {
      base.withColumn("__kept", filter(col("__toks"), t => lit(true)))
        .select(col("id"), concat_ws(" ", col("__kept")).as("clean_text"),
          (size(col("__toks")) - size(col("__kept"))).as("n_removed"))
    }
    timed("no_hof") {
      base.select(col("id"), concat_ws(" ", col("__toks")).as("clean_text"),
        size(col("__toks")).as("n_removed"))
    }
    spark.stop()
  }
}
