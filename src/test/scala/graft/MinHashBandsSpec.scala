package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Bit-equivalence of the native per-row [[graft.functions.MinHashBands]]
  * scan against the explode/128-min-aggregate + concat_ws formulation it
  * replaced: identical (doc_id, band, bsig) bucket tables on adversarial
  * shingle edges and a randomized corpus. The d03/d11 DuckDB oracles were
  * written (and stay green) against the aggregate semantics, so equality
  * here is what keeps those keys pinned.
  */
class MinHashBandsSpec extends SparkSpec {

  private def aggBuckets(hashed: DataFrame, bands: Int, rows: Int): DataFrame = {
    val sigs = DedupOps.minhashSignatures(hashed, bands * rows)
    val bandCols = (0 until bands).map { bnd =>
      val rs = (0 until rows).map(r => col(s"sig_${bnd * rows + r}"))
      struct(lit(bnd).as("band"), concat_ws("_", rs: _*).as("bsig"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bsig").as("bsig"))
  }

  private def assertEquivalent(texts: Seq[(Long, String)], bands: Int = 32,
                               rows: Int = 4): Unit = {
    import spark.implicits._
    val sh = DedupOps.shingleSets(texts.toDF("doc_id", "text"),
      col("doc_id"), col("text"), 3)
    val hashed = DedupOps.hashedShingleSets(sh)
    val native = DedupOps.lshBuckets(hashed, bands, rows)
    assert(native.queryExecution.analyzed.toString.contains("graft_minhash_bands"),
      "native path not taken — is GraftExtensions installed?")
    val agg = aggBuckets(hashed, bands, rows)
    val bad = native.withColumnRenamed("bsig", "n")
      .join(agg.withColumnRenamed("bsig", "a"), Seq("doc_id", "band"), "full_outer")
      .filter(not(col("n") <=> col("a"))).collect()
    if (bad.nonEmpty) {
      val r = bad.head
      fail(s"${bad.length} mismatching buckets; first: doc_id=${r.get(0)} " +
        s"band=${r.get(1)} native=${r.get(2)} agg=${r.get(3)}")
    }
    assert(native.count() === agg.count())
  }

  test("adversarial shingle edges match the aggregate formulation exactly") {
    assertEquivalent(Seq(
      "", " ", "a", "a b", "a b c", "a b c d e f g",
      "dup dup dup dup dup", "x " * 100,
      "café über naïve résumé", "😀 a b 😀 c", "1 2 3 4 5",
      "the quick brown fox jumps over the lazy dog").zipWithIndex
      .map { case (t, i) => (i.toLong, t) })
  }

  test("empty and null docs drop on both paths") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, ""), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val sh = DedupOps.shingleSets(df, col("doc_id"), col("text"), 3)
    val hashed = DedupOps.hashedShingleSets(sh)
    val native = DedupOps.lshBuckets(hashed, 8, 2)
    val agg = aggBuckets(hashed, 8, 2)
    // "" and "a b" shingle (k=3) to <3-token docs — shinglesOfTokens decides
    // whether those are empty; whatever it yields, both paths must agree
    assert(native.select("doc_id").distinct().collect().map(_.get(0)).toSet ===
      agg.select("doc_id").distinct().collect().map(_.get(0)).toSet)
  }

  test("randomized corpus matches the aggregate formulation exactly") {
    val rnd = new scala.util.Random(0xba4d5L)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "é", "😀", "x1", "x2")
    val texts = (1 to 400).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, (1 to n).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    assertEquivalent(texts)
    assertEquivalent(texts.take(50), bands = 5, rows = 3)
  }

  test("the native plan computes buckets without an aggregate exchange") {
    import spark.implicits._
    val pq = java.nio.file.Files
      .createTempDirectory("graft_minhash_plan").resolve("t.parquet").toString
    Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(pq)
    val sh = DedupOps.shingleSets(spark.read.parquet(pq),
      col("doc_id"), col("text"), 3)
    val plan = DedupOps.lshBuckets(DedupOps.hashedShingleSets(sh), 32, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_minhash_bands"), plan)
    assert(!plan.contains("Exchange"),
      s"per-document banding plan should not shuffle:\n$plan")
  }
}
