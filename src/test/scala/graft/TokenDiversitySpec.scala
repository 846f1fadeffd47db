package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Equivalence of the native per-row [[graft.functions.TokenDiversity]]
  * scan against the array_sort + run-length-fold formulation it replaced
  * (`TextOps.tokenDiversityFold`): identical (n_tokens, collision_p,
  * diversity) on adversarial token edges and a randomized corpus. The
  * t25 DuckDB oracle was written against the fold semantics, so equality
  * here is what keeps that key pinned.
  */
class TokenDiversitySpec extends SparkSpec {

  private def assertEquivalent(texts: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val df = texts.toDF("doc_id", "text")
    val native = TextOps.tokenDiversity(df, col("doc_id"), col("text"))
    assert(native.queryExecution.analyzed.toString.contains("graft_token_diversity"),
      "native path not taken — is GraftExtensions installed?")
    val fold = TextOps.tokenDiversityFold(df, col("doc_id"), col("text"))
    val n = native.select(col("id"), col("n_tokens").as("nt_n"),
      col("collision_p").as("cp_n"), col("diversity").as("dv_n"))
    val f = fold.select(col("id"), col("n_tokens").as("nt_f"),
      col("collision_p").as("cp_f"), col("diversity").as("dv_f"))
    val bad = n.join(f, Seq("id"), "full_outer")
      .filter(not(col("nt_n") <=> col("nt_f")) ||
        not(col("cp_n") <=> col("cp_f")) || not(col("dv_n") <=> col("dv_f")))
      .collect()
    if (bad.nonEmpty)
      fail(s"${bad.length} mismatching docs; first: ${bad.head}")
  }

  test("adversarial token edges match the fold formulation exactly") {
    assertEquivalent(Seq(
      "", " ", "  ", "a", "a a", "a b", "a a a a", "a b a b c",
      "\ta\n", " a b ", "a  b", "dup dup dup unique", "x " * 300,
      "the the the the a a of", "😀 😀 emoji", "café café naïve",
      "7 7 7 2", "~`! ~`! $%^").zipWithIndex
      .map { case (t, i) => (i.toLong, t) })
  }

  test("null text yields null stats on both paths") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "a a b"))
      .toDF("doc_id", "text")
    val native = TextOps.tokenDiversity(df, col("doc_id"), col("text"))
      .orderBy("id").collect()
    val fold = TextOps.tokenDiversityFold(df, col("doc_id"), col("text"))
      .orderBy("id").collect()
    assert(native.length === 2 && fold.length === 2)
    assert(native(0).isNullAt(1) && fold(0).isNullAt(1))
    assert(native(1).getDouble(2) === fold(1).getDouble(2))
  }

  test("randomized corpus matches the fold formulation exactly") {
    val rnd = new scala.util.Random(0x70cd17L)
    val words = Vector("a", "b", "c", "dd", "ee", "é", "😀", " ", "\t", ".")
    val texts = (1 to 800).map { i =>
      val n = rnd.nextInt(50)
      (i.toLong, (1 to n).map(_ => words(rnd.nextInt(words.length)))
        .mkString(if (rnd.nextBoolean()) " " else "  "))
    }
    assertEquivalent(texts)
  }

  test("the native plan is a shuffle-free projection") {
    import spark.implicits._
    val pq = java.nio.file.Files
      .createTempDirectory("graft_tokdiv_plan").resolve("t.parquet").toString
    Seq((1L, "a a b"), (2L, "c d")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(pq)
    val plan = TextOps.tokenDiversity(spark.read.parquet(pq),
      col("doc_id"), col("text")).queryExecution.executedPlan.toString
    assert(plan.contains("graft_token_diversity"), plan)
    assert(!plan.contains("Exchange"),
      s"per-document diversity plan should not shuffle:\n$plan")
  }
}
