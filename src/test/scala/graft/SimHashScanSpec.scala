package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Bit-equivalence of the native per-row [[graft.functions.SimHash60]]
  * scan against the explode/60-sum-aggregate formulation it replaced
  * (`DedupOps.simhash60Agg`): identical fingerprints on adversarial token
  * edges and a randomized unicode corpus. The d04/d12/d21 DuckDB oracles
  * were written (and stay green) against the aggregate semantics, so
  * equality here is what keeps those keys pinned.
  */
class SimHashScanSpec extends SparkSpec {

  private def assertEquivalent(texts: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val df = texts.toDF("doc_id", "text")
    val native = DedupOps.simhash60(df, col("doc_id"), col("text"))
      .withColumnRenamed("simhash", "n")
    val agg = DedupOps.simhash60Agg(df, col("doc_id"), col("text"))
      .withColumnRenamed("simhash", "a")
    val joined = native.join(agg, Seq("doc_id"), "full_outer")
    val bad = joined.filter(not(col("n") <=> col("a"))).collect()
    if (bad.nonEmpty) {
      val r = bad.head
      fail(s"${bad.length} mismatching docs; first: doc_id=${r.getLong(0)} " +
        s"native=${r.get(1)} agg=${r.get(2)}")
    }
    // same doc set too (null-text drop parity)
    assert(native.count() === agg.count())
  }

  test("adversarial token edges match the aggregate formulation exactly") {
    assertEquivalent(Seq(
      "", " ", "  ", "\ta", "a\t", "\ta\n", " a b ", "a  b",
      "a\tb\nc", "don’t stop me", "café 123", "a b", "",
      "😀 emoji 😀", "dup dup dup unique", "x", "x " * 200,
      "the the the the a a of", "~`!@# $%^&*", "7things 2do",
      "vtab", "\f\r mixed \f").zipWithIndex
      .map { case (t, i) => (i.toLong, t) })
  }

  test("null text drops the row on both paths") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "a b"))
      .toDF("doc_id", "text")
    val native = DedupOps.simhash60(df, col("doc_id"), col("text")).collect()
    val agg = DedupOps.simhash60Agg(df, col("doc_id"), col("text")).collect()
    assert(native.map(_.getLong(0)).toSeq === Seq(2L))
    assert(agg.map(_.getLong(0)).toSeq === Seq(2L))
    assert(native.head.getLong(1) === agg.head.getLong(1))
  }

  test("randomized unicode corpus matches the aggregate formulation exactly") {
    val rnd = new scala.util.Random(0x51a54460L)
    val alphabet: IndexedSeq[String] =
      ('a' to 'f').map(_.toString) ++ ('0' to '3').map(_.toString) ++
        Seq(" ", " ", "\t", "\n", " ", "é", ".", ",", "😀", "𝔘")
    val texts = (1 to 1500).map { i =>
      val n = rnd.nextInt(60)
      (i.toLong,
        (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    assertEquivalent(texts)
  }

  test("the native plan has no shuffle: per-row projection only") {
    import spark.implicits._
    val pq = java.nio.file.Files
      .createTempDirectory("graft_simhash_plan").resolve("t.parquet").toString
    Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(pq)
    val plan = DedupOps.simhash60(spark.read.parquet(pq),
      col("doc_id"), col("text")).queryExecution.executedPlan.toString
    assert(plan.contains("graft_simhash60"), plan)
    assert(!plan.contains("Exchange"),
      s"per-document fingerprint plan should not shuffle:\n$plan")
  }
}
