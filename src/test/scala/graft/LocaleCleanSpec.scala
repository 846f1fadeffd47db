package graft

import org.apache.spark.sql.functions._
import graft.functions.Exprs

/** Bit-equivalence of the native [[graft.functions.LocaleClean]] scan
  * against the translate/regexp chain it replaced
  * ([[Exprs.localeCleanFallback]]): every output string must match exactly,
  * on adversarial locale edges and on a randomized corpus over the
  * boundary alphabet. The b04 DuckDB oracle was written (and stays green)
  * against the chain's semantics, so equality here is what keeps that key
  * pinned.
  */
class LocaleCleanSpec extends SparkSpec {

  private def native(c: org.apache.spark.sql.Column) =
    call_function("graft_locale_clean", c)

  private def assertEquivalent(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.toDF("text")
      .select(col("text"), native(col("text")).as("nat"),
        Exprs.localeCleanFallback(col("text")).as("ref"))
    val bad = df.filter(not(col("nat") <=> col("ref"))).collect()
    if (bad.nonEmpty) {
      val r = bad.head
      fail(s"${bad.length} mismatching rows; first: text=[${r.getString(0)}] " +
        s"native=[${r.getString(1)}] regex=[${r.getString(2)}]")
    }
  }

  test("adversarial locale edges match the regex chain exactly") {
    assertEquivalent(Seq(
      "", " ", "\t\n\f\r", " ", "  1 234,56 ",
      "1234", "1.234", "1.2345", "1.23", "12.345", "123.456", "1.234.567",
      "1.234.567,89", "1,234", "1,234.56", "1.234,56", ",", ".", "..",
      ".123", "123.", "1..234", "1.,234", "1,2,3", "-1.234,5", "+1 234",
      "1.234x", "x1.234", "1.234 567", // space inside: stripped BEFORE regex
      "1. 234", // NBSP splits the digits until stripped
      "abc", "12a34", "1e3", "1,5e2", "NaN", "Infinity", "१२३", "٣٤٥",
      "1.१२३", // non-ASCII digits are \D for the lookahead
      "😀1.234😀", "3.1415926", "0.999", "999.999", "999.9999"))
  }

  test("randomized corpus over the boundary alphabet matches exactly") {
    val rnd = new scala.util.Random(0xb04c1eaL)
    val alphabet: IndexedSeq[String] =
      ('0' to '9').map(_.toString) ++
        Seq(".", ",", " ", "\t", " ", "-", "+", "e", "x", "१", "😀")
    val texts = (1 to 4000).map { _ =>
      val n = rnd.nextInt(24)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    assertEquivalent(texts)
  }

  test("null text yields null on both paths, and try_cast agrees") {
    import spark.implicits._
    val df = Seq[(Integer, String)]((1, null), (2, "1.234,5"), (3, "junk"))
      .toDF("id", "text")
      .select(col("id"), native(col("text")).as("nat"),
        Exprs.localeNumeric(col("text")).as("num"))
      .orderBy("id")
    val rows = df.collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).getString(1) === "1234.5" && rows(1).getDouble(2) === 1234.5)
    assert(rows(2).isNullAt(2)) // malformed -> null, never an ANSI failure
  }

  test("localeNumeric routes through the native scan on a graft session") {
    import spark.implicits._
    val pq = java.nio.file.Files
      .createTempDirectory("graft_locale_plan").resolve("t.parquet").toString
    Seq("1.234,5").toDF("text").write.mode("overwrite").parquet(pq)
    val plan = spark.read.parquet(pq)
      .select(Exprs.localeNumeric(col("text")).as("v"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_locale_clean") && !plan.contains("regexp_replace"))
  }

  test("Native.has is false for unregistered names") {
    assert(spark != null) // force session init so getActiveSession is set
    assert(!graft.functions.Native.has("graft_no_such_function"))
    assert(graft.functions.Native.has("graft_locale_clean"))
  }
}
