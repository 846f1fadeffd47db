package graft

import org.apache.spark.sql.functions._

/** Bit-equivalence of the native [[graft.functions.TextScanStats]] scan
  * against the regex formulations it replaced: every field must match the
  * original `length`/`regexp_replace`/`split`/`regexp_extract_all` Column
  * chain exactly, on adversarial edges and on a randomized unicode corpus.
  * The t01/t23 DuckDB oracles were written (and stay green) against the
  * regex semantics, so equality here is what keeps those keys pinned.
  */
class TextScanSpec extends SparkSpec {

  private def scanOf(t: org.apache.spark.sql.Column) =
    call_function("graft_text_scan", t)

  /** The pre-r10 regex formulations, verbatim. */
  private def regexCols(t: org.apache.spark.sql.Column) = {
    def cnt(re: String) = length(t) - length(regexp_replace(t, re, ""))
    Seq(
      length(t).as("r_n_chars"),
      cnt("[A-Za-z]").as("r_alpha"),
      cnt("[0-9]").as("r_digit"),
      cnt("\\s").as("r_space"),
      cnt("[A-Z]").as("r_upper"),
      cnt("[^A-Za-z0-9\\s]").as("r_symbol"),
      size(split(trim(t), "\\s+")).as("r_ws_tokens"),
      size(regexp_extract_all(t, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .as("r_bpe_tokens"))
  }

  private val fields =
    Seq("n_chars", "alpha", "digit", "space", "upper", "symbol",
      "ws_tokens", "bpe_tokens")

  private def assertEquivalent(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.toDF("text")
      .select((col("text") +: scanOf(col("text")).as("st") +:
        regexCols(col("text"))): _*)
    val bad = df.filter(fields.map(f =>
        col(s"st.$f") =!= col(s"r_$f")).reduce(_ || _))
      .collect()
    // build the diagnostic only on failure: ScalaTest's assert clue is
    // by-value, so bad.head in the clue would run even when bad is empty
    if (bad.nonEmpty) {
      val r = bad.head
      val diffs = fields.filter(f =>
        r.getStruct(1).getAs[Int](f) != r.getAs[Int](s"r_$f"))
      fail(s"${bad.length} mismatching rows; first: text=${r.getString(0)} " +
        diffs.map(f => s"$f: scan=${r.getStruct(1).getAs[Int](f)} " +
          s"regex=${r.getAs[Int](s"r_$f")}").mkString(", "))
    }
  }

  test("adversarial edges match the regex formulation exactly") {
    assertEquivalent(Seq(
      "", " ", "  ", "\t", "\n", "", "\f", "\r",
      "a", " a", "a ", " a ", "\ta", "a\n", "\ta\n", "a b", "a  b",
      "a\tb\nc", "a b ", " a b", "don’t", "café 123.456",
      "über-Straße", "ABC def 42!", "a b", // NBSP is NOT Java \s
      "", // NEL is NOT Java \s without UNICODE_CHARACTER_CLASS
      "😀", "a😀b", "😀 1", "𝔘𝔫𝔦", // supplementary code points
      "..", "a.b,c;d", "1,234.56", "  \t \n ", "x" * 5000,
      ("word " * 100).trim, "7things 2do", "-1", "+", "=", "~`!@#$%^&*()"))
  }

  test("randomized unicode corpus matches the regex formulation exactly") {
    val rnd = new scala.util.Random(0x60afCafeL)
    // alphabet biased toward the boundary classes: ASCII alnum, every Java
    // \s char, NBSP/NEL impostors, accented letters, symbols, an emoji
    val alphabet: IndexedSeq[String] =
      ('a' to 'z').map(_.toString) ++ ('A' to 'Z').map(_.toString) ++
        ('0' to '9').map(_.toString) ++
        Seq(" ", "\t", "\n", "", "\f", "\r", " ", "",
          "é", "Ü", "ß", ".", ",", "!", "…", "’", "#", "😀", "𝔘")
    val texts = (1 to 2000).map { _ =>
      val n = rnd.nextInt(80)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    assertEquivalent(texts)
  }

  test("avgTokenLen scan arithmetic == the regex string-rebuild formulation") {
    import spark.implicits._
    // n_chars - space == length(regexp_replace(trim(text), "\s+", "")):
    // trim removes only \s chars, the replace removes every \s, so the
    // rebuilt string's length is exactly the non-\s code-point count
    val texts = Seq("", " ", "  a  b  ", "a\tb\nc", "don’t stop",
      "😀 x 😀", "a b", "x" * 300, "  \t \n ", "é ü ß")
    val df = texts.toDF("text").select(
      graft.operators.TextOps.avgTokenLen(col("text")).as("scan"),
      (length(regexp_replace(trim(col("text")), "\\s+", "")).cast("double") /
        size(split(trim(col("text")), "\\s+"))).as("regex"))
    val bad = df.filter(not(col("scan") <=> col("regex"))).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("punctRatio scan arithmetic == the \\p{Alnum} regex formulation") {
    import spark.implicits._
    // Java \p{Alnum} without UNICODE_CHARACTER_CLASS is ASCII [A-Za-z0-9],
    // so the regex count equals the scan's symbol field on ANY text —
    // including unicode letters, which are "symbols" to both forms
    val texts = Seq("", " ", "a.b,c;d!", "é ü ß", "don’t", "😀!x",
      "ALL CAPS 9?", "~`!@#$%^&*()", "1,234.56", "x" * 200 + "!!!")
    val df = texts.toDF("text").select(
      graft.operators.TextOps.punctRatio(col("text")).as("scan"),
      ((length(col("text")) -
        length(regexp_replace(col("text"), "[^\\p{Alnum}\\s]", "")))
        .cast("double") / greatest(length(col("text")), lit(1))).as("regex"))
    val bad = df.filter(not(col("scan") <=> col("regex"))).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("null text yields a null struct, matching length(null)/size(null)") {
    import spark.implicits._
    val df = Seq[(Integer, String)]((1, null), (2, "ab c"))
      .toDF("id", "text")
      .select(col("id"), scanOf(col("text")).as("st"),
        size(split(trim(col("text")), "\\s+")).as("r_ws"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).getStruct(1).getAs[Int]("ws_tokens") === 2)
  }

  test("operator layer: tokenCount/bpeTokenCount/charClassStats use the scan") {
    import spark.implicits._
    val df = Seq("The 42 quick-brown foxes…", "  ", "ALL CAPS 9").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    // one scan per projection: the optimized plan must contain the native
    // call and no regexp_replace. Assert over a parquet-backed frame — a
    // local Seq.toDF gets constant-folded by ConvertToLocalRelation into a
    // LocalRelation whose plan string names neither expression.
    val pq = java.nio.file.Files
      .createTempDirectory("graft_textscan_plan").resolve("t.parquet").toString
    df.write.mode("overwrite").parquet(pq)
    val plan = graft.operators.TextOps
      .charClassStats(spark.read.parquet(pq), col("doc_id"), col("text"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_text_scan") && !plan.contains("regexp_replace"))
    val r = df.orderBy("doc_id").select(
      graft.operators.TextOps.tokenCount(col("text")).as("ws"),
      graft.operators.TextOps.bpeTokenCount(col("text")).as("bpe"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    // "The 42 quick-brown foxes…": ws = The|42|quick-brown|foxes… = 4;
    // bpe = The,42,quick,-,brown,foxes,… = 7
    assert(r(0) === ((4, 7)))
    // "  " trims to "": split("") = [""] -> 1 token; bpe = 0 matches
    assert(r(1) === ((1, 0)))
    assert(r(2) === ((3, 3))) // ALL|CAPS|9
  }
}
