package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurationOps, TextOps}

/** Unit coverage for the curation operators (stratified sampling, quantile
  * filtering, chunking, stopword stripping); sf-scale behavior is covered
  * by the t05-t08 oracle rows. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 100L)
    .map(i => (i, if (i % 2 == 0) "en" else "zh", s"doc number $i text"))
    .toDF("doc_id", "lang", "text")

  test("stratifiedHashSample: rate bounds and determinism") {
    val none = CurationOps.stratifiedHashSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.0, "zh" -> 0.0), defaultRate = 0.0)
    assert(none.count() === 0)
    val all = CurationOps.stratifiedHashSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 1.0), defaultRate = 1.0)
    assert(all.count() === 100)
    // per-stratum rates apply independently; membership is a pure function
    // of the id, so two runs select the identical subset
    def run() = CurationOps.stratifiedHashSample(docs, col("doc_id"), col("lang"),
        Map("en" -> 0.0), defaultRate = 1.0)
      .select("doc_id").as[Long].collect().toSet
    val s1 = run()
    assert(s1 === (1L until 100L by 2).toSet) // en gone, all zh kept
    assert(s1 === run())
  }

  test("qualityTopQuantile exact: keeps ceil(q*n) best per stratum, id tie-break") {
    val scored = Seq(
      (1L, "en", 0.9), (2L, "en", 0.8), (3L, "en", 0.1),
      (4L, "zh", 0.5), (5L, "zh", 0.5), (6L, "zh", 0.4)
    ).toDF("doc_id", "lang", "q")
    val kept = CurationOps.qualityTopQuantile(scored, col("doc_id"), col("lang"),
        col("q"), q = 0.5, exact = true)
      .select("id").as[Long].collect().toSet
    // en: ceil(3*0.5)=2 -> {1,2}; zh: tie at 0.5 broken by id -> {4}... n=3 -> 2 kept {4,5}
    assert(kept === Set(1L, 2L, 4L, 5L))
  }

  test("qualityTopQuantile approx: covers the exact top set within one boundary row") {
    val scored = (0L until 40L).map(i => (i, "en", i.toDouble / 40.0))
      .toDF("doc_id", "lang", "q")
    val exact = CurationOps.qualityTopQuantile(scored, col("doc_id"), col("lang"),
      col("q"), 0.25, exact = true).select("id").as[Long].collect().toSet
    val approx = CurationOps.qualityTopQuantile(scored, col("doc_id"), col("lang"),
      col("q"), 0.25, exact = false).select("id").as[Long].collect().toSet
    // percentile_approx returns an element of the data, so the threshold can
    // sit one rank below the exact cut — the approx set must contain every
    // exactly-kept row and at most one extra boundary row
    assert(exact.subsetOf(approx))
    assert(approx.size - exact.size <= 1, s"approx=$approx exact=$exact")
  }

  test("chunkDocuments: ceil(n/k) chunks, ragged tail, token-exact slices") {
    val d = Seq((1L, (1 to 35).map(i => s"t$i").mkString(" ")), (2L, "solo"))
      .toDF("doc_id", "text")
    val out = CurationOps.chunkDocuments(d, col("doc_id"), col("text"), 16)
      .orderBy("id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getString(2)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq === Seq(
      (1L, 0L, 16), (1L, 1L, 16), (1L, 2L, 3), (2L, 0L, 1)))
    assert(out(2)._4 === "t33 t34 t35")
    assert(out(0)._4.startsWith("t1 t2 ") && out(0)._4.endsWith(" t16"))
  }

  test("chunkDocuments round-trip: concatenated chunks rebuild every document") {
    val rnd = new scala.util.Random(13)
    val d = (1 to 30).map(i =>
      (i.toLong, (1 to (1 + rnd.nextInt(70))).map(j => s"w$j").mkString(" ")))
    val rebuilt = CurationOps.chunkDocuments(d.toDF("doc_id", "text"),
        col("doc_id"), col("text"), 7)
      .groupBy("id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        x => x.getField("chunk_text")), " ").as("whole"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    d.foreach { case (id, text) => assert(rebuilt(id) === text, s"doc $id") }
  }

  test("packChunks: packs respect the budget, chunks never split, order is greedy") {
    // chunk sizes: doc i has i%5+1 "chunks" of n_tokens 10,20,30
    val chunks = (0L until 60L).flatMap(i =>
      (0L to i % 3).map(c => (i, c, ((c + 1) * 10).toInt)))
      .toDF("id", "chunk_id", "n_tokens")
    val packed = CurationOps.packChunks(chunks, col("id"), col("chunk_id"),
      col("n_tokens"), budgetTokens = 50, nShards = 4)
    val rows = packed.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Long]("chunk_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Int]("shard"), r.getAs[Long]("pack_id")))
    // every chunk assigned exactly once
    assert(rows.length == chunks.count())
    // within a (shard, pack), token total stays <= budget + one chunk's
    // overhang is impossible here since every chunk <= budget: totals <= 50
    // is NOT guaranteed by greedy fill (a pack closes when the cumsum
    // crosses it), but the defining invariant is: a chunk's pack equals
    // floor(preceding_tokens_in_shard / budget) over the (id, chunk_id) order
    rows.groupBy(_._4).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(r => (r._1, r._2)).foreach { r =>
        assert(r._5 == cum / 50, s"pack mismatch at $r (cum=$cum)")
        cum += r._3
      }
    }
    // deterministic under repartitioning
    val packed2 = CurationOps.packChunks(chunks.repartition(7), col("id"),
      col("chunk_id"), col("n_tokens"), budgetTokens = 50, nShards = 4)
    assert(packed2.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getLong(4))).toSet ==
      rows.map(r => (r._1, r._2, r._4, r._5)).toSet)
  }

  test("repetition: duplicate-trigram share, short docs score 0") {
    val df = Seq(
      (1L, "a b c d e"),          // 3 distinct trigrams, no dups
      (2L, "x y x y x y x y"),    // 6 trigrams, 2 distinct
      (3L, "one two"),            // shorter than 3 tokens
      (4L, "")                    // empty
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.repetition(df, col("doc_id"), col("text"), 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got(1L) == ((3, 0.0)))
    assert(got(2L) == ((6, 1.0 - 2.0 / 6.0)))
    assert(got(3L) == ((0, 0.0)))
    assert(got(4L) == ((0, 0.0)))
  }

  test("tfidfTopK: rare terms outrank ubiquitous ones, deterministic ties") {
    import graft.operators.TextOps
    val d = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "apple durian")).toDF("doc_id", "text")
    // ratio idf: apple (4/4)=1, banana/cherry/durian (4/2)=2
    val ratio = TextOps.tfidfTopK(d, col("doc_id"), col("text"), k = 2,
        logIdf = false)
      .orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(ratio.toSeq === Seq(
      (1L, 1, "apple", 2.0), (1L, 2, "banana", 2.0), // tie -> term order
      (2L, 1, "cherry", 2.0), (2L, 2, "apple", 1.0),
      (3L, 1, "durian", 2.0), (3L, 2, "apple", 1.0)))
    // log idf agrees on these docs (no tf-vs-df trade-off inversions here)
    val log = TextOps.tfidfTopK(d, col("doc_id"), col("text"), k = 2)
      .orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(log.toSeq === ratio.map(t => (t._1, t._2, t._3)).toSeq)
  }

  test("stripStopwords: removes default stopwords, counts removals") {
    val d = Seq((1L, "the quick fox and the dog"), (2L, "no stop words here"))
      .toDF("doc_id", "text")
    val out = CurationOps.stripStopwords(d, col("doc_id"), col("text"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq(
      (1L, "quick fox dog", 3),
      (2L, "no stop words here", 0)))
  }

  test("redactPii: masks emails, IPs, and phones with per-kind counts") {
    val docs = Seq(
      (1L, "mail a.b+c@ex-ample.org and x@y.io, host 192.168.0.1, call +39 333 123 4567 now"),
      (2L, "clean text with no pii at all"),
      (3L, "version 1.2.3.4 of the lib") // dotted quad: redacts as IP by design
    ).toDF("doc_id", "text")
    val out = TextOps.redactPii(docs, col("doc_id"), col("text"))
      .orderBy("id")
      .as[(Long, String, Int, Int, Int)].collect().toSeq
    assert(out(0) === ((1L,
      "mail <EMAIL> and <EMAIL>, host <IP>, call <PHONE> now", 2, 1, 1)))
    assert(out(1) === ((2L, "clean text with no pii at all", 0, 0, 0)))
    assert(out(2)._2 === "version <IP> of the lib")
  }

  test("redactPii: digits inside an email never double-count as phone or IP") {
    val docs = Seq((1L, "ping +1234567890@sms.gateway.com ok")).toDF("doc_id", "text")
    val out = TextOps.redactPii(docs, col("doc_id"), col("text"))
      .as[(Long, String, Int, Int, Int)].collect().head
    // the email is masked first ('+' is legal in the local part, so the
    // whole token is one email), leaving nothing for the phone stage
    assert(out === ((1L, "ping <EMAIL> ok", 1, 0, 0)))
  }

  test("mixtureSample: rate = min(1, share*budget/tokens), under-budget strata keep all") {
    // stratum a: 10 docs x 10 tokens = 100; stratum b: 5 docs x 10 = 50
    val d = ((0L until 10L).map(i => (i, "a")) ++ (10L until 15L).map(i => (i, "b")))
      .map { case (i, s) => (i, s, (1 to 10).map(j => s"w$j").mkString(" ")) }
      .toDF("doc_id", "source", "text")
    val out = CurationOps.mixtureSample(d, col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")),
        shares = Map("a" -> 0.5), defaultShare = 1.0, budgetTokens = 100L)
      .select("id", "stratum", "rate")
      .as[(Long, String, Double)].collect()
    // a: rate 0.5*100/100 = 0.5; b: min(1, 1.0*100/50) clamps to 1 -> all 5 kept
    assert(out.filter(_._2 == "a").forall(_._3 == 0.5))
    assert(out.filter(_._2 == "b").map(_._1).sorted.toSeq === (10L until 15L))
    // hash-bucket membership: deterministic across runs, monotone in rate
    val again = CurationOps.mixtureSample(d, col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")),
        shares = Map("a" -> 0.5), defaultShare = 1.0, budgetTokens = 100L)
    assert(out.map(_._1).toSet ===
      again.select("id").as[Long].collect().toSet)
    val smaller = CurationOps.mixtureSample(d, col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")),
        shares = Map("a" -> 0.2), defaultShare = 1.0, budgetTokens = 100L)
      .select("id").as[Long].collect().toSet
    assert(smaller.subsetOf(out.map(_._1).toSet),
      "a lower rate must select a subset of the higher-rate sample")
  }

  test("hashSplit: disjoint, exhaustive, deterministic, proportions in the ballpark") {
    val ids = (0L until 2000L).map(i => Tuple1(i)).toDF("doc_id")
    def run() = CurationOps.hashSplit(ids, col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toSeq
    val s1 = run()
    assert(s1.length === 2000, "every row gets exactly one split")
    assert(s1.map(_._2).toSet === Set("train", "val", "test"))
    assert(s1.toSet === run().toSet, "split assignment must be deterministic")
    val byName = s1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byName("train") > 1500 && byName("train") < 1700, s"$byName")
    assert(byName("val") > 120 && byName("val") < 280, s"$byName")
    assert(byName("test") > 120 && byName("test") < 280, s"$byName")
  }

  test("stratifiedTopN: exactly n per stratum, deterministic, stable under growth") {
    val d100 = docs // 50 en / 50 zh
    def run(df: org.apache.spark.sql.DataFrame) =
      CurationOps.stratifiedTopN(df, col("doc_id"), col("lang"), n = 7)
        .select("doc_id", "lang").as[(Long, String)].collect().toSet
    val s1 = run(d100)
    assert(s1.groupBy(_._2).view.mapValues(_.size).toMap === Map("en" -> 7, "zh" -> 7))
    assert(s1 === run(d100), "selection must be deterministic")
    // undersized stratum: keeps everything it has
    val tiny = docs.filter(col("doc_id") < 3) // 2 en, 1 zh
    assert(run(tiny).size === 3)
    // growth monotonicity: a row among the 7 smallest hashes of the FULL
    // corpus that also lies in a subset is necessarily among the subset's
    // 7 smallest — growing the corpus only evicts, never resurrects
    val sub = run(docs.filter(col("doc_id") < 50L))
    assert(s1.filter(_._1 < 50L).subsetOf(sub))
  }

  test("weightedSample: matches the driver-side A-ES reference; weight rules") {
    val rows = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "en" else "zh",
        if (i % 10 == 0) 0.0 else (i % 7 + 1).toDouble))
    val df = rows.toDF("doc_id", "lang", "w")
    val got = CurationOps.weightedSample(df.repartition(5), col("doc_id"),
        col("lang"), col("w"), k = 5)
      .select("doc_id", "lang", "samp_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // driver-side reference: identical hash-derived uniform and pow key
    val want = rows.filter(_._3 > 0).groupBy(_._2).flatMap { case (lang, rs) =>
      rs.map { case (id, _, w) =>
        val u = (graft.functions.Hashing.hash60Scalar(s"ws_$id").toDouble + 1.0) /
          1152921504606846976.0
        (id, math.pow(u, 1.0 / w))
      }.sortBy { case (id, key) => (-key, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), i) => (id, lang, i + 1) }
    }.toSet
    assert(got === want)
    // zero-weight rows are never sampled
    assert(got.forall(_._1 % 10 != 0))
    // k >= stratum size keeps every positive-weight row
    val all = CurationOps.weightedSample(df, col("doc_id"), col("lang"),
        col("w"), k = 100).count()
    assert(all === rows.count(_._3 > 0))
  }

  test("vocabOov: hand-checked vocabulary cut and OOV ratios") {
    // counts: a=4, b=3, c=2, d=1 -> V=2 vocab {a, b}
    val d = Seq(
      (1L, "a a b c"), (2L, "a b d"), (3L, "a b c")
    ).toDF("doc_id", "text")
    val out = TextOps.vocabOov(d, col("doc_id"), col("text"), vocabSize = 2)
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 1L, 0.25), // c is OOV
      (2L, 3L, 1L, 1.0 / 3.0), // d is OOV
      (3L, 3L, 1L, 1.0 / 3.0)))
    // tie determinism: with V=3, c (tf 2) enters; d stays out
    val out3 = TextOps.vocabOov(d, col("doc_id"), col("text"), vocabSize = 3)
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out3.map(_._3) === Seq(0L, 1L, 0L))
  }

  test("bm25Score: matches the textbook formula computed driver-side; tf saturates, length penalizes") {
    val d = Seq(
      (1L, "spark spark spark query"), // high tf, short
      (2L, "spark query join filter"), // one each
      (3L, "join filter merge scan"), // no query terms
      (4L, "spark " + (1 to 20).map(_ => "pad").mkString(" ")) // long doc penalty
    ).toDF("doc_id", "text")
    val got = TextOps.bm25Score(d, col("doc_id"), col("text"),
        queryTerms = Seq("spark", "query"))
      .orderBy("id").as[(Long, Int, Double)].collect().toSeq
    // driver-side reference with the same fixed op order
    val toks = Map(1L -> 4, 2L -> 4, 3L -> 4, 4L -> 21)
    val tf = Map(("spark", 1L) -> 3, ("spark", 2L) -> 1, ("spark", 4L) -> 1,
      ("query", 1L) -> 1, ("query", 2L) -> 1)
    val (n, sumdl) = (4L, 33L)
    val df_ = Map("spark" -> 3L, "query" -> 2L)
    def score(id: Long): Double = Seq("spark", "query").map { t =>
      val tfv = tf.getOrElse((t, id), 0).toDouble
      val idf = (n + 1).toDouble / (df_(t) + 1).toDouble
      val part = 1.0 - 0.75 + 0.75 * (toks(id).toDouble / (sumdl.toDouble / n.toDouble))
      idf * (tfv * 2.2 / (tfv + 1.2 * part))
    }.reduce(_ + _)
    got.foreach { case (id, dl, s) =>
      assert(dl === toks(id))
      assert(s === score(id), s"doc $id: got $s want ${score(id)}")
    }
    val byId = got.map(g => g._1 -> g._3).toMap
    assert(byId(1L) > byId(2L), "more matching tokens must score higher at equal dl")
    assert(byId(2L) > byId(4L), "longer documents are length-penalized")
    assert(byId(3L) === 0.0)
  }

  test("unigramScore: exact integer sums, hand-checked score") {
    // corpus: "a" x3, "b" x2, "c" x1 -> total 6
    val d = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextOps.unigramScore(d, col("doc_id"), col("text"))
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1: tf(a)+tf(a)+tf(b) = 3+3+2 = 8; score = 8 / (3*6)
    // doc 2: 3+2+1 = 6; score = 6 / (3*6)
    assert(out === Seq(
      (1L, 3L, 8L, 8.0 / 18.0),
      (2L, 3L, 6L, 6.0 / 18.0)))
  }

  test("winsorize exact: hand-checked rank thresholds, values clamp into band") {
    // stratum A: values 1..10 -> n=10, kLo = floor(9*0.05)+1 = 1 (lo=1.0),
    // kHi = floor(9*0.95)+1 = 9 (hi=9.0); 10.0 clamps to 9.0
    val df = (1 to 10).map(i => (i.toLong, "A", i.toDouble)).toDF("id", "s", "v")
    val got = graft.operators.CurationOps.winsorize(df, col("id"), col("s"),
        col("v"), 0.05, 0.95, exact = true)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.forall { case (_, _, lo, hi, _) => lo == 1.0 && hi == 9.0 })
    assert(got.map(_._5).toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 9.0))
  }

  test("winsorize: null values pass through unclamped and don't shift thresholds") {
    val df = ((1 to 10).map(i => (i.toLong, "A", Some(i.toDouble))) ++
      Seq((90L, "A", Option.empty[Double]), (91L, "B", Option.empty[Double])))
      .toDF("id", "s", "v")
    val got = graft.operators.CurationOps.winsorize(df, col("id"), col("s"),
        col("v"), 0.05, 0.95, exact = true)
      .orderBy("id").collect()
    val a = got.filter(_.getString(1) == "A")
    // thresholds unchanged by the null row: lo=1.0, hi=9.0 (ranked over
    // the 10 non-null values only)
    assert(a.forall(r => r.getDouble(3) == 1.0 && r.getDouble(4) == 9.0))
    // the null-value rows survive with null v_wins (and the all-null
    // stratum B keeps its row with null thresholds)
    val nullRows = got.filter(_.isNullAt(2))
    assert(nullRows.map(_.getLong(0)).toSet === Set(90L, 91L))
    assert(nullRows.forall(_.isNullAt(5)))
    assert(got.length === 12)
  }

  test("winsorize approx: thresholds within one rank of exact on a spread stratum") {
    val df = (1 to 200).map(i => (i.toLong, "A", i.toDouble)).toDF("id", "s", "v")
    def thresholds(exact: Boolean) =
      graft.operators.CurationOps.winsorize(df, col("id"), col("s"), col("v"),
          0.10, 0.90, exact = exact)
        .select("lo", "hi").distinct().collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).head
    val (exLo, exHi) = thresholds(true)
    val (apLo, apHi) = thresholds(false)
    assert(math.abs(apLo - exLo) <= 1.0 && math.abs(apHi - exHi) <= 1.0)
  }

  test("winsorize/topQuantile accuracy knob: approx band scales as n/accuracy ranks") {
    // values = 1..n in one stratum, so |approx - exact| in VALUE space IS the
    // rank drift; percentile_approx guarantees rank error <= n/accuracy
    // (+1 rank of slack for the element-of-data snap at the boundary)
    val n = 2000
    val df = (1 to n).map(i => (i.toLong, "A", i.toDouble)).toDF("id", "s", "v")
    def winThresholds(accuracy: Int) =
      graft.operators.CurationOps.winsorize(df, col("id"), col("s"), col("v"),
          0.10, 0.90, exact = false, accuracy = accuracy)
        .select("lo", "hi").distinct().collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).head
    val exact = (
      math.floor(0.10 * (n - 1)) + 1,  // the operator's explicit rank def
      math.floor(0.90 * (n - 1)) + 1)
    Seq(50, 10000).foreach { acc =>
      val band = n.toDouble / acc + 1
      val (lo, hi) = winThresholds(acc)
      assert(math.abs(lo - exact._1) <= band && math.abs(hi - exact._2) <= band,
        s"accuracy=$acc band=$band got ($lo,$hi) vs $exact")
    }
    // the knob must actually reach the sketch: at accuracy=10000 the drift
    // collapses to <=2 values while accuracy=50 is only bound by ~41
    val (tLo, tHi) = winThresholds(10000)
    assert(math.abs(tLo - exact._1) <= 2 && math.abs(tHi - exact._2) <= 2)
    // same contract through qualityTopQuantile: kept-set size drifts from
    // ceil(q*n) by at most the rank band
    Seq(50, 10000).foreach { acc =>
      val kept = graft.operators.CurationOps.qualityTopQuantile(
        df, col("id"), col("s"), col("v"), q = 0.25,
        exact = false, accuracy = acc).count()
      assert(math.abs(kept - math.ceil(0.25 * n)) <= n.toDouble / acc + 1,
        s"accuracy=$acc kept=$kept")
    }
  }

  test("canonicalizeUrl: hand-checked normalization cases") {
    val cases = Seq(
      // fragment + default port + trailing slash + host case
      ("http://Site.Example.COM:80/path/#frag", "http://site.example.com/path"),
      // tracking params removed wherever they sit; '?' head repaired
      ("https://h.org/x?utm_source=a&q=1&fbclid=z", "https://h.org/x?q=1"),
      ("https://h.org/x?utm_a=1&utm_b=2", "https://h.org/x"),
      ("https://h.org/x?q=1&utm_a=1&b=2", "https://h.org/x?q=1&b=2"),
      // a legit param merely CONTAINING utm_ survives (separator anchor)
      ("http://h.org/x?xutm_a=1", "http://h.org/x?xutm_a=1"),
      // :443 only default for https; :8080 never stripped
      ("http://h.org:443/x", "http://h.org:443/x"),
      ("http://h.org:8080/x", "http://h.org:8080/x"),
      ("https://H.org:443/x", "https://h.org/x"),
      // port stripped with root path + query after (UrlRe only continues
      // past a port via '/', so a bare ":80?q=1" extracts as ":80")
      ("http://h.org:80/?q=1", "http://h.org/?q=1"))
    val got = graft.operators.TextOps.canonicalizeUrls(
        cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, s"see $u end") }
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .orderBy("id").collect().map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq === cases.map { case (u, c) => (u, c) })
  }

  test("tokenDiversity: hand-checked Simpson collision, short docs null") {
    val df = Seq(
      (1L, "a a a a"),        // all same: collision 12/12 = 1
      (2L, "a b c d"),        // all distinct: collision 0
      (3L, "a a b b"),        // 2+2: (2+2)/12
      (4L, "solo")            // 1 token -> null
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.tokenDiversity(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(1L) == ((4L, Some(1.0))))
    assert(got(2L) == ((4L, Some(0.0))))
    assert(got(3L) == ((4L, Some(4.0 / 12.0))))
    assert(got(4L) == ((1L, None)))
  }

  test("domainBlocklist: exact host, subdomain, min-rule tie, clean doc null") {
    val df = Seq(
      (1L, "x http://ads.example.com/a y"),     // subdomain of example.com
      (2L, "x https://example.com/b y"),        // exact host
      (3L, "x http://example.com.evil.io/c y"), // NOT a suffix match
      (4L, "x http://ads.example.com/a https://bad.org/z y"), // both rules -> min
      (5L, "no urls at all")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.domainBlocklist(df, col("doc_id"),
        col("text"), Seq("example.com", "bad.org"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(got(1L) == Some("example.com"))
    assert(got(2L) == Some("example.com"))
    assert(got(3L) == None)
    assert(got(4L) == Some("bad.org")) // "bad.org" < "example.com"
    assert(got(5L) == None)
    assert(got.size == 5)
  }

  /** Driver-side greedy-prefix reference for tokenBudgetSelect. */
  private def budgetRef(rows: Seq[(Long, Long, Long)], budget: Long): Set[Long] = {
    var cum = 0L
    rows.sortBy { case (id, q, _) => (-q, id) }.flatMap { case (id, _, t) =>
      cum += t
      if (cum <= budget) Some(id) else None
    }.toSet
  }

  test("tokenBudgetSelect matches the greedy prefix rule, boundary ties by id") {
    // quality ties on purpose: the boundary bucket must admit by id order
    val rows = Seq(
      (1L, 900L, 40L), (2L, 900L, 40L), (3L, 900L, 40L),
      (4L, 800L, 30L), (5L, 800L, 30L), (6L, 700L, 100L), (7L, 600L, 1L))
    val got = CurationOps.tokenBudgetSelect(rows.toDF("doc_id", "q", "t"),
        col("doc_id"), col("q"), col("t"), budget = 150L)
      .collect().map(_.getLong(0)).toSet
    // 40+40+40=120 (bucket 900 full), +30 (id 4) = 150, id 5 would be 180
    assert(got == Set(1L, 2L, 3L, 4L))
    assert(got == budgetRef(rows, 150L))
  }

  test("tokenBudgetSelect randomized differential vs the naive global cumsum") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val rows = (1L to 200L).map(i =>
        (i, (rnd.nextInt(8) * 100).toLong, (rnd.nextInt(50) + 1).toLong))
      val budget = 500L + rnd.nextInt(3000)
      val got = CurationOps.tokenBudgetSelect(rows.toDF("id", "q", "t"),
          col("id"), col("q"), col("t"), budget)
        .collect().map(_.getLong(0)).toSet
      assert(got == budgetRef(rows, budget), s"trial $trial budget $budget")
    }
  }

  test("tokenBudgetSelect edges: zero budget, oversize first doc, zero-token docs") {
    val df = Seq((1L, 900L, 50L), (2L, 800L, 10L)).toDF("id", "q", "t")
    assert(CurationOps.tokenBudgetSelect(df, col("id"), col("q"), col("t"), 0L)
      .count() == 0L)
    // first doc alone exceeds the budget: prefix rule admits nothing after
    assert(CurationOps.tokenBudgetSelect(df, col("id"), col("q"), col("t"), 40L)
      .count() == 0L)
    // zero-token doc exactly at the budget boundary still qualifies
    val z = Seq((1L, 900L, 40L), (2L, 800L, 0L), (3L, 700L, 5L))
      .toDF("id", "q", "t")
    val got = CurationOps.tokenBudgetSelect(z, col("id"), col("q"), col("t"), 40L)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("tokenBudgetMixture: per-stratum prefixes, unbudgeted strata excluded") {
    val rows = Seq(
      (1L, "en", 900L, 40L), (2L, "en", 800L, 40L), (3L, "en", 700L, 40L),
      (4L, "de", 900L, 10L), (5L, "de", 800L, 10L), // de fits whole
      (6L, "fr", 999L, 1L))                          // no fr budget
    val got = CurationOps.tokenBudgetMixture(
        rows.toDF("id", "s", "q", "t"), col("id"), col("s"), col("q"),
        col("t"), budgets = Seq("en" -> 80L, "de" -> 100L))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L, 5L)) // en stops after 80 tokens; no fr
  }

  test("tokenBudgetMixture randomized differential vs per-stratum greedy") {
    val rnd = new scala.util.Random(7)
    val strata = Seq("a", "b", "c")
    for (trial <- 1 to 3) {
      val rows = (1L to 300L).map(i => (i, strata(rnd.nextInt(3)),
        (rnd.nextInt(6) * 100).toLong, (rnd.nextInt(40) + 1).toLong))
      val budgets = Seq("a" -> (200L + rnd.nextInt(1500)),
        "b" -> (200L + rnd.nextInt(1500)))
      val got = CurationOps.tokenBudgetMixture(
          rows.toDF("id", "s", "q", "t"), col("id"), col("s"), col("q"),
          col("t"), budgets)
        .collect().map(_.getLong(0)).toSet
      val want = budgets.flatMap { case (s, b) =>
        budgetRef(rows.filter(_._2 == s).map(r => (r._1, r._3, r._4)), b)
      }.toSet
      assert(got == want, s"trial $trial budgets $budgets")
    }
  }

  test("negativeSample matches the driver-side ring reference") {
    import graft.functions.Hashing.hash60Scalar
    val ids = (0L until 57L).toSeq
    val df = ids.toDF("id")
    // reference: global hash-ring order, pick = hash mod n, self advances 1
    val ring = ids.map(id => (hash60Scalar(s"neg:$id"), id)).sorted
    val n = ring.size
    val want = (for (a <- ids; j <- 1 to 3) yield {
      val pick = (hash60Scalar(s"negt:$a:$j") % n).toInt
      val c1 = ring(pick)._2
      (a, j.toLong, if (c1 != a) c1 else ring((pick + 1) % n)._2)
    }).toSet
    val got = CurationOps.negativeSample(df, col("id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.size === ids.size * 3)          // k rows per anchor
    assert(got.forall { case (a, _, neg) => neg != a })
  }

  test("negativeSample: deterministic across partitionings and bucket counts") {
    val df = (0L until 200L).toDF("id")
    val a = CurationOps.negativeSample(df.repartition(1), col("id"), k = 2)
      .orderBy("anchor", "j").collect().toSeq
    val b = CurationOps.negativeSample(df.repartition(13), col("id"), k = 2,
        buckets = 16)
      .orderBy("anchor", "j").collect().toSeq
    assert(a === b && a.size === 400)
  }

  test("balancedShards: round-robin by quality rank, ties by id, bucket-invariant") {
    val df = Seq(
      (1L, "A", 900000L), (2L, "A", 800000L), (3L, "A", 700000L),
      (4L, "A", 700000L), // tie with 3 -> id order
      (5L, "A", 100000L),
      (6L, "B", 500000L), (7L, "B", 400000L)
    ).toDF("doc_id", "src", "q")
    val got = CurationOps.balancedShards(df, col("doc_id"), col("src"),
        col("q"), nShards = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // A rank order: 1,2,3,4,5 -> shards 0,1,0,1,0; B: 6,7 -> 0,1
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1, 5L -> 0,
      6L -> 0, 7L -> 1))
    val coarse = CurationOps.balancedShards(df.repartition(5), col("doc_id"),
        col("src"), col("q"), nShards = 2, buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(coarse === got)
  }

  test("temperatureWeights: alpha=1 is proportional, lower alpha upweights the tail") {
    val df = Seq(("big", 900L), ("big", 0L), ("tail", 100L))
      .toDF("src", "toks")
    // alpha = 1: exact proportional ppm shares
    val prop = CurationOps.temperatureWeights(df, col("src"), col("toks"),
        alphaPpm = 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(prop === Map("big" -> 900000L, "tail" -> 100000L))
    // alpha = 0.3: tail rises above its raw share, order preserved
    val temp = CurationOps.temperatureWeights(df, col("src"), col("toks"),
        alphaPpm = 300000L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(temp("tail") > 100000L && temp("tail") < temp("big"))
    // shares sum to 1e6 up to the floor-division remainder
    assert(math.abs(temp.values.sum - 1000000L) <= temp.size)
    // fail-loud convention: a corpus with no tokens anywhere has no
    // defined mixture — must raise, not emit null shares
    val degenerate = Seq(("a", 0L), ("b", 0L)).toDF("src", "toks")
    val ex = intercept[Exception] {
      CurationOps.temperatureWeights(degenerate, col("src"), col("toks"),
        alphaPpm = 300000L).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("corpus has no tokens"))),
      s"expected the no-tokens failure, got: ${ex.getMessage}")
  }

  test("exactSplit: exact per-stratum counts, matches the driver-side rank reference") {
    // 103 rows in stratum A, 7 in B — both indivisible by the weights
    val rows = (0L until 103L).map(i => (i, "A")) ++
      (200L until 207L).map(i => (i, "B"))
    val df = rows.toDF("doc_id", "src")
    val got = CurationOps.exactSplit(df, col("doc_id"), col("src"),
        weights = Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // exact counts: floor boundaries, remainder to the last split
    val byStratum = got.groupBy(_._2).map { case (s, g) =>
      s -> g.groupBy(_._3).map { case (sp, v) => sp -> v.size } }
    assert(byStratum("A") === Map("train" -> 82, "val" -> 10, "test" -> 11))
    assert(byStratum("B") === Map("train" -> 5, "val" -> 1, "test" -> 1))
    // driver-side reference: rank by (hash60, id) within stratum
    val ref = rows.groupBy(_._2).flatMap { case (s, g) =>
      val ordered = g.map(_._1).sortBy(id =>
        (graft.functions.Hashing.hash60Scalar(s"xsplit_$id"), id))
      val n = ordered.size.toLong
      val b1 = n * 800000L / 1000000L; val b2 = n * 900000L / 1000000L
      ordered.zipWithIndex.map { case (id, rk) =>
        (id, s, if (rk < b1) "train" else if (rk < b2) "val" else "test") }
    }.toSet
    assert(got.toSet === ref)
  }

  test("exactSplit: invariant under partitioning and bucket count") {
    val df = (0L until 500L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "src")
    val a = CurationOps.exactSplit(df.repartition(1), col("doc_id"), col("src"),
        weights = Seq("train" -> 900000L, "eval" -> 100000L))
      .orderBy("id").collect().toSeq
    val b = CurationOps.exactSplit(df.repartition(17), col("doc_id"), col("src"),
        weights = Seq("train" -> 900000L, "eval" -> 100000L), buckets = 8)
      .orderBy("id").collect().toSeq
    assert(a === b && a.size === 500)
  }

  test("dsirSelect: target-like pool docs outrank target-unlike ones; " +
      "ranks contiguous, scores monotone, selection deterministic") {
    // target speaks "alpha beta gamma"; half the pool mimics it, half
    // speaks "zulu yankee xray" — DSIR must rank every mimic above every
    // non-mimic (their tokens' importance ratios are symmetric-opposite)
    val rows =
      (0L until 20L).map(i => (i, true, "alpha beta gamma alpha beta")) ++
      (100L until 110L).map(i => (i, false, "alpha beta gamma beta alpha")) ++
      (200L until 210L).map(i => (i, false, "zulu yankee xray zulu yankee"))
    val df = rows.toDF("doc_id", "tgt", "text")
    val out = CurationOps.dsirSelect(df, col("doc_id"), col("text"),
      col("tgt"), topN = 15).orderBy("rank").collect()
    assert(out.length === 15, "topN rows selected from the 20-doc pool")
    assert(out.map(_.getInt(3)).toSeq === (1 to 15), "ranks contiguous")
    val ws = out.map(_.getLong(2))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b },
      "w_micro non-increasing in rank")
    // the 10 mimics fill ranks 1-10; non-mimics only pad the tail
    val top10 = out.take(10).map(_.getLong(0)).toSet
    assert(top10 === (100L until 110L).toSet,
      s"target-like docs must outrank target-unlike ones: $top10")
    assert(out.forall(r => r.getLong(0) >= 100L), "no target doc selected")
    // deterministic: identical selection on a re-run
    val again = CurationOps.dsirSelect(df, col("doc_id"), col("text"),
      col("tgt"), topN = 15).orderBy("rank").collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
