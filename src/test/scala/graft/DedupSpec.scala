package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps}

/** Unit coverage for the dedup/text operators on hand-built corpora with
  * known answers (the sf-scale behavior is covered by the Verify oracle
  * gate). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different text about spark engines here"),
    (3L, "THE  QUICK   brown fox jumps over the lazy dog"), // exact dup of 0 mod case/ws
    (4L, "tiny")
  ).toDF("doc_id", "text")

  test("exact dedup groups case/whitespace variants, keeps min id") {
    val out = DedupOps.exactDedup(docs, col("doc_id"), col("text"))
      .orderBy("keep_id").collect()
    assert(out.length === 4) // 0&3 merge
    val merged = out.find(_.getAs[Long]("keep_id") == 0L).get
    assert(merged.getAs[Long]("n_dups") === 2L)
  }

  test("word shingles: distinct, guarded below k tokens") {
    val sh = docs.select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("s"))
      .orderBy("doc_id").collect()
    assert(sh(0).getSeq[String](1).contains("the quick brown"))
    assert(sh(4).getSeq[String](1).isEmpty) // "tiny" has 1 token
  }

  test("brute-force jaccard finds the near-dup pair only") {
    val sh = DedupOps.shingleSets(docs, col("doc_id"), col("text"), 3)
    val pairs = DedupOps.jaccardPairsBrute(sh, 0.5)
      .orderBy("doc_a", "doc_b").collect()
    // (0,1) near-dup and (0,3)/(1,3) via the normalized-equal doc 3 —
    // shingling is case-sensitive here, so doc 3 differs from doc 0
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((0L, 1L)))
  }

  test("minhash LSH pairs equal brute-force pairs on the planted corpus") {
    val sh = DedupOps.shingleSets(docs, col("doc_id"), col("text"), 3)
    val brute = DedupOps.jaccardPairsBrute(sh, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLshPairs(sh, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === brute)
  }

  test("dedupClusters: chain components collapse to the min id, isolated docs are singletons") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 1-2-3 (transitive cluster), pair 5-6, isolated 4
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = DedupOps.dedupClusters(ids, pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq === Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)))
  }

  test("dedupClusters: path halving converges a deep chain in O(log d) rounds") {
    val depth = 16
    val ids = (0L until depth).toDF("doc_id")
    val chain = (0L until depth - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // threshold 0 forces the distributed rounds (the property under test)
    val (out, rounds) = DedupOps.dedupClustersWithRounds(ids, chain,
      localPairThreshold = 0)
    val labels = out.orderBy("doc_id").collect().map(_.getLong(1))
    assert(labels.forall(_ == 0L)) // one component, min id 0
    // pure 1-hop propagation needs ~depth rounds; halving must beat half that
    assert(rounds <= depth / 2,
      s"expected <= ${depth / 2} rounds on a depth-$depth chain, got $rounds")
  }

  test("dedupClusters: strict mode throws on non-convergence instead of warning") {
    val ids = (0L until 8L).toDF("doc_id")
    val chain = (0L until 7L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      DedupOps.dedupClusters(ids, chain, maxIter = 1, strict = true,
        localPairThreshold = 0)
    }
  }

  test("dedupClusters: local union-find path matches the distributed rounds") {
    val ids = (0L until 40L).toDF("doc_id")
    // two chains, one pair, isolated remainder — deep enough to exercise
    // path compression and min-rep selection
    val pairs = ((0L until 9L).map(i => (i, i + 1)) ++
      Seq((20L, 25L), (25L, 21L), (30L, 31L))).toDF("doc_a", "doc_b")
    val (local, lr) = DedupOps.dedupClustersWithRounds(ids, pairs)
    assert(lr === 0) // small pair set must take the local path
    val (dist, dr) = DedupOps.dedupClustersWithRounds(ids, pairs,
      localPairThreshold = 0)
    assert(dr > 0)
    val l = local.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val d = dist.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(l === d)
    assert(l.find(_._1 == 25L).get._2 === 20L) // cross-chain min label
  }

  test("dedupClusters: local path handles string ids with SQL min semantics") {
    val ids = Seq("d", "c", "b", "a", "zz").toDF("doc_id")
    val pairs = Seq(("d", "c"), ("c", "b")).toDF("doc_a", "doc_b")
    val out = DedupOps.dedupClusters(ids, pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(out.toSeq === Seq(
      ("a", "a", true), ("b", "b", true), ("c", "b", false),
      ("d", "b", false), ("zz", "zz", true)))
  }

  test("decontaminate: flags exactly the docs sharing a k-gram, k is a hard boundary") {
    import org.apache.spark.sql.functions.col
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon noise"), // shares a 5-gram
      (2L, "x alpha beta gamma delta y z"),         // only a 4-gram overlap
      (3L, "completely different words here now ok"),
      (4L, "pad pad alpha beta gamma delta epsilon")// 5-gram not at the start
    ).toDF("doc_id", "text")
    val flagged = graft.operators.DedupOps.decontaminate(
        corpus, col("doc_id"), col("text"), bench, col("text"), k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L, 4L))
  }

  test("decontamOverlap: exact distinct-gram fractions; gram-less docs absent") {
    import org.apache.spark.sql.functions.col
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),  // both 5-grams hit: 2/2
      (2L, "alpha beta gamma delta epsilon noise"), // 1 of 2 distinct grams
      (3L, "completely different words here now ok"), // 0 of 2
      (4L, "too short"),                            // < k tokens: absent
      // repeated gram counted ONCE (distinct): 1 hit / 2 distinct grams
      (5L, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon")
    ).toDF("doc_id", "text")
    val got = graft.operators.DedupOps.decontamOverlap(
        corpus, col("doc_id"), col("text"), bench, col("text"), k = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L, 5L)) // 4 has no 5-gram
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0),
      // doc 5: 10 tokens -> 6 windows, but window 6 repeats window 1 ->
      // 5 DISTINCT grams (the seam windows are new), 1 benchmark hit
      (5L, 5L, 1L, 1.0 / 5.0)))
  }

  test("charEntropy: exact landmarks and a driver-side differential") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "aaaa"),         // single char: exactly 0 bits
      (2L, "abab"),         // two equiprobable chars: exactly 1 bit
      (3L, "abcd"),         // four equiprobable chars: exactly 2 bits
      (4L, ""),             // empty: null entropy, zero counts
      (5L, "mississippi")
    ).toDF("doc_id", "text")
    val got = TextOps.charEntropy(docs, col("doc_id"), col("text"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got(0) === ((1L, 4L, 1L, Some(0.0))))
    assert(got(1)._4.exists(v => math.abs(v - 1.0) < 1e-12))
    assert(got(2)._4.exists(v => math.abs(v - 2.0) < 1e-12))
    assert(got(3) === ((4L, 0L, 0L, None)))
    // driver-side reference for mississippi: m=1 i=4 s=4 p=2, n=11
    val n = 11.0
    val want = (math.log(n) -
      Seq(1.0, 4.0, 4.0, 2.0).map(c => c * math.log(c)).sum / n) / math.log(2.0)
    assert(got(4)._2 === 11L && got(4)._3 === 4L)
    assert(got(4)._4.exists(v => math.abs(v - want) < 1e-9))
  }

  test("charEntropy: SQL-registered expression; interpreted eval agrees with codegen") {
    // SQL-string surface: graft_char_stats is injected like graft_dot/hash60
    val viaSql = spark.sql(
      "SELECT graft_char_stats('mississippi').n_chars AS n," +
        " graft_char_stats('mississippi').n_distinct AS d," +
        " graft_char_stats(CAST(NULL AS STRING)) IS NULL AS nn").head()
    assert(viaSql.getLong(0) === 11L && viaSql.getLong(1) === 4L && viaSql.getBoolean(2))
    // non-ASCII spill path: runs sorted after the ASCII block, counts by
    // code point (the astral char is ONE char)
    val uni = Seq((1L, "aéé😀")).toDF("doc_id", "text")
    val r = TextOps.charEntropy(uni, col("doc_id"), col("text")).head()
    assert(r.getLong(1) === 4L && r.getLong(2) === 3L) // 4 chars, 3 distinct
    // interpreted path (eval) must agree bit-for-bit with codegen
    val docs = Seq((1L, "the quick brown fox 123  !!")).toDF("doc_id", "text")
    def run(): Double = TextOps.charEntropy(docs, col("doc_id"), col("text"))
      .head().getDouble(3)
    val cg = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(java.lang.Double.doubleToLongBits(cg) ==
        java.lang.Double.doubleToLongBits(run()))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("simhash: identical docs hamming 0, near-dups small, distinct docs large") {
    val fp = DedupOps.simhash60(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(ham(0L, 1L) <= 12) // one-token difference
    assert(ham(0L, 2L) > 12) // unrelated
  }

  test("simhashPairs multi-index banding is exhaustive: banded == brute at maxHamming 0..5") {
    import spark.implicits._
    // adversarial error placements against a fixed base fingerprint —
    // errors CONCENTRATED in one 10-bit chunk, SPREAD one-per-chunk (the
    // pigeonhole worst case), and packed at the top end — at every
    // distance 1..6, plus an exact duplicate (the maxHamming-0 band) and
    // random fingerprints. The banded miner must reproduce the brute
    // pair set EXACTLY for every maxHamming the scheme claims (0..5).
    val rnd = new scala.util.Random(0xba4d5L)
    val mask60 = (1L << 60) - 1
    val base = rnd.nextLong() & mask60
    val planted = scala.collection.mutable.ArrayBuffer[Long](base, base)
    for (d <- 1 to 6) {
      planted += (0 until d).foldLeft(base)((v, i) => v ^ (1L << i))
      planted += (0 until d).foldLeft(base)((v, i) => v ^ (1L << (i * 10)))
      planted += (0 until d).foldLeft(base)((v, i) => v ^ (1L << (59 - i)))
    }
    val rand = Seq.fill(150)(rnd.nextLong() & mask60)
    val fp = (planted.toSeq ++ rand).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "simhash")
    // multi-index combination bands: exhaustive through hamming 5;
    // classic single-chunk 4×15 bands: exhaustive through hamming 3
    for ((multiIndex, maxExact) <- Seq((true, 5), (false, 3)); h <- 0 to maxExact) {
      val banded = DedupOps.simhashPairs(fp, h, multiIndex)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = DedupOps.simhashPairsBrute(fp, h).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded === brute,
        s"banded != brute at maxHamming $h (multiIndex $multiIndex): " +
          s"missed ${brute -- banded}, extra ${banded -- brute}")
      if (h > 0) assert(brute.nonEmpty) // the planted variants really pair
    }
  }

  test("quality score stays in [0,1]; langId votes markers") {
    val q = docs.select(TextOps.qualityScore(col("text")).as("q")).collect()
    assert(q.forall { r => val v = r.getDouble(0); v >= 0.0 && v <= 1.0 })
    val langs = Seq((1L, "der hund und die katze"), (2L, "el perro de la casa que"))
      .toDF("doc_id", "text")
      .select(TextOps.langId(col("text")).as("l")).collect().map(_.getString(0))
    assert(langs === Array("de", "es"))
  }

  test("boilerplateStrip: cross-doc lines vanish, unique lines survive in order") {
    // lineWords=3 -> lines are 3-token windows; "visit our site" leads
    // three docs (boilerplate), the rest is unique per doc
    val d = Seq(
      (1L, "visit our site alpha beta gamma delta epsilon zeta"),
      (2L, "visit our site one two three four five six"),
      (3L, "visit our site just this much"),
      (4L, "totally unique words never repeated anywhere else ever")
    ).toDF("doc_id", "text")
    val out = DedupOps.boilerplateStrip(d, col("doc_id"), col("text"),
        lineWords = 3, minDocs = 2)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "alpha beta gamma delta epsilon zeta", 1L),
      (2L, "one two three four five six", 1L),
      (3L, "just this much", 1L),
      (4L, "totally unique words never repeated anywhere else ever", 0L)))
  }

  test("boilerplateStrip: an all-boilerplate doc keeps an empty row; same-doc repeats don't count") {
    val d = Seq(
      (1L, "cookie notice here"), // whole doc = the shared line
      (2L, "cookie notice here plus real content words"),
      (3L, "echo echo echo echo echo echo") // repeats only WITHIN the doc
    ).toDF("doc_id", "text")
    val out = DedupOps.boilerplateStrip(d, col("doc_id"), col("text"),
        lineWords = 3, minDocs = 2)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    // doc frequency is DISTINCT docs: doc 3's internally-repeated line has
    // df=1 and survives intact
    assert(out === Seq(
      (1L, "", 1L),
      (2L, "plus real content words", 1L),
      (3L, "echo echo echo echo echo echo", 0L)))
  }

  test("minhash signatures: row-wise plan bit-matches the aggregate formulation, drops shingle-less docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different text with other words entirely here"),
      (4L, "too short")  // < 3 tokens of shingle -> no shingles
    ).toDF("doc_id", "text")
    val hashed = DedupOps.hashedShingleSets(
      DedupOps.shingleSets(docs, col("doc_id"), col("text"), 3))
    val rowwise = DedupOps.minhashSignaturesRowwise(hashed, 16)
      .orderBy("doc_id").collect().map(_.toSeq)
    val viaAgg = DedupOps.minhashSignatures(hashed, 16)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(rowwise.toSeq === viaAgg.toSeq)
    assert(rowwise.map(_.head) === Array(1L, 2L, 3L)) // doc 4 absent from both
  }

  test("crossNearDupPairs: all shard-vs-corpus matches, none within a side") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about physical plans and shuffles"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today")
    ).toDF("doc_id", "text")
    val shard = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "unrelated text talking about watermark semantics in streams"),
      // near-dup of shard doc 1 — must NOT pair (within-shard dedup is
      // minhashLshPairs' job, not the cross join's)
      (5L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.crossNearDupPairs(
        DedupOps.shingleSets(shard, col("doc_id"), col("text"), 3),
        DedupOps.shingleSets(corpus, col("doc_id"), col("text"), 3),
        threshold = 0.8)
      .orderBy("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // shard 1 and 5 (identical) each match corpus 0 exactly and corpus 4
    // (one extra trailing token: 10 of 11 shingles shared)
    assert(pairs.map(p => (p._1, p._2)).toSeq ===
      Seq((1L, 0L), (1L, 4L), (5L, 0L), (5L, 4L)))
    assert(pairs.filter(_._2 == 0L).forall(_._3 == 1.0))
    assert(pairs.filter(_._2 == 4L).forall(p => math.abs(p._3 - 10.0 / 11) < 1e-12))
  }

  test("substringDupStats counts cross-doc duplicated window positions") {
    // window=10, stride=5. Doc 10 and 11 share a verbatim 20-char span;
    // doc 12 is unique; doc 13 is shorter than the window (zero windows);
    // doc 14 repeats a span only WITHIN itself (not cross-doc dup).
    val span = "ABCDEFGHIJKLMNOPQRST" // 20 chars
    val docs = Seq(
      (10L, span + "uvwxyz0123"),        // 30 chars
      (11L, span),                        // 20 chars
      (12L, "zyxwvutsrqponmlkjihgfedcba"), // 26 chars, unique
      (13L, "short"),                     // < window
      (14L, "1234512345123451234512345")  // internal repeats only, 25 chars
    ).toDF("doc_id", "text")
    val got = DedupOps.substringDupStats(docs, col("doc_id"), col("text"),
        window = 10, stride = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 10: offsets 0,5,10,15,20 -> 5 windows; windows at 0,5,10
    //   (substrings of the shared 20-char span) also occur in doc 11
    assert(got(10L) === ((5L, 3L, 600000L)))
    // doc 11: offsets 0,5,10 -> 3 windows, all shared with doc 10
    assert(got(11L) === ((3L, 3L, 1000000L)))
    // doc 12: 4 windows, none shared
    assert(got(12L) === ((4L, 0L, 0L)))
    // doc 13: shorter than the window — zero windows, zero ppm (no div-0)
    assert(got(13L) === ((0L, 0L, 0L)))
    // doc 14: "1234512345" repeats at offsets 0,5,10,15 within ONE doc —
    // repetition, not cross-doc duplication
    assert(got(14L) === ((4L, 0L, 0L)))
  }

  test("substringDupStats plans without a Window node (hot-key safe)") {
    val docs = Seq((1L, "abcdefghijklmnop")).toDF("doc_id", "text")
    val df = DedupOps.substringDupStats(docs, col("doc_id"), col("text"),
      window = 10, stride = 5)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty,
      "per-key doc count must hash-aggregate (streams), not window (buffers the key group)")
  }

  test("substringDupStats handles a mega-boilerplate key shared by many docs") {
    // one 10-char window string shared VERBATIM by 5000 docs — the hot-key
    // case: the old count-over-window plan buffered all 5000 (key, doc)
    // rows of that key in one WindowExec group; the groupBy+join plan
    // streams. Each doc also carries a unique 10-char tail window.
    val boiler = "BOILERPLAT"
    val docs = spark.range(5000).selectExpr("id AS doc_id",
      s"concat('$boiler', lpad(CAST(id AS STRING), 10, '0')) AS text")
    val got = DedupOps.substringDupStats(docs, col("doc_id"), col("text"),
        window = 10, stride = 10)
      .agg(sum(col("n_windows")), sum(col("n_dup_windows")),
        min(col("dup_ppm")), max(col("dup_ppm")))
      .collect()(0)
    // 2 windows/doc; the boilerplate window dups everywhere, the tail never
    assert(got.getLong(0) === 10000L)
    assert(got.getLong(1) === 5000L)
    assert(got.getLong(2) === 500000L && got.getLong(3) === 500000L)
  }

  test("crossSubstringContam catches bench spans at any alignment") {
    // window=10, stride=5 on the corpus side; bench keyed at stride 1.
    val benchSpan = "0123456789ABCDEFGHIJ" // 20 chars
    val bench = Seq((0L, benchSpan)).toDF("bid", "text")
    val docs = Seq(
      // bench span embedded at offset 2 — NOT a multiple of the doc
      // stride. Doc windows at 0,5,10: [5,15) and [10,20) fall inside the
      // span (hits via bench's stride-1 keys); [0,10) straddles the 'xx'
      // prefix (miss). A strided bench side would score 0 here.
      (1L, "xx" + benchSpan + "yy"),
      (2L, benchSpan),                      // verbatim bench member: all hit
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzz"),     // clean
      (4L, "tiny")                          // shorter than the window
    ).toDF("doc_id", "text")
    val got = DedupOps.crossSubstringContam(docs, col("doc_id"), col("text"),
        bench, col("text"), window = 10, stride = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((3L, 2L, 666666L)))
    assert(got(2L) === ((3L, 3L, 1000000L)))
    assert(got(3L) === ((3L, 0L, 0L)))
    assert(got(4L) === ((0L, 0L, 0L)))
  }

  test("substringDupStats chunked offsets agree across block boundaries") {
    // offsetBlock=4 with 11 offsets per doc (text 60 chars, window 10,
    // stride 5 -> offsets 0..10) spans 3 blocks incl. a partial last one;
    // results must equal the single-block plan bit-for-bit
    val base = "The quick brown fox jumps over the lazy dog again and again!"
    val docs = Seq((1L, base), (2L, base), (3L, base.reverse))
      .toDF("doc_id", "text")
    def run(block: Int) = DedupOps.substringDupStats(docs, col("doc_id"),
        col("text"), window = 10, stride = 5, offsetBlock = block)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val chunked = run(4)
    assert(chunked === run(1 << 20))
    // docs 1 and 2 are identical: every window position duplicated
    assert(chunked.take(2).forall(t => t._2 == 11L && t._3 == 11L && t._4 == 1000000L))
    assert(chunked(2)._3 === 0L)
  }

  test("canonicalPerCluster keeps the best-scored member, ties to the lower id") {
    // clusters: {1,2,3} rep 1, {4,5} rep 4, {6} singleton
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L)).toDF("doc_id", "rep")
    val scores = Seq((1L, 10L), (2L, 99L), (3L, 99L), // tie 2 vs 3 -> 2
      (4L, 7L), (5L, 3L), (6L, 1L)).toDF("doc_id", "q")
    val got = DedupOps.canonicalPerCluster(clusters, scores,
        col("doc_id"), col("q"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(got == Map(
      1L -> (2L, 0), 2L -> (2L, 1), 3L -> (2L, 0),
      4L -> (4L, 1), 5L -> (4L, 0),
      6L -> (6L, 1)))
  }

  test("containmentPairs: subset doc scores 1.0 one way, Jaccard-invisible") {
    val corpus = Seq(
      (1L, "one two three four five"),                 // 3 shingles, all in doc 2
      (2L, "zero one two three four five six"),        // 5 shingles
      (3L, "alpha beta gamma delta")                   // disjoint
    ).toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(corpus, col("doc_id"), col("text"),
        k = 3, thresholdPpm = 700000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // 1-in-2 containment = 3/3 = 1.0; 2-in-1 = 3/5 = 0.6 < 0.7 cut;
    // Jaccard(1,2) = 3/5 — a 0.7 Jaccard threshold would see nothing
    assert(got.toSeq === Seq((1L, 2L, 3L, 3L, 1000000L)))
    val both = DedupOps.containmentPairs(corpus, col("doc_id"), col("text"),
        k = 3, thresholdPpm = 600000L)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(both.toSeq === Seq((1L, 2L, 1000000L), (2L, 1L, 600000L)))
  }

  test("containmentPairs: maxDf prunes boilerplate keys from both counts") {
    val corpus = Seq(
      (1L, "common phrase here aaa bbb ccc"),
      (2L, "common phrase here ddd eee fff"),
      (3L, "common phrase here ggg hhh iii")
    ).toDF("doc_id", "text")
    // every doc shares exactly "common phrase here" (df=3); all other
    // shingles are private. Unpruned, each pair intersects on that one key:
    val loose = DedupOps.containmentPairs(corpus, col("doc_id"), col("text"),
        k = 3, thresholdPpm = 0L).collect()
    assert(loose.length === 6 && loose.forall(_.getLong(2) == 1L))
    // with maxDf=2 the df=3 key is pruned from intersections AND sizes —
    // nothing intersects, no pair survives even a zero threshold
    val pruned = DedupOps.containmentPairs(corpus, col("doc_id"), col("text"),
        k = 3, thresholdPpm = 0L, maxDf = 2L).collect()
    assert(pruned.isEmpty)
  }

  test("autoShingleWidth: saturated vocab widens k, rich vocab stays at " +
      "kMin, bounds clamp, sharded vocab measured not estimated") {
    // fixed 4-word vocab, 64 docs x 8 tokens: realized df at k=3 is
    // 64·6 / 4³ = 6 > 4, at k=4 it's 64·5 / ~realized(256) ≈ 1.6 -> k = 4
    val rnd = new scala.util.Random(7)
    val vocab = Array("aa", "bb", "cc", "dd")
    val dense = (0 until 64).map(i =>
      (i.toLong, Seq.fill(8)(vocab(rnd.nextInt(4))).mkString(" ")))
      .toDF("doc_id", "text")
    assert(DedupOps.autoShingleWidth(dense, col("text")) === 4)
    // rich vocabulary (every token unique): every shingle is unique at
    // the minimum width already — one probe, early exit
    val rich = (0 until 64).map(i =>
      (i.toLong, (0 until 8).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(DedupOps.autoShingleWidth(rich, col("text")) === 3)
    // binary vocab: realized df = 64·(9-k)/2^k first dips <= 4 at k = 6
    // (192/64 = 3) — the r12 vocab^k formula said 7 because it ignored
    // the window count shrinking with k; measuring df gets it right
    val binary = (0 until 64).map(i =>
      (i.toLong, Seq.fill(8)(vocab(rnd.nextInt(2))).mkString(" ")))
      .toDF("doc_id", "text")
    assert(DedupOps.autoShingleWidth(binary, col("text")) === 6)
    assert(DedupOps.autoShingleWidth(binary, col("text"), kMax = 5) === 5)
    // empty corpus: kMin, no crash
    assert(DedupOps.autoShingleWidth(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), col("text")) === 3)
    // SHARDED vocabulary — the case that kills a vocab^k estimator: two
    // sub-corpora with disjoint 4-word vocabularies. Union vocab is 8,
    // so the formula would credit 8^k keys; shingles never cross shards,
    // the real space is 2·4^k, and realized-df probing must therefore
    // choose the SAME width it chose for one shard at half the volume
    // (here both pick k = 4; a 64-doc single-shard corpus of this size
    // picked 4 above).
    val sharded = (0 until 128).map { i =>
      val v = if (i < 64) vocab else Array("ee", "ff", "gg", "hh")
      (i.toLong, Seq.fill(8)(v(rnd.nextInt(4))).mkString(" "))
    }.toDF("doc_id", "text")
    assert(DedupOps.autoShingleWidth(sharded, col("text")) === 4)
  }

  test("containmentPairsAuto equals containmentPairs at the chosen width") {
    val rnd = new scala.util.Random(13)
    val vocab = Array("aa", "bb", "cc", "dd")
    val corpus = (0 until 64).map(i =>
      (i.toLong, Seq.fill(8)(vocab(rnd.nextInt(4))).mkString(" ")))
      .toDF("doc_id", "text")
    val k = DedupOps.autoShingleWidth(corpus, col("text"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(key(DedupOps.containmentPairsAuto(corpus, col("doc_id"),
        col("text"), thresholdPpm = 500000L))
      === key(DedupOps.containmentPairs(corpus, col("doc_id"), col("text"),
        k, thresholdPpm = 500000L)))
  }

  test("tokenFrequencySpectrum: hapax row, cumulative coverage reaches 1e6") {
    val corpus = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    // f(a)=3, f(b)=2, f(c)=1; total mass 6
    val got = TextOps.tokenFrequencySpectrum(corpus, col("text"))
      .orderBy(col("f").desc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (3L, 1L, 500000L, 1L, 500000L),   // 3·1e6 div 6
      (2L, 1L, 333333L, 2L, 833333L),   // 2/6; cum 5/6
      (1L, 1L, 166666L, 3L, 1000000L))) // hapax; full coverage
  }

  test("sourceOverlap: exact pairwise Jaccard, zero-overlap pairs kept, cross-doc dedup") {
    val corpus = Seq(
      // A: two docs sharing "one two three" (must count once in A's vocab)
      ("A", "one two three four"),        // shingles: {one two three, two three four}
      ("A", "one two three"),             // {one two three} — already in A
      // B: overlaps A on "two three four" + has one private shingle
      ("B", "two three four five"),       // {two three four, three four five}
      // C: disjoint vocabulary
      ("C", "alpha beta gamma delta")     // {alpha beta gamma, beta gamma delta}
    ).toDF("source", "text")
    val got = DedupOps.sourceOverlap(corpus, col("source"), col("text"), 3)
      .orderBy("src_a", "src_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // vocab sizes: A=2, B=2, C=2; A∩B = {two three four} = 1
    assert(got == Map(
      ("A", "B") -> (2L, 2L, 1L, 1000000L / 3), // 1/(2+2-1) = 333333 ppm
      ("A", "C") -> (2L, 2L, 0L, 0L),
      ("B", "C") -> (2L, 2L, 0L, 0L)))
  }

  test("dedupRecallEval: measured LSH recall on the sf0.01 corpus meets " +
      "the 1-(1-J^r)^b floor") {
    // the d03 recall CLAIM made measurable: on the real sf0.01 documents
    // corpus (sampleRate = 1.0 -> the whole corpus is the sample, so the
    // audit covers every true pair), the banded miner's measured recall
    // must meet its analytic per-pair floor at J = threshold, and — since
    // candidates verify with exact Jaccard — precision must be exact
    val (threshold, bands, rowsPerBand) = (0.8, 32, 4)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val row = DedupOps.dedupRecallEval(docs, col("doc_id"), col("text"),
      threshold, sampleRate = 1.0, bands = bands,
      rowsPerBand = rowsPerBand).head()
    val nDocs = row.getAs[Long]("n_docs")
    val nSampled = row.getAs[Long]("n_sampled")
    val truth = row.getAs[Long]("truth_pairs")
    val banded = row.getAs[Long]("banded_pairs")
    val matched = row.getAs[Long]("matched_pairs")
    val recallPpm = row.getAs[Long]("recall_ppm")
    val precisionPpm = row.getAs[Long]("precision_ppm")
    assert(nSampled === nDocs) // rate 1.0: every doc sampled
    assert(truth > 0, "corpus has no true near-dup pairs - vacuous audit")
    // analytic floor: P[pair at J = threshold survives banding]
    val floorPpm = math.floor(
      (1.0 - math.pow(1.0 - math.pow(threshold, rowsPerBand), bands)) * 1e6
    ).toLong
    assert(recallPpm >= floorPpm, s"recall $recallPpm < floor $floorPpm")
    // exact-verify miner: every banded pair is a true pair
    assert(precisionPpm === 1000000L)
    assert(matched === banded)
  }

  test("dedupRecallEval: deterministic sample, empty-truth guard") {
    // strangers only: no pair reaches the threshold -> truth = 0 and the
    // ppm columns report the vacuous 1000000 instead of dividing by zero
    val strangers = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"),
      (3L, "red green blue cyan magenta")
    ).toDF("doc_id", "text")
    val row = DedupOps.dedupRecallEval(strangers, col("doc_id"),
      col("text"), 0.8, sampleRate = 1.0).head()
    assert(row.getAs[Long]("truth_pairs") === 0L)
    assert(row.getAs[Long]("banded_pairs") === 0L)
    assert(row.getAs[Long]("recall_ppm") === 1000000L)
    assert(row.getAs[Long]("precision_ppm") === 1000000L)
    // half-sample is hash-deterministic: same subset on every invocation
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = DedupOps.dedupRecallEval(docs, col("doc_id"), col("text"), 0.8)
      .head()
    val b = DedupOps.dedupRecallEval(docs, col("doc_id"), col("text"), 0.8)
      .head()
    assert(a === b)
    assert(a.getAs[Long]("n_sampled") < a.getAs[Long]("n_docs"))
  }

  test("simhashRecallEval: pigeonhole makes banded recall EXACTLY 1 on the " +
      "sf0.01 corpus") {
    // unlike the LSH audit's probabilistic floor, the multi-index chunk
    // scheme is provably exhaustive at maxHamming 3: every hamming<=3
    // pair shares a clean chunk combination, and banded pairs are hamming-verified — so on
    // a full-corpus sample (rate 1.0, every true pair audited) recall
    // AND precision must come back exactly 1000000. Anything less is a
    // chunk-extraction or verification bug, not sampling luck.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val row = DedupOps.simhashRecallEval(docs, col("doc_id"), col("text"),
      maxHamming = 3, sampleRate = 1.0).head()
    assert(row.getAs[Long]("n_sampled") === row.getAs[Long]("n_docs"))
    assert(row.getAs[Long]("truth_pairs") > 0,
      "corpus has no hamming<=3 pairs - vacuous audit")
    assert(row.getAs[Long]("banded_pairs") === row.getAs[Long]("truth_pairs"))
    assert(row.getAs[Long]("recall_ppm") === 1000000L)
    assert(row.getAs[Long]("precision_ppm") === 1000000L)
    // the audit is hash-deterministic at fractional rates too
    val a = DedupOps.simhashRecallEval(docs, col("doc_id"), col("text")).head()
    val b = DedupOps.simhashRecallEval(docs, col("doc_id"), col("text")).head()
    assert(a === b)
    assert(a.getAs[Long]("n_sampled") < a.getAs[Long]("n_docs"))
  }
}
