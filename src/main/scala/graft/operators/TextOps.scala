package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, language identification, document
  * fingerprinting, shingling. Everything is pure built-in `Column`
  * composition (codegen'd, no UDFs) so the hot path stays inside
  * whole-stage codegen and the same logic is expressible in the DuckDB
  * oracle.
  *
  * These extend the reference surface (which has no document processing) —
  * see SURVEY.md §2E.
  */
object TextOps {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** The [[graft.functions.TextScanStats]] struct when the active session
    * has GraftExtensions installed, else null — helpers below pair it with
    * their original regex formulation so they stay usable (correct, just
    * pre-native speed) on vanilla sessions; bit-equivalence of the two
    * sides is pinned by TextScanSpec. */
  private def textScan(text: Column): Option[Column] =
    if (graft.functions.Native.has("graft_text_scan"))
      Some(call_function("graft_text_scan", text))
    else None

  /** Whitespace token count — `size(tokens(text))` semantics through the
    * native single-pass [[graft.functions.TextScanStats]] scan (no token
    * array is materialized; bit-equivalence pinned by TextScanSpec). */
  def tokenCount(text: Column): Column =
    textScan(text).map(_.getField("ws_tokens"))
      .getOrElse(size(tokens(text)))

  /** BPE-ish token count: word pieces + standalone non-word glyphs, the
    * usual pre-tokenizer regex shape `[A-Za-z0-9]+|[^A-Za-z0-9\s]` —
    * counted by the same native scan instead of materializing every match
    * just to take the array size. */
  def bpeTokenCount(text: Column): Column =
    textScan(text).map(_.getField("bpe_tokens"))
      .getOrElse(size(regexp_extract_all(text,
        lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))))

  /** Average token length in characters (whitespace removed / token count).
    * The numerator's semantic definition is
    * `length(regexp_replace(trim(text), "\\s+", ""))` (and that stays the
    * oracle-SQL form) — but counting the survivors of a full string
    * REBUILD equals `n_chars − space` from the scan struct (trim removes
    * only `\s` chars, the replace removes every `\s`, so what's left is
    * exactly the non-`\s` code points), which drops the last per-row
    * regex string rebuild from the quality-score path. Pinned against the
    * regex formulation in TextScanSpec. */
  def avgTokenLen(text: Column): Column =
    textScan(text).map { st =>
      (st.getField("n_chars") - st.getField("space")).cast("double") /
        st.getField("ws_tokens")
    }.getOrElse(
      length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
        size(tokens(text)))

  /** Share of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(sw, t))).cast("double") /
      tokenCount(text)
  }

  /** Punctuation character share. Semantic definition (and the
    * vanilla-session/oracle form): code points matching
    * `[^\p{Alnum}\s]` over total length — and Java's `\p{Alnum}` WITHOUT
    * `UNICODE_CHARACTER_CLASS` is the POSIX ASCII class `[A-Za-z0-9]`,
    * which makes the count exactly the scan struct's `symbol` field
    * (`[^A-Za-z0-9\s]`), so the native path needs no regex and no string
    * rebuild. Pinned in TextScanSpec. */
  def punctRatio(text: Column): Column =
    textScan(text).map { st =>
      st.getField("symbol").cast("double") /
        greatest(st.getField("n_chars"), lit(1))
    }.getOrElse(
      (length(text) - length(regexp_replace(text, "[^\\p{Alnum}\\s]", "")))
        .cast("double") / greatest(length(text), lit(1)))

  /** Composite quality score in [0, 1]: length saturation, stopword balance,
    * token-shape, punctuation penalty — the standard cheap pre-filter shape
    * for pretraining corpora (weights are engine defaults, callers can
    * recompose from the parts). */
  def qualityScore(text: Column, stopwords: Seq[String] = DefaultStopwords): Column = {
    val lenSat = least(length(text).cast("double") / 500.0, lit(1.0))
    val swBalance = lit(1.0) - abs(stopwordRatio(text, stopwords) - lit(0.4))
    val shapeSat = least(avgTokenLen(text) / 8.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    lit(0.35) * lenSat + lit(0.25) * swBalance + lit(0.2) * shapeSat +
      lit(0.2) * punctPenalty
  }

  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Language-ID by stopword-marker voting: count marker-token hits per
    * language, argmax with a fixed precedence order; 'und' when nothing
    * matches. A real system uses char-n-gram profiles — same relational
    * shape (per-language score column + argmax), heavier marker set. */
  def langId(text: Column, markers: Seq[(String, Seq[String])] = DefaultMarkers): Column = {
    val toks = tokens(text)
    val scores = markers.map { case (lang, ms) =>
      val arr = array(ms.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(arr, t)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, "und")) { case (acc, (lang, sc)) =>
      acc.when(sc === best, lang)
    }.otherwise("und")
  }

  val DefaultMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "de", "que"),
    "zh" -> Seq("的", "是", "了"))

  /** Content fingerprint: md5 of canonicalized text (lowercase, collapsed
    * whitespace). Identical in any engine — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Top-`k` terms per document by tf·idf: explode tokens → per-(doc, term)
    * counts → document frequency per term → idf-weighted score → per-doc
    * window rank. Two shuffles (term for df, doc for the rank window); the
    * corpus size rides as a broadcast 1-row aggregate. Ties break on the
    * term so the kept set is deterministic.
    *
    * `logIdf = true` (default) scores with the standard smoothed
    * `ln((N+1)/(df+1)) + 1`. `logIdf = false` scores with the raw ratio
    * `(N+1)/(df+1)`: every arithmetic step is then a correctly-rounded
    * IEEE operation on integer-derived doubles, so scores — and therefore
    * ranks — reproduce bit-for-bit in any engine (libm `ln` implementations
    * may differ in the last ulp). Note the two weightings are different
    * scoring semantics, not just formats: where tf trades off against df,
    * their rankings can diverge (ln is monotone in idf, not in tf·idf).
    * The oracle-gated query pins the ratio variant; the default stays
    * standard tf·idf. Output: (id, rank, term, score). */
  def tfidfTopK(df: DataFrame, idCol: Column, textCol: Column, k: Int,
                logIdf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(idCol.as("id"), explode(tokens(textCol)).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // tf is one row per (doc, term), so df(term) = row count per term —
    // derived from the aggregated frame, NOT by re-exploding the corpus
    // (which would scan and shuffle the raw tokens a second time)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n"))
    val ratio = (col("n") + lit(1.0)) / (col("df") + lit(1.0))
    val idf = if (logIdf) log(ratio) + lit(1.0) else ratio
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * idf)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select("id", "rank", "term", "score")
  }

  /** Distinct word k-shingles from an ALREADY-MATERIALIZED token array
    * column. Guarded: fewer than k tokens -> empty set (sequence(1, 0) would
    * count DOWN in Spark, not produce an empty array).
    *
    * Callers must project the token array into its own column first
    * (`select(tokens(text).as("w"))`) — passing `tokens(text)` directly
    * re-evaluates the split regex for every element_at access inside the
    * transform lambda, turning shingling O(tokens²·|text|) (measured 5× the
    * whole pipeline cost). */
  def shinglesOfTokens(w: Column, k: Int): Column =
    array_distinct(allShinglesOfTokens(w, k))

  /** All k-grams in document order, duplicates kept — [[shinglesOfTokens]]
    * without the distinct; the total/distinct pair drives [[repetition]].
    * Same caller contract: `w` must be a materialized token-array column. */
  def allShinglesOfTokens(w: Column, k: Int): Column =
    when(size(w) < k, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(w) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(w, i + lit(j))): _*)))

  /** Gopher-style intra-document repetition: the share of word `k`-grams
    * that duplicate an earlier k-gram of the same document —
    * `1 - distinct/total`, 0.0 for documents shorter than k tokens. A
    * standard quality-filter signal (boilerplate and looping text score
    * high). Narrow per-row expressions, no shuffle; the ratio is a
    * division of small exact integers, so it is bit-reproducible by the
    * oracle engine without rounding. Returns (id, n_grams, dup_ratio). */
  def repetition(df: DataFrame, idCol: Column, textCol: Column,
                 k: Int = 3): DataFrame =
    df.select(idCol.as("id"), tokens(textCol).as("__toks"))
      .select(col("id"), allShinglesOfTokens(col("__toks"), k).as("__grams"))
      .select(col("id"),
        size(col("__grams")).as("n_grams"),
        when(size(col("__grams")) > 0,
          lit(1.0) - size(array_distinct(col("__grams"))).cast("double")
            / size(col("__grams")))
          .otherwise(lit(0.0)).as("dup_ratio"))

  /** Top-`vocabSize` vocabulary by corpus term frequency (ties by term, so
    * the vocabulary is deterministic) and the per-document OOV share
    * against it — the tokenizer-prep question "how much of the corpus does
    * a V-entry vocab cover, and which documents fall outside it". The OOV
    * ratio is exact-integer division (n_oov / n_tokens), bit-reproducible
    * unrounded.
    *
    * Plan: one term-count aggregate; the vocabulary is rank ≤ V of it
    * (WindowGroupLimit prunes map-side — the count table, already one row
    * per distinct term, never fully sorts); membership back on the token
    * stream is a broadcast-sized left join at any realistic V; one regroup
    * per doc. Returns (id, n_tokens, n_oov, oov_ratio). */
  def vocabOov(df: DataFrame, idCol: Column, textCol: Column,
               vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabOov: vocabSize must be positive: $vocabSize")
    val toks = df.select(idCol.as("id"), explode(tokens(textCol)).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("__tf"))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__tf").desc, col("term"))))
      .filter(col("__rk") <= vocabSize)
      .select(col("term"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_ratio"))
  }

  /** BM25 relevance of every document against a LITERAL query-term list —
    * the lexical-retrieval scorer (k1 saturates term frequency, b
    * length-normalizes). idf is the ratio form (N+1)/(df+1): like
    * [[tfidfTopK]], libm `ln` is not bit-reproducible across engines, and
    * the ratio is a strictly monotone transform of it, so rankings for a
    * single term agree and multi-term semantics are pinned as documented.
    *
    * Determinism: per-term tf and dl are per-row expressions on the
    * materialized token array (no shuffle); corpus stats (N, Σdl, per-term
    * df) are ONE 1-row aggregate broadcast back; the score is a FIXED
    * left-to-right expression tree over the literal term list — every
    * operation is a single correctly-rounded IEEE op on exact-integer
    * inputs, so the score reproduces bit-for-bit unrounded in any engine.
    *
    * Plan: scan + 1-row aggregate + broadcast cross join + projection.
    * Nothing shuffles with the corpus; top-k on the result is a
    * TakeOrdered. Returns (id, dl, score). */
  def bm25Score(df: DataFrame, idCol: Column, textCol: Column,
                queryTerms: Seq[String], k1: Double = 1.2,
                b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Score: empty query")
    require(queryTerms.distinct.size == queryTerms.size,
      s"bm25Score: duplicate query terms: $queryTerms")
    // tf/df columns are INDEX-named — raw terms in column names would make
    // duplicates ambiguous and dotted/spaced terms unresolvable
    val ts = queryTerms.zipWithIndex
    val perDoc = df.select(idCol.as("id"), tokens(textCol).as("__toks"))
      .select(col("id") +: size(col("__toks")).as("dl") +:
        ts.map { case (t, i) =>
          size(filter(col("__toks"), x => x === lit(t))).as(s"__tf_$i")
        }: _*)
      // feeds both the stats aggregate and the scoring join — persist so
      // the corpus tokenizes once (same rule as unigramScore)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val statCols = count(lit(1)).as("__n") +:
      sum(col("dl").cast("long")).as("__sumdl") +:
      ts.map { case (_, i) =>
        sum((col(s"__tf_$i") > 0).cast("long")).as(s"__df_$i")
      }
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val termScores = ts.map { case (_, i) =>
      val tf = col(s"__tf_$i").cast("double")
      val idf = (col("__n") + 1).cast("double") / (col(s"__df_$i") + 1).cast("double")
      val part = lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)
      idf * (tf * lit(k1 + 1.0) / (tf + lit(k1) * part))
    }
    perDoc.crossJoin(broadcast(stats))
      .select(col("id"), col("dl"), termScores.reduce(_ + _).as("score"))
  }

  /** Per-document unigram corpus-frequency score: the mean corpus
    * frequency of a document's tokens,
    * `score = Σ_tok tf(tok) / (n_tokens × total_tokens)` — a
    * perplexity-proxy rarity signal (low = rare-word-heavy document,
    * high = common-word boilerplate) with NO floating-point accumulation:
    * both sums are integer (order-independent under any partitioning), and
    * the score is one double division of exact products — bit-reproducible
    * cross-engine unrounded, unlike an avg() over per-token doubles.
    *
    * Plan: token explode feeding (a) the term-frequency aggregate and
    * (b) the scoring join — persisted across the two branches; the 1-row
    * total rides a broadcast cross join (no driver round trip). Two
    * shuffles (term counts, per-doc regroup), linear in token count. The
    * n×total product is computed in DOUBLE (two exact longs can overflow
    * their product at 100 TB token counts). Returns
    * (id, n_tokens, sum_tf, score). */
  def unigramScore(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = df.select(idCol.as("id"), explode(tokens(textCol)).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = toks.groupBy("term").agg(count(lit(1)).as("tf"))
    val total = counts.agg(sum(col("tf")).as("total"))
    toks.join(counts, "term")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("tf")).as("sum_tf"))
      .crossJoin(broadcast(total))
      .select(col("id"), col("n_tokens"), col("sum_tf"),
        (col("sum_tf").cast("double") /
          (col("n_tokens").cast("double") * col("total").cast("double")))
          .as("score"))
  }

  /** PII patterns: deliberately restricted to a regex dialect shared by
    * Java (Spark) and RE2 (DuckDB, Go tooling) — no backreferences, no
    * lookaround — so redaction is reproducible by any engine scanning the
    * corpus. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d[\\d ()-]{6,14}\\d"

  /** PII redaction: mask emails, IPv4 addresses, and international-format
    * phone numbers with typed placeholders, and count each. Masking is
    * staged — emails first, then IPs, then phones — with each count taken
    * against the previous stage's text, so the semantics are well-defined
    * when patterns could overlap (a digit run inside an email never
    * double-counts as a phone). Pure `regexp_replace`/`regexp_count`
    * per-row expressions: no shuffle, scans at parquet speed, and each
    * stage materializes in its own projection so the regex runs once per
    * row (aliases with multiple refs don't collapse). Returns
    * (id, red_text, n_email, n_ip, n_phone). */
  def redactPii(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("id"), textCol.as("__t0"))
      .select(col("id"),
        regexp_count(col("__t0"), lit(EmailRe)).as("n_email"),
        regexp_replace(col("__t0"), EmailRe, "<EMAIL>").as("__t1"))
      .select(col("id"), col("n_email"),
        regexp_count(col("__t1"), lit(Ipv4Re)).as("n_ip"),
        regexp_replace(col("__t1"), Ipv4Re, "<IP>").as("__t2"))
      .select(col("id"), col("n_email"), col("n_ip"),
        regexp_count(col("__t2"), lit(PhoneRe)).as("n_phone"),
        regexp_replace(col("__t2"), PhoneRe, "<PHONE>").as("red_text"))
      .select("id", "red_text", "n_email", "n_ip", "n_phone")

  /** Single-expression convenience form — only for small inputs/tests; see
    * the [[shinglesOfTokens]] performance note. */
  def wordShingles(text: Column, k: Int): Column = shinglesOfTokens(tokens(text), k)

  /** Shingles mapped to 60-bit portable hashes (see [[Hashing.hash60]]). */
  def shingleHashes(text: Column, k: Int): Column =
    transform(wordShingles(text, k), s => Hashing.hash60(s))

  /** Sparse TF-IDF cosine document-similarity self-join via an inverted
    * index: the lexical (term-overlap) counterpart of the embedding-cosine
    * near-dup miner. Pipeline: per-(doc, term) tf → document frequency →
    * df-pruned ratio-idf weights (the bit-reproducible idf pinned by
    * [[tfidfTopK]]) → self-join on term → Σ(wa·wb) per pair → normalize by
    * the pruned-space L2 norms.
    *
    * Scale shape: everything shuffles on the TERM key, and `maxDf` is the
    * load-bearing knob — a term kept in the index contributes at most
    * df² candidate pairs, so pruning df > maxDf bounds per-term join work
    * by maxDf² and kills exactly the stopword-posting-list skew that makes
    * naive all-pairs text similarity explode (it also drops the terms that
    * carry no discriminative signal — the same reason search engines
    * df-prune). df ≤ 1 terms pair with nothing and are pruned too. Cosine
    * is over the PRUNED term space on both sides (self-consistent; the
    * oracle applies the same integer df filter). The weight frame is
    * persisted eagerly — norms and both join sides read it (the
    * sibling-stage race rule from SCALING.md).
    *
    * `normRound` rounds the L2 norms to that many decimals before the
    * division so an external engine reproduces the cosine bit-for-bit up
    * to the (order-dependent, ~1 ulp) dot sums — the same stat-rounding
    * convention as the season-score oracle. Returns (id_a, id_b, cos)
    * with id_a < id_b and cos >= threshold. */
  def sparseCosinePairs(df: DataFrame, idCol: Column, textCol: Column,
                        threshold: Double, maxDf: Long,
                        normRound: Option[Int] = None): DataFrame =
    sparseCosineImpl(df, idCol, textCol, threshold, lit(maxDf), normRound)

  /** Scale-relative twin of [[sparseCosinePairs]]: the df cutoff is
    * `floor(maxDfFrac * corpusSize)` instead of an absolute count. An
    * absolute `maxDf` silently degrades as the corpus grows — a term
    * linking the same FRACTION of documents (the near-dup signal) crosses
    * the fixed cutoff at ~10× scale and the query goes empty (the d09 /
    * SCALING.md sf0.1 finding); a fractional cutoff keeps "discriminative
    * vs stopword" meaning the same thing at every scale. The tradeoff is
    * explicit: per-term candidate work is bounded by (frac·n)², quadratic
    * in corpus size, so frac is the knob that trades recall at scale for
    * join work — at 100 TB you pick frac from the posting-list budget,
    * not from a row count measured at test scale. The cutoff is
    * floor-of-double on the broadcast corpus count, reproduced identically
    * by any IEEE-double engine (same single multiply + floor). */
  def sparseCosinePairsFrac(df: DataFrame, idCol: Column, textCol: Column,
                            threshold: Double, maxDfFrac: Double,
                            normRound: Option[Int] = None): DataFrame = {
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1]: $maxDfFrac")
    sparseCosineImpl(df, idCol, textCol, threshold,
      floor(lit(maxDfFrac) * col("n")).cast("long"), normRound)
  }

  /** Shared core: `cutoff` may reference `n` (the broadcast corpus count)
    * — the df filter therefore sits after the one-row crossJoin, which
    * costs nothing (broadcast of a single row) and lets the absolute and
    * fractional variants share one plan shape. */
  private def sparseCosineImpl(df: DataFrame, idCol: Column, textCol: Column,
                               threshold: Double, cutoff: Column,
                               normRound: Option[Int]): DataFrame = {
    def r(c: Column): Column = normRound match {
      case Some(n) => round(c * pow(lit(10.0), n)) / pow(lit(10.0), n)
      case None => c
    }
    val toks = df.select(idCol.as("id"), explode(tokens(textCol)).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val n = df.agg(count(lit(1)).as("n"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df") >= 2 && col("df") <= cutoff)
    val w = tf.join(dfreq, "term")
      .select(col("id"), col("term"),
        (col("tf") * ((col("n") + lit(1.0)) / (col("df") + lit(1.0)))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    w.count()
    val norms = w.groupBy("id").agg(r(sqrt(sum(col("w") * col("w")))).as("norm"))
    val a = w.select(col("term"), col("id").as("id_a"), col("w").as("wa"))
    val b = w.select(col("term"), col("id").as("id_b"), col("w").as("wb"))
    val dot = a.join(b, Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(sum(col("wa") * col("wb")).as("dot"))
    dot
      .join(norms.select(col("id").as("id_a"), col("norm").as("na")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("norm").as("nb")), "id_b")
      .withColumn("cos", col("dot") / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Mojibake sequences repaired by [[repairText]]: UTF-8 bytes of the
    * common punctuation/accent characters decoded once as Windows-1252
    * (the ftfy top offenders) - each key is the full misdecoded character
    * triplet/pair, so no key is a prefix or substring of another. Plain
    * string literals, not regexes: counting and replacement use exact
    * substring semantics reproducible in any engine. Each stage counts
    * against the previous stage's text (the [[redactPii]] convention), so
    * overlap semantics stay well-defined even if the fix list ever gains
    * overlapping entries. */
  val MojibakeFixes: Seq[(String, String)] = Seq(
    "â€™" -> "'", "â€œ" -> "“", "â€" -> "”",
    "â€“" -> "–", "â€”" -> "—",
    "Ã©" -> "é", "Ã¨" -> "è", "Ã " -> "à", "Ã¼" -> "ü", "Ã¶" -> "ö")

  /** Character-class profile: fractions of alphabetic, digit, whitespace,
    * uppercase, and symbol characters per document — the Gopher/C4-style
    * cheap quality signals (symbol-heavy and shouty documents score out).
    * Every fraction is an exact integer count divided once by the total
    * length, so values are bit-reproducible in any engine without
    * rounding. Counts come from ONE native scan
    * ([[graft.functions.TextScanStats]]) whose fields match the
    * `length(t) - length(regexp_replace(t, re, ""))` formulation
    * bit-for-bit — the regex chain rebuilt the document five times per
    * row and dominated t23 at sf10 (53 s → one compiled pass). Empty
    * documents emit 0.0 across the board. Pure per-row projections — no
    * shuffle. */
  def charClassStats(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val st = col("__st")
    val n = st.getField("n_chars")
    def frac(c: Column): Column =
      when(n > 0, c.cast("double") / n.cast("double")).otherwise(0.0)
    // vanilla-session fallback: the original regex-count struct. A struct
    // of nulls (fallback, null text) and a null struct (native) project
    // identically through getField/when-otherwise below.
    val scanned = textScan(textCol).getOrElse {
      def cnt(re: String) =
        length(textCol) - length(regexp_replace(textCol, re, ""))
      struct(length(textCol).as("n_chars"), cnt("[A-Za-z]").as("alpha"),
        cnt("[0-9]").as("digit"), cnt("\\s").as("space"),
        cnt("[A-Z]").as("upper"), cnt("[^A-Za-z0-9\\s]").as("symbol"))
    }
    df.select(idCol.as("id"), scanned.as("__st"))
      .select(col("id"),
        n.as("n_chars"),
        frac(st.getField("alpha")).as("alpha_frac"),
        frac(st.getField("digit")).as("digit_frac"),
        frac(st.getField("space")).as("space_frac"),
        frac(st.getField("upper")).as("upper_frac"),
        frac(st.getField("symbol")).as("symbol_frac"))
  }

  /** URL regex: scheme://host[/path] without spaces — the Java/RE2 shared
    * dialect, same policy as the PII patterns. */
  val UrlRe = "https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\\s]*)?"

  /** Domain-level URL aggregation: extract every http(s) URL, reduce it to
    * its lowercased host, and aggregate (url occurrences, distinct docs)
    * per domain — the crawl-curation primitive behind domain allow/deny
    * lists, per-domain caps, and source-mix reporting. Extraction and the
    * host projection are per-row regex expressions (Java∩RE2 dialect;
    * lowercasing happens AFTER extraction, where it is a plain column
    * function); the aggregate shuffles one row per URL occurrence with
    * map-side combine. Returns (domain, n_urls, n_docs). */
  def extractDomains(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("id"),
        explode(regexp_extract_all(textCol, lit(UrlRe), lit(0))).as("url"))
      .select(col("id"),
        lower(regexp_extract(col("url"), "https?://([A-Za-z0-9.-]+)", 1)).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"), count_distinct(col("id")).as("n_docs"))

  /** Simpson token diversity: the probability that two random token draws
    * (without replacement) from the document are the same type —
    * `sum tf·(tf−1) / (T·(T−1))` — and its complement as the diversity
    * score. Repeated-token spam scores near 0 diversity; natural prose
    * near 1. Complements [[repetition]] (k-gram duplication): this is the
    * unigram-distribution view, sensitive to concentration even when no
    * k-gram repeats verbatim.
    *
    * Entirely per-row — the token array is sorted and run-length folded
    * with `aggregate`, so the corpus never shuffles and the operator is
    * embarrassingly parallel at any scale. The statistic is one division
    * of exact longs, bit-reproducible cross-engine unrounded. Documents
    * with fewer than 2 tokens have no defined collision probability →
    * null. Returns (id, n_tokens, collision_p, diversity). */
  def tokenDiversity(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    if (graft.functions.Native.has("graft_token_diversity")) {
      // one compiled pass per row ([[graft.functions.TokenDiversity]]):
      // tokenize + hash-count + Σ tf·(tf−1), replacing the interpreted
      // per-element run-length fold below (kept as the vanilla-session
      // fallback; equivalence pinned by TokenDiversitySpec). The repeated
      // getField uses collapse to one evaluation via codegen
      // subexpression elimination.
      val st = call_function("graft_token_diversity", textCol)
      val nTok = st.getField("n_tokens")
      return df.select(idCol.as("id"), nTok.as("n_tokens"),
          when(nTok > 1,
            st.getField("coll").cast("double") / (nTok * (nTok - 1L)))
            .as("collision_p"))
        .withColumn("diversity",
          when(col("collision_p").isNotNull, lit(1.0) - col("collision_p")))
    }
    tokenDiversityFold(df, idCol, textCol)
  }

  /** The pre-r11 sorted run-length-fold formulation of [[tokenDiversity]]
    * — the equivalence reference and the no-extensions fallback. */
  private[graft] def tokenDiversityFold(df: DataFrame, idCol: Column,
                                        textCol: Column): DataFrame = {
    val sorted = array_sort(col("__toks"))
    // run-length fold over the sorted tokens: acc = (prev, run, acc_sum);
    // run == 0 marks "no previous token" (so a leading "" is not confused
    // with the sentinel prev)
    val init = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("s"))
    val folded = aggregate(sorted, init,
      (acc, t) => {
        val run = acc.getField("run")
        val s = acc.getField("s")
        when(run > 0 && t === acc.getField("prev"),
          struct(acc.getField("prev").as("prev"), (run + 1L).as("run"), s.as("s")))
        .otherwise(
          struct(t.as("prev"), lit(1L).as("run"),
            (s + run * (run - 1L)).as("s")))
      },
      acc => acc.getField("s") +
        acc.getField("run") * (acc.getField("run") - 1L))
    df.select(idCol.as("id"), tokens(textCol).as("__toks"))
      .select(col("id"), size(col("__toks")).cast("long").as("n_tokens"),
        folded.as("__coll"))
      .select(col("id"), col("n_tokens"),
        when(col("n_tokens") > 1,
          col("__coll").cast("double")
            / (col("n_tokens") * (col("n_tokens") - 1L))).as("collision_p"))
      .withColumn("diversity",
        when(col("collision_p").isNotNull, lit(1.0) - col("collision_p")))
  }

  /** Natural log of 2 — interpolated verbatim into the oracle twin (the
    * BM25 convention for shared fp constants) so both engines divide by
    * the identical double. */
  val Ln2: Double = math.log(2.0)

  /** Shannon entropy of the per-document CHARACTER distribution, in bits
    * per char — the classic gibberish/binary-junk detector: natural prose
    * sits ~3.5–4.5 bits, single-char spam at 0, uniform random bytes near
    * log2(alphabet). Complements [[tokenDiversity]] (token-level Simpson)
    * with the sub-token view that catches junk *inside* "words".
    *
    * H = (ln n − Σ_c cnt_c·ln cnt_c / n) / ln 2. The per-row counting pass
    * is the native [[graft.functions.CharEntropyStats]] expression — one
    * compiled loop over code points inside WholeStageCodegen, accumulating
    * the ln sum in ascending code point order (= the UTF-8 sort order a
    * run-length fold over `array_sort`ed chars would use; a HOF
    * formulation of exactly that shape ran interpreted per char and was
    * 10× slower, see the expression's scaladoc). The corpus never shuffles
    * and the operator is embarrassingly parallel at any scale. Entropy is
    * emitted unrounded; gate queries round it 6-dp (the t02 convention)
    * because the ln sum is fp-order-sensitive (Spark accumulates in char
    * order, an oracle SUM is order-free) and both engines' ≤1-ulp ln
    * differences vanish at the 1e-6 grid. Single-char docs produce an
    * exact 0.0 in any engine (n·ln(n)/n ≡ ln n); empty docs → null.
    * Returns (id, n_chars, n_distinct_chars, entropy_bits). */
  def charEntropy(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("id"),
        call_function("graft_char_stats", textCol).as("__st"))
      .select(col("id"),
        col("__st.n_chars").as("n_chars"),
        col("__st.n_distinct").as("n_distinct_chars"),
        when(col("__st.n_chars") > 0,
          (log(col("__st.n_chars").cast("double"))
            - col("__st.s") / col("__st.n_chars").cast("double")) / lit(Ln2))
          .as("entropy_bits"))

  /** Domain blocklist labeling: each document's URLs are reduced to hosts
    * (the [[extractDomains]] projection), and a host matches a blocklist
    * entry when it EQUALS the entry or is a subdomain of it
    * (label-aligned suffix). Returns every input id with `blocked_by` =
    * the minimum matching entry (deterministic when several match), null
    * when clean — a filter is `blocked_by IS NULL`.
    *
    * Scale shape: suffix matching is NOT a LIKE-join (which would be a
    * nested-loop over the blocklist). Each host explodes to its ≤ ~6
    * label-aligned suffixes, which equi-join the blocklist on the suffix
    * string — broadcast at any realistic blocklist size, linear in hosts,
    * and the LIKE semantics fall out exactly (asserted against the
    * LIKE-join oracle). */
  def domainBlocklist(df: DataFrame, idCol: Column, textCol: Column,
                      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist")
    val rules = df.sparkSession.createDataFrame(
      blocked.map(b => Tuple1(b.toLowerCase(java.util.Locale.ROOT))))
      .toDF("__rule").distinct()
    val hosts = df
      .select(idCol.as("id"),
        explode(regexp_extract_all(textCol, lit(UrlRe), lit(0))).as("__url"))
      .select(col("id"),
        lower(regexp_extract(col("__url"), "https?://([A-Za-z0-9.-]+)", 1))
          .as("__host"))
      .distinct()
    val labels = split(col("__host"), "\\.")
    val suffixes = transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
    val matched = hosts
      .select(col("id"), explode(suffixes).as("__sfx"))
      .join(broadcast(rules), col("__sfx") === col("__rule"))
      .groupBy("id").agg(min(col("__rule")).as("blocked_by"))
    df.select(idCol.as("id")).join(matched, Seq("id"), "left")
  }

  /** Canonicalize one URL string: (1) strip the fragment, (2) lowercase
    * scheme+host (path/query case is significant and preserved),
    * (3) remove tracking query params (`utm_*`, `fbclid`) wherever they
    * sit in the query string, (4) strip default ports (:80 for http,
    * :443 for https), (5) strip a trailing slash. The step ORDER is part
    * of the contract — the DuckDB twin replays the same sequence (RE2 ∩
    * Java dialect: no lookahead, backreferences only in replacements,
    * where each dialect uses its own syntax). Crawl dedup by URL is only
    * as good as this normalization — "http://Site.COM:80/a?utm_source=x"
    * and "http://site.com/a" are the same fetch. Input is an extracted
    * URL (lowercase scheme, the [[UrlRe]] convention). */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val prefix = lower(regexp_extract(noFrag, "^(https?://[^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^https?://[^/?#]*(.*)$", 1)
    val lowered = concat(prefix, rest)
    // remove every "?p=v"/"&p=v" tracking pair (separator-anchored, so a
    // legit "xutm_a" param never matches), then repair the query head: if
    // the first remaining separator is '&' (the '?' pair was removed),
    // promote it to '?'. Two global replaces handle ANY mix of adjacent
    // tracking params — the single-pass "match includes the next '&'"
    // formulations all skip one of two back-to-back params.
    val noTrack = regexp_replace(lowered,
      "[?&](utm_[A-Za-z0-9_]+|fbclid)=[^&#]*", "")
    val repaired = regexp_replace(noTrack, "^((?:[^?&])*)&", "$1?")
    val noPort80 = regexp_replace(repaired, "^(http://[^/:?#]+):80(/|$|\\?)", "$1$2")
    val noPort = regexp_replace(noPort80, "^(https://[^/:?#]+):443(/|$|\\?)", "$1$2")
    regexp_replace(noPort, "/$", "")
  }

  /** Per-document URL extraction + canonicalization: one row per URL
    * occurrence, (id, url, canon). Pure per-row regex projections, no
    * shuffle; feed the canon column into [[extractDomains]]-style
    * aggregation or exact URL-level dedup. */
  def canonicalizeUrls(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("id"),
        explode(regexp_extract_all(textCol, lit(UrlRe), lit(0))).as("url"))
      .withColumn("canon", canonicalizeUrl(col("url")))

  /** Collocation mining via ratio-PMI: corpus bigram counts vs the
    * independence expectation. Score = P(ab) / (P(a)·P(b)) expressed as
    * (c_ab·N_uni·N_uni) / (N_bi·c_a·c_b) — the ratio form of pointwise
    * mutual information (log-free, the bit-reproducible convention pinned
    * by [[tfidfTopK]]/[[bm25Score]]). High scores = tokens that co-occur
    * far above chance (collocations, named entities, templated phrases);
    * a standard corpus-analysis and tokenizer-prep signal.
    *
    * Plan: one explode for unigram counts, one for adjacent-bigram counts
    * (both hash aggs with map-side combine), two joins of the filtered
    * bigram frame against the unigram counts, 1-row totals broadcast. The
    * `minCount` filter runs BEFORE the joins, so the join input is the
    * interesting-bigram set, not the full bigram domain. The arithmetic is
    * products of exact longs evaluated left-to-right in double — every
    * step a correctly-rounded IEEE op, identical in any engine. */
  def bigramPmi(df: DataFrame, idCol: Column, textCol: Column,
                minCount: Long): DataFrame = {
    val toks = df.select(idCol.as("id"), tokens(textCol).as("__w"))
    val unis = toks.select(explode(col("__w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    unis.count() // eager: totals + two join sides read it (race rule)
    val bis = toks.select(explode(allShinglesOfTokens(col("__w"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab"))
    val nUni = unis.agg(sum(col("c")).as("n_uni"))
    val nBi = bis.agg(sum(col("c_ab")).as("n_bi"))
    def d(c: Column): Column = c.cast("double")
    bis.filter(col("c_ab") >= minCount)
      .withColumn("a", split(col("bg"), " ").getItem(0))
      .withColumn("b", split(col("bg"), " ").getItem(1))
      .join(unis.select(col("t").as("a"), col("c").as("c_a")), "a")
      .join(unis.select(col("t").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .withColumn("pmi_ratio",
        d(col("c_ab")) * d(col("n_uni")) * d(col("n_uni")) /
          (d(col("n_bi")) * d(col("c_a")) * d(col("c_b"))))
      .select("bg", "c_ab", "c_a", "c_b", "pmi_ratio")
  }

  /** Text repair (ftfy/CCNet-style cleanup): strip C0 control characters
    * (keeping tab/newline/CR), fix the common mojibake sequences, collapse
    * whitespace runs, with per-kind counts. Each stage counts against the
    * previous stage's text (the [[redactPii]] overlap convention).
    * Mojibake counting is exact-substring arithmetic -
    * (len(t) - len(replace(t, seq, ''))) / len(seq) - so no regex dialect
    * is involved; the control/whitespace stages use the Java/RE2 shared
    * dialect. Pure per-row projections staged so each replace runs once
    * per row: no shuffle, parquet-speed scan. Returns
    * (id, clean_text, n_ctrl, n_mojibake, n_wsrun). */
  def repairText(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val ctrlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
    val wsRunRe = "\\s{2,}"
    val afterCtrl = df.select(idCol.as("id"), textCol.as("__t0"))
      .select(col("id"),
        regexp_count(col("__t0"), lit(ctrlRe)).as("n_ctrl"),
        regexp_replace(col("__t0"), ctrlRe, "").as("__m0"))
    val afterMoj = MojibakeFixes.zipWithIndex.foldLeft(afterCtrl) {
      case (d, ((seq, fix), i)) => d
        .withColumn(s"__c$i",
          ((length(col(s"__m$i")) - length(replace(col(s"__m$i"), lit(seq), lit(""))))
            / lit(seq.length)).cast("long"))
        .withColumn(s"__m${i + 1}", replace(col(s"__m$i"), lit(seq), lit(fix)))
    }
    val last = col(s"__m${MojibakeFixes.length}")
    val mojTotal = MojibakeFixes.indices.map(i => col(s"__c$i")).reduce(_ + _)
    afterMoj
      .select(col("id"), col("n_ctrl"), mojTotal.as("n_mojibake"), last.as("__t2"))
      .select(col("id"), col("n_ctrl"), col("n_mojibake"),
        regexp_count(col("__t2"), lit(wsRunRe)).as("n_wsrun"),
        trim(regexp_replace(col("__t2"), wsRunRe, " ")).as("clean_text"))
      .select("id", "clean_text", "n_ctrl", "n_mojibake", "n_wsrun")
  }

  /** Bigram language-model quality scoring — the CCNet/KenLM-style
    * perplexity proxy: train add-k-smoothed bigram statistics on a
    * reference corpus, score each document by its mean bigram
    * log-probability (fluent text scores high; gibberish, OCR noise, and
    * wrong-language text score low). The real pipelines use a 5-gram
    * KenLM; the bigram form is the same relational shape with the same
    * filtering power per shuffle byte, and the order generalizes by
    * widening the zip.
    *
    * `P(w|prev) = (c(prev,w) + a) / (c(prev) + a·V)` with V = |train
    * vocabulary|. Counts are exact ints; the probability is one double
    * division of integer-derived doubles (bit-identical anywhere); each
    * bigram's `ln(p)` is quantized to micro units BEFORE summing
    * (`round(ln(p)·1e6)` → int64), so document totals are exact longs —
    * order-independent and oracle-reproducible. The only cross-engine fp
    * surface is libm `ln` (≤ 1 ulp apart), which flips a rounded micro
    * unit only on the measure-zero set of probabilities landing within
    * ~1e-16 relative of a half-micro boundary — the decayedAgg `pow`
    * argument.
    *
    * Plan: ONE pass over the train corpus builds the unigram and bigram
    * count tables (map-combined hash aggregates; bigrams via the shifted
    * `zip_with`, no self-join); scoring explodes each document's bigrams
    * and left-joins the two count tables (vocab-sized — broadcastable in
    * practice, plain equi-joins so AQE decides) plus the broadcast 1-row
    * vocab size. Documents with fewer than 2 tokens come back with zero
    * bigrams and a null mean. Output:
    * (id, n_bigrams, lp_sum_micro, avg_lp_micro). */
  def bigramLmScore(train: DataFrame, trainTextCol: Column,
                    docs: DataFrame, idCol: Column, textCol: Column,
                    a: Double = 1.0): DataFrame = {
    require(a > 0, s"smoothing a must be positive: $a")
    def bigrams(toks: Column): Column = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (x, y) => struct(x.as("p"), y.as("w")))
    val trainToks = train.select(tokens(trainTextCol).as("__tk"))
      .filter(size(col("__tk")) > 0)
    val uni = trainToks.select(explode(col("__tk")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("__c1"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val bi = trainToks.select(explode(bigrams(col("__tk"))).as("__b"))
      .select(col("__b.p").as("p"), col("__b.w").as("w"))
      .groupBy(col("p"), col("w")).agg(count(lit(1)).as("__c2"))
    val docBi = docs.select(idCol.as("id"), tokens(textCol).as("__tk"))
      .select(col("id"), explode(bigrams(col("__tk"))).as("__b"))
      .select(col("id"), col("__b.p").as("p"), col("__b.w").as("w"))
    val scored = docBi
      .join(bi, Seq("p", "w"), "left")
      .join(uni, Seq("p"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        round(log((coalesce(col("__c2"), lit(0L)) + lit(a)) /
            (coalesce(col("__c1"), lit(0L)) + lit(a) * col("__v"))) *
          lit(1.0e6)).cast("long").as("__lp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("lp_sum_micro"))
    // the mean floors through ONE double division (exact inputs < 2^53,
    // identical IEEE op + floor on both engines) — NOT integer `div`:
    // Spark's div truncates toward zero while DuckDB's // floors, and
    // log-prob sums are negative, so the two would differ by one micro
    docs.select(idCol.as("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lp_sum_micro"), lit(0L)).as("lp_sum_micro"),
        when(col("n_bigrams").isNotNull,
          floor(col("lp_sum_micro").cast("double") / col("n_bigrams"))
            .cast("long")).as("avg_lp_micro"))
  }

  /** Symbol-sequence delimiters for BPE training: each symbol is stored as
    * `\u0001 sym \u0002` inside one encoded string, and `\u0003` is the
    * end-of-word marker symbol. The encoding exists so a merge application
    * is ONE literal string `replace`: the pattern `\u0001 L \u0002 \u0001 R \u0002`
    * can only match a complete adjacent symbol pair (delimiters make
    * partial-symbol matches impossible), and literal replace scans
    * left-to-right non-overlapping — exactly BPE's greedy application
    * order, on any engine. Words containing the three control chars are
    * dropped up front (a deterministic rule both engines replay; real text
    * containing \u0001-\u0003 is corruption by definition). */
  private val BpeD1 = "\u0001"
  private val BpeD2 = "\u0002"
  private val BpeEow = "\u0003"

  /** Distributed BPE merge training — the tokenizer-training algorithm
    * (Sennrich et al. 2016) on the word-frequency table: per round, count
    * adjacent symbol pairs weighted by word frequency, adopt the most
    * frequent pair (ties broken lexicographically — fully deterministic),
    * and fuse every occurrence greedily left-to-right.
    *
    * The scale shape is the point: the corpus is scanned ONCE (word
    * counting — a map-combined hash aggregate); every training round then
    * runs over the distinct-WORD table, whose size is the vocabulary, not
    * the corpus — at 100 TB the rounds cost the same as at 100 GB. Each
    * round is one explode+aggregate (pair counts; symbol pairs come from a
    * per-row `zip_with` of the shifted symbol array — no self-join) plus a
    * 1-row driver collect (the argmax, bounded like the PageRank
    * convergence scalar) plus one codegen'd `replace` projection, with an
    * eager localCheckpoint truncating the round-over-round plan exactly
    * like the PageRank rounds (superseded checkpoint blocks are dropped by
    * the caller's between-queries cleanup; the frame is vocab-sized).
    *
    * Merging stops early when no pair reaches `minPairFreq`. Symbols are
    * UTF-16 code units via the `(.)` per-char wrap — BMP-safe; a
    * supplementary-plane corpus would need a codepoint-aware splitter.
    * Returns the ordered merge table (rank, left, right, pair_freq) — the
    * artifact a tokenizer ships. Apply it with [[applyBpeMerges]]. */
  def trainBpeMerges(docs: DataFrame, textCol: Column, numMerges: Int,
                     minPairFreq: Long = 2L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = bpeWordTable(docs, textCol).localCheckpoint(true)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val best = bpePairCounts(cur)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minPairFreq) done = true
      else {
        val (l, rr, cnt) =
          (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += ((r, l, rr, cnt))
        cur = cur.select(
          replace(col("seq"), lit(BpeD1 + l + BpeD2 + BpeD1 + rr + BpeD2),
            lit(BpeD1 + l + rr + BpeD2)).as("seq"),
          col("freq")).localCheckpoint(true)
        r += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_freq")
  }

  /** (seq, freq): the encoded word-frequency table BPE trains on. */
  private def bpeWordTable(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(tokens(textCol)).as("w"))
      .filter(length(col("w")) > 0 &&
        !col("w").contains(BpeD1) && !col("w").contains(BpeD2) &&
        !col("w").contains(BpeEow))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(
        concat(regexp_replace(col("w"), "(.)", BpeD1 + "$1" + BpeD2),
          lit(BpeD1 + BpeEow + BpeD2)).as("seq"),
        col("freq"))

  /** Adjacent-pair frequencies (l, r, cnt) over an encoded word table. */
  private def bpePairCounts(words: DataFrame): DataFrame = {
    val syms = transform(
      filter(split(col("seq"), BpeD1), s => s =!= lit("")),
      s => rtrim(s, BpeD2))
    words
      .select(col("freq"), syms.as("__sy"))
      .select(col("freq"), explode(zip_with(
        slice(col("__sy"), lit(1), size(col("__sy")) - 1),
        slice(col("__sy"), lit(2), size(col("__sy")) - 1),
        (x, y) => struct(x.as("l"), y.as("r")))).as("__p"))
      .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Vocabulary emission for a trained merge table — the artifact that
    * turns [[trainBpeMerges]] into a usable tokenizer: base tokens are the
    * corpus's distinct characters plus the end-of-word marker, id'd
    * 0..B−1 in binary string order; each merge product `left||right` gets
    * id `B + rank − 1`. (Two different merges CAN produce the same string
    * — (a,bc) and (ab,c) both yield "abc"; both rows are kept, as in the
    * merge table itself.) The char set is alphabet-sized, so the global
    * rank window's single partition is bounded by the alphabet, not the
    * corpus — the one place a global window is the right plan. Output:
    * (token_id, token). */
  def bpeVocab(docs: DataFrame, textCol: Column,
               merges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val chars = docs.select(explode(tokens(textCol)).as("w"))
      .filter(length(col("w")) > 0 &&
        !col("w").contains(BpeD1) && !col("w").contains(BpeD2) &&
        !col("w").contains(BpeEow))
      .select(explode(split(col("w"), "")).as("token"))
      .filter(length(col("token")) > 0)
      .unionByName(Seq(BpeEow).toDF("token"))
      .distinct()
    val base = chars.withColumn("token_id",
      row_number().over(Window.orderBy(col("token"))).cast("long") - 1)
    val baseCount = base.agg(count(lit(1)).as("__n"))
    base.select(col("token_id"), col("token"))
      .unionByName(merges.crossJoin(broadcast(baseCount))
        .select((col("__n") + col("rank") - 1).as("token_id"),
          concat(col("left"), col("right")).as("token")))
  }

  /** Tokenize with a learned merge table: apply the merges in rank order.
    * The corpus is NOT rewritten per merge — tokenization runs on the
    * distinct-word table (vocab-sized) as a chain of codegen'd `replace`
    * projections (checkpoint-truncated every `checkpointEvery` merges so
    * the expression tree stays bounded), and the corpus gets its token
    * arrays back through one word-keyed join (broadcast-friendly: the
    * tokenized vocab is small). Output: one row per (id, word position)
    * with the word's BPE token array — downstream packing/counting
    * flattens or aggregates as needed. */
  def applyBpeMerges(docs: DataFrame, idCol: Column, textCol: Column,
                     merges: Seq[(String, String)],
                     checkpointEvery: Int = 64): DataFrame = {
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1")
    val positioned = docs.select(idCol.as("id"),
        posexplode(tokens(textCol)).as(Seq("word_pos", "w")))
      .filter(length(col("w")) > 0 &&
        !col("w").contains(BpeD1) && !col("w").contains(BpeD2) &&
        !col("w").contains(BpeEow))
    var vocab = positioned.select(col("w")).distinct()
      .withColumn("seq",
        concat(regexp_replace(col("w"), "(.)", BpeD1 + "$1" + BpeD2),
          lit(BpeD1 + BpeEow + BpeD2)))
    merges.grouped(checkpointEvery).foreach { group =>
      val applied = group.foldLeft(col("seq")) { case (c, (l, r)) =>
        replace(c, lit(BpeD1 + l + BpeD2 + BpeD1 + r + BpeD2),
          lit(BpeD1 + l + r + BpeD2))
      }
      vocab = vocab.select(col("w"), applied.as("seq")).localCheckpoint(true)
    }
    val tokenized = vocab.select(col("w"),
      transform(
        filter(split(col("seq"), BpeD1), s => s =!= lit("")),
        s => rtrim(s, BpeD2)).as("bpe_tokens"))
    positioned.join(tokenized, "w")
      .select(col("id"), col("word_pos"), col("w").as("word"),
        col("bpe_tokens"))
  }

  /** Token-frequency spectrum — the corpus-health diagnostic behind Zipf
    * plots, hapax ratios, and tokenizer-vocab sizing: for each occurrence
    * count f, how many distinct token types occur exactly f times, and
    * what share of the corpus's token mass those types carry. The f=1 row
    * is the hapax count (the OOV-pressure signal); the cumulative column
    * answers "what fraction of tokens do types seen ≥ f times cover" —
    * the head/tail split that sizes a vocabulary.
    *
    * Scale shape: two map-combined hash aggregates (corpus → per-type
    * counts → frequency-of-frequency), then windows over the SPECTRUM
    * frame only. |spectrum| = distinct occurrence counts, which is
    * O(√total_tokens) by the partition-number bound (k distinct counts
    * need ≥ k(k+1)/2 tokens) — ~1.4M rows even at 10¹² tokens, so the
    * unpartitioned cumulative window is bounded by arithmetic, not by
    * corpus size (same argument as the E90 quality-grid window).
    *
    * All-integer outputs on the exact ppm grid (`x·1e6 div T` — staged
    * int64 division; cum·1e6 ≤ 10¹⁸ at a trillion tokens, no overflow).
    * Output, ordered by f desc: (f, n_types, token_ppm, cum_types,
    * cum_token_ppm) where cum_* accumulate from the most-frequent row
    * down — cum_token_ppm at row f = share of tokens covered by types
    * with frequency ≥ f (reaches 1e6 at f=1). */
  def tokenFrequencySpectrum(df: DataFrame, textCol: Column): DataFrame = {
    val tf = df.select(explode(tokens(textCol)).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("f"))
    val spec = tf.groupBy(col("f")).agg(count(lit(1)).as("n_types"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("f").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    spec
      .withColumn("__mass", col("f") * col("n_types"))
      .withColumn("__total", sum(col("__mass")).over(wAll))
      .withColumn("__cum_mass", sum(col("__mass")).over(wCum))
      .select(col("f"), col("n_types"),
        expr("__mass * 1000000 div __total").as("token_ppm"),
        sum(col("n_types")).over(wCum).as("cum_types"),
        expr("__cum_mass * 1000000 div __total").as("cum_token_ppm"))
  }
}
