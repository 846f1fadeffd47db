package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Training-data curation operators: deterministic stratified sampling,
  * per-stratum quality-quantile filtering, fixed-size token chunking
  * (sequence-packing prep), stopword stripping. All pure built-in `Column`
  * composition — codegen'd, shuffle-free where possible, and every decision
  * is reproducible bit-for-bit by an external engine (sampling rides on the
  * portable [[Hashing.hash60]], not Spark's `rand()`).
  *
  * These extend the reference surface — see SURVEY.md §2E.
  */
object CurationOps {

  /** Resolution of the sampling hash bucket: rates are effectively
    * quantized to 1e-6. */
  private val SampleBuckets = 1000000L

  /** Deterministic stratified sampling: keep a row iff
    * `hash60("sample_" || id) mod 1e6  <  rate(stratum) * 1e6`.
    *
    * Unlike `DataFrame.sample`/`rand()`, membership is a pure function of
    * the row id — re-runs, retries, and other engines (the DuckDB oracle)
    * select the identical subset, and upstream/downstream joins on the
    * sample are stable. Per-stratum rates are the standard curation knob
    * (e.g. downsample English, keep all low-resource languages). A plain
    * codegen'd filter: no shuffle, no state, scans at parquet speed. */
  def stratifiedHashSample(df: DataFrame, idCol: Column, strataCol: Column,
                           rates: Map[String, Double],
                           defaultRate: Double): DataFrame = {
    val bucket = pmod(
      Hashing.hash60(concat(lit("sample_"), idCol.cast("string"))),
      lit(SampleBuckets))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(strataCol === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket < (rate * lit(SampleBuckets.toDouble)))
  }

  /** Keep the top-`q` share of rows per stratum by `score` (descending,
    * ties broken by `idCol` so the kept set is deterministic): a row
    * survives iff its rank ≤ ceil(q * stratum size).
    *
    * `exact = true` ranks with one `row_number` window — one shuffle on the
    * stratum plus a per-stratum sort; this is the oracle-checkable path.
    * The production path (`exact = false`) never sorts a stratum: it
    * computes an approximate per-stratum score threshold with the mergeable
    * `percentile_approx` sketch (map-side combinable) and broadcast-joins
    * the tiny threshold table back — linear scan, no skew-prone sort, the
    * plan that survives a billion-row English stratum. Both paths emit the
    * same (id, stratum, score) schema.
    *
    * `accuracy` is the approx path's precision/memory knob (per Spark's
    * percentile_approx contract: rank error ≤ n/accuracy, sketch memory
    * grows ~linearly with accuracy). The default 10000 bounds the kept-set
    * rank drift to 0.01% of each stratum; CurationSpec pins the
    * approx-vs-exact threshold band as a function of this parameter. */
  def qualityTopQuantile(df: DataFrame, idCol: Column, strataCol: Column,
                         score: Column, q: Double,
                         exact: Boolean = true,
                         accuracy: Int = 10000): DataFrame = {
    val scored = df.select(idCol.as("id"), strataCol.as("stratum"),
      score.as("score"))
    if (exact) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("stratum"))
        .orderBy(col("score").desc, col("id").asc)
      scored
        .withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("stratum"))))
        .filter(col("__rn") <= ceil(col("__n") * lit(q)))
        .drop("__rn", "__n")
    } else {
      val thresholds = scored.groupBy(col("stratum").as("__s"))
        .agg(percentile_approx(col("score"), lit(1.0 - q), lit(accuracy))
          .as("__thresh"))
      // null-safe join: a null stratum is a legitimate group (the exact
      // path's window treats it as one partition); a plain equi-join would
      // silently drop those rows and the two paths would disagree
      scored.join(broadcast(thresholds), col("stratum") <=> col("__s"))
        .filter(col("score") >= col("__thresh"))
        .drop("__s", "__thresh")
    }
  }

  /** Per-stratum winsorization: clamp `valueCol` into the stratum's
    * [qLo, qHi] quantile band — the outlier-robust normalization used on
    * heavy-tailed quality/engagement signals before they feed sampling
    * weights. The quantile is defined EXPLICITLY (not engine-dependent):
    * the value at 1-based rank `floor(q·(n−1)) + 1` in the (value, id)
    * total order of the stratum — deterministic under ties, reproducible
    * by any engine with row_number.
    *
    * `exact = true` ranks with one window (shuffle + per-stratum sort) and
    * reduces the band to a stratum-count-sized threshold table — the
    * oracle path. The production path (`exact = false`) replaces the sort
    * with the mergeable `percentile_approx` sketch, same plan shape as
    * [[qualityTopQuantile]]: linear scan, broadcast thresholds, no
    * skew-prone sort. Both emit (id, stratum, value, lo, hi, v_wins);
    * the clamp only ever outputs input values, so results hash-compare
    * unrounded. Null values pass through unclamped (null stratum is a
    * legitimate group, handled null-safe like qualityTopQuantile).
    * `accuracy` = the approx path's rank-error/memory knob, same contract
    * as [[qualityTopQuantile]] (rank error ≤ n/accuracy). */
  def winsorize(df: DataFrame, idCol: Column, strataCol: Column,
                valueCol: Column, qLo: Double, qHi: Double,
                exact: Boolean = true,
                accuracy: Int = 10000): DataFrame = {
    require(0.0 <= qLo && qLo < qHi && qHi <= 1.0,
      s"need 0 <= qLo < qHi <= 1: ($qLo, $qHi)")
    val base = df.select(idCol.as("id"), strataCol.as("stratum"),
      valueCol.as("value"))
    // thresholds rank NON-NULL values only: nulls sort first in the window
    // and would shift every rank (and become the lo threshold themselves)
    val nonNull = base.filter(col("value").isNotNull)
    val thresholds = if (exact) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("stratum"))
        .orderBy(col("value").asc, col("id").asc)
      def kOf(q: Double) =
        (floor((col("__n") - 1) * lit(q)) + 1).cast("long")
      nonNull
        .withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__n",
          count(lit(1)).over(Window.partitionBy(col("stratum"))))
        .groupBy(col("stratum").as("__s"))
        .agg(max(when(col("__rn") === kOf(qLo), col("value"))).as("lo"),
          max(when(col("__rn") === kOf(qHi), col("value"))).as("hi"))
    } else {
      nonNull.groupBy(col("stratum").as("__s"))
        .agg(percentile_approx(col("value"), lit(qLo), lit(accuracy)).as("lo"),
          percentile_approx(col("value"), lit(qHi), lit(accuracy)).as("hi"))
    }
    // left join: an all-null stratum has no threshold row at all. The null
    // guard on v_wins is load-bearing — Spark's greatest/least SKIP nulls,
    // so an unguarded clamp would coerce a null value to lo, not keep it
    // null (verified in CurationSpec).
    base.join(broadcast(thresholds), col("stratum") <=> col("__s"), "left")
      .withColumn("v_wins",
        when(col("value").isNotNull,
          least(greatest(col("value"), col("lo")), col("hi"))))
      .select("id", "stratum", "value", "lo", "hi", "v_wins")
  }

  /** Fixed-size token chunking for sequence packing: split each document
    * into consecutive `chunkTokens`-token chunks (last chunk ragged).
    * Output: (id, chunk_id, chunk_text, n_tokens).
    *
    * The token array is materialized in its own projection BEFORE the
    * explode — Spark re-evaluates non-trivial HOF/explode arguments per
    * output row, so splitting inline would re-tokenize the document once
    * per chunk. A narrow explode, no shuffle; at 100 TB this is the
    * pre-tokenizer pass that feeds packing, and it scans at parquet
    * speed. */
  def chunkDocuments(df: DataFrame, idCol: Column, textCol: Column,
                     chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    df.select(idCol.as("id"), TextOps.tokens(textCol).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      // ceil(n/k) chunks, ragged tail: sequence is inclusive on both ends
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          floor((col("__n") - lit(1)) / lit(chunkTokens)).cast("long"))))
      .select(col("id"), col("chunk_id"),
        concat_ws(" ",
          slice(col("__toks"), (col("chunk_id") * chunkTokens + 1).cast("int"),
            lit(chunkTokens))).as("chunk_text"),
        size(slice(col("__toks"), (col("chunk_id") * chunkTokens + 1).cast("int"),
          lit(chunkTokens))).as("n_tokens"))
  }

  /** Sequence packing (training-batch prep): a pack CLOSES when the
    * cumulative token count crosses `budgetTokens`; the crossing chunk
    * stays in the pack it started in (chunks are never split), so pack
    * totals overhang the budget by AT MOST ONE CHUNK — the invariant is
    * `pack ≤ budgetTokens + chunkTokens − 1`, not `≤ budgetTokens`
    * (pinned in CurationSpec/PackingPipelineSpec, and measured TIGHT at
    * sf10 by the PackingSweep). Packing is greedy over the
    * deterministic (id, chunk_id) order WITHIN a hash-assigned shard:
    * a single global order would mean one partition doing all the work, so
    * the cumulative-sum window partitions by `nShards` portable-hash shards
    * — each shard packs independently and in parallel, which is exactly how
    * a 100 TB corpus is packed in practice (pack ids are (shard, pack_id)
    * pairs). One shuffle (the window), no iteration. Deterministic and
    * engine-portable: shard = hash60 mod nShards, cumsum over unique sort
    * keys. */
  def packChunks(chunks: DataFrame, idCol: Column, chunkIdCol: Column,
                 nTokensCol: Column, budgetTokens: Int, nShards: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    require(nShards > 0, s"nShards must be positive: $nShards")
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(Hashing.hash60(concat(lit("pack_"), idCol.cast("string"))),
      lit(nShards)).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(idCol, chunkIdCol)
    chunks
      .withColumn("shard", shard)
      .withColumn("__cum", sum(nTokensCol).over(w))
      // tokens BEFORE this chunk decide its pack: floor(preceding / budget)
      .withColumn("pack_id",
        floor((col("__cum") - nTokensCol) / lit(budgetTokens.toDouble)).cast("long"))
      .drop("__cum")
  }

  /** Strip stopword tokens from the text, reporting how many were removed:
    * (id, clean_text, n_removed). The token array is materialized once (see
    * [[chunkDocuments]] on HOF argument re-evaluation); the filter lambda is
    * an `array_contains` against a literal array — fully codegen'd, no
    * shuffle. */
  def stripStopwords(df: DataFrame, idCol: Column, textCol: Column,
                     stopwords: Seq[String] = TextOps.DefaultStopwords): DataFrame = {
    val sw = array(stopwords.map(lit): _*)
    df.select(idCol.as("id"), TextOps.tokens(textCol).as("__toks"))
      .withColumn("__kept", filter(col("__toks"), t => !array_contains(sw, t)))
      .select(col("id"),
        concat_ws(" ", col("__kept")).as("clean_text"),
        (size(col("__toks")) - size(col("__kept"))).as("n_removed"))
  }

  /** Data-mixture planning + application: hit a target token budget with a
    * target share per stratum (the domain/language mixing step of a
    * pretraining pipeline). Per stratum,
    * `rate = min(1, share × budgetTokens / stratumTokens)` — a stratum with
    * fewer tokens than its allotment keeps everything (rate clamps at 1;
    * the shortfall is reported, not silently redistributed) — then rows are
    * kept by the same deterministic hash-bucket rule as
    * [[stratifiedHashSample]], so the selected subset is reproducible by
    * any engine and stable across retries.
    *
    * Plan: ONE aggregate over the stratum domain (tiny — map-side combine
    * does the work), the rate table broadcast back, and a codegen'd filter.
    * The fact table scans once and never shuffles. Rates are single
    * correctly-rounded IEEE ops on exact integer totals, so the kept set is
    * bit-reproducible cross-engine. Returns the kept rows as
    * (id, stratum, n_tokens, stratum_tokens, rate — unrounded). */
  def mixtureSample(df: DataFrame, idCol: Column, strataCol: Column,
                    tokensCol: Column, shares: Map[String, Double],
                    defaultShare: Double, budgetTokens: Long): DataFrame = {
    val rows = df.select(idCol.as("id"), strataCol.as("stratum"),
      tokensCol.as("n_tokens"))
    val share = shares.foldLeft(lit(defaultShare)) { case (acc, (k, v)) =>
      when(col("stratum") === k, lit(v)).otherwise(acc)
    }
    val totals = rows.groupBy("stratum")
      .agg(sum(col("n_tokens").cast("long")).as("stratum_tokens"))
      .withColumn("rate", least(lit(1.0),
        share * lit(budgetTokens.toDouble) / col("stratum_tokens").cast("double")))
    val bucket = pmod(
      Hashing.hash60(concat(lit("mix_"), col("id").cast("string"))),
      lit(SampleBuckets))
    rows.join(broadcast(totals), "stratum")
      .filter(bucket < col("rate") * lit(SampleBuckets.toDouble))
      .select("id", "stratum", "n_tokens", "stratum_tokens", "rate")
  }

  /** Exactly-N-per-stratum deterministic sample: the N rows with the
    * SMALLEST sampling hashes in each stratum. Where [[stratifiedHashSample]]
    * keeps an expected fraction, this keeps a guaranteed count (the "10k
    * docs per language" curation ask) — still a pure function of the ids,
    * so re-runs and other engines select the identical rows, and growing
    * the corpus only ever swaps rows in/out by hash order (no reshuffle of
    * the kept set's identity rule). One shuffle on the stratum; Spark 4
    * plans the rank filter as WindowGroupLimit, so each map task forwards
    * at most N rows per stratum before the exchange — the sort never sees
    * the full stratum. */
  def stratifiedTopN(df: DataFrame, idCol: Column, strataCol: Column,
                     n: Int): DataFrame = {
    require(n > 0, s"stratifiedTopN: n must be positive: $n")
    val h = Hashing.hash60(concat(lit("topn_"), idCol.cast("string")))
    df.withColumn("__h", h)
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(strataCol).orderBy(col("__h"), idCol)))
      .filter(col("__rk") <= n)
      .drop("__h", "__rk")
  }

  /** Weighted sampling WITHOUT replacement, exactly k rows per stratum,
    * inclusion probability proportional to `weightCol` — the data-mixing
    * primitive behind "sample 10k docs per source, preferring high
    * quality". Efraimidis–Spirakis A-ES: every row gets sampling key
    * `u^(1/w)` with `u` uniform in (0, 1]; the k largest keys per stratum
    * ARE a weighted sample without replacement. `u` is hash-derived from
    * the id (`(hash60 + 1) / 2^60`), not `rand()` — re-runs, retries, and
    * other engines draw the IDENTICAL sample (the [[stratifiedTopN]]
    * determinism contract, weighted).
    *
    * Same plan shape as [[stratifiedTopN]]: one shuffle on the stratum,
    * rank filter planned as WindowGroupLimit so each map task forwards at
    * most k rows per stratum before the exchange. Cross-engine fp note:
    * the key involves one `pow` per row; a ≤1-ulp pow difference can only
    * flip a rank if two keys agree to ~1e-16 relative, while hash-derived
    * `u` gaps keep keys ~1e-6 apart at gate scale — and ties break by id
    * regardless. Rows with null or non-positive weight are excluded (no
    * defined inclusion probability). Returns the input columns plus
    * `samp_rank` (1..k within each stratum, descending key order). */
  def weightedSample(df: DataFrame, idCol: Column, strataCol: Column,
                     weightCol: Column, k: Int): DataFrame = {
    require(k > 0, s"weightedSample: k must be positive: $k")
    val u = (Hashing.hash60(concat(lit("ws_"), idCol.cast("string")))
      .cast("double") + lit(1.0)) / lit(1152921504606846976.0) // 2^60
    val key = pow(u, lit(1.0) / weightCol.cast("double"))
    df.filter(weightCol.isNotNull && weightCol.cast("double") > 0)
      .withColumn("__sk", key)
      .withColumn("samp_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(strataCol).orderBy(col("__sk").desc, idCol)))
      .filter(col("samp_rank") <= k)
      .drop("__sk")
  }

  /** Deterministic dataset split: each row lands in exactly one named
    * split, by hash bucket — `weights` (name → fraction, summing to 1;
    * the last split absorbs rounding remainder) become cumulative bucket
    * thresholds. Disjoint and exhaustive BY CONSTRUCTION (one bucket, one
    * CASE), reproducible by any engine, stable under re-runs and retries —
    * the properties a train/val/test split must have before anything
    * downstream is trustworthy. Pure codegen'd projection, no shuffle. */
  def hashSplit(df: DataFrame, idCol: Column,
                weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty, "hashSplit: no splits given")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"hashSplit: weights must sum to 1: $weights")
    val bucket = pmod(
      Hashing.hash60(concat(lit("split_"), idCol.cast("string"))),
      lit(SampleBuckets))
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val assign = weights.init.zip(bounds.init).foldLeft(
      when(lit(false), lit(null).cast("string"))) {
      case (acc, ((name, _), cum)) =>
        acc.when(bucket < lit(cum * SampleBuckets), name)
    }.otherwise(weights.last._1)
    df.withColumn("split", assign)
  }

  /** Token-budget corpus selection: the docs a greedy pass in
    * (quality desc, id asc) order admits while the running token total
    * stays ≤ `budget` — the "best data that fits the training budget"
    * primitive (prefix rule: a doc is in iff the cumulative tokens
    * through it, in that order, is ≤ budget).
    *
    * `qMicroCol` is the quality score pre-quantized to an integer grid
    * (e.g. `round(q·10⁶)` — the caller owns the grid, matching the gate's
    * 6-dp rounding convention), which is what makes the selection
    * bit-reproducible AND gives the scale plan its bucket key.
    *
    * Scale shape — the global greedy NEVER sorts the corpus: per-quality
    * token sums aggregate map-side to a ≤ grid-size frame (≤ 10⁶+1 rows
    * for a [0,1] score at 6 dp); the running bucket totals are a window
    * over THAT tiny frame, and the single budget-crossing bucket (the
    * cum/before columns are monotone, so it is unique) resolves to a
    * driver-side scalar — the same documented tiny-frame action as
    * PageRank's node count. Admission is then a plain quality-threshold
    * filter (`q > boundary` — no join, no ordering), and ONLY the
    * boundary bucket's rows pay a per-row running sum (partitioned on
    * that one quality value, ordered by id). The narrow (id, q, tokens)
    * projection is persisted: the bucket aggregate materializes it alone
    * (single consumer — the lazy-persist rule), and the two filter
    * branches then read the cache instead of re-evaluating the quality
    * expression over the corpus. A corpus where billions of docs share
    * the boundary quality value degenerates that one window partition —
    * sharpen the grid (more dp) rather than salt: the order inside a
    * quality tie is id-deterministic and must stay so. */
  def tokenBudgetSelect(df: DataFrame, idCol: Column, qMicroCol: Column,
                        tokCol: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val rows = df.select(idCol.as("id"), qMicroCol.cast("long").as("q_micro"),
        tokCol.cast("long").as("n_tokens"))
      .filter(col("id").isNotNull && col("q_micro").isNotNull &&
        col("n_tokens").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wq = org.apache.spark.sql.expressions.Window
      .orderBy(col("q_micro").desc)
    // ≤ 1 row: the unique bucket whose preceding total fits the budget
    // (<= not <: zero-token docs exactly AT the budget still qualify)
    // but whose own total crosses it
    val boundary = rows.groupBy("q_micro").agg(sum(col("n_tokens")).as("__btoks"))
      .withColumn("__cum", sum(col("__btoks")).over(wq))
      .withColumn("__before", col("__cum") - col("__btoks"))
      .filter(col("__before") <= budget && col("__cum") > budget)
      .select(col("q_micro"), col("__before"))
      .collect().headOption.map(r => (r.getLong(0), r.getLong(1)))
    boundary match {
      case None => // nothing crosses: the whole (non-null) corpus fits
        rows
      case Some((bq, before)) =>
        val full = rows.filter(col("q_micro") > bq)
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_micro")).orderBy(col("id").asc)
        val bdry = rows.filter(col("q_micro") === bq)
          .withColumn("__run", lit(before) + sum(col("n_tokens")).over(wb))
          .filter(col("__run") <= budget)
          .select(col("id"), col("q_micro"), col("n_tokens"))
        full.unionByName(bdry)
    }
  }

  /** Per-stratum token budgets — the data-mixing spec "this many tokens
    * of each source/language, best quality first": [[tokenBudgetSelect]]'s
    * greedy prefix rule applied independently inside every budgeted
    * stratum. Strata absent from `budgets` are excluded entirely (an
    * unbudgeted source contributes zero tokens — the mixture IS the
    * budget list).
    *
    * Same scale shape as the single-budget form, vectorized over strata:
    * ONE (stratum, quality)-bucket aggregate, running totals windowed
    * per stratum over the tiny bucket frame, and ≤ one crossing row per
    * stratum collected driver-side (crossings are a ≤ |strata|-row
    * scalar set, the PageRank-n convention). Admission compiles to a
    * literal predicate per stratum (threshold filter — no join), and
    * only the |strata| boundary buckets pay a per-row running sum. */
  def tokenBudgetMixture(df: DataFrame, idCol: Column, strataCol: Column,
                         qMicroCol: Column, tokCol: Column,
                         budgets: Seq[(String, Long)]): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetMixture: no budgets given")
    require(budgets.map(_._1).distinct.size == budgets.size,
      s"tokenBudgetMixture: duplicate strata in $budgets")
    require(budgets.forall(_._2 >= 0),
      s"tokenBudgetMixture: negative budget in $budgets")
    val rows = df.select(idCol.as("id"), strataCol.cast("string").as("stratum"),
        qMicroCol.cast("long").as("q_micro"), tokCol.cast("long").as("n_tokens"))
      .filter(col("id").isNotNull && col("q_micro").isNotNull &&
        col("n_tokens").isNotNull)
      .filter(col("stratum").isin(budgets.map(_._1): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bmap = budgets.toMap
    val budgetOf = budgets.tail.foldLeft(
      when(col("stratum") === budgets.head._1, lit(budgets.head._2))) {
      case (acc, (s, b)) => acc.when(col("stratum") === s, lit(b))
    }
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("q_micro").desc)
    // ≤ one crossing row per stratum (monotone cum/before within stratum)
    val crossings = rows.groupBy("stratum", "q_micro")
      .agg(sum(col("n_tokens")).as("__btoks"))
      .withColumn("__cum", sum(col("__btoks")).over(wq))
      .withColumn("__before", col("__cum") - col("__btoks"))
      .withColumn("__budget", budgetOf)
      .filter(col("__before") <= col("__budget") &&
        col("__cum") > col("__budget"))
      .select(col("stratum"), col("q_micro"), col("__before"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fullPred = budgets.map(_._1).map { s =>
      crossings.get(s) match {
        case None           => col("stratum") === s // stratum fits whole
        case Some((bq, _))  => col("stratum") === s && col("q_micro") > bq
      }
    }.reduce(_ || _)
    val full = rows.filter(fullPred)
    if (crossings.isEmpty) full
    else {
      val cs = crossings.toSeq
      val bdryPred = cs.map { case (s, (bq, _)) =>
        col("stratum") === s && col("q_micro") === bq
      }.reduce(_ || _)
      val remainOf = cs.tail.foldLeft(
        when(col("stratum") === cs.head._1, lit(bmap(cs.head._1) - cs.head._2._2))) {
        case (acc, (s, (_, before))) =>
          acc.when(col("stratum") === s, lit(bmap(s) - before))
      }
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("stratum"), col("q_micro")).orderBy(col("id").asc)
      val bdry = rows.filter(bdryPred)
        .withColumn("__run", sum(col("n_tokens")).over(wb))
        .filter(col("__run") <= remainOf)
        .select(col("id"), col("stratum"), col("q_micro"), col("n_tokens"))
      full.unionByName(bdry)
    }
  }

  /** Exact-count stratified split — the eval-set assignment [[hashSplit]]
    * can't give: per stratum, EXACTLY `floor(n_s·w_k)` rows land in each
    * split (hashSplit's per-row bucket test is proportional only in
    * expectation — a 500-doc stratum with a 1% eval weight can draw 0 or
    * 11 eval docs; an exact split draws 5, every time). Assignment is a
    * pure function of (salt, id): rows are ordered per stratum by
    * `hash60(salt_id)` (ties by id) and the first `floor(n_s·cum_1)`
    * ranks are split 1, the next `floor(n_s·cum_2) − floor(n_s·cum_1)`
    * split 2, … — deterministic, reproducible, and stable under
    * partitioning.
    *
    * Scale shape — NO per-stratum global sort window (WindowExec buffers
    * each key group, and strata are few-and-huge by nature — the E93
    * hot-key lesson): the global per-stratum rank is assembled from the
    * hash's own bucket structure. `__b` = the hash's top bits (so
    * bucket-major order IS hash order — the [[negativeSample]] dense-index
    * argument); per-(stratum, bucket) counts prefix-sum into offsets with
    * a window over the COUNTS frame (≤ `buckets` rows per stratum group),
    * and each row pays a row_number only within its (stratum, bucket)
    * group — n_s/buckets rows, another 2^k of `buckets` away if a stratum
    * grows. Offsets and stratum sizes are strata×buckets / strata-sized
    * frames, broadcast back. Split boundaries are exact int64 staged
    * divisions (`n_s·cum_ppm div 1e6`) — no fp anywhere.
    *
    * `weights` are ppm and must sum to exactly 1,000,000.
    * Output: (id, stratum, split). */
  def exactSplit(df: DataFrame, idCol: Column, strataCol: Column,
                 weights: Seq[(String, Long)], salt: String = "xsplit",
                 buckets: Int = 1024): DataFrame = {
    require(weights.nonEmpty, "exactSplit: no splits given")
    require(weights.map(_._2).sum == 1000000L,
      s"exactSplit: ppm weights must sum to 1000000: $weights")
    require(weights.forall(_._2 >= 0), s"exactSplit: negative weight: $weights")
    require(buckets >= 1 && (buckets & (buckets - 1)) == 0,
      s"exactSplit: buckets must be a power of two: $buckets")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val base = df.select(idCol.as("id"), strataCol.as("stratum"))
      .withColumn("__o",
        Hashing.hash60(concat(lit(s"${salt}_"), col("id").cast("string"))))
      .withColumn("__b", shiftright(col("__o"), shift))
    val ranked = bucketedStratumRank(base)
    val cum = weights.scanLeft(0L) { case (acc, (_, w)) => acc + w }.tail
    val assign = weights.init.zip(cum.init).foldLeft(
      when(lit(false), lit(null).cast("string"))) {
      case (acc, ((name, _), cumPpm)) =>
        acc.when(col("__rk") < expr(s"__n * ${cumPpm}L div 1000000L"), name)
    }.otherwise(weights.last._1)
    ranked.select(col("id"), col("stratum"), assign.as("split"))
  }

  /** Quality-balanced shard assignment — the write-side layout rule for
    * curriculum-safe training shards: per stratum, rows are ranked by
    * quality (desc, ties by id) and dealt round-robin to `nShards`, so
    * EVERY shard receives the same quality mixture from every stratum
    * (a naive hash shard gives each shard the right size but a random
    * quality profile; a range shard gives shard 0 all the best docs —
    * both poison curriculum or mixture assumptions downstream).
    *
    * Scale shape — the [[exactSplit]] bucketed-rank argument with the
    * QUALITY grid as the bucket key: `qMicroCol` lives on the 0..1e6
    * integer grid (the t02/E90 convention), so its high bits are a
    * prefix of the (1e6 − q) ordering and the global per-stratum rank
    * assembles from per-(stratum, bucket) counts + prefix offsets
    * (window over the ≤`buckets`-row counts frame) + row_number within
    * (stratum, bucket) — no per-stratum sort window. A corpus where
    * millions of docs share one quality value concentrates that bucket;
    * sharpen the quality grid rather than salt (the tokenBudgetSelect
    * note — order inside a tie must stay id-deterministic).
    *
    * Output: (id, stratum, q_micro, shard), shard in 0..nShards−1. */
  def balancedShards(df: DataFrame, idCol: Column, strataCol: Column,
                     qMicroCol: Column, nShards: Int,
                     buckets: Int = 1024): DataFrame = {
    require(nShards >= 1, s"balancedShards: nShards must be >= 1: $nShards")
    require(buckets >= 1 && (buckets & (buckets - 1)) == 0 && buckets <= (1 << 20),
      s"balancedShards: buckets must be a power of two <= 2^20: $buckets")
    val shift = 20 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val base = df.select(idCol.as("id"), strataCol.as("stratum"),
        qMicroCol.cast("long").as("q_micro"))
      .withColumn("__o", lit(1000000L) - col("q_micro")) // asc = best first
      .withColumn("__b", shiftright(col("__o"), shift))
    bucketedStratumRank(base)
      .select(col("id"), col("stratum"), col("q_micro"),
        pmod(col("__rk"), lit(nShards.toLong)).cast("int").as("shard"))
  }

  /** Global per-stratum dense rank assembled from order-prefix buckets —
    * the shared machinery behind [[exactSplit]] and [[balancedShards]].
    * `base` carries (id, stratum, __o order value, __b bucket), where
    * `__b` MUST be a monotone prefix of `__o` (its high bits), so
    * bucket-major order IS the global (__o, id) order. Per-(stratum,
    * bucket) counts prefix-sum into offsets (window over the
    * ≤buckets-row counts frame), each row pays a row_number only within
    * its (stratum, bucket) group, and the offset/size joins are
    * NULL-SAFE (`<=>`): a null stratum — or the null bucket a null order
    * key lands in — ranks as its own group (nulls-first, ties by id)
    * instead of silently dropping rows, which is what a null-unsafe
    * usingColumns join would do. `base` is materialized eagerly: three
    * plan branches read it (counts, sizes, rank), and its projection
    * carries a per-row md5/quality expression — the sourceOverlap
    * multi-consumer rule. Output: base columns + `__rk` (0-based global
    * per-stratum rank) + `__n` (stratum size). */
  private def bucketedStratumRank(base0: DataFrame): DataFrame = {
    val base = base0.localCheckpoint(true)
    val counts = base.groupBy(col("stratum"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("__b").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts
      .select(col("stratum").as("__s2"), col("__b").as("__b2"),
        coalesce(sum(col("__c")).over(wOff), lit(0L)).as("__off"))
    val sizes = base.groupBy(col("stratum")).agg(count(lit(1)).as("__n"))
      .select(col("stratum").as("__s3"), col("__n"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum"), col("__b"))
      .orderBy(col("__o").asc, col("id").asc)
    base
      .withColumn("__rn", row_number().over(wRank).cast("long"))
      .join(broadcast(offsets),
        col("stratum") <=> col("__s2") && col("__b") <=> col("__b2"))
      .join(broadcast(sizes), col("stratum") <=> col("__s3"))
      .withColumn("__rk", col("__off") + col("__rn") - 1)
      .drop("__s2", "__b2", "__s3", "__rn", "__off")
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * sampling-weight rule (w_s ∝ n_s^α, α ∈ (0, 1]) that upweights tail
    * sources relative to their raw share: α = 1 is proportional sampling,
    * α → 0 approaches uniform; 0.3 is the usual multilingual temperature.
    * Produces the weight table that [[mixtureSample]] /
    * [[tokenBudgetMixture]] consume as their per-stratum shares.
    *
    * Numeric discipline: per-stratum token totals are exact int64 sums;
    * the power is computed on the RELATIVE share (n_s/N ∈ (0, 1], so the
    * double never overflows at any corpus size) and micro-quantized to
    * int64 BEFORE normalization — the normalizer is then an exact integer
    * sum (order-independent) and the final share is a staged integer
    * division on the ppm grid. The one fp op is libm `pow` (≤1 ulp
    * across engines — the documented measure-zero boundary risk).
    * Windows run over the strata frame only (strata-sized by nature).
    *
    * Output: (stratum, n_docs, n_tokens, r_micro, share_ppm). */
  def temperatureWeights(df: DataFrame, strataCol: Column,
                         tokensCol: Column, alphaPpm: Long): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000L,
      s"temperatureWeights: alphaPpm must be in [1, 1e6]: $alphaPpm")
    val alphaD = alphaPpm.toDouble / 1000000.0
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.groupBy(strataCol.as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokensCol.cast("long")).as("n_tokens"))
      .withColumn("__tot", sum(col("n_tokens")).over(wAll))
      // fail-loud convention: a corpus whose every stratum has zero (or
      // all-null) tokens has no defined mixture — without this guard the
      // non-ANSI division would silently emit null shares downstream
      .withColumn("__tot",
        when(col("__tot").isNull || col("__tot") <= 0L,
          raise_error(lit("temperatureWeights: corpus has no tokens " +
            "(all strata zero or null) — mixture weights are undefined"))
            .cast("long"))
          .otherwise(col("__tot")))
      .withColumn("r_micro",
        round(pow(col("n_tokens").cast("double") / col("__tot").cast("double"),
          lit(alphaD)) * lit(1000000.0)).cast("long"))
      .withColumn("__rt", sum(col("r_micro")).over(wAll))
      .select(col("stratum"), col("n_docs"), col("n_tokens"), col("r_micro"),
        expr("r_micro * 1000000 div __rt").as("share_ppm"))
  }

  /** Deterministic uniform negative sampling — the contrastive-training
    * data op: for every anchor row, `k` pseudo-random "negative" partners
    * drawn uniformly from the corpus, reproducible bit-for-bit across
    * re-runs, retries, and engines (no `rand()`; every pick is a pure
    * function of (anchor id, j) through the portable
    * [[Hashing.hash60]]).
    *
    * Mechanism: each candidate row gets a position on the hash ring
    * (`h = hash60(salt:id)`); ranking the ring yields a DENSE GLOBAL INDEX
    * 0..N−1. A global `row_number()` would funnel the corpus through one
    * task, so the index is built scalably: partition the ring into
    * `buckets` ranges by the hash's high bits, count per bucket (bounded
    * driver collect, ≤ `buckets` rows — the prefix-sum pattern), and add
    * each bucket's offset to its partition-local rank. Hash uniformity
    * makes the buckets skew-free by construction. Each (anchor, j) then
    * picks index `hash60(salt t:anchor:j) mod N` — an equi-join on a long,
    * no candidate explosion; a pick that lands on its own anchor
    * deterministically advances to the next ring position ((pick+1) mod N,
    * a second equi-join over only the collided rows, ~k·N/N ≈ k rows).
    *
    * The ring index is also the natural place to EXCLUDE known positives
    * (near-dups from E3/E5): filter the candidate frame before calling.
    * Output: (anchor, j, neg_id), k rows per anchor. */
  def negativeSample(df: DataFrame, idCol: Column, k: Int,
                     buckets: Int = 1024, salt: String = "neg"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(buckets >= 1 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two: $buckets")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val cand = df.select(idCol.as("cand_id"))
      .withColumn("__h",
        Hashing.hash60(concat(lit(s"$salt:"), col("cand_id"))))
      .withColumn("__b", shiftright(col("__h"), shift))
    // bounded driver collect: ≤ `buckets` (bucket, count) rows → offsets
    val counts = cand.groupBy(col("__b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    require(n >= 2, s"need >= 2 candidate rows to draw negatives: $n")
    var acc = 0L
    val offsets = counts.map { case (b, c) => val o = acc; acc += c; (b, o) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__b2", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h").asc, col("cand_id").asc)
    val indexed = cand
      .withColumn("__rn", row_number().over(w).cast("long"))
      .join(broadcast(offDf), col("__b") === col("__b2"))
      .select(col("cand_id"), (col("__rn") - 1 + col("__off")).as("__idx"))
    val targets = df.select(idCol.as("anchor"))
      .select(col("anchor"),
        explode(sequence(lit(1L), lit(k.toLong))).as("j"))
      .withColumn("__pick", pmod(
        Hashing.hash60(concat(lit(s"${salt}t:"), col("anchor"), lit(":"),
          col("j"))),
        lit(n)))
    val first = targets.join(indexed, col("__pick") === col("__idx"))
    val ok = first.filter(col("cand_id") =!= col("anchor"))
      .select(col("anchor"), col("j"), col("cand_id").as("neg_id"))
    val collided = first.filter(col("cand_id") === col("anchor"))
      .select(col("anchor"), col("j"),
        pmod(col("__pick") + 1, lit(n)).as("__p2"))
      .join(indexed, col("__p2") === col("__idx"))
      .select(col("anchor"), col("j"), col("cand_id").as("neg_id"))
    ok.unionByName(collided)
  }

  /** E142: DSIR-style importance selection (Xie et al., "Data Selection
    * for Language Models via Importance Resampling", arXiv:2302.03169) —
    * pick the pool documents whose hashed-unigram distribution looks most
    * like a small TARGET corpus. Features are hashed token buckets
    * (`hash60("dsir_"||term) mod nBuckets`, the portable-hash
    * convention); each bucket gets an add-1-smoothed log importance
    * ratio ln(p_target(f)/q_pool(f)); a document's score is the exact
    * sum of its tokens' ratios. Deviations from the paper, both for
    * reproducibility: selection is deterministic top-N by score (the
    * paper perturbs with Gumbel noise to resample — noise-free selection
    * is the [[stratifiedHashSample]] stance: a re-run on 100 TB must
    * pick the same rows), and per-bucket ratios quantize to micro units
    * (long) BEFORE the per-doc sum so the score is order-independent
    * (the t37 bigram-LM convention; a double sum over a shuffled join is
    * not associative-stable).
    *
    * Scale shape: one token explode (linear scan), two map-side-partial
    * aggregates onto `nBuckets` keys, the ratio table stays nBuckets
    * rows and BROADCASTS into the scoring join (no shuffle of the token
    * frame beyond the per-doc regroup), and the final top-N is
    * `orderBy.limit` → TakeOrderedAndProject (per-partition heaps, no
    * global sort). Returns the selected rows:
    * (id, n_tokens, w_micro, rank), rank 1-based by (score desc, id). */
  def dsirSelect(df: DataFrame, idCol: Column, textCol: Column,
                 isTarget: Column, topN: Int,
                 nBuckets: Int = 4096): DataFrame = {
    require(topN > 0, s"dsirSelect: topN must be positive: $topN")
    require(nBuckets > 0, s"dsirSelect: nBuckets must be positive: $nBuckets")
    val toks = df.select(idCol.as("id"), isTarget.as("__tgt"),
        explode(TextOps.tokens(textCol)).as("__term"))
      .select(col("id"), col("__tgt"),
        pmod(Hashing.hash60(concat(lit("dsir_"), col("__term"))),
          lit(nBuckets.toLong)).as("__f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tgtCnt = toks.filter(col("__tgt"))
      .groupBy("__f").agg(count(lit(1)).as("__ct"))
    val poolToks = toks.filter(!col("__tgt"))
    val rawCnt = poolToks.groupBy("__f").agg(count(lit(1)).as("__cr"))
    val nt = tgtCnt.agg(coalesce(sum(col("__ct")), lit(0L)).as("__nt"))
    val nr = rawCnt.agg(coalesce(sum(col("__cr")), lit(0L)).as("__nr"))
    val b = lit(nBuckets.toLong)
    val ratios = rawCnt.join(tgtCnt, Seq("__f"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("__f"),
        round(log(
          ((coalesce(col("__ct"), lit(0L)) + lit(1L)).cast("double") /
            (col("__nt") + b).cast("double")) /
          ((col("__cr") + lit(1L)).cast("double") /
            (col("__nr") + b).cast("double"))) * lit(1.0e6))
          .cast("long").as("__lr"))
    val scored = poolToks.join(broadcast(ratios), "__f")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lr")).as("w_micro"))
    // eager: the selection is ≤ topN rows — materialize it and release the
    // token cache before returning (DedupOps.materializeReleasing; its
    // finally releases the exploded token frame even when the checkpoint
    // action fails, so the cache never pins storage for the session across
    // a multi-key sweep)
    DedupOps.materializeReleasing(
      scored.orderBy(col("w_micro").desc, col("id").asc).limit(topN)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("w_micro").desc, col("id").asc)))
        .select(col("id"), col("n_tokens"), col("w_micro"), col("rank")),
      toks)
  }
}
