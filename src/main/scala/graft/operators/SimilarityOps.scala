package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Similarity search over embedding columns (Array[Float]).
  *
  * Cosine is a strict left-to-right double fold — deterministic and
  * reproducible by the oracle engine. The fold runs through the native
  * codegen'd [[graft.functions.DotFold]] expression (registered as
  * `graft_dot` by [[graft.GraftExtensions]]); [[dotHof]] is the
  * bit-identical built-in higher-order-function twin that defines the
  * portable semantics (and is what the DuckDB oracle SQL mirrors).
  *
  * Scale paths: brute-force top-k is the correctness baseline (O(n·q), fine
  * when the query set is small and broadcastable); random-hyperplane LSH
  * bucketing bounds the candidate set for high-similarity search; IVF with a
  * deterministic codebook partitions the corpus so a probe touches only
  * nProbe inverted lists.
  */
object SimilarityOps {

  /** dot(a, b) over float/double arrays, accumulated in double
    * left-to-right — the native codegen'd path when the active session
    * registers it, [[dotHof]] on a vanilla session (bit-identical,
    * DotFoldSpec), chosen at Column-construction time ([[Native.has]]) so
    * every dot consumer — including [[embeddingSimhashHof]], which was
    * the r11 vanilla-session gap — analyzes on any session. */
  def dot(a: Column, b: Column): Column =
    if (graft.functions.Native.has("graft_dot"))
      call_function("graft_dot", a, b)
    else dotHof(a, b)

  /** The engine-portable HOF twin of [[dot]]: same element order, same
    * IEEE ops, bit-identical output (asserted in DotFoldSpec). Kept as the
    * semantic definition; `CodegenFallback` + an allocated zip array make
    * it the slower form, so operators call [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** 60-bit random-hyperplane sign sketch per vector — "simhash for
    * embeddings", the scale path for ALL-PAIRS embedding near-dup mining
    * (E5's `cosinePairsBrute` is the O(n²) oracle twin; [[lshBuckets]] is
    * query-vs-corpus top-k, a different shape). Bit p = sign of
    * dot(v, plane_p) with ±1 Rademacher planes derived from hash60 (the
    * [[lshBuckets]]/[[randomProject]] convention — reproducible bit-for-bit
    * with no stored artifact, and the DuckDB oracle rebuilds every plane).
    * 60 bits, not 64: the sign-bit/BIGINT-portability rule shared with
    * `DedupOps.simhash60` and `Multimodal.aHash60`, and it makes
    * `DedupOps.simhashPairs`' multi-index pigeonhole machinery apply
    * verbatim.
    *
    * Hamming distance estimates angle: P(bit differs) = θ/π, so cos 0.95
    * pairs (θ≈18°) differ on ~6% of bits (E[hamming]≈3.6 of 60) —
    * chunk-banded candidates at maxHamming 3 target the TIGHT near-dup
    * regime (dup detection), not broad similarity (that's [[lshTopK]]'s
    * job).
    *
    * On a graft session this is ONE compiled per-row pass
    * ([[graft.functions.EmbeddingSimhash60]]): the HOF formulation below
    * ran 60 interpreted `transform` lambda calls per row (Spark's array
    * HOFs carry no codegen) plus an interpreted `aggregate` bit fold —
    * the same interpretation tax the SimHash/MinHash scans just removed
    * from the text miners. The HOF form remains as the vanilla-session
    * fallback and the oracle-SQL definition; bit-equivalence is pinned by
    * EmbeddingSimhashSpec. Output (doc_id, simhash) — named for
    * simhashPairs. */
  def embeddingSimhash(corpus: DataFrame, idCol: Column = col("vec_id"),
                       embCol: Column = col("embedding"),
                       dim: Int = 64): DataFrame =
    if (graft.functions.Native.has("graft_embedding_simhash"))
      corpus.select(idCol.as("doc_id"),
        call_function("graft_embedding_simhash", embCol, lit(dim))
          .as("simhash"))
    else embeddingSimhashHof(corpus, idCol, embCol, dim)

  /** The pre-r11 `transform`+`aggregate` formulation of
    * [[embeddingSimhash]] — the bit-equivalence reference and the
    * no-extensions fallback. All 60 planes ship as one nested literal,
    * one `transform` computes the projections (the lshBuckets
    * plan-compilation lesson). */
  private[graft] def embeddingSimhashHof(corpus: DataFrame, idCol: Column,
                                         embCol: Column,
                                         dim: Int): DataFrame = {
    val planesLit = array((0 until 60).map(p =>
      array(Array.tabulate(dim) { d =>
        if ((Hashing.hash60Scalar(s"esh_${p}_$d") & 1L) == 0L) 1.0 else -1.0
      }.map(lit).toIndexedSeq: _*)): _*)
    val projs = transform(planesLit, w => dot(embCol, w))
    val powers = array((0 until 60).map(p => lit(1L << p)): _*)
    val fp = aggregate(sequence(lit(0), lit(59)), lit(0L), (acc, p) =>
      acc + when(element_at(col("__projs"), p + 1) > 0,
        element_at(powers, p + 1)).otherwise(0L))
    corpus.select(idCol.as("__vid"), projs.as("__projs"))
      .select(col("__vid").as("doc_id"), fp.as("simhash"))
  }

  /** All-pairs embedding near-dup mining at scale: sketch → multi-index
    * pigeonhole chunk candidates (`DedupOps.simhashPairs` verbatim — one
    * bucket equi-join, no vector×vector term) → exact-cosine verification
    * of the candidate pairs only. Exact recall for pairs within
    * `maxHamming` sketch bits (pigeonhole); pairs at the threshold whose
    * sketches happen to differ on more bits are missed — the
    * deterministic-sketch trade (planted near-identical recall asserted
    * in SimilaritySpec; the oracle replays the same sketches, so the gate
    * is exact regardless). Composes with `DedupOps.dedupClusters` /
    * `canonicalPerCluster` like any pair miner.
    *
    * Output: (vec_a, vec_b, hamming, cos) for verified pairs with
    * cos ≥ threshold. */
  def embeddingNearDupPairs(corpus: DataFrame, threshold: Double,
                            maxHamming: Int = 3, dim: Int = 64,
                            idCol: Column = col("vec_id"),
                            embCol: Column = col("embedding")): DataFrame = {
    // eager materialization ×2 (the d03 persist lesson, measured 43.6 s →
    // ~2.5 s at sf0.1 combined): (1) the INPUT projection — the 60-dot
    // sketch references the embedding inside a HOF chain, and a lazy
    // upstream expression (cast/union/transform) re-evaluates inside that
    // interpreted path per reference (13.6 s vs 2.4 s for the sketch
    // alone); (2) the SKETCH frame — the bucket self-join reads it on
    // both sides and would otherwise pay the projection plan per branch.
    // One row per vector each: at scale the sketch table IS the persisted
    // artifact, like the minhash signature table.
    val e = preparedVectors(corpus, idCol, embCol, dim)
    val pairs = graft.operators.DedupOps
      .simhashPairs(embeddingSimhash(e, dim = dim).localCheckpoint(true),
        maxHamming)
    verifyCosine(pairs, e, e, threshold)
  }

  /** Shared prep for the embedding pair miners: project to the canonical
    * (vec_id, embedding) shape, EXCLUDE zero-magnitude vectors (the
    * quantizeInt8 precedent — no defined cosine to anything, and under
    * ANSI mode, Spark 4's default, their 0/0 would kill the job rather
    * than emit NaN), materialize eagerly (the d03 persist lesson), and
    * FAIL LOUDLY on a dim mismatch: `graft_dot` returns null when array
    * lengths differ, a null projection signs to a 0-bit, and every
    * wrong-dim vector would silently sketch to 0 — collapsing candidate
    * generation into the all-pairs blowup the sketch exists to prevent.
    * The check is a 1-row min/max aggregate over the WHOLE materialized
    * frame (a first-row sample would pass a mixed-dim corpus whose first
    * vector happens to match) — one cheap scan of the checkpoint, next
    * to nothing beside the 60-plane sketch pass that follows it. */
  private def preparedVectors(corpus: DataFrame, idCol: Column,
                              embCol: Column, dim: Int): DataFrame = {
    val e = corpus.select(idCol.as("vec_id"), embCol.as("embedding"))
      .filter(dot(col("embedding"), col("embedding")) > 0)
      .localCheckpoint(true)
    val dims = e.agg(min(size(col("embedding"))).as("mn"),
      max(size(col("embedding"))).as("mx")).head()
    if (!dims.isNullAt(0)) // empty frame: nothing to sketch, nothing to check
      require(dims.getInt(0) == dim && dims.getInt(1) == dim,
        s"embedding dims [${dims.getInt(0)}, ${dims.getInt(1)}] != sketch " +
          s"dim $dim — wrong-dim vectors would silently sketch to 0 " +
          "(null-dot sign bits) and candidate generation would degenerate " +
          "to all-pairs; fix the corpus or pass the real dim")
    e
  }

  /** Shared verification tail of the miners: exact cosine over candidate
    * pairs only, threshold filter, canonical output shape. */
  private def verifyCosine(pairs: DataFrame, left: DataFrame,
                           right: DataFrame, threshold: Double): DataFrame =
    pairs
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"),
        col("hamming"))
      .join(left.select(col("vec_id").as("vec_a"), col("embedding").as("__ea")),
        "vec_a")
      .join(right.select(col("vec_id").as("vec_b"), col("embedding").as("__eb")),
        "vec_b")
      .withColumn("cos", cosine(col("__ea"), col("__eb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "hamming", "cos")

  /** The `dedupRecallEval` of the embedding family: MEASURED recall of
    * the hyperplane-sketch miner ([[embeddingNearDupPairs]]) against
    * brute-force cosine ground truth on a hash-deterministic sample.
    * Unlike the SimHash audit (where pigeonhole makes candidate recall
    * provably exact), the sketch's recall claim is genuinely
    * probabilistic: a cos ≥ threshold pair whose 60-bit sketches differ
    * on more than `maxHamming` bits is MISSED (P(bit differs) = θ/π per
    * plane — at cos 0.95, E[hamming] ≈ 3.6, so maxHamming 3 trades a
    * measurable miss rate for the banded plan) — this operator is what
    * makes that trade measurable on a user's corpus. Precision is 1 by
    * construction (candidates are exact-cosine verified; below 1000000
    * flags a verification regression). Ground truth is O(sample²) BY
    * DESIGN: hold the absolute sample size constant via `sampleRate` as
    * the corpus grows, like the other audits. Output: the
    * `DedupOps.recallReport` one-row ppm shape (n_docs = corpus vectors,
    * n_sampled = sampled nonzero vectors). */
  def embeddingSketchRecallEval(corpus: DataFrame, threshold: Double,
                                maxHamming: Int = 3, dim: Int = 64,
                                sampleRate: Double = 0.5,
                                idCol: Column = col("vec_id"),
                                embCol: Column = col("embedding")): DataFrame = {
    val sample = graft.operators.CurationOps.stratifiedHashSample(
      corpus.select(idCol.as("vec_id"), embCol.as("embedding")),
      col("vec_id"), lit("all"), Map.empty, sampleRate)
    // zero-filter + eager materialization + loud dim check, shared with
    // the miners; feeds the brute side, the sketch, and the verify join
    val e = preparedVectors(sample, col("vec_id"), col("embedding"), dim)
    val truth = cosinePairsBrute(e, threshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      .localCheckpoint(true) // reused by the count and the match join
    val banded = graft.operators.DedupOps
      .simhashPairs(embeddingSimhash(e, dim = dim).localCheckpoint(true),
        maxHamming)
    val verified = verifyCosine(banded, e, e, threshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    graft.operators.DedupOps.recallReport(corpus, e, truth, verified)
  }

  /** Cross-corpus embedding near-dup — the incremental-ingestion form of
    * [[embeddingNearDupPairs]] (as E85 is to E3, for vectors): (new
    * vector, corpus vector) pairs with cos ≥ threshold, WITHOUT
    * re-pairing the corpus against itself. Both sides sketch with the
    * SAME hash-derived planes, candidates come from the cross-table
    * chunk join (`DedupOps.simhashPairsCross`), exact cosine verifies.
    * At scale the corpus sketch table is the persisted artifact — a
    * daily shard sketches only itself and joins against it. Output:
    * (vec_a ∈ newVecs, vec_b ∈ corpus, hamming, cos). */
  def crossEmbeddingNearDupPairs(newVecs: DataFrame, corpus: DataFrame,
                                 threshold: Double, maxHamming: Int = 3,
                                 dim: Int = 64,
                                 idCol: Column = col("vec_id"),
                                 embCol: Column = col("embedding")): DataFrame = {
    val (c, csk) = corpusEmbeddingArtifact(corpus, dim, idCol, embCol)
    crossEmbeddingNearDupPairsFromArtifact(newVecs, c, csk, threshold,
      maxHamming, dim, idCol, embCol)
  }

  /** The corpus-side PERSISTED ARTIFACT of incremental embedding dedup
    * (E123): (prepared vectors, hyperplane sketch table). At scale both
    * are written tables, built once and grown from admitted shards; a
    * daily shard sketches only itself and joins against them
    * ([[crossEmbeddingNearDupPairsFromArtifact]]). Both frames come back
    * eagerly materialized (the d03 persist lesson); streaming callers
    * keep them across triggers. */
  def corpusEmbeddingArtifact(corpus: DataFrame, dim: Int = 64,
                              idCol: Column = col("vec_id"),
                              embCol: Column = col("embedding"))
      : (DataFrame, DataFrame) = {
    val c = preparedVectors(corpus, idCol, embCol, dim)
    (c, embeddingSimhash(c, dim = dim).localCheckpoint(true))
  }

  /** [[crossEmbeddingNearDupPairs]] against an already-built corpus
    * artifact — the streaming/incremental form: each arriving shard
    * prepares and sketches ITSELF ONLY (with the same hash-derived
    * planes), chunk-joins the standing sketch table, and verifies exact
    * cosine against the standing vectors. Union over triggers ≡ one
    * batch run (proven in StreamingSpec). */
  def crossEmbeddingNearDupPairsFromArtifact(newVecs: DataFrame,
      corpusPrepared: DataFrame, corpusSketch: DataFrame, threshold: Double,
      maxHamming: Int = 3, dim: Int = 64, idCol: Column = col("vec_id"),
      embCol: Column = col("embedding")): DataFrame = {
    // zero-filter + eager materialization + loud dim check on the shard,
    // shared with [[embeddingNearDupPairs]] via [[preparedVectors]]
    val n = preparedVectors(newVecs, idCol, embCol, dim)
    val pairs = graft.operators.DedupOps.simhashPairsCross(
      embeddingSimhash(n, dim = dim).localCheckpoint(true),
      corpusSketch, maxHamming)
    verifyCosine(pairs, n, corpusPrepared, threshold)
  }

  /** Brute-force cosine top-k: queries × corpus cross join (queries
    * broadcast), per-query rank by (similarity desc, id asc). The window
    * sort is per-query over corpus-size rows — the exact-search baseline
    * every ANN variant is measured against. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // the non-equi condition plans as BroadcastNestedLoopJoin, whose
    // parallelism is the STREAMED side's partition count — a small corpus
    // arriving as one parquet split would run the O(n·q) loop on a single
    // core; spread it across the cluster first
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("ce"))
      .repartition(par)
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"), cosine(col("qe"), col("ce")).as("cos"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "nn_id", "cos")
  }

  /** Brute-force cosine near-dup pairs (threshold-filtered), the all-pairs
    * twin of [[bruteForceTopK]] — O(n²), verification/oracle use. */
  def cosinePairsBrute(corpus: DataFrame, threshold: Double): DataFrame = {
    // BroadcastNestedLoopJoin parallelism = streamed-side partitions (see
    // bruteForceTopK); without the repartition the O(n²) loop runs on one
    // core when the corpus is a single parquet split
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val a = corpus.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      .repartition(par)
    val b = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact per-group embedding centroids, emitted long-form as
    * (grp, pos, n, centroid). The mean is computed ORDER-INDEPENDENTLY:
    * each component is quantized to nano units (`round(x·10⁹)` — one
    * deterministic IEEE multiply + round), summed as exact longs, and
    * divided once at the end — a double-sum mean differs run-to-run at
    * scale because fp addition isn't associative across partition orders
    * (the E72 argument), and would not be oracle-checkable. Quantization
    * bias is ≤ 5·10⁻¹⁰ per component — far below embedding noise.
    *
    * Plan: posexplode to (grp, pos, q) — dim rows per vector — then ONE
    * hash aggregate on (grp, pos) with map-side combine; a mega-group
    * flattens under partial aggregation exactly like E63. Use for
    * per-source/per-cluster centroids, drift monitoring, or seeding
    * coarse quantizers. */
  /** Deterministic random-projection (Johnson–Lindenstrauss) dimensionality
    * reduction — the pre-ANN compression step for embedding tables: project
    * `inDim`-dim vectors onto `outDim` Rademacher (±1) directions derived
    * from the portable [[Hashing.hash60]] (sign(i,j) = parity of
    * `hash60(salt:i:j)`), so the projection matrix is reproducible
    * bit-for-bit by any engine with no stored artifact. JL preserves
    * pairwise distances within (1±ε) for outDim = O(log n / ε²); the
    * conventional 1/√outDim scale is a constant the caller applies (kept
    * out so the output stays on an exact integer grid).
    *
    * Arithmetic is exact: components quantize to micro units
    * (`round(x·1e6)` — one deterministic IEEE multiply, the centroid
    * convention), the signed sums run as int64, and the output
    * (vec_id, j, proj_micro) is order-independent across partitions and
    * replayed exactly by the DuckDB twin. |sum| ≤ inDim·1e6·max|x| — no
    * overflow for any sane embedding.
    *
    * Plan: the quantized array is materialized in its own projection, then
    * ONE posexplode to (vec_id, i, q) — inDim rows per vector — a
    * broadcast join against the inDim×outDim sign table (driver-built,
    * tiny), and one hash aggregate on (vec_id, j) with map-side combine.
    * At 100 TB this is a narrow explode + broadcast + combine-heavy agg:
    * no shuffle grows beyond vectors × outDim output rows. */
  def randomProject(corpus: DataFrame, idCol: Column, embCol: Column,
                    inDim: Int, outDim: Int,
                    salt: String = "rp"): DataFrame = {
    require(inDim >= 1, s"inDim must be >= 1: $inDim")
    require(outDim >= 1, s"outDim must be >= 1: $outDim")
    val spark = corpus.sparkSession
    import spark.implicits._
    val signs = for (i <- 0 until inDim; j <- 0 until outDim) yield
      (i, j, if (Hashing.hash60Scalar(s"$salt:$i:$j") % 2 == 0) 1 else -1)
    val signDf = signs.toDF("__i", "j", "__s")
    corpus
      .select(idCol.as("vec_id"),
        transform(embCol, x => round(x.cast("double") * lit(1.0e6))
          .cast("long")).as("__q"))
      .select(col("vec_id"), posexplode(col("__q")).as(Seq("__i", "__qv")))
      .join(broadcast(signDf), "__i")
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("__qv") * col("__s")).as("proj_micro"))
  }

  def groupCentroids(df: DataFrame, groupCol: Column, embCol: Column): DataFrame =
    df.select(groupCol.as("grp"),
        posexplode(transform(embCol,
          x => round(x.cast("double") * lit(1.0e9)).cast("long"))))
      .groupBy(col("grp"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("col")).as("__s"))
      .select(col("grp"), col("pos"), col("n"),
        (col("__s").cast("double") / (col("n").cast("double") * lit(1.0e9)))
          .as("centroid"))

  /** Symmetric int8 quantization of an embedding column — the standard 4×
    * storage/bandwidth compression for embedding tables at rest: per-vector
    * scale = max|v|/127, q_i = round(v_i / scale) ∈ [-127, 127]. Zero
    * vectors quantize to all-zero with scale 0. Emitted exploded as
    * (vec_id, pos, scale, q) scalar rows so the result is hash-comparable
    * by any engine; narrow per-row expressions, no shuffle. Dequantization
    * error is bounded by scale/2 per component (asserted in
    * SimilaritySpec). */
  def quantizeInt8(corpus: DataFrame, idCol: Column, embCol: Column): DataFrame = {
    val scale = array_max(transform(embCol, x => abs(x.cast("double")))) / lit(127.0)
    corpus
      .select(idCol.as("vec_id"), embCol.as("__e"), scale.as("scale"))
      .select(col("vec_id"), col("scale"),
        posexplode(transform(col("__e"), x =>
          when(col("scale") === 0.0, lit(0L))
            .otherwise(round(x.cast("double") / col("scale")).cast("long")))))
      .select(col("vec_id"), col("pos"), col("scale"), col("col").as("q"))
  }

  /** Deterministic ±1 hyperplane, precomputed driver-side from the portable
    * hash (buckets reproducible anywhere) and shipped as an array LITERAL —
    * the runtime plan does zero hashing, only the multiply-add fold. */
  private def planeWeights(table: Int, plane: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      if ((Hashing.hash60Scalar(s"${table}_${plane}_$d") & 1L) == 0L) 1.0 else -1.0
    }

  /** Random-hyperplane LSH bucket id per (table, vector): `planes` sign bits
    * of dot(v, hyperplane). Emits numTables rows per vector — candidates for
    * a query are vectors sharing a bucket in ANY table.
    *
    * All numTables×planes hyperplanes ship as ONE nested array literal and
    * a single `transform` computes every projection per row. The previous
    * formulation inlined a separate 64-literal dot tree per plane — 96
    * trees, ~6k literal nodes — and PLAN COMPILATION, not data, dominated
    * runtime (measured 4.3 s for 2 k vectors; the one-literal form cuts
    * the expression tree ~50×). The projections land in their own
    * projection so the non-cheap alias is evaluated once (CollapseProject
    * keeps multi-referenced non-cheap aliases separate — the shingleSets
    * rule). Projection order (t·planes + p) and the left-to-right dot fold
    * are unchanged, so buckets — and the oracle — are bit-identical. */
  def lshBuckets(corpus: DataFrame, numTables: Int, planes: Int,
                 dim: Int = 64): DataFrame = {
    val planesLit = array((0 until numTables).flatMap(t =>
      (0 until planes).map(p =>
        array(planeWeights(t, p, dim).map(lit).toIndexedSeq: _*))): _*)
    val projs = transform(planesLit, w => dot(col("embedding"), w))
    // bit weights as a literal lookup so the fold needs no variable shift;
    // bucket value = Σ (proj > 0) << p, identical to the unrolled form
    val powers = array((0 until planes).map(p => lit(1L << p)): _*)
    val buckets = transform(sequence(lit(0), lit(numTables - 1)), t =>
      aggregate(sequence(lit(0), lit(planes - 1)), lit(0L), (acc, p) =>
        acc + when(
          element_at(col("__projs"), t * lit(planes) + p + 1) > 0,
          element_at(powers, p + 1)).otherwise(0L)))
    corpus.select(col("vec_id"), projs.as("__projs"))
      .select(col("vec_id"), posexplode(buckets))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bucket"))
  }

  /** LSH-bucketed approximate top-k: candidates = same bucket in any table,
    * then exact cosine + per-query rank. Recall vs [[bruteForceTopK]] is
    * measured in SimilaritySpec; it rises with numTables and falls with
    * planes. Candidate generation is a bucket equi-join — never O(n·q).
    * Defaults favor recall on weakly-similar corpora (few planes, many
    * tables): top neighbors at cos≈0.45 are near-orthogonal, so each extra
    * plane halves their bucket-collision odds almost as fast as a random
    * pair's. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numTables: Int = 16, planes: Int = 6): DataFrame =
    rankCandidates(corpus, queries,
      lshCandidates(corpus, queries, numTables, planes), k)

  /** Hard-negative mining — the contrastive-training complement of
    * [[graft.operators.CurationOps.negativeSample]]: random negatives are
    * easy for a model; the informative ones are the NEAR-misses. Per
    * query, the top-`k` most-similar corpus vectors EXCLUDING a known
    * positive/duplicate pair set (`positives`: (q_id, pos_id) — same
    * label, mined near-dups from E3/E5, same source document, …).
    *
    * The exclusion is a left-anti join applied to the LSH candidate set
    * BEFORE ranking — an excluded vector must not occupy a rank slot
    * (post-filtering the top-k would silently return fewer than k when a
    * query's neighborhood is dominated by its positives, exactly the
    * queries hard-negative mining cares about most). Candidate
    * generation, scoring, and ranking are [[lshTopK]]'s bucketed plan —
    * no all-pairs anywhere. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    positives: DataFrame, k: Int,
                    numTables: Int = 16, planes: Int = 6): DataFrame =
    rankCandidates(corpus, queries,
      lshCandidates(corpus, queries, numTables, planes)
        .join(positives.select(col("q_id"), col("pos_id").as("nn_id")),
          Seq("q_id", "nn_id"), "left_anti"),
      k)

  /** Maximal-marginal-relevance re-ranking — the diversity pass between
    * retrieval and consumption: a plain top-k hands back k near-copies of
    * the same document when the neighborhood is redundant (which, post
    * near-dup mining, is exactly when it matters); MMR greedily picks
    * argmax of `λ·relevance − (1−λ)·max-similarity-to-already-picked`,
    * trading relevance against redundancy per pick.
    *
    * Runs over a CANDIDATE frame (q_id, nn_id, cos) — [[lshTopK]]'s
    * output shape, m candidates per query — never the corpus: the greedy
    * loop is `k` unrolled DataFrame rounds (the BPE/PageRank convention,
    * eager checkpoint per round bounds the plan), each one
    * anti-join + pair-similarity join + per-query argmax window over
    * ≤ m rows per group. Pair similarities join the vector table by id
    * (equi-joins; remaining × picked ≤ m·k rows per query).
    *
    * Numeric discipline: relevance and pair cosines quantize to the
    * int64 micro grid BEFORE scoring; the score is the UNDIVIDED integer
    * `λppm·rel − (1e6−λppm)·maxsim` (ordering is invariant to the 1e6
    * scale, and skipping the division sidesteps the Spark-div-vs-DuckDB-
    * floor mismatch on negative scores — the t37 lesson, avoided rather
    * than patched). Ties break by nn_id. Queries with fewer than k
    * candidates simply stop early (fewer output rows, never padding).
    * Candidates with no row in `vectors` are excluded from EVERY round
    * up front (their pair similarity is uncomputable; admitting them in
    * round 1 only would strand later rounds — asserted in
    * SimilaritySpec).
    *
    * Output: (q_id, mmr_rank, nn_id), mmr_rank 1..k in pick order. */
  def mmrRerank(candidates: DataFrame, vectors: DataFrame, k: Int,
                lambdaPpm: Long): DataFrame = {
    require(k >= 1, s"mmrRerank: k must be >= 1: $k")
    require(lambdaPpm >= 0 && lambdaPpm <= 1000000L,
      s"mmrRerank: lambdaPpm must be in [0, 1e6]: $lambdaPpm")
    val ce = vectors.select(col("vec_id"), col("embedding"))
    // a candidate whose vector is missing can never have its pair
    // similarity computed — admit only covered candidates UP FRONT, so
    // every round (including round 1) sees the same universe. Without
    // this, round 1 would happily pick an uncovered candidate and the
    // later rounds' inner embedding joins would silently strand the
    // query with fewer than k picks.
    val relC = candidates.select(col("q_id"), col("nn_id"),
        round(col("cos") * lit(1000000.0)).cast("long").as("rel"))
      .join(ce.select(col("vec_id").as("nn_id")), Seq("nn_id"), "left_semi")
      .localCheckpoint(true)
    var picked = relC
      .withColumn("__rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("rel").desc, col("nn_id").asc)))
      .filter(col("__rk") === 1)
      .select(col("q_id"), lit(1).as("mmr_rank"), col("nn_id"))
      .localCheckpoint(true)
    for (r <- 2 to k) {
      val remaining = relC.join(picked.select("q_id", "nn_id"),
        Seq("q_id", "nn_id"), "left_anti")
      val scored = remaining
        .join(picked.select(col("q_id"), col("nn_id").as("p_id")), "q_id")
        .join(ce.select(col("vec_id").as("nn_id"), col("embedding").as("e1")),
          "nn_id")
        .join(ce.select(col("vec_id").as("p_id"), col("embedding").as("e2")),
          "p_id")
        .select(col("q_id"), col("nn_id"), col("rel"),
          round(cosine(col("e1"), col("e2")) * lit(1000000.0)).cast("long")
            .as("sim"))
        .groupBy(col("q_id"), col("nn_id"), col("rel"))
        .agg(max(col("sim")).as("maxsim"))
        .withColumn("score",
          lit(lambdaPpm) * col("rel") - lit(1000000L - lambdaPpm) * col("maxsim"))
      val next = scored
        .withColumn("__rk", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("nn_id").asc)))
        .filter(col("__rk") === 1)
        .select(col("q_id"), lit(r).as("mmr_rank"), col("nn_id"))
      picked = picked.unionByName(next).localCheckpoint(true)
    }
    picked
  }

  /** Retrieval-evaluation metrics — the ANN quality gate as an operator:
    * per query, recall@k and reciprocal rank of an approximate top-k
    * `result` against an exact `truth` baseline (both shaped
    * (q_id, rank, nn_id) — [[lshTopK]]/[[bruteForceTopK]] output). The
    * check every index build should ship with: recall tells you the
    * bucket/probe parameters hold on YOUR distribution, not the paper's.
    *
    * All-integer outputs on the exact ppm grid: `recall_ppm =
    * hits·1e6 div |relevant|`, `rr_ppm = 1e6 div first_hit_rank` (floor —
    * deterministic anywhere, no fp). Queries in `truth` with no result
    * hits come back with zeros and a null first_hit_rank. Plan: one
    * (q_id, nn_id) semi-join + two per-query aggregates + a left join —
    * equi-joins only, metrics tables are query-sized. */
  def annEvalMetrics(result: DataFrame, truth: DataFrame): DataFrame = {
    val rel = truth.select(col("q_id"), col("nn_id"))
    val hits = result.join(rel, Seq("q_id", "nn_id"), "left_semi")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("rank")).as("first_hit_rank"))
    val relCounts = rel.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_relevant"))
    relCounts.join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("n_relevant"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("coalesce(n_hits, 0L) * 1000000 div n_relevant").as("recall_ppm"),
        col("first_hit_rank"),
        coalesce(expr("1000000 div first_hit_rank"), lit(0L)).as("rr_ppm"))
  }

  /** Distinct LSH bucket-cojoin candidates (q_id, nn_id), self excluded. */
  private def lshCandidates(corpus: DataFrame, queries: DataFrame,
                            numTables: Int, planes: Int): DataFrame = {
    val cb = lshBuckets(corpus, numTables, planes)
    val qb = lshBuckets(queries, numTables, planes)
      .withColumnRenamed("vec_id", "q_id")
    qb.join(cb, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("nn_id")).distinct()
  }

  /** Exact-cosine scoring + per-query rank of a candidate pair set. */
  private def rankCandidates(corpus: DataFrame, queries: DataFrame,
                             cand: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("ce"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    cand.join(c, "nn_id").join(broadcast(q), "q_id")
      .select(col("q_id"), col("nn_id"), cosine(col("qe"), col("ce")).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "nn_id", "cos")
  }

  /** Deterministic IVF codebook: nCells anchor vectors with ±1 components
    * derived from the portable hash (a fixed codebook instead of trained
    * k-means centroids — same partitioned-search plan, reproducible). */
  def ivfCodebook(spark: org.apache.spark.sql.SparkSession, nCells: Int,
                  dim: Int): DataFrame = {
    import spark.implicits._
    (0 until nCells).map { cell =>
      val anchor = Array.tabulate(dim) { d =>
        if ((Hashing.hash60Scalar(s"ivf_${cell}_$d") & 1L) == 0L) 1.0f else -1.0f
      }
      (cell, anchor)
    }.toDF("cell", "anchor")
  }

  /** Codebook rows pulled to the driver, sorted by cell ascending — the
    * bounded-by-nCells collect every assignment already paid implicitly
    * through `broadcast(codebook)`; here it feeds the per-row argmax scan
    * (float anchors widen to double — exact, the [[DotFold]] cast). */
  private[graft] def collectCodebook(
      codebook: DataFrame): (Array[Int], Array[Array[Double]]) = {
    val rows = codebook.select(col("cell"), col("anchor")).collect()
      .map { r =>
        val cell = r.get(0) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => other.toString.toInt
        }
        val anchor = r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray
        (cell, anchor)
      }.sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  /** Group-tagged codebook rows (cell, anchor, grp) pulled to the driver
    * for the per-row pruned scan ([[graft.functions.ArgMaxCosGrouped]]):
    * parallel arrays sorted by (grp, cell) ascending — each group is a
    * CONTIGUOUS SLICE (the expression scans only its row's slice, the
    * compiled form of the broadcast-hash join on grp; a global scan with
    * a tag filter was measured O(k) per row, ~66G wasted branch-ops at
    * sf100's k≈32k), and cells ascend within a slice so the strict
    * replace keeps the lowest cell on ties — `min(struct)`'s tie-break. */
  private[graft] def collectGroupedCodebook(centGrp: DataFrame)
      : (Array[Int], Array[Array[Double]], Array[Int]) = {
    val rows = centGrp.select(col("cell"), col("anchor"), col("grp")).collect()
      .map { r =>
        val anchor = r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray
        (r.getInt(0), anchor, r.getInt(2))
      }.sortBy(e => (e._3, e._1))
    (rows.map(_._1), rows.map(_._2), rows.map(_._3))
  }

  /** The per-row argmax-cosine Column over a driver-known codebook (the
    * [[graft.functions.ArgMaxCos]] scan — codebook ships as foldable
    * literals the extension builder unpacks once). */
  private def argMaxCosCol(emb: Column, cells: Array[Int],
                           anchors: Array[Array[Double]]): Column =
    call_function("graft_argmax_cos", emb,
      typedLit(cells.toSeq), typedLit(anchors.map(_.toSeq).toSeq))

  /** IVF assignment: each vector goes to its nearest (max cosine) codebook
    * cell. On a graft session this is ONE compiled per-row codebook scan
    * ([[graft.functions.ArgMaxCos]]) — a pure map over the corpus, no
    * exchange at any scale. The relational crossJoin + `min(struct)`
    * argmax ([[ivfAssignHof]]) remains the vanilla-session fallback and
    * the semantic definition; it pays a full-corpus exchange for the
    * `groupBy(vec_id)` (guide §2.4 — that exchange was one per assignment
    * and one per Lloyd iteration). Bit-equivalence pinned by
    * ArgMaxCosSpec. */
  def ivfAssign(corpus: DataFrame, codebook: DataFrame): DataFrame =
    if (graft.functions.Native.has("graft_argmax_cos")) {
      val (cells, anchors) = collectCodebook(codebook)
      corpus.select(col("vec_id"), col("embedding"),
        argMaxCosCol(col("embedding"), cells, anchors).as("cell"))
    } else ivfAssignHof(corpus, codebook)

  /** The engine-portable relational twin of [[ivfAssign]]: broadcast the
    * codebook, min(struct) argmax, no sort — one exchange on vec_id. */
  private[graft] def ivfAssignHof(corpus: DataFrame,
                                  codebook: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(codebook))
      .select(col("vec_id"), col("embedding"), col("cell"),
        cosine(col("embedding"), col("anchor")).as("acos"))
      .groupBy("vec_id")
      .agg(min(struct((-col("acos")).as("neg"), col("cell").as("cell"))).as("m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("m.cell").as("cell"))

  /** Lloyd's k-means over the embedding column, seeded by the
    * deterministic [[farthestInit]] anchors (or an explicit `init`
    * codebook): each iteration is one [[ivfAssign]] (argmax-cosine,
    * broadcast codebook) plus a centroid recompute — `posexplode` →
    * per-(cell, pos) exact-long mean → rebuild anchor arrays. One shuffle
    * per iteration (the (cell,pos) agg; the assign side is a broadcast
    * crossJoin + map-side min), codebook stays k·dim rows (always
    * broadcastable). Empty cells drop out (standard Lloyd's).
    * Returns (codebook, assignment).
    *
    * Centroid means are ORDER-INDEPENDENT since r11 (the [[groupCentroids]]
    * / E72 convention): components quantize to nano units
    * (`round(x·10⁹)` long), sum exactly, divide once — a double-sum mean
    * differs run-to-run at cluster scale because fp addition isn't
    * associative across partition orders, which made every fit
    * UNREPRODUCIBLE at exactly the corpus sizes where reproducibility
    * matters (a re-run of a 100 TB training-data clustering must yield
    * the same clusters). Quantization bias ≤ 5·10⁻¹⁰ per component, far
    * below embedding noise; KMeansSpec's planted-cluster/inertia gates
    * are unchanged. The iteration chain is therefore oracle-replayable
    * end-to-end given a fixed seed — s12_kmeans_iter gates TWO Lloyd
    * iterations from the hash-anchor [[ivfCodebook]] against a DuckDB
    * replay. The greedy [[farthestInit]] seeding stays spec-gated (its
    * sequential driver-side walk has no tractable SQL twin). */
  /** Deterministic farthest-point (greedy k-center) seeding: start from the
    * min-id vector, then repeatedly take the vector least similar to every
    * chosen anchor. nCells-1 scans, each a codegen'd max-cosine against
    * driver-literal anchors — the standard fix for the collapsed-cluster
    * degeneracy of data-blind random inits. */
  /** Greedy k-center (farthest-point) seeding on a deterministic
    * hash-ordered sample, run driver-side — ONE TakeOrdered job no matter
    * how many cells (the pqTrain seeding move). The round-1..9
    * formulation ran nCells−1 SEQUENTIAL full-corpus jobs whose max-cos
    * expression grew with the chosen set: O(k) scheduler round-trips and
    * O(k²) codegen/eval work before a single Lloyd iteration — measured
    * ~1 min per fit at 20k vectors / k = 64 (seeding alone dominated
    * training; see SCALING "Round 10"). A k-center seed needs SPREAD,
    * not the global argmax: greedy selection over a hash-deterministic
    * sample (engine-portable, ≥ 32·k points) seeds the same planted
    * clusters (KMeansSpec is unchanged — its fixtures are smaller than
    * the sample floor, so the sample IS the whole corpus and selection
    * is identical to the old full-corpus walk). */
  private def farthestInit(corpus: DataFrame, nCells: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sampleN = math.max(32 * nCells, 2048)
    val pts = corpus
      .select(col("vec_id"), col("embedding"),
        Hashing.hash60(concat(lit("kmseed_"), col("vec_id").cast("string")))
          .as("__h"))
      .orderBy(col("__h"), col("vec_id")).limit(sampleN)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1).map(_._2)
    require(pts.nonEmpty, "kmeansFit: empty corpus")
    // mirrors [[cosine]]'s exact IEEE op order (dot / (sqrt·sqrt), left-
    // to-right element folds) so the greedy walk picks the same points
    // the old full-corpus expression did on any in-sample fixture
    def cosD(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // same greedy rule as before: start from the min-vec_id point, then
    // repeatedly take the point whose max cosine to the chosen set is
    // smallest (the farthest point under cosine similarity)
    val chosen = scala.collection.mutable.ArrayBuffer[Array[Float]](pts.head)
    while (chosen.size < nCells) {
      chosen += pts.minBy(p => chosen.map(c => cosD(p, c)).max)
    }
    chosen.toSeq.zipWithIndex.map { case (a, i) => (i, a) }.toDF("cell", "anchor")
  }

  def kmeansFit(corpus: DataFrame, nCells: Int, iters: Int,
                dim: Int = 64,
                init: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    require(iters > 0, s"iters must be positive: $iters")
    if (!graft.functions.Native.has("graft_argmax_cos"))
      return kmeansFitHof(corpus, nCells, iters, dim, init)
    // Native Lloyd loop: the codebook lives on the DRIVER between
    // iterations (k·dim doubles — the same bound the broadcast already
    // imposed), so each iteration is ONE job: a per-row ArgMaxCos scan
    // (no exchange — the relational form shuffled the whole corpus per
    // iteration for its groupBy(vec_id) argmax) feeding the SAME
    // (cell, pos) nano-grid means expression as [[kmeansFitHof]], with
    // only the k anchor rows collected (k·dim doubles — a first cut
    // collected the k·dim (cell, pos) partial rows instead, ~2M Row
    // objects per iteration at sf100's k≈32k, measured driver-heavy).
    // The per-iteration localCheckpoint is gone — a driver-literal
    // codebook needs no lineage truncation. Means divide in-Spark exactly
    // as the relational form (s/(n·1e9), one IEEE divide on exact long
    // sums) — the fitted codebook is bit-identical (ArgMaxCosSpec; the
    // s12/s17-s20/s22 oracle hashes are the standing witnesses).
    val spark = corpus.sparkSession
    var (cells, anchors) = collectCodebook(
      init.getOrElse(farthestInit(corpus, nCells)))
    for (_ <- 0 until iters) {
      val means = corpus
        .select(argMaxCosCol(col("embedding"), cells, anchors).as("cell"),
          posexplode(transform(col("embedding"),
            x => round(x.cast("double") * lit(1.0e9)).cast("long"))))
        .groupBy("cell", "pos")
        .agg(count(lit(1)).as("__n"), sum(col("col")).as("__s"))
        .select(col("cell"), col("pos"),
          (col("__s").cast("double") / (col("__n").cast("double") * lit(1.0e9)))
            .as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s("m")).as("anchor"))
      val next = collectCodebook(means)
      cells = next._1
      anchors = next._2
    }
    import spark.implicits._
    val codebook = cells.zip(anchors).toSeq.toDF("cell", "anchor")
    (codebook,
      corpus.select(col("vec_id"), col("embedding"),
        argMaxCosCol(col("embedding"), cells, anchors).as("cell")))
  }

  /** The engine-portable relational Lloyd loop — [[kmeansFit]]'s vanilla-
    * session fallback and semantic definition (one [[ivfAssignHof]]
    * exchange + one (cell, pos) agg + an eager localCheckpoint per
    * iteration). */
  private[graft] def kmeansFitHof(corpus: DataFrame, nCells: Int, iters: Int,
                                  dim: Int = 64,
                                  init: Option[DataFrame] = None)
      : (DataFrame, DataFrame) = {
    require(iters > 0, s"iters must be positive: $iters")
    var codebook = init.getOrElse(farthestInit(corpus, nCells))
    for (_ <- 0 until iters) {
      // exact-long nano-grid mean (order-independent — see scaladoc)
      val means = ivfAssignHof(corpus, codebook)
        .select(col("cell"), posexplode(transform(col("embedding"),
          x => round(x.cast("double") * lit(1.0e9)).cast("long"))))
        .groupBy("cell", "pos")
        .agg(count(lit(1)).as("__n"), sum(col("col")).as("__s"))
        .select(col("cell"), col("pos"),
          (col("__s").cast("double") / (col("__n").cast("double") * lit(1.0e9)))
            .as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s("m")).as("anchor"))
      // k·dim values; eager checkpoint truncates the per-iteration lineage
      // (see the iterative-plan rule in SCALING.md) and keeps the broadcast
      // side tiny and precomputed
      codebook = means.localCheckpoint(true)
    }
    (codebook, ivfAssignHof(corpus, codebook))
  }

  /** Deterministic product-quantization codebook: `m` subspaces ×
    * `k` codes, ±1 components. Anchors are DISTINCT within a subspace by
    * construction — the low ⌈log₂ k⌉ dims carry the code's own bits (k
    * random sign patterns over few dims WILL collide by birthday, making
    * the colliding codes unreachable through the argmin tie-break), the
    * remaining dims come from the portable hash (same reproducibility
    * argument as [[ivfCodebook]]). Returns (sub, code, anchor[dim/m]). */
  def pqCodebook(spark: org.apache.spark.sql.SparkSession, m: Int = 8,
                 k: Int = 16, dim: Int = 64): DataFrame = {
    import spark.implicits._
    require(dim % m == 0, s"pq: m=$m must divide dim=$dim")
    val subDim = dim / m
    val bits = 32 - Integer.numberOfLeadingZeros(k - 1) // ceil(log2 k)
    require(bits <= subDim, s"pq: k=$k needs $bits code bits > subDim=$subDim")
    (for (sub <- 0 until m; code <- 0 until k) yield {
      val anchor = Array.tabulate(subDim) { d =>
        val bit =
          if (d < bits) (code >> d) & 1
          else (Hashing.hash60Scalar(s"pq_${sub}_${code}_$d") & 1L).toInt
        if (bit == 0) 1.0 else -1.0
      }
      (sub, code, anchor)
    }).toDF("sub", "code", "anchor")
  }

  /** Corpus exploded to per-subspace slices: (vec_id, sub, __sv). */
  private def pqSubvectors(corpus: DataFrame, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"pq: m=$m must divide dim=$dim")
    val subDim = dim / m
    corpus
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("vec_id"), col("sub"),
        slice(col("embedding"), col("sub") * subDim + 1, lit(subDim)).as("__sv"))
  }

  /** Nearest-anchor assignment per (vector, subspace) by L2:
    * argmin |v−c|² = argmin (|c|² − 2v·c) — no sqrt, no sort, one
    * broadcast join + `min(struct)`, ties to the lower code. |c|² rides
    * precomputed on the (tiny) codebook side. Keeps the subvector for the
    * training loop's centroid update. */
  private def pqAssign(subs: DataFrame, codebook: DataFrame): DataFrame = {
    val cb = codebook.withColumn("__n2", dot(col("anchor"), col("anchor")))
    subs.join(broadcast(cb), "sub")
      .select(col("vec_id"), col("sub"), col("code"), col("__sv"),
        (col("__n2") - lit(2.0) * dot(col("__sv"), col("anchor"))).as("__score"))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("__score").as("s"), col("code").as("code"))).as("m"),
        first(col("__sv")).as("__sv"))
      .select(col("vec_id"), col("sub"), col("m.code").as("code"), col("__sv"))
  }

  /** Product-quantization encode: each vector's `sub`-th `dim/m`-slice maps
    * to its nearest (L2) codebook entry; for the equal-norm ±1 hash
    * codebook this coincides with argmax dot. Output is m codes per
    * vector — at k=16/m=8 that is 8 bytes instead of 256 of floats, the
    * 32× compression that makes a 100 TB embedding corpus scannable.
    * Returns (vec_id, sub, code). */
  /** PQ codebook pulled to the driver for the per-row scan: entries
    * sorted (sub asc, code asc), `subOffsets(sub)..subOffsets(sub+1)`
    * delimiting each sub's codes (codes need not be dense — trained
    * codebooks drop empty codes). Requires subs 0..m-1 all present. */
  private[graft] def collectPqCodebook(codebook: DataFrame, m: Int)
      : (Array[Int], Array[Int], Array[Array[Double]]) = {
    val rows = codebook.select(col("sub"), col("code"), col("anchor"))
      .collect()
      .map { r =>
        (r.getInt(0), r.getInt(1), r.getSeq[Any](2).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray)
      }.sortBy(e => (e._1, e._2))
    val offsets = new Array[Int](m + 1)
    var i = 0
    rows.zipWithIndex.foreach { case ((sub, _, _), idx) =>
      require(sub >= 0 && sub < m, s"pq codebook sub $sub out of range 0..${m - 1}")
      while (i <= sub) { offsets(i) = idx; i += 1 }
    }
    while (i <= m) { offsets(i) = rows.length; i += 1 }
    (0 until m).foreach { s =>
      require(offsets(s) < offsets(s + 1), s"pq codebook has no codes for sub $s")
    }
    (offsets, rows.map(_._2), rows.map(_._3))
  }

  /** The per-row PQ assignment Column ([[graft.functions.PqCodes]]) —
    * array of m (code, d) structs, d = raw dot(subvector, chosen anchor). */
  private def pqCodesCol(emb: Column, offsets: Array[Int], codes: Array[Int],
                         anchors: Array[Array[Double]]): Column =
    call_function("graft_pq_codes", emb,
      typedLit(offsets.toSeq), typedLit(codes.toSeq),
      typedLit(anchors.map(_.toSeq).toSeq))

  def pqEncode(corpus: DataFrame, codebook: DataFrame, m: Int = 8,
               dim: Int = 64): DataFrame =
    if (graft.functions.Native.has("graft_pq_codes")) {
      // one compiled per-row scan + posexplode — a pure map over the
      // corpus; the relational form ([[pqEncodeHof]]) paid a full
      // (vec_id, sub) exchange for its groupBy argmin (guide §2.4)
      val (offsets, codes, anchors) = collectPqCodebook(codebook, m)
      corpus
        .select(col("vec_id"),
          posexplode(pqCodesCol(col("embedding"), offsets, codes, anchors)))
        .select(col("vec_id"), col("pos").as("sub"), col("col.code").as("code"))
    } else pqEncodeHof(corpus, codebook, m, dim)

  /** The engine-portable relational twin of [[pqEncode]] (vanilla-session
    * fallback and semantic definition). */
  private[graft] def pqEncodeHof(corpus: DataFrame, codebook: DataFrame,
                                 m: Int = 8, dim: Int = 64): DataFrame =
    pqAssign(pqSubvectors(corpus, m, dim), codebook)
      .select("vec_id", "sub", "code")

  /** Trained PQ codebook: per-subspace Lloyd's k-means in ONE distributed
    * loop over all subspaces (the subspace id is just another grouping
    * key — m independent k-means for the cost of one). Seeding is greedy
    * k-center (farthest-point) per subspace, run driver-side on a
    * deterministic hash-ordered sample — one TakeOrdered job total, the
    * standard sample-seeding move at corpus scale. Each iteration is one
    * broadcast-join assignment plus a per-(sub, code, pos) mean;
    * `localCheckpoint` truncates the per-iteration lineage (the iterative
    * -plan rule). Centroid means sum floats in partition order, so like
    * E33 this is spec-gated (reconstruction-error + recall), never
    * oracle-hashed. Empty cells drop out. Returns (sub, code, anchor). */
  def pqTrain(corpus: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 3,
              dim: Int = 64, sampleN: Int = 256): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val sample = corpus
      .select(col("vec_id"), col("embedding"),
        Hashing.hash60(concat(lit("pqseed_"), col("vec_id").cast("string"))).as("__h"))
      .orderBy(col("__h"), col("vec_id")).limit(sampleN)
      .select("embedding").as[Array[Float]].collect()
    require(sample.nonEmpty, "pqTrain: empty corpus")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val seeds = (0 until m).flatMap { s =>
      val pts = sample.map(v => v.slice(s * subDim, (s + 1) * subDim).map(_.toDouble))
      val chosen = scala.collection.mutable.ArrayBuffer(pts.head)
      while (chosen.size < k) {
        chosen += pts.maxBy(p => chosen.map(c => d2(p, c)).min)
      }
      chosen.toSeq.zipWithIndex.map { case (a, code) => (s, code, a) }
    }
    val subs = pqSubvectors(corpus, m, dim)
    var cb = seeds.toDF("sub", "code", "anchor")
    for (_ <- 0 until iters) {
      cb = pqAssign(subs, cb)
        .select(col("sub"), col("code"), posexplode(col("__sv")))
        .groupBy("sub", "code", "pos")
        .agg(avg(col("col").cast("double")).as("mv"))
        .groupBy("sub", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          x => x("mv")).as("anchor"))
        .localCheckpoint(true)
    }
    cb
  }

  /** PQ asymmetric-distance search over PRE-ENCODED codes: the query stays
    * un-quantized; its dot against every (sub, code) anchor builds a
    * per-query lookup table (m·k broadcastable rows), and a corpus
    * vector's approximate score is the SUM of its codes' table entries —
    * an equi-join on (sub, code) + one aggregate. `encoded` is a
    * [[pqEncode]] output (vec_id, sub, code), the STORED representation:
    * search touches 1-byte codes only, the float corpus is never read
    * (encode once at ingest, search many). Scores are float-sum
    * approximations (and partition-order summed), so this is spec-gated
    * like E33, not oracle-hashed; exactness on planted codebook points is
    * asserted in SimilaritySpec. */
  def pqAdcTopK(encoded: DataFrame, queries: DataFrame, codebook: DataFrame,
                topK: Int, m: Int = 8, dim: Int = 64): DataFrame = {
    val subDim = dim / m
    val qdots = queries
      .select(col("vec_id").as("q_id"), col("embedding"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("q_id"), col("sub"),
        slice(col("embedding"), col("sub") * subDim + 1, lit(subDim)).as("__qv"))
      .join(broadcast(codebook), "sub")
      .select(col("q_id"), col("sub"), col("code"),
        dot(col("__qv"), col("anchor")).as("__qd"))
    encoded.join(broadcast(qdots), Seq("sub", "code"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("__qd")).as("adc"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id").asc)))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("vec_id").as("nn_id"), col("adc"))
  }

  /** IVF probe: search only the nProbe nearest cells' inverted lists.
    * Exact cosine within the probed subset, per-query top-k. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, codebook: DataFrame,
              k: Int, nProbe: Int): DataFrame = {
    val assigned = ivfAssign(corpus, codebook)
    val qCells = queries.crossJoin(broadcast(codebook))
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("cell"),
        cosine(col("embedding"), col("anchor")).as("acos"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("acos").desc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select("q_id", "qe", "cell")
    qCells.join(assigned, "cell")
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        cosine(col("qe"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "nn_id", "cos")
  }

  /** IVF-PQ (IVFADC) search — [[ivfTopK]]'s cell probing composed with
    * [[pqAdcTopK]]'s asymmetric-distance scoring, the production ANN
    * index shape: the STORED representation is (cell assignment, m 1-byte
    * codes) per vector — the float corpus is read once at index build
    * ([[ivfAssign]] + [[pqEncode]]) and never again at search. A query
    * probes its nProbe nearest cells and ADC-scores only those cells'
    * code rows against its per-(sub, code) lookup table (m·k rows,
    * broadcast) — touched bytes per query ≈ nProbe/nCells of the encoded
    * table, which is itself 32× smaller than the floats. That is the
    * shape that searches a 100 TB embedding corpus: linear scans touch
    * compressed codes of a corpus fraction, and the only per-query state
    * is a broadcastable table.
    *
    * Unlike [[pqAdcTopK]]'s float-sum scores (spec-gated), the ADC score
    * here is EXACT and engine-portable: each table entry quantizes to the
    * nano grid (`round(dot·10⁹)` long — the s07/s12 convention) and a
    * vector's score is the exact long sum of its m entries, so ranking
    * (score DESC, id ASC) reproduces bit-identically in any engine and
    * the key is oracle-hashed, not spec-gated. Quantization perturbs
    * scores by ≤ m·0.5 nano — below any meaningful ADC gap.
    *
    * `encoded` is a [[pqEncode]] output, `assigned` an [[ivfAssign]]
    * projection (vec_id, cell); queries exclude themselves. Output:
    * (q_id, rank, nn_id, adc_nano). */
  def ivfPqTopK(encoded: DataFrame, assigned: DataFrame, queries: DataFrame,
                ivfCb: DataFrame, pqCb: DataFrame, topK: Int, nProbe: Int,
                m: Int = 8, dim: Int = 64): DataFrame =
    ivfPqTopKFromIndex(
      assigned.select(col("vec_id"), col("cell")).join(encoded, "vec_id"),
      queries, ivfCb, pqCb, topK, nProbe, m, dim)

  /** The PERSISTED IVF-PQ index artifact — the d11/d19 artifact treatment
    * for the production ANN index: ONE relational table
    * (vec_id, sub, code, cell) holding every vector's cell assignment and
    * its m 1-byte codes. Built once from the float corpus
    * ([[ivfAssign]] + [[pqEncode]] under FIXED codebooks); the floats are
    * never read again at search or at append time.
    *
    * Incrementality is structural, not approximate: assignment and
    * encoding are PER-VECTOR functions of the (frozen) codebooks, so
    * index(corpus ∪ shard) = index(corpus) ∪ index(shard) row-for-row —
    * a daily embedding shard encodes ONLY ITSELF ([[ivfPqIndex]] over the
    * shard) and appends; no rebuild, no re-read of the standing corpus
    * (proven union-equal to a full rebuild, shard stream driven end to
    * end, in StreamingSpec). Growing the codebooks, by contrast, IS a
    * rebuild — the standard IVF contract.
    *
    * [[ivfPqIndexWrite]] lays the table out partitioned BY CELL: an
    * nProbe search filters on the partition column, so at rest the scan
    * touches only the probed cells' files (static/dynamic partition
    * pruning does the inverted-list seek a native ANN engine hand-codes),
    * and each file stores 1-byte codes — the 32× compression that makes
    * a 100 TB float corpus searchable from a fraction of its bytes. */
  def ivfPqIndex(corpus: DataFrame, ivfCb: DataFrame, pqCb: DataFrame,
                 m: Int = 8, dim: Int = 64): DataFrame =
    if (graft.functions.Native.has("graft_argmax_cos") &&
        graft.functions.Native.has("graft_pq_codes")) {
      // assignment and encoding are PER-VECTOR functions of the frozen
      // codebooks (the incrementality contract), so the index build is
      // ONE map-only scan of the float corpus: cell argmax + m-code scan
      // per row, posexplode — no join, no exchange (the relational form
      // shuffled the corpus three times: assign argmax, encode argmin,
      // and the vec_id re-join)
      val (cells, anchors) = collectCodebook(ivfCb)
      val (offsets, codes, pqAnchors) = collectPqCodebook(pqCb, m)
      corpus
        .select(col("vec_id"),
          argMaxCosCol(col("embedding"), cells, anchors).as("cell"),
          posexplode(pqCodesCol(col("embedding"), offsets, codes, pqAnchors)))
        .select(col("vec_id"), col("pos").as("sub"), col("col.code").as("code"),
          col("cell"))
    } else ivfPqIndexHof(corpus, ivfCb, pqCb, m, dim)

  /** The engine-portable relational twin of [[ivfPqIndex]] (vanilla-
    * session fallback and semantic definition). */
  private[graft] def ivfPqIndexHof(corpus: DataFrame, ivfCb: DataFrame,
                                   pqCb: DataFrame, m: Int = 8,
                                   dim: Int = 64): DataFrame =
    ivfAssignHof(corpus, ivfCb).select(col("vec_id"), col("cell"))
      .join(pqEncodeHof(corpus, pqCb, m, dim), "vec_id")
      .select(col("vec_id"), col("sub"), col("code"), col("cell"))

  /** Persist an [[ivfPqIndex]] (plus both codebooks — an index artifact
    * that can't be searched without hunting down the codebooks that built
    * it isn't an artifact) as first-class parquet tables under `path`.
    * `append = true` is the shard path: new code rows land in their cell
    * partitions, codebooks (frozen by contract) are written once. */
  def ivfPqIndexWrite(index: DataFrame, ivfCb: DataFrame, pqCb: DataFrame,
                      path: String, append: Boolean = false): Unit = {
    index.write.mode(if (append) "append" else "overwrite")
      .partitionBy("cell").parquet(s"$path/codes")
    if (!append) {
      ivfCb.write.mode("overwrite").parquet(s"$path/ivf_codebook")
      pqCb.write.mode("overwrite").parquet(s"$path/pq_codebook")
    }
  }

  /** Read back a persisted artifact: (codes, ivf codebook, pq codebook). */
  def ivfPqIndexRead(spark: org.apache.spark.sql.SparkSession,
                     path: String): (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/ivf_codebook"),
      spark.read.parquet(s"$path/pq_codebook"))

  /** [[ivfPqTopK]] served FROM the stored index table — the scoring core
    * both entry points share: probe cells against the IVF codebook,
    * build the per-(sub, code) nano-grid ADC table, equi-join the probed
    * cells' code rows, exact-long sum, rank.
    *
    * With `pruneCells` (default on) the union of probed cells — a
    * driver-side set bounded by nCells, i.e. codebook-sized, the
    * coOccurrence-scalar discipline — is pushed as a STATIC `cell IN`
    * filter on the index side. On a written artifact (partitioned by
    * cell, [[ivfPqIndexWrite]]) that filter is a partition filter the
    * parquet scan resolves at file-listing time, so the search reads
    * ONLY the probed cells' files — the inverted-list seek, guaranteed
    * in the plan rather than left to runtime DPP (SimilaritySpec asserts
    * the partition count on an executed scan). Off switches to the pure
    * join (streaming-friendly: no driver action at plan time). */
  def ivfPqTopKFromIndex(index: DataFrame, queries: DataFrame,
                         ivfCb: DataFrame, pqCb: DataFrame,
                         topK: Int, nProbe: Int,
                         m: Int = 8, dim: Int = 64,
                         pruneCells: Boolean = true): DataFrame = {
    val subDim = dim / m
    val qCells = queries.crossJoin(broadcast(ivfCb))
      .select(col("vec_id").as("q_id"), col("cell"),
        cosine(col("embedding"), col("anchor")).as("acos"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("acos").desc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select("q_id", "cell")
    val prunedIndex =
      if (pruneCells) {
        val cells = qCells.select("cell").distinct()
          .collect().map(_.getInt(0)).sorted
        index.filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      } else index
    val qdots = queries
      .select(col("vec_id").as("q_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("embedding"))
      .select(col("q_id"), col("sub"),
        slice(col("embedding"), col("sub") * subDim + 1, lit(subDim)).as("__qv"))
      .join(broadcast(pqCb), "sub")
      .select(col("q_id"), col("sub"), col("code"),
        round(dot(col("__qv"), col("anchor")) * lit(1.0e9)).cast("long")
          .as("__qd"))
    broadcast(qCells)
      .join(prunedIndex, "cell")
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id", "sub", "code")
      .join(broadcast(qdots), Seq("q_id", "sub", "code"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("__qd")).as("adc_nano"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("adc_nano").desc, col("vec_id").asc)))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("vec_id").as("nn_id"),
        col("adc_nano"))
  }

  /** IVF-PQ shortlist + EXACT re-rank — the standard two-stage production
    * search, and the answer to coarse-quantizer resolution: ADC can rank
    * BETWEEN clusters but not finely WITHIN one (all same-cluster vectors
    * share nearly the same codes, and no amount of codebook training
    * fixes that — measured in SimilaritySpec: trained codebooks LOSE to
    * hash codebooks on within-cluster ranking). So the index serves a
    * cheap shortlist (top `shortlistR` by ADC, compressed codes only) and
    * exact cosine re-ranks just those rows — the float corpus is touched
    * for shortlistR rows per query instead of scanned: a selective join
    * by vec_id (at rest: a point-lookup-friendly read), which is how a
    * 100 TB float table participates in search without being read.
    * Recall becomes the CELL-probe recall (the IVF side), with the ADC
    * resolution limit bought back exactly. Output (q_id, rank, nn_id,
    * cos). */
  /** Residual vectors vs the coarse quantizer: x − μ_cell per vector,
    * doubles. The FAISS IVF-PQ move (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", §IV): PQ-encoding the RESIDUAL instead
    * of the raw vector quantizes a distribution whose spread is the
    * within-cell scatter rather than the corpus spread, so the same code
    * budget buys finer resolution. Exactness: float→double widening is
    * exact and the subtraction is one IEEE op on engine-portable inputs
    * (±1 hash anchors, or kmeansFit's nano-grid means), so the residual
    * frame — and everything encoded from it — replays bit-identically in
    * the DuckDB twin. Output (vec_id, cell, embedding = residual). */
  private[graft] def ivfResiduals(corpus: DataFrame,
                                  ivfCb: DataFrame): DataFrame =
    ivfAssign(corpus, ivfCb)
      .join(broadcast(ivfCb), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("embedding"), col("anchor"),
          (x, c) => x.cast("double") - c.cast("double")).as("embedding"))

  /** Residual-encoded IVF-PQ index build — [[ivfPqIndex]] with the codes
    * quantizing x − μ_cell instead of x. Returns (index, scales):
    *
    *  - index (vec_id, sub, code, cell) — same stored shape as
    *    [[ivfPqIndex]] (1-byte codes, cell-partitionable, shard-appendable:
    *    assignment and residual encode are per-vector functions of the
    *    frozen codebooks, so the incrementality contract is unchanged);
    *  - scales (sub, alpha) — the per-subspace least-squares DECODE scale
    *    for the ±1 hash codebook: residual components are within-cell
    *    scatter (‖r‖ ≪ ‖anchor‖ = √subDim), so the decoded residual is
    *    α·anchor with α* = Σ r·c / Σ ‖c‖² fitted over the corpus (one
    *    aggregate over the encoded rows — the scalar the fixed codebook
    *    can't carry; a TRAINED residual codebook would absorb it, but its
    *    float-sum means aren't oracle-replayable, the pqTrain trade-off).
    *    α rides the exact nano grid (round(dot·10⁹) long sums, one final
    *    division), so it is order-independent and engine-portable.
    *
    * The shared encoded frame is eagerly checkpointed serialized (the
    * b55/d17 storage lesson) — index and scales both read it, and at
    * corpus scale recomputing the assign+encode lineage twice is the
    * only alternative. */
  def ivfPqResidualIndex(corpus: DataFrame, ivfCb: DataFrame,
                         pqCb: DataFrame, m: Int = 8,
                         dim: Int = 64): (DataFrame, DataFrame) = {
    val subDim = dim / m
    if (graft.functions.Native.has("graft_argmax_cos") &&
        graft.functions.Native.has("graft_pq_codes")) {
      // residual build as a MAP-ONLY pipeline: per-row cell argmax →
      // residual subtraction → per-row PQ scan (the [[PqCodes]] struct
      // carries dot(sv, anchor_chosen) alongside the code, so the scales
      // term needs no pqCb re-join). index and scales are two map-only
      // scans of the corpus — the relational form paid two exchanges
      // (encode argmin + the vec_id re-join) plus an eager serialized
      // checkpoint of the n·m encoded rows purely to share that lineage;
      // with no shuffle left to share, the checkpoint goes too.
      val (offsets, codes, pqAnchors) = collectPqCodebook(pqCb, m)
      val enc = ivfResiduals(corpus, ivfCb)
        .select(col("vec_id"), col("cell"),
          posexplode(pqCodesCol(col("embedding"), offsets, codes, pqAnchors)))
      val index = enc.select(col("vec_id"), col("pos").as("sub"),
        col("col.code").as("code"), col("cell"))
      // same quantization tail as the relational form: round(d·1e9) long,
      // exact integer sums, one division (null d rows — short/null slices
      // — drop out of the sum but stay in the count, as before)
      val scales = enc
        .select(col("pos").as("sub"),
          round(col("col.d") * lit(1.0e9)).cast("long").as("__rd"))
        .groupBy("sub")
        .agg(sum(col("__rd")).as("__s"), count(lit(1)).as("__n"))
        .select(col("sub"), (col("__s").cast("double") /
          (col("__n").cast("double") * lit(subDim * 1.0e9))).as("alpha"))
      (index, scales)
    } else ivfPqResidualIndexHof(corpus, ivfCb, pqCb, m, dim)
  }

  /** The engine-portable relational twin of [[ivfPqResidualIndex]]
    * (vanilla-session fallback and semantic definition). */
  private[graft] def ivfPqResidualIndexHof(corpus: DataFrame,
                                           ivfCb: DataFrame, pqCb: DataFrame,
                                           m: Int = 8, dim: Int = 64)
      : (DataFrame, DataFrame) = {
    val subDim = dim / m
    val res = ivfResiduals(corpus, ivfCb)
    val enc = pqAssign(
        pqSubvectors(res.select(col("vec_id"), col("embedding")), m, dim),
        pqCb)
      .join(res.select(col("vec_id"), col("cell")), "vec_id")
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val index = enc.select(col("vec_id"), col("sub"), col("code"), col("cell"))
    val scales = enc.join(broadcast(pqCb), Seq("sub", "code"))
      .select(col("sub"),
        round(dot(col("__sv"), col("anchor")) * lit(1.0e9)).cast("long")
          .as("__rd"))
      .groupBy("sub")
      .agg(sum(col("__rd")).as("__s"), count(lit(1)).as("__n"))
      .select(col("sub"), (col("__s").cast("double") /
        (col("__n").cast("double") * lit(subDim * 1.0e9))).as("alpha"))
    (index, scales)
  }

  /** Search over a RESIDUAL-encoded index ([[ivfPqResidualIndex]]): the
    * ADC score approximates dot(q, x) through the reconstruction
    * x̂ = μ_cell + α_sub·anchor_code, i.e.
    *
    *   adc = dot(q, μ_cell) + Σ_sub α_sub · dot(q_sub, anchor_code)
    *
    * — one per-(query, probed-cell) base term (nProbe rows/query) plus
    * the usual per-(query, sub, code) table (m·k rows/query, and unlike
    * a textbook residual ADC it stays CELL-INDEPENDENT: the cell enters
    * only through the additive μ term, because the decode is linear —
    * so the broadcast table does not grow nProbe-fold). Every term rides
    * the nano grid (round(·10⁹) longs, exact integer sums), so ranking
    * reproduces bit-identically in the DuckDB twin, same as [[ivfPqTopK]].
    * Touched bytes per query are unchanged from the non-residual search:
    * probed cells' 1-byte codes only, partition-pruned at rest. */
  def ivfPqResidualTopK(index: DataFrame, scales: DataFrame,
                        queries: DataFrame, ivfCb: DataFrame,
                        pqCb: DataFrame, topK: Int, nProbe: Int,
                        m: Int = 8, dim: Int = 64,
                        pruneCells: Boolean = true): DataFrame = {
    val subDim = dim / m
    val qCells = queries.crossJoin(broadcast(ivfCb))
      .select(col("vec_id").as("q_id"), col("cell"),
        cosine(col("embedding"), col("anchor")).as("acos"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("acos").desc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select("q_id", "cell")
    val prunedIndex =
      if (pruneCells) {
        val cells = qCells.select("cell").distinct()
          .collect().map(_.getInt(0)).sorted
        index.filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      } else index
    // per-(query, probed cell) reconstruction base: round(dot(q, μ)·10⁹)
    val qmu = qCells
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding"))), "q_id")
      .join(broadcast(ivfCb), "cell")
      .select(col("q_id"), col("cell"),
        round(dot(col("embedding"), col("anchor")) * lit(1.0e9)).cast("long")
          .as("__qmu"))
    // per-(query, sub, code) decoded-residual term: round(α·dot(q_sub, c)·10⁹)
    val qdots = queries
      .select(col("vec_id").as("q_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("embedding"))
      .select(col("q_id"), col("sub"),
        slice(col("embedding"), col("sub") * subDim + 1, lit(subDim)).as("__qv"))
      .join(broadcast(pqCb), "sub")
      .join(broadcast(scales), "sub")
      .select(col("q_id"), col("sub"), col("code"),
        round(col("alpha") * dot(col("__qv"), col("anchor")) * lit(1.0e9))
          .cast("long").as("__qd"))
    broadcast(qCells)
      .join(prunedIndex, "cell")
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "cell", "vec_id", "sub", "code")
      .join(broadcast(qdots), Seq("q_id", "sub", "code"))
      .groupBy("q_id", "cell", "vec_id")
      .agg(sum(col("__qd")).as("__rsum"))
      .join(broadcast(qmu), Seq("q_id", "cell"))
      .select(col("q_id"), col("vec_id"),
        (col("__qmu") + col("__rsum")).as("adc_nano"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("adc_nano").desc, col("vec_id").asc)))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("vec_id").as("nn_id"),
        col("adc_nano"))
  }

  /** E141: SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540) — cluster-bounded embedding near-dup removal, the
    * standard curation step between exact/fuzzy text dedup and training.
    * The corpus is k-means-clustered ([[kmeansFit]], the oracle-replayable
    * nano-grid Lloyd chain), then pairwise cosine runs ONLY within each
    * cluster; a vector is dropped when some lower-id vector in its cluster
    * sits above the similarity threshold. Returns one verdict row per
    * vector: (vec_id, cell, kept, dup_of, cos) where dup_of is the
    * smallest qualifying lower-id partner (null when kept) and cos its
    * similarity.
    *
    * Determinism notes: the drop rule is "∃ lower-id in-cell partner with
    * cos ≥ τ" — anchor-independent and order-independent, unlike the
    * paper's keep-one-random-per-group rule, so the verdict set is a pure
    * function of (corpus, cells, τ) and DuckDB replays it row-for-row
    * (the paper's rule needs RNG state; ours needs none and removes the
    * same groups, keeping each group's min-id member).
    *
    * Scale shape (the 100 TB question): the within-cell self-join
    * shuffles once on `cell` and is quadratic ONLY in cell size — the
    * SemDeDup trade. `nCells` must scale with the corpus so cells stay
    * O(hundreds): callers use n/targetCellSize (the s21 key derives it
    * from the corpus row count; at the gate/bench decades the max(16,·)
    * floor keeps it at the oracle CTE's 16). The kmeans assign term is
    * n·k broadcast-codebook cosines, map-side only; cluster skew lands in
    * the AQE skew-join path. Pairs never materialize beyond the
    * threshold filter. */
  def semDedup(corpus: DataFrame, nCells: Int, iters: Int,
               threshold: Double, dim: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    val (_, assigned) = kmeansFit(corpus, nCells, iters, dim = dim,
      init = Some(ivfCodebook(spark, nCells, dim)))
    semVerdicts(assigned, threshold)
  }

  /** The SemDeDup pair/verdict tail shared by [[semDedup]] and
    * [[semDedupSampled]]: within-cell lower-id-partner drop rule over an
    * (vec_id, embedding, cell) assignment. One shuffle on `cell`; the pair
    * join streams through the threshold filter, so the n·cellSize/2 pair
    * rows never materialize. The verdict frame is checkpointed eagerly and
    * the wide embedding cache released in the same call
    * (DedupOps.materializeReleasing — release runs even if the checkpoint
    * action fails). */
  private def semVerdicts(assigned0: DataFrame, threshold: Double): DataFrame = {
    val assigned = assigned0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val a = assigned.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("__ea"))
    val b = assigned.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("__eb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_b").as("vec_id"), col("vec_a"),
        cosine(col("__ea"), col("__eb")).as("__cos"))
      .filter(col("__cos") >= lit(threshold))
      .groupBy("vec_id")
      .agg(min(struct(col("vec_a").as("dup_of"), col("__cos").as("cos")))
        .as("__m"))
      .select(col("vec_id"), col("__m.dup_of").as("dup_of"),
        col("__m.cos").as("cos"))
    DedupOps.materializeReleasing(
      assigned.select("vec_id", "cell")
        .join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"), col("dup_of").isNull.as("kept"),
          col("dup_of"), col("cos")),
      assigned)
  }

  /** E141 production path: SemDeDup with SAMPLE-FITTED cells and PRUNED
    * assignment — the configuration [[semDedup]]'s scaladoc promises at
    * 100 TB, as a runnable operator (reference scope: the curation step of
    * arXiv:2303.09540 §3 at their 11k-cluster / 440M-point regime).
    *
    * Three scale levers, each replacing a term of [[semDedup]] that grows
    * super-linearly when nCells tracks the corpus (k = n/targetCellSize):
    *
    * 1. SAMPLE FIT. Lloyd iterations run on a deterministic hash-ordered
    *    sample of `fitSampleN` rows (hash60("sdfit_"+vec_id) order — the
    *    farthestInit sampling move), not the corpus: fit cost is
    *    iters·fitSampleN·k regardless of n. The ABSOLUTE cap matters for
    *    the formula: with sampleN itself scaled to k the fit term would be
    *    ∝ k², so fitSampleN is a fixed budget and once k > fitSampleN/16
    *    the sample is simply the best k·16-point budget available
    *    (centroid quality degrades gracefully; verdict semantics never
    *    depend on cell QUALITY, only on the deterministic cell function).
    *    The sample REPARTITIONS after the global limit that materializes
    *    it: orderBy+limit plans as a single-partition GlobalLimit, and
    *    without the repartition every per-iteration [[kmeansFit]]
    *    aggregate over the sample runs on ONE task while the cluster
    *    idles (at the 65,536-row cap that is iters·sampleN·k cosines
    *    single-threaded — tens of minutes at k = 2¹⁶). Membership is
    *    fixed by the hash order before the repartition and the Lloyd
    *    means are exact-long nano-grid sums (order-independent), so the
    *    fitted codebook is BIT-IDENTICAL either way — pinned by
    *    SimilaritySpec, witnessed again by the s22 oracle hash.
    * 2. PRUNED ASSIGNMENT. Full-corpus assignment is the quadratic term of
    *    the s21 formula (n·k = n²/targetCellSize cosines). Here centroids
    *    are first bucketed to `coarseGroups` (default ⌈√k⌉) group anchors;
    *    each point ranks the NON-EMPTY groups (k·g + n·g cosines), then
    *    ranks only its group's centroids (n·k/g expected). Total assign ≈
    *    n·2√k — sub-quadratic (n^1.5/√cellSize with tiny constant) instead
    *    of n². Restricting the point's group rank to non-empty groups
    *    guarantees every point still gets a cell. Group anchors are
    *    KMEANS-OF-CENTROIDS: a second (tiny — k points) [[kmeansFit]] over
    *    the fitted centroids themselves, seeded from fixed ±1 hash planes
    *    ("sdg_" family). Raw hash planes as the anchors routed points by
    *    a data-blind partition of the sphere and measurably skewed cell
    *    sizes (fattening the quadratic-in-cell-size pair term — disclosed
    *    in SCALING r16); Lloyd-refined anchors sit where the centroid
    *    mass actually is, so group populations track the data. Cost is
    *    iters·k·g centroid-sized cosines — noise next to the fit.
    * 3. CAPPED nCells. k = min(maxCells, max(8, ⌈n/targetCellSize⌉)).
    *    The cap bounds the broadcast codebook (k·dim floats must ship to
    *    every executor) and the fit budget; past it, cells grow beyond
    *    targetCellSize and the pair term n²/2k takes over — the SemDeDup
    *    paper's own GPU-brute regime (their k=11k over 440M points = 40k
    *    per cell). Set maxCells to the codebook-broadcast budget, not
    *    below ⌈n/targetCellSize⌉, unless you accept that trade.
    *
    * With the cap not binding, cost = n·targetCellSize/2 pairs (exactly
    * linear) + n·2√k assign + iters·fitSampleN·k fit (both linear per
    * decade once fitSampleN caps) — the measured linear sibling to s21's
    * quadratic-by-formula gate configuration, as d09 is to d14.
    *
    * Determinism: sample membership (hash order, vec_id tie-break), group
    * and cell ranks (cos desc, id asc — [[ivfAssign]]'s tie-break), and
    * the verdict rule are all pure functions of the corpus; the s22 oracle
    * replays the whole chain (sample → 2 Lloyd rounds → group prune →
    * assign → pairs → verdicts) in SQL. */
  def semDedupSampled(corpus: DataFrame, targetCellSize: Int, maxCells: Int,
                      iters: Int, threshold: Double,
                      fitSampleN: Int = 65536,
                      coarseGroups: Option[Int] = None,
                      dim: Int = 64): DataFrame = {
    require(targetCellSize >= 2, s"targetCellSize must be >= 2: $targetCellSize")
    require(maxCells >= 8, s"maxCells must be >= 8: $maxCells")
    require(fitSampleN >= 16, s"fitSampleN must be >= 16: $fitSampleN")
    val spark = corpus.sparkSession
    val n = corpus.count()
    val nCells = math.min(maxCells.toLong,
      math.max(8L, math.ceil(n.toDouble / targetCellSize).toLong)).toInt
    val g = coarseGroups.getOrElse(
      math.max(2, math.ceil(math.sqrt(nCells.toDouble)).toInt))
    // sample membership is fixed by the hash-ordered global limit; the
    // repartition only redistributes those rows so the per-iteration fit
    // aggregates run on every core instead of the GlobalLimit's single
    // partition (nano-grid means are order-independent → bit-identical
    // codebook, pinned in SimilaritySpec)
    val fit = corpus
      .select(col("vec_id"), col("embedding"),
        Hashing.hash60(concat(lit("sdfit_"), col("vec_id").cast("string")))
          .as("__h"))
      .orderBy(col("__h"), col("vec_id")).limit(fitSampleN)
      .select("vec_id", "embedding")
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    val (icb, _) = kmeansFit(fit, nCells, iters, dim = dim,
      init = Some(ivfCodebook(spark, nCells, dim)))
    // group anchors: kmeans-of-centroids — Lloyd over the k fitted
    // centroids (a k-row corpus), seeded from fixed ±1 "sdg_" hash planes
    // (own seed family, independent of the "ivf_" Lloyd init planes). The
    // returned assignment IS the centroid → group routing.
    import spark.implicits._
    val gInit = (0 until g).map { grp =>
      val anchor = Array.tabulate(dim) { d =>
        if ((graft.functions.Hashing.hash60Scalar(s"sdg_${grp}_$d") & 1L) == 0L)
          1.0 else -1.0
      }
      (grp, anchor)
    }.toDF("cell", "anchor")
    val (gFit, centAssign) = kmeansFit(
      icb.select(col("cell").as("vec_id"), col("anchor").as("embedding")),
      g, iters, dim = dim, init = Some(gInit))
    val gcb = gFit.select(col("cell").as("grp"), col("anchor").as("ganchor"))
    // centroid → group (k rows total; Lloyd's own final assignment)
    val centGrp = centAssign
      .select(col("vec_id").as("cell"), col("embedding").as("anchor"),
        col("cell").as("grp"))
    semVerdicts(prunedAssign(corpus, gcb, centGrp), threshold)
  }

  /** The pruned two-stage assignment of [[semDedupSampled]]: point → best
    * NON-EMPTY group (ranking only groups that hold ≥1 centroid guarantees
    * the pruned candidate set is never empty, so no point drops out) →
    * nearest centroid WITHIN that group (ivfAssign tie-break). On a graft
    * session both stages fuse into ONE compiled map-only projection per
    * row ([[graft.functions.ArgMaxCos]] over the live group anchors
    * feeding [[graft.functions.ArgMaxCosGrouped]] over the centroids) —
    * no exchange at any scale; the relational twin ([[prunedAssignHof]])
    * pays two full-corpus groupBy(vec_id) exchanges for its argmaxes.
    * Bit-equivalence pinned by ArgMaxCosSpec; the s22 oracle hash is the
    * standing witness. */
  private[graft] def prunedAssign(corpus: DataFrame, gcb: DataFrame,
                                  centGrp: DataFrame): DataFrame =
    if (graft.functions.Native.has("graft_argmax_cos") &&
        graft.functions.Native.has("graft_argmax_cos_grouped")) {
      val (cells, anchors, groups) = collectGroupedCodebook(centGrp)
      val live = groups.toSet
      val (gAll, gaAll) = collectCodebook(
        gcb.select(col("grp").as("cell"), col("ganchor").as("anchor")))
      val keep = gAll.indices.filter(i => live(gAll(i)))
      val grps = keep.map(gAll).toArray
      val ganchors = keep.map(gaAll).toArray
      corpus.select(col("vec_id"), col("embedding"),
        call_function("graft_argmax_cos_grouped", col("embedding"),
          argMaxCosCol(col("embedding"), grps, ganchors),
          typedLit(cells.toSeq), typedLit(anchors.map(_.toSeq).toSeq),
          typedLit(groups.toSeq)).as("cell"))
    } else prunedAssignHof(corpus, gcb, centGrp)

  /** The engine-portable relational twin of [[prunedAssign]] (vanilla-
    * session fallback and semantic definition): broadcast group rank +
    * broadcast-hash within-group rank, one groupBy(vec_id) exchange
    * each. */
  private[graft] def prunedAssignHof(corpus: DataFrame, gcb: DataFrame,
                                     centGrp0: DataFrame): DataFrame = {
    // k rows; eager checkpoint keeps the twice-broadcast side precomputed
    val centGrp = centGrp0.localCheckpoint(true)
    val liveGcb = gcb.join(centGrp.select("grp").distinct(), "grp")
    val ptGrp = corpus.crossJoin(broadcast(liveGcb))
      .select(col("vec_id"), col("embedding"), col("grp"),
        cosine(col("embedding"), col("ganchor")).as("__gc"))
      .groupBy("vec_id")
      .agg(min(struct((-col("__gc")).as("neg"), col("grp").as("grp"))).as("m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("m.grp").as("grp"))
    ptGrp.join(broadcast(centGrp), "grp")
      .select(col("vec_id"), col("embedding"), col("cell"),
        cosine(col("embedding"), col("anchor")).as("__ac"))
      .groupBy("vec_id")
      .agg(min(struct((-col("__ac")).as("neg"), col("cell").as("cell"))).as("m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("m.cell").as("cell"))
  }

  def ivfPqTopKReranked(index: DataFrame, corpus: DataFrame,
                        queries: DataFrame, ivfCb: DataFrame,
                        pqCb: DataFrame, topK: Int, shortlistR: Int,
                        nProbe: Int, m: Int = 8,
                        dim: Int = 64): DataFrame = {
    require(shortlistR >= topK, s"shortlistR=$shortlistR must be >= topK=$topK")
    val short = ivfPqTopKFromIndex(index, queries, ivfCb, pqCb,
      topK = shortlistR, nProbe = nProbe, m = m, dim = dim)
      .select(col("q_id"), col("nn_id"))
    short
      .join(corpus.select(col("vec_id").as("nn_id"),
        col("embedding").as("__ce")), "nn_id")
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("__qe"))), "q_id")
      .select(col("q_id"), col("nn_id"),
        cosine(col("__qe"), col("__ce")).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("nn_id"), col("cos"))
  }
}
