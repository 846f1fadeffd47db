package graft.entry

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{AnalyticsOps, CurationOps, DedupOps, Multimodal, SimilarityOps, TextOps}
import QueryHelpers._

/** Training-data pipeline queries over the documents/embeddings tables
  * (SURVEY.md §2E): text analysis (t), deduplication (d), similarity
  * search (s), multimodal plumbing (m). Every key is DuckDB-oracle-checked,
  * including the approximate ANN variants: the LSH planes and IVF codebook
  * are deterministic hash60 literals, so the bucket assignment — and hence
  * the full approximate result — is SQL-expressible. SimilaritySpec
  * additionally asserts their recall against the exact baseline.
  */
object DQueries {

  private val JaccardThreshold = 0.8
  private val CosineThreshold = 0.4

  /** Deterministic dirty-text augmentation for the t21 gate (the corpus is
    * clean): one C0 control char for even ids, two mojibake sequences for
    * every doc, a double-space run for ids % 3 == 0. Shared verbatim by the
    * Spark query and (via [[sqlLit]]) the DuckDB twin. */
  private val TextRepairAug: String = " caf\u00c3\u00a9 don\u00e2\u20ac\u2122t"

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  val queries: Map[String, Q] = Map(
    "t01_token_count" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("ws_tokens"),
          TextOps.bpeTokenCount(col("text")).as("bpe_tokens"))
        .orderBy("doc_id")
    }),

    "t02_quality_score" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), rnd(TextOps.qualityScore(col("text"))).as("quality"))
        .orderBy("doc_id")
    }),

    "t03_lang_id" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    "t04_fingerprint" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    "d01_exact_dedup" -> ((s, dir) => {
      DedupOps.exactDedup(documents(s, dir), col("doc_id"), col("text"))
        .orderBy("fingerprint")
    }),

    "d02_ngram_jaccard" -> ((s, dir) => {
      val sh = DedupOps.shingleSets(documents(s, dir), col("doc_id"), col("text"), 3)
      DedupOps.jaccardPairsBrute(sh, JaccardThreshold)
        .select(col("doc_a"), col("doc_b"), rnd(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    "d03_minhash_lsh" -> ((s, dir) => {
      // Scale path: LSH banding prunes candidates, exact Jaccard verifies.
      // Same oracle as d02 — with 32x4 banding the per-pair miss probability
      // at J>=0.8 is <5e-8, so the verified output equals brute force.
      val sh = DedupOps.shingleSets(documents(s, dir), col("doc_id"), col("text"), 3)
      DedupOps.minhashLshPairs(sh, JaccardThreshold)
        .select(col("doc_a"), col("doc_b"), rnd(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    "d06_dedup_clusters" -> ((s, dir) => {
      // Cluster assignment over the LSH-mined near-dup pairs: each doc gets
      // its connected component's min id as representative; keep one per
      // cluster.
      val docs = documents(s, dir)
      val sh = DedupOps.shingleSets(docs, col("doc_id"), col("text"), 3)
      val pairs = DedupOps.minhashLshPairs(sh, JaccardThreshold)
      DedupOps.dedupClusters(docs.select("doc_id"), pairs, strict = true)
        .select(col("doc_id"), col("rep"), col("keep").cast("int").as("keep"))
        .orderBy("doc_id")
    }),

    "d12_canonical" -> ((s, dir) => {
      // E91: keep-best-per-cluster — the drop rule a real dedup pipeline
      // applies after clustering: argmax integer quality (ties to the
      // lower id) picks each near-dup cluster's canonical doc. Simhash
      // pairs feed the clusters here; the stage composes with any miner.
      val docs = documents(s, dir)
      val fp = DedupOps.simhash60(docs, col("doc_id"), col("text"))
      val pairs = DedupOps.simhashPairs(fp, maxHamming = 3)
        .select(col("doc_a"), col("doc_b"))
      val clusters = DedupOps.dedupClusters(docs.select("doc_id"), pairs,
        strict = true)
      val scores = docs.select(col("doc_id"),
        round(TextOps.qualityScore(col("text")) * lit(1000000.0))
          .cast("long").as("q_micro"))
      DedupOps.canonicalPerCluster(clusters, scores, col("doc_id"),
          col("q_micro"))
        .orderBy("doc_id")
    }),

    "d13_substring_dup" -> ((s, dir) => {
      // E93: substring-level exact-dup stats — strided 40-char windows,
      // a position is duplicated when its hash60 key occurs in >= 2
      // distinct docs. Portable keys make the full stat SQL-expressible.
      DedupOps.substringDupStats(documents(s, dir), col("doc_id"),
          col("text"), window = 40, stride = 10)
        .orderBy("doc_id")
    }),

    "d15_substring_contam" -> ((s, dir) => {
      // E94: character-level decontamination — fraction of each doc's
      // strided 40-char windows appearing verbatim (stride-1 keys, any
      // alignment) in the doc_id<20 "benchmark" slice (the d07 slice).
      val docs = documents(s, dir)
      DedupOps.crossSubstringContam(docs, col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 20), col("text"),
          window = 40, stride = 10)
        .orderBy("doc_id")
    }),

    "d16_source_overlap" -> ((s, dir) => {
      // E104: source-overlap audit matrix — exact pairwise shingle-set
      // Jaccard between sources on the portable 60-bit keys, complete
      // S·(S-1)/2 matrix with zero-overlap pairs, int64 ppm grid.
      DedupOps.sourceOverlap(documents(s, dir), col("source"), col("text"),
          k = 3)
        .orderBy("src_a", "src_b")
    }),

    "d17_containment" -> ((s, dir) => {
      // E107: asymmetric-containment pairs — the quote/subset dups that
      // Jaccard LSH structurally misses; exact inverted-index
      // intersections on 60-bit keys, df-pruned at 500, 0.6 threshold.
      DedupOps.containmentPairs(documents(s, dir), col("doc_id"),
          col("text"), k = 3, thresholdPpm = 600000L, maxDf = 500L)
        .orderBy("doc_a", "doc_b")
    }),

    "d07_decontam" -> ((s, dir) => {
      // E30 through the gate: docs sharing any 5-gram with the doc_id<20
      // "benchmark" slice — semi-join on portable 60-bit gram hashes.
      val docs = documents(s, dir)
      DedupOps.decontaminate(docs, col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 20), col("text"), k = 5)
        .orderBy("doc_id")
    }),

    "d08_line_dedup" -> ((s, dir) => {
      // E37 through the gate: lines (10-token windows over the single-line
      // corpus) occurring in >= 2 distinct docs are boilerplate — stripped
      // everywhere, surviving text reassembled in order.
      DedupOps.boilerplateStrip(documents(s, dir), col("doc_id"), col("text"),
          lineWords = 10, minDocs = 2)
        .select(col("id").as("doc_id"), col("clean_text"), col("n_removed"))
        .orderBy("doc_id")
    }),

    "d04_simhash" -> ((s, dir) => {
      // maxHamming 3 with multi-index chunk candidates: pigeonhole makes the
      // chunked plan's recall exact, so it matches the brute-force oracle.
      val fp = DedupOps.simhash60(documents(s, dir), col("doc_id"), col("text"))
      DedupOps.simhashPairs(fp, maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    "d05_embedding_dup" -> ((s, dir) => {
      SimilarityOps.cosinePairsBrute(embeddings(s, dir), CosineThreshold)
        .select(col("vec_a"), col("vec_b"), rnd(col("cos")).as("cos"))
        .orderBy("vec_a", "vec_b")
    }),

    "d18_embedding_simhash" -> ((s, dir) => {
      // E122 through the gate: the corpus is augmented with planted
      // near-identical twins (vec_id + 1e6, first dim scaled 1.5x — pure
      // double arithmetic both engines replay exactly), because the base
      // embeddings have no pairs in the tight cos>=0.95 regime this
      // operator targets. Everything casts to double FIRST so the
      // augmented union is one type and the oracle's CAST matches.
      val base = embeddings(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val twins = embeddings(s, dir).filter(col("vec_id") < 50)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, x.cast("double") * lit(1.5))
              .otherwise(x.cast("double"))).as("embedding"))
      SimilarityOps.embeddingNearDupPairs(base.unionByName(twins),
          threshold = 0.95, maxHamming = 3)
        .select(col("vec_a"), col("vec_b"), col("hamming"),
          rnd(col("cos")).as("cos"))
        .orderBy("vec_a", "vec_b")
    }),

    "d19_cross_embedding_dedup" -> ((s, dir) => {
      // E123 through the gate: the twins play the freshly-ingested shard,
      // the base embeddings the standing corpus — pairs cross sides only
      // (no corpus self-pairing), same sketches/planes as d18.
      val base = embeddings(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val twins = embeddings(s, dir).filter(col("vec_id") < 50)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, x.cast("double") * lit(1.5))
              .otherwise(x.cast("double"))).as("embedding"))
      SimilarityOps.crossEmbeddingNearDupPairs(twins, base,
          threshold = 0.95, maxHamming = 3)
        .select(col("vec_a"), col("vec_b"), col("hamming"),
          rnd(col("cos")).as("cos"))
        .orderBy("vec_a", "vec_b")
    }),

    "d20_dedup_recall_eval" -> ((s, dir) => {
      // E128: the dedup-quality audit — MEASURED recall/precision of the
      // banded LSH miner vs brute ground truth on the deterministic
      // half-sample (t05 machinery). The oracle replays the sample and
      // the brute truth and asserts the miner found every pair: at 32×4
      // banding the per-pair miss probability at J≥0.8 is < 5e-8 (the
      // d03 adjudication), so any measured miss hash-mismatches the gate.
      DedupOps.dedupRecallEval(documents(s, dir), col("doc_id"),
        col("text"), JaccardThreshold)
    }),

    "d21_simhash_recall_eval" -> ((s, dir) => {
      // E129: the d04 audit — the multi-index pigeonhole makes the banded
      // candidate set provably EXHAUSTIVE at maxHamming 3, so measured
      // recall/precision must be exactly 1000000; the eval exists to
      // MEASURE that on any corpus (a chunk-scheme bug surfaces here as
      // recall < 1e6 before it silently loses dup pairs in production).
      DedupOps.simhashRecallEval(documents(s, dir), col("doc_id"),
        col("text"), maxHamming = 3)
    }),

    "d22_embedding_recall_eval" -> ((s, dir) => {
      // E130: the d18 audit — hyperplane-sketch recall is genuinely
      // probabilistic (cos ≥ threshold at hamming > 3 is a miss), so this
      // is a MEASURED number, reproduced exactly by the oracle because
      // the planes are hash-derived literals. Corpus is d18's
      // twin-augmented one so the tight cos≥0.95 regime is populated.
      val base = embeddings(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val twins = embeddings(s, dir).filter(col("vec_id") < 50)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, x.cast("double") * lit(1.5))
              .otherwise(x.cast("double"))).as("embedding"))
      SimilarityOps.embeddingSketchRecallEval(base.unionByName(twins),
        threshold = 0.95, maxHamming = 3)
    }),

    "s01_ann_topk" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .select(col("q_id"), col("rank"), col("nn_id"), rnd(col("cos")).as("cos"))
        .orderBy("q_id", "rank")
    }),

    "s02_ann_lsh" -> ((s, dir) => {
      // Approximate, but fully deterministic: the hyperplanes are hash60
      // literals, so the DuckDB twin reproduces the exact bucket assignment.
      val emb = embeddings(s, dir)
      SimilarityOps.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .select(col("q_id"), col("rank"), col("nn_id"), rnd(col("cos")).as("cos"))
        .orderBy("q_id", "rank")
    }),

    "s11_mmr_rerank" -> ((s, dir) => {
      // E110: MMR diversity re-ranking over the LSH top-10 candidates —
      // 3 greedy picks at lambda=0.7, integer micro scoring, unrolled
      // rounds mirroring the BPE/t41 oracle convention.
      val emb = embeddings(s, dir)
      val cand = SimilarityOps.lshTopK(emb, emb.filter(col("vec_id") < 10),
        k = 10)
      SimilarityOps.mmrRerank(cand, emb, k = 3, lambdaPpm = 700000L)
        .orderBy("q_id", "mmr_rank")
    }),

    "s12_kmeans_iter" -> ((s, dir) => {
      // E131: the Lloyd TRAINING LOOP oracle-gated end-to-end — the r11
      // exact-long nano-grid means make each iteration order-independent,
      // so two iterations from the fixed hash-anchor ivfCodebook replay
      // exactly in DuckDB (assignment via the s03 argmax shape, means on
      // the E72/s07 grid; all sums < 2^53, so the final doubles are
      // bit-identical with no rounding). The greedy farthestInit seeding
      // stays spec-gated — this key pins everything after the seed.
      val (cb, _) = SimilarityOps.kmeansFit(embeddings(s, dir), nCells = 8,
        iters = 2,
        init = Some(SimilarityOps.ivfCodebook(s, nCells = 8, dim = 64)))
      cb.select(col("cell"), posexplode(col("anchor")))
        .select(col("cell"), col("pos"), col("col").as("centroid"))
        .orderBy("cell", "pos")
    }),

    "s03_ann_ivf" -> ((s, dir) => {
      // Approximate, but fully deterministic: the codebook anchors are
      // hash60 literals, so the DuckDB twin reproduces the cell assignment.
      val emb = embeddings(s, dir)
      val codebook = SimilarityOps.ivfCodebook(s, nCells = 16, dim = 64)
      SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 10), codebook,
          k = 5, nProbe = 4)
        .select(col("q_id"), col("rank"), col("nn_id"), rnd(col("cos")).as("cos"))
        .orderBy("q_id", "rank")
    }),

    "s13_ivfpq_topk" -> ((s, dir) => {
      // E133: the composed production index (IVFADC) — IVF cell probing ×
      // PQ asymmetric-distance scoring over stored 1-byte codes. Both
      // codebooks are hash-derived literals and the ADC table rides the
      // exact nano grid, so unlike the float-sum pqAdcTopK this search
      // is fully oracle-replayable.
      val emb = embeddings(s, dir)
      val ivfCb = SimilarityOps.ivfCodebook(s, nCells = 16, dim = 64)
      val pqCb = SimilarityOps.pqCodebook(s, m = 8, k = 16, dim = 64)
      val assigned = SimilarityOps.ivfAssign(emb, ivfCb)
        .select("vec_id", "cell")
      val encoded = SimilarityOps.pqEncode(emb, pqCb, m = 8, dim = 64)
      SimilarityOps.ivfPqTopK(encoded, assigned,
          emb.filter(col("vec_id") < 10), ivfCb, pqCb, topK = 5, nProbe = 4)
        .orderBy("q_id", "rank")
    }),

    "s16_ivfpq_rerank" -> ((s, dir) => {
      // E136: the two-stage production search — ADC shortlist (top-20
      // from stored codes, probed cells only) + exact cosine re-rank of
      // just those rows. The float corpus is touched for 20 rows per
      // query instead of scanned; the re-rank buys back the coarse
      // quantizer's within-cell resolution limit (SimilaritySpec:
      // 0.10 -> 0.775 recall on a planted clustered corpus). Both stages
      // are engine-exact, so the composed search is oracle-hashed.
      val emb = embeddings(s, dir)
      val ivfCb = SimilarityOps.ivfCodebook(s, nCells = 16, dim = 64)
      val pqCb = SimilarityOps.pqCodebook(s, m = 8, k = 16, dim = 64)
      SimilarityOps.ivfPqTopKReranked(
          SimilarityOps.ivfPqIndex(emb, ivfCb, pqCb), emb,
          emb.filter(col("vec_id") < 10), ivfCb, pqCb,
          topK = 5, shortlistR = 20, nProbe = 4)
        .orderBy("q_id", "rank")
    }),

    "s15_ivfpq_eval" -> ((s, dir) => {
      // E135: the s10 treatment for the PRODUCTION index — measured
      // recall@5 / reciprocal rank of the served IVF-PQ search against
      // brute exact-cosine truth. Both sides are engine-exact (nano-grid
      // ADC, exact cosine ranking), so unlike most ANN evals the metric
      // itself is oracle-hashed, not spec-asserted: a probe/encode/ADC
      // regression moves a NUMBER the gate pins.
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val ivfCb = SimilarityOps.ivfCodebook(s, nCells = 16, dim = 64)
      val pqCb = SimilarityOps.pqCodebook(s, m = 8, k = 16, dim = 64)
      SimilarityOps.annEvalMetrics(
          SimilarityOps.ivfPqTopK(
            SimilarityOps.pqEncode(emb, pqCb),
            SimilarityOps.ivfAssign(emb, ivfCb).select("vec_id", "cell"),
            q, ivfCb, pqCb, topK = 5, nProbe = 4),
          SimilarityOps.bruteForceTopK(emb, q, k = 5))
        .orderBy("q_id")
    }),

    "s14_ivfpq_artifact" -> ((s, dir) => {
      // The s13 search served FROM the persisted index artifact: build
      // the (vec_id, sub, code, cell) table, WRITE it partitioned by
      // cell plus both codebooks, READ it back, search the stored rows.
      // Same oracle as s13 — the key gates that the artifact round-trip
      // preserves the search bit-for-bit (and the cell layout means the
      // probe scan prunes to probed partitions at rest).
      val emb = embeddings(s, dir)
      val ivfCb = SimilarityOps.ivfCodebook(s, nCells = 16, dim = 64)
      val pqCb = SimilarityOps.pqCodebook(s, m = 8, k = 16, dim = 64)
      val path = sys.props("java.io.tmpdir") + "/graft_ivfpq_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9._-]", "_")
      SimilarityOps.ivfPqIndexWrite(
        SimilarityOps.ivfPqIndex(emb, ivfCb, pqCb), ivfCb, pqCb, path)
      val (index, icb, pcb) = SimilarityOps.ivfPqIndexRead(s, path)
      SimilarityOps.ivfPqTopKFromIndex(index,
          emb.filter(col("vec_id") < 10), icb, pcb, topK = 5, nProbe = 4)
        .orderBy("q_id", "rank")
    }),

    "s17_ivf_trained" -> ((s, dir) => {
      // E133/E131 composed: s13's IVF-PQ search under a TRAINED coarse
      // quantizer — two oracle-replayable Lloyd iterations (the s12
      // nano-grid chain, hash-anchor seed) refine the 16 cells onto the
      // data before the same stored-code ADC search runs. Probing
      // data-aligned cells is the IVF side's recall knob (the residual
      // the s16 re-rank can't buy back); pinning the trained search as
      // its own key makes the trained-vs-untrained delta gate-visible
      // next to s13, and s18 pins the recall numbers themselves.
      val emb = embeddings(s, dir)
      val (ivfCb, _) = SimilarityOps.kmeansFit(emb, nCells = 16, iters = 2,
        init = Some(SimilarityOps.ivfCodebook(s, nCells = 16, dim = 64)))
      val pqCb = SimilarityOps.pqCodebook(s, m = 8, k = 16, dim = 64)
      SimilarityOps.ivfPqTopK(
          SimilarityOps.pqEncode(emb, pqCb),
          SimilarityOps.ivfAssign(emb, ivfCb).select("vec_id", "cell"),
          emb.filter(col("vec_id") < 10), ivfCb, pqCb, topK = 5, nProbe = 4)
        .orderBy("q_id", "rank")
    }),

    "s18_ivf_trained_eval" -> ((s, dir) => {
      // E135 for the trained configuration: measured recall@5/MRR of the
      // s17 search against brute exact-cosine truth, oracle-hashed like
      // s15 — the s15/s18 pair pins the cell-training recall delta as
      // two numbers the gate compares every round.
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val (ivfCb, _) = SimilarityOps.kmeansFit(emb, nCells = 16, iters = 2,
        init = Some(SimilarityOps.ivfCodebook(s, nCells = 16, dim = 64)))
      val pqCb = SimilarityOps.pqCodebook(s, m = 8, k = 16, dim = 64)
      SimilarityOps.annEvalMetrics(
          SimilarityOps.ivfPqTopK(
            SimilarityOps.pqEncode(emb, pqCb),
            SimilarityOps.ivfAssign(emb, ivfCb).select("vec_id", "cell"),
            q, ivfCb, pqCb, topK = 5, nProbe = 4),
          SimilarityOps.bruteForceTopK(emb, q, k = 5))
        .orderBy("q_id")
    }),

    "s19_ivfpq_residual" -> ((s, dir) => {
      // E139: FAISS-style residual encoding under the trained coarse
      // quantizer — the codes quantize x − μ_cell (within-cell scatter)
      // instead of x, with a per-subspace least-squares decode scale α
      // standing in for the residual codebook training the oracle can't
      // replay. Differs from s17 ONLY in what the codes encode, so the
      // s18-vs-s20 recall delta isolates what residual encoding buys;
      // every term rides the nano grid, fully oracle-hashed.
      val emb = embeddings(s, dir)
      val (ivfCb, _) = SimilarityOps.kmeansFit(emb, nCells = 16, iters = 2,
        init = Some(SimilarityOps.ivfCodebook(s, nCells = 16, dim = 64)))
      val pqCb = SimilarityOps.pqCodebook(s, m = 8, k = 16, dim = 64)
      val (index, scales) = SimilarityOps.ivfPqResidualIndex(emb, ivfCb, pqCb)
      SimilarityOps.ivfPqResidualTopK(index, scales,
          emb.filter(col("vec_id") < 10), ivfCb, pqCb, topK = 5, nProbe = 4)
        .orderBy("q_id", "rank")
    }),

    "s20_ivfpq_residual_eval" -> ((s, dir) => {
      // E140: measured recall@5/MRR of the s19 residual search against
      // brute exact-cosine truth — completes the ADC quality grid
      // (s15 untrained / s18 trained / s20 trained+residual), all three
      // oracle-hashed numbers the gate compares every round.
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val (ivfCb, _) = SimilarityOps.kmeansFit(emb, nCells = 16, iters = 2,
        init = Some(SimilarityOps.ivfCodebook(s, nCells = 16, dim = 64)))
      val pqCb = SimilarityOps.pqCodebook(s, m = 8, k = 16, dim = 64)
      val (index, scales) = SimilarityOps.ivfPqResidualIndex(emb, ivfCb, pqCb)
      SimilarityOps.annEvalMetrics(
          SimilarityOps.ivfPqResidualTopK(index, scales, q, ivfCb, pqCb,
            topK = 5, nProbe = 4),
          SimilarityOps.bruteForceTopK(emb, q, k = 5))
        .orderBy("q_id")
    }),

    "s21_semdedup" -> ((s, dir) => {
      // E141: SemDeDup (arXiv:2303.09540) — kmeans-cluster-bounded
      // embedding dedup. Corpus augmented with the d18 planted twins
      // (vec_id + 1e6, first dim ×1.5 — pure double arithmetic both
      // engines replay) so the tight cos ≥ 0.95 regime has real prey;
      // nCells derives from corpus size (n/512, floor 16 — at gate sf
      // the floor holds, matching the 16-cell oracle Lloyd chain).
      val base = embeddings(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val twins = embeddings(s, dir).filter(col("vec_id") < 50)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, x.cast("double") * lit(1.5))
              .otherwise(x.cast("double"))).as("embedding"))
      val aug = base.unionByName(twins)
      val nCells = math.max(16, math.ceil(aug.count() / 512.0).toInt)
      // the oracle twin hard-codes a 16-cell Lloyd chain, and the DuckDB
      // compare only ever runs on the gate dir (sf0.01): fail LOUDLY the
      // day the GATE fixture outgrows 8192 rows instead of surfacing as an
      // opaque hash mismatch (regenerate the CTE alongside raising this).
      // Bench decades legitimately derive 40/391/… cells — no oracle there.
      // isGateDir = exact leaf-name match against the GateDirName constant
      // (not a substring sniff — see QueryHelpers).
      if (isGateDir(dir))
        require(nCells == 16, s"s21 oracle twin encodes 16 cells but the " +
          s"gate corpus now derives nCells=$nCells — regenerate the CTE")
      SimilarityOps.semDedup(aug, nCells = nCells, iters = 2,
          threshold = 0.95)
        .select(col("vec_id"), col("cell"), col("kept"), col("dup_of"),
          rnd(col("cos")).as("cos"))
        .orderBy("vec_id")
    }),

    "s22_semdedup_sampled" -> ((s, dir) => {
      // E143: the SemDeDup PRODUCTION configuration as a runnable, gated
      // path — sample-fitted Lloyd cells, coarse-group-pruned assignment,
      // capped nCells (SimilarityOps.semDedupSampled; the measured linear
      // sibling to s21's quadratic-by-formula configuration, as d09 is to
      // d14). Same d18-twin-augmented corpus as s21 so the two keys'
      // verdicts are directly comparable.
      val base = embeddings(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val twins = embeddings(s, dir).filter(col("vec_id") < 50)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, x.cast("double") * lit(1.5))
              .otherwise(x.cast("double"))).as("embedding"))
      val aug = base.unionByName(twins)
      if (isGateDir(dir))
        // gate constants — chosen so EVERY production lever BINDS on the
        // 550-row fixture and the oracle CTE replays it end-to-end: the
        // cap binds (ceil(550/64) = 9 → capped to 8 cells), the fit
        // sample binds (256 < 550 rows), and the 4-group prune is a real
        // prune (2 cells per group expected). The CTE hard-codes
        // (8 cells, 256 sample, 4 groups); cell-count drift is impossible
        // at maxCells = 8 because semDedupSampled derives
        // nCells = min(8, max(8, ⌈n/64⌉)) = 8 for every n (the min/max
        // clamp, not a require), and a fixture change that altered sample
        // membership would surface as the opaque hash mismatch.
        SimilarityOps.semDedupSampled(aug, targetCellSize = 64,
            maxCells = 8, iters = 2, threshold = 0.95, fitSampleN = 256,
            coarseGroups = Some(4))
          .select(col("vec_id"), col("cell"), col("kept"), col("dup_of"),
            rnd(col("cos")).as("cos"))
          .orderBy("vec_id")
      else
        // bench decades: the production formula — 512-target cells
        // (pair term n·256, exactly linear), ⌈√k⌉ coarse groups (assign
        // n·2√k), 65536-row fit budget (fit iters·sampleN·k, linear in k
        // once the budget caps), 2¹⁶ cell cap (broadcast-codebook
        // backstop, never binding below ~34M vectors)
        SimilarityOps.semDedupSampled(aug, targetCellSize = 512,
            maxCells = 65536, iters = 2, threshold = 0.95)
          .select(col("vec_id"), col("cell"), col("kept"), col("dup_of"),
            rnd(col("cos")).as("cos"))
          .orderBy("vec_id")
    }),

    "t44_dsir_select" -> ((s, dir) => {
      // E142: DSIR importance selection — target = the src0/src1/src2
      // slice, pool = everything else, top-100 pool docs by hashed-
      // unigram importance (deterministic, noise-free — see the op's
      // scaladoc for the two documented deviations from the paper).
      CurationOps.dsirSelect(documents(s, dir), col("doc_id"), col("text"),
          col("source").isin("src0", "src1", "src2"), topN = 100)
        .select(col("id").as("doc_id"), col("n_tokens"), col("w_micro"),
          col("rank"))
        .orderBy("rank")
    }),

    "s05_quantize" -> ((s, dir) => {
      // E32 through the gate: symmetric int8 quantization, exploded to
      // scalar rows. scale and q are single correctly-rounded IEEE ops on
      // exact inputs — hash-comparable unrounded.
      SimilarityOps.quantizeInt8(embeddings(s, dir), col("vec_id"),
          col("embedding"))
        .orderBy("vec_id", "pos")
    }),

    "s06_pq_encode" -> ((s, dir) => {
      // E39 through the gate: deterministic product quantization — 8
      // subspaces x 16 +-1 codes; argmax-dot assignment (== argmin L2 for
      // equal-norm anchors) per slice. The ADC search path over these
      // codes is spec-gated (float-sum scores), like E33.
      val cb = SimilarityOps.pqCodebook(s, m = 8, k = 16, dim = 64)
      SimilarityOps.pqEncode(embeddings(s, dir), cb, m = 8, dim = 64)
        .orderBy("vec_id", "sub")
    }),

    "m01_media_features" -> ((s, dir) => {
      val media = Multimodal.attachBinary(documents(s, dir))
      // byte-level columns only: the text payloads are format="raw" by
      // construction (the BMP/WAV header fields are exercised with real
      // fixture bytes in EtlSpec, where the oracle engine can't follow)
      Multimodal.extractFeatures(media)
        .select("doc_id", "n_bytes", "first_byte", "last_byte")
        .orderBy("doc_id")
    }),

    "m05_image_resize" -> ((s, dir) => {
      // E113 through the gate with REAL pixel work: the deterministic BMP
      // corpus renders, the operator decodes + nearest-neighbor halves it,
      // and the exact integer channel sums replay in SQL (output pixel
      // (x, y) = source pixel (2x, 2y) — sums over even coordinates of
      // the md5-derived channels).
      val imgs = Multimodal.demoBmpCorpus(documents(s, dir), col("doc_id"))
      Multimodal.resizeImages(imgs, factor = 2)
        .select(col("doc_id"), col("w_in"), col("h_in"), col("w_out"),
          col("h_out"), col("sum_b"), col("sum_g"), col("sum_r"))
        .orderBy("doc_id")
    }),

    "m07_video_dedup" -> ((s, dir) => {
      // E125 through the gate: frame-level containment over the binary
      // payloads (32-byte "frames", stride 1) — a doc whose every frame
      // appears in another is a contained clip. Pure composition of the
      // m02 frame explode, hash60, and the d17 inverted-index report.
      val media = Multimodal.attachBinary(documents(s, dir))
      Multimodal.videoNearDupPairs(media, col("doc_id"), col("payload"),
          frameBytes = 32, thresholdPpm = 600000L, maxDf = 50L)
        .orderBy("doc_a", "doc_b")
    }),

    "m06_audio_dedup" -> ((s, dir) => {
      // E124 through the gate: REAL audio bytes — each doc renders as a
      // deterministic mono 16-bit WAV (samples from hash60, groups of 4
      // with variant-silenced leading frames), the operator walks the RIFF
      // chunks back to samples, frame-energy-delta signs them, and mines
      // pairs via the d04 chunk machinery. The oracle replays the sample/
      // energy arithmetic directly (exact integers end to end).
      val wavs = Multimodal.demoWavCorpus(documents(s, dir), col("doc_id"))
      Multimodal.audioNearDupPairs(wavs, col("doc_id"), col("payload"),
          maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    "m03_image_dedup" -> ((s, dir) => {
      // E121 through the gate: REAL image bytes — each doc renders as a
      // deterministic 16x16 24-bpp BMP (pixels from hash60, groups of 4
      // planted as near-dup variants), the operator decodes the BYTES back
      // to pixels, aHash-60s them, and mines pairs via the d04 chunk
      // machinery. The oracle replays the pixel/hash arithmetic directly
      // (it cannot parse BMP, but every channel value is pure md5 math).
      val imgs = Multimodal.demoBmpCorpus(documents(s, dir), col("doc_id"))
      Multimodal.imageNearDupPairs(imgs, col("doc_id"), col("payload"),
          maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    "m08_image_recall_eval" -> ((s, dir) => {
      // E132: the m03 audit — the d21 treatment for the image miner.
      // Same planted-BMP corpus; MEASURED recall/precision of the
      // chunk-banded aHash miner vs brute all-pairs hamming truth on the
      // deterministic half-sample. The multi-index pigeonhole makes both
      // ppms provably 1000000 — the audit is the tripwire that catches a
      // chunk-extraction or verification bug before it silently loses
      // image dup pairs.
      val imgs = Multimodal.demoBmpCorpus(documents(s, dir), col("doc_id"))
      Multimodal.imageRecallEval(imgs, col("doc_id"), col("payload"),
        maxHamming = 3)
    }),

    "s04_range_join" -> ((s, dir) => {
      // E23 through the gate: events.value against 25 overlapping intervals
      // derived from the nation table; bucketized candidates must equal the
      // naive inequality join.
      val iv = nation(s, dir).select(col("n_nationkey"),
        (col("n_nationkey") * lit(15.0)).as("lo"),
        (col("n_nationkey") * lit(15.0) + lit(25.0)).as("hi"))
      graft.operators.JoinOps.bucketedRangeJoin(
          events(s, dir), col("value"), iv, col("lo"), col("hi"),
          bucketWidth = 20.0)
        .groupBy(col("n_nationkey")).agg(count(lit(1)).as("n"))
        .orderBy("n_nationkey")
    }),

    "t05_hash_sample" -> ((s, dir) => {
      // Deterministic stratified sampling on the portable hash60 — the
      // same subset is reproducible by any engine (no rand()).
      CurationOps.stratifiedHashSample(documents(s, dir), col("doc_id"),
          col("lang"), rates = Map("en" -> 0.3, "zh" -> 1.0),
          defaultRate = 0.6)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    "t06_quality_topq" -> ((s, dir) => {
      // Oracle path: exact per-stratum rank. The production plan
      // (percentile_approx threshold + broadcast join, no per-stratum
      // sort) is benched instead — see benchOverrides.
      CurationOps.qualityTopQuantile(documents(s, dir), col("doc_id"),
          col("lang"), rnd(TextOps.qualityScore(col("text"))), q = 0.5,
          exact = true)
        .select(col("id").as("doc_id"), col("stratum").as("lang"),
          col("score").as("quality"))
        .orderBy("doc_id")
    }),

    "t07_chunking" -> ((s, dir) => {
      CurationOps.chunkDocuments(documents(s, dir), col("doc_id"),
          col("text"), chunkTokens = 16)
        .select(col("id").as("doc_id"), col("chunk_id"), col("chunk_text"),
          col("n_tokens"))
        .orderBy("doc_id", "chunk_id")
    }),

    "t08_stopword_strip" -> ((s, dir) => {
      CurationOps.stripStopwords(documents(s, dir), col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("clean_text"), col("n_removed"))
        .orderBy("doc_id")
    }),

    "t11_seq_packing" -> ((s, dir) => {
      // E28 through the gate: greedy per-shard sequence packing over the
      // t07 chunks — cumsum window partitioned by portable-hash shard.
      val chunks = CurationOps.chunkDocuments(documents(s, dir),
        col("doc_id"), col("text"), chunkTokens = 16)
      CurationOps.packChunks(chunks, col("id"), col("chunk_id"),
          col("n_tokens"), budgetTokens = 64, nShards = 8)
        .select(col("id").as("doc_id"), col("chunk_id"), col("shard"),
          col("pack_id"))
        .orderBy("doc_id", "chunk_id")
    }),

    "t12_repetition" -> ((s, dir) => {
      // E29 through the gate: duplicate-trigram share per document; the
      // ratio is exact-integer division, bit-reproducible without rounding.
      TextOps.repetition(documents(s, dir), col("doc_id"), col("text"), k = 3)
        .select(col("id").as("doc_id"), col("n_grams"), col("dup_ratio"))
        .orderBy("doc_id")
    }),

    "t18_stratified_topn" -> ((s, dir) => {
      // E44 through the gate: exactly 5 docs per language by smallest
      // sampling hash — guaranteed count, deterministic identity.
      CurationOps.stratifiedTopN(documents(s, dir), col("doc_id"),
          col("lang"), n = 5)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    "t30_weighted_sample" -> ((s, dir) => {
      // E84: A-ES weighted sampling without replacement — exactly 20 docs
      // per language, inclusion probability ∝ (token count + 1), the
      // hash-derived draw identical in both engines.
      val docs = documents(s, dir)
        .withColumn("w", (TextOps.tokenCount(col("text")) + lit(1)).cast("double"))
      CurationOps.weightedSample(docs, col("doc_id"), col("lang"),
          col("w"), k = 20)
        .select(col("doc_id"), col("lang"), col("w"), col("samp_rank"))
        .orderBy("doc_id")
    }),

    "t31_drift" -> ((s, dir) => {
      // E86: token-length distribution drift between the even-id
      // "reference crawl" and the odd-id "current crawl" — per-bucket
      // PSI/KL on fixed caller-supplied edges (integral values on integral
      // edges, so bucketing is exact in both engines); ln terms 6-dp
      // rounded per the fp-sensitivity convention.
      val docs = documents(s, dir)
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("double").as("v"))
      AnalyticsOps.distributionDrift(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          col("v"), edges = Seq(20.0, 35.0, 50.0, 65.0, 80.0))
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          rnd6(col("p_ref")).as("p_ref"), rnd6(col("p_cur")).as("p_cur"),
          rnd6(col("psi_term")).as("psi_term"),
          rnd6(col("kl_term")).as("kl_term"))
        .orderBy("bucket")
    }),

    "t32_cms_freq" -> ((s, dir) => {
      // E89: count-min frequency estimate for every distinct token
      // (depth 4 × width 256 — narrow on purpose so collisions actually
      // engage the min). The sketch is built once and is mergeable per
      // shard; estimates are always ≥ truth (graft.functions.CountMin).
      val toks = documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
      val sk = graft.functions.CountMin.build(toks, col("term"),
        depth = 4, width = 256)
      graft.functions.CountMin.estimate(sk, toks.distinct(), col("term"),
          depth = 4, width = 256)
        .withColumnRenamed("key", "term")
        .orderBy("term")
    }),

    "t33_budget_select" -> ((s, dir) => {
      // E90: token-budget corpus selection — the docs a greedy
      // (quality desc, doc_id asc) pass admits while the running token
      // total stays ≤ 10k. Bucket-cumsum plan: the corpus itself is
      // never globally sorted (CurationOps.tokenBudgetSelect).
      val docs = documents(s, dir).select(col("doc_id"),
        round(TextOps.qualityScore(col("text")) * lit(1000000.0))
          .cast("long").as("q_micro"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      CurationOps.tokenBudgetSelect(docs, col("doc_id"), col("q_micro"),
          col("n_tokens"), budget = 10000L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "t34_budget_mixture" -> ((s, dir) => {
      // E92: per-language token budgets — the data-mixing spec as greedy
      // best-quality prefixes inside each budgeted stratum; unbudgeted
      // langs (es/fr here) contribute zero tokens by definition.
      val docs = documents(s, dir).select(col("doc_id"), col("lang"),
        round(TextOps.qualityScore(col("text")) * lit(1000000.0))
          .cast("long").as("q_micro"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      CurationOps.tokenBudgetMixture(docs, col("doc_id"), col("lang"),
          col("q_micro"), col("n_tokens"),
          budgets = Seq("en" -> 5000L, "de" -> 2000L, "zh" -> 2500L))
        .withColumnRenamed("id", "doc_id")
        .withColumnRenamed("stratum", "lang")
        .orderBy("doc_id")
    }),

    "t37_bigram_lm" -> ((s, dir) => {
      // E101: bigram-LM quality scoring (CCNet-style perplexity proxy),
      // self-trained on the corpus; micro-quantized int64 log-prob sums,
      // floor-through-double mean (Spark div truncates, DuckDB // floors
      // — both floor identically through the IEEE double path).
      val docs = documents(s, dir)
      TextOps.bigramLmScore(docs, col("text"), docs, col("doc_id"),
          col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    "t36_bpe_merges" -> ((s, dir) => {
      // E99: distributed BPE merge training — 8 rounds over the word-freq
      // table; deterministic argmax (freq desc, pair asc), greedy
      // left-to-right fusion via delimiter-encoded literal replace. The
      // oracle unrolls the same 8 rounds (the b46 convention).
      TextOps.trainBpeMerges(documents(s, dir), col("text"), numMerges = 8)
        .orderBy("rank")
    }),

    "t38_bpe_vocab" -> ((s, dir) => {
      // E103: the tokenizer vocabulary from the trained merges — corpus
      // chars + EOW in binary order, then merge products by rank.
      val docs = documents(s, dir)
      TextOps.bpeVocab(docs, col("text"),
          TextOps.trainBpeMerges(docs, col("text"), numMerges = 8))
        .orderBy("token_id")
    }),

    "t35_negative_sample" -> ((s, dir) => {
      // E97: deterministic contrastive negatives — 3 per anchor off the
      // hash ring (dense global index via bucketed prefix sums; a pick
      // landing on its own anchor advances one ring position). Every pick
      // is a pure hash60 function, so the oracle replays the exact ids.
      CurationOps.negativeSample(documents(s, dir), col("doc_id"), k = 3)
        .orderBy("anchor", "j")
    }),

    "t19_vocab_oov" -> ((s, dir) => {
      // E45 through the gate: 100-term vocabulary coverage; exact-integer
      // OOV ratio emitted UNROUNDED.
      TextOps.vocabOov(documents(s, dir), col("doc_id"), col("text"),
          vocabSize = 100)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_oov"),
          col("oov_ratio"))
        .orderBy("doc_id")
    }),

    "t17_bm25" -> ((s, dir) => {
      // E43 through the gate: BM25 top-10 for a literal 3-term query;
      // ratio idf (pinned like t09), fixed-order score tree, emitted
      // UNROUNDED.
      TextOps.bm25Score(documents(s, dir), col("doc_id"), col("text"),
          queryTerms = Seq("spark", "table", "query"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("id").asc)))
        .filter(col("rank") <= 10)
        .select(col("id").as("doc_id"), col("rank"), col("dl"), col("score"))
        .orderBy("rank")
    }),

    "t15_hash_split" -> ((s, dir) => {
      // E40 through the gate: deterministic 0.8/0.1/0.1 train/val/test
      // assignment; disjoint and exhaustive by construction.
      CurationOps.hashSplit(documents(s, dir), col("doc_id"),
          weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
    }),

    "t39_exact_split" -> ((s, dir) => {
      // E105: exact-count stratified split — per source, EXACTLY
      // floor(n_s·w) rows per split, ranked by the portable hash60 via
      // the bucketed dense rank (no per-stratum sort window).
      CurationOps.exactSplit(documents(s, dir), col("doc_id"), col("source"),
          weights = Seq("train" -> 800000L, "val" -> 100000L,
            "test" -> 100000L))
        .select(col("id").as("doc_id"), col("stratum").as("source"),
          col("split"))
        .orderBy("doc_id")
    }),

    "t43_balanced_shards" -> ((s, dir) => {
      // E115: quality-balanced round-robin shard assignment — every
      // shard receives the same per-source quality mixture; bucketed
      // rank on the quality grid, no per-stratum sort window.
      CurationOps.balancedShards(documents(s, dir), col("doc_id"),
          col("source"),
          round(TextOps.qualityScore(col("text")) * lit(1000000.0))
            .cast("long"),
          nShards = 4)
        .select(col("id").as("doc_id"), col("stratum").as("source"),
          col("q_micro"), col("shard"))
        .orderBy("doc_id")
    }),

    "t42_temperature_mix" -> ((s, dir) => {
      // E111: temperature-scaled mixture weights (alpha = 0.3) per
      // source — relative-share pow micro-quantized before the exact
      // integer normalization.
      CurationOps.temperatureWeights(documents(s, dir), col("source"),
          TextOps.tokenCount(col("text")), alphaPpm = 300000L)
        .orderBy("stratum")
    }),

    "t40_token_spectrum" -> ((s, dir) => {
      // E106: token-frequency spectrum — frequency-of-frequency table
      // with hapax row and cumulative head-coverage shares, all on the
      // exact int64 ppm grid.
      TextOps.tokenFrequencySpectrum(documents(s, dir), col("text"))
        .orderBy(col("f").desc)
    }),

    "t41_lr_quality" -> ((s, dir) => {
      // E108: distributed logistic regression (full-batch GD, 6 rounds,
      // lr 0.01) predicting lang='en' from three small-integer doc
      // features; micro-grid weights, exact integer gradient sums.
      AnalyticsOps.logisticScores(documents(s, dir), col("doc_id"),
          Seq(expr("length(text) div 100"),
            expr("size(split(trim(text), '\\\\s+')) div 10"),
            expr("length(regexp_replace(text, '[A-Za-z0-9\\\\s]', '')) div 10")),
          col("lang") === "en", rounds = 6, lrPpm = 10000L)
        .select(col("id").as("doc_id"), col("y"), col("p_micro"), col("pred"))
        .orderBy("doc_id")
    }),

    "t16_unigram_score" -> ((s, dir) => {
      // E41 through the gate: mean corpus frequency per doc — exact
      // integer sums, one double division, emitted UNROUNDED.
      TextOps.unigramScore(documents(s, dir), col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("n_tokens"), col("sum_tf"),
          col("score"))
        .orderBy("doc_id")
    }),

    "t14_mixture_sample" -> ((s, dir) => {
      // E38 through the gate: per-source token budget allocation (src0
      // over-weighted, src1 under-weighted, uniform default) followed by
      // the deterministic hash-bucket keep rule.
      CurationOps.mixtureSample(documents(s, dir), col("doc_id"),
          col("source"), TextOps.tokenCount(col("text")),
          shares = Map("src0" -> 0.2, "src1" -> 0.02),
          defaultShare = 0.05, budgetTokens = 5000L)
        .select(col("id").as("doc_id"), col("stratum").as("source"),
          col("n_tokens"), col("stratum_tokens"), rnd6(col("rate")).as("rate"))
        .orderBy("doc_id")
    }),

    "t13_pii_redact" -> ((s, dir) => {
      // E36 through the gate: the corpus has no natural PII, so each doc is
      // deterministically augmented (both sides run the same concat) with
      // an email, a phone, and an IP derived from doc_id; the operator must
      // mask all three and count them.
      val pii = documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or +39 3"),
          lpad(col("doc_id").cast("string"), 8, "0"),
          lit(" ip 10."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".0."), pmod(col("doc_id") * 7, lit(256)).cast("string")).as("text"))
      // sort BEFORE the regex chain (the b04 range-sampling lesson): the
      // redaction projections run once, above the sort, and preserve its
      // order; text→text width means the shuffle carries no extra bytes
      TextOps.redactPii(pii.orderBy("doc_id"), col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("red_text"),
          col("n_email"), col("n_ip"), col("n_phone"))
    }),

    "t10_heavy_hitters" -> ((s, dir) => {
      // E26 through the gate: MG-sketch candidate pruning must be invisible
      // — the two-pass plan's output equals the plain GROUP BY/HAVING twin.
      val toks = documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
      graft.functions.HeavyHitters.exactHeavyHitters(toks, col("term"),
          minShare = 0.005)
        .orderBy("term")
    }),

    "t09_tfidf_topk" -> ((s, dir) => {
      // logIdf = false: ratio-idf weighting, bit-reproducible across
      // engines — a distinct (pinned) scoring semantics; see
      // TextOps.tfidfTopK on where it can rank differently from log idf
      TextOps.tfidfTopK(documents(s, dir), col("doc_id"), col("text"), k = 3,
          logIdf = false)
        .select(col("id").as("doc_id"), col("rank"), col("term"),
          rnd6(col("score")).as("score"))
        .orderBy("doc_id", "rank")
    }),

    "d09_sparse_sim" -> ((s, dir) => {
      // E52: lexical near-dup via the inverted-index sparse-cosine
      // self-join; df-pruning (maxDf) bounds per-term pair work and kills
      // stopword skew. Norms rounded 6dp so the oracle's division matches.
      TextOps.sparseCosinePairs(documents(s, dir), col("doc_id"), col("text"),
          threshold = 0.3, maxDf = 200, normRound = Some(6))
        .select(col("id_a"), col("id_b"), rnd(col("cos")).as("cos"))
        .orderBy("id_a", "id_b")
    }),

    "d14_sparse_sim_frac" -> ((s, dir) => {
      // E52 scale-relative: df cutoff = floor(0.08 * corpus size), so the
      // near-dup linking terms (df ~5% of docs in this corpus) survive at
      // EVERY scale while the ~77%-df stopwords stay pruned — d09's
      // absolute maxDf=200 empties at sf0.1 (SCALING.md); this key stays
      // non-empty at 10x.
      TextOps.sparseCosinePairsFrac(documents(s, dir), col("doc_id"),
          col("text"), threshold = 0.3, maxDfFrac = 0.08, normRound = Some(6))
        .select(col("id_a"), col("id_b"), rnd(col("cos")).as("cos"))
        .orderBy("id_a", "id_b")
    }),

    "t20_quality_deciles" -> ((s, dir) => {
      // E53: per-language quality deciles (ntile over a deterministic
      // total order) — the exact path; the approx-threshold plan is E17.
      AnalyticsOps.quantileBuckets(
          documents(s, dir)
            .select(col("doc_id"), col("lang"),
              rnd(TextOps.qualityScore(col("text"))).as("quality")),
          Seq(col("lang")), col("quality"), col("doc_id"), n = 10,
          as = "decile")
        .select(col("doc_id"), col("lang"), col("quality"), col("decile"))
        .orderBy("doc_id")
    }),

    "t21_text_repair" -> ((s, dir) => {
      // E54 through the gate: the corpus text is clean, so each doc is
      // deterministically augmented (both sides run the same concat) with
      // a control char, two mojibake sequences, and a double-space run
      // derived from doc_id parity; the operator must fix and count them.
      val dirty = documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit("")).otherwise(lit("")),
          lit(TextRepairAug),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("  x")).otherwise(lit(""))
        ).as("text"))
      // sort BEFORE the repair chain (the b04 range-sampling lesson; see
      // t13) — projections above the sort preserve its order
      TextOps.repairText(dirty.orderBy("doc_id"), col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("clean_text"),
          col("n_ctrl"), col("n_mojibake"), col("n_wsrun"))
    }),

    "t22_bigram_pmi" -> ((s, dir) => {
      // E59: ratio-PMI collocations (log-free, bit-reproducible); minCount
      // prunes the bigram domain BEFORE the unigram joins.
      TextOps.bigramPmi(documents(s, dir), col("doc_id"), col("text"),
          minCount = 5)
        .select(col("bg"), col("c_ab"), col("c_a"), col("c_b"), col("pmi_ratio"))
        .orderBy("bg")
    }),

    "b42_checksum" -> ((s, dir) => {
      // E60: order-independent content checksum over int/string columns
      // (string forms round-trip identically across engines).
      graft.operators.AnalyticsOps.tableChecksum(lineitem(s, dir),
          Seq(col("l_orderkey"), col("l_linenumber"), col("l_returnflag")))
    }),

    "b45_partition_diff" -> ((s, dir) => {
      // E71: partition-level snapshot diff — month partitions of orders;
      // the new snapshot drops 1998-08 entirely (removed), re-dates
      // 1992-01 copies to 1999-01 (added), bumps 1997 %13 prices
      // (changed months), everything else bit-identical (same). Only
      // partition-count-sized checksum frames are joined; no row compare.
      val o = orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      val newer = o
        .filter(!(year(col("o_orderdate")) === 1998 &&
          month(col("o_orderdate")) === 8))
        .withColumn("o_totalprice",
          when(year(col("o_orderdate")) === 1997 &&
              col("o_orderkey") % 13 === 0,
            col("o_totalprice") + lit(1.0)).otherwise(col("o_totalprice")))
        .unionByName(o.filter(year(col("o_orderdate")) === 1992 &&
            month(col("o_orderdate")) === 1)
          .withColumn("o_orderdate", add_months(col("o_orderdate"), 84)))
      def ck(d: org.apache.spark.sql.DataFrame) =
        graft.operators.AnalyticsOps.partitionChecksum(d,
          date_trunc("month", col("o_orderdate")),
          Seq(col("o_orderkey"),
            round(col("o_totalprice") * 10000).cast("long")))
      graft.operators.AnalyticsOps.diffPartitionChecksums(ck(o), ck(newer))
        .select(unix_timestamp(col("part_key")).as("part_ts"), col("status"),
          col("n_old"), col("n_new"))
        .orderBy("part_ts")
    }),

    "t23_char_classes" -> ((s, dir) => {
      // E62: exact-integer character-class fractions (one division each —
      // unrounded, bit-reproducible).
      TextOps.charClassStats(documents(s, dir), col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("n_chars"), col("alpha_frac"),
          col("digit_frac"), col("space_frac"), col("upper_frac"),
          col("symbol_frac"))
        .orderBy("doc_id")
    }),

    "t24_domains" -> ((s, dir) => {
      // E63 through the gate: the corpus has no URLs, so each doc plants
      // one or two deterministic URLs (same concat both sides); the
      // operator extracts, lowercases hosts, and aggregates per domain.
      val withUrls = documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" see http://Site"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".Example.COM/page"),
          when(pmod(col("doc_id"), lit(2)) === 0,
            lit(" and https://mirror.example.org/x")).otherwise(lit(""))
        ).as("text"))
      TextOps.extractDomains(withUrls, col("doc_id"), col("text"))
        .orderBy("domain")
    }),

    "t25_token_diversity" -> ((s, dir) => {
      // E66: Simpson token diversity — per-row run-length fold, exact
      // integer collision probability, no shuffle.
      TextOps.tokenDiversity(documents(s, dir), col("doc_id"), col("text"))
        .select(col("id"), col("n_tokens"), col("collision_p"), col("diversity"))
        .orderBy("id")
    }),

    "t26_blocklist" -> ((s, dir) => {
      // E67: domain blocklist over the t24 planted URLs — doc_id%7==3 hits
      // the exact-host rule, doc_id%2==0 the subdomain rule; both-match
      // docs resolve to the minimum rule.
      val withUrls = documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" see http://Site"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".Example.COM/page"),
          when(pmod(col("doc_id"), lit(2)) === 0,
            lit(" and https://mirror.example.org/x")).otherwise(lit(""))
        ).as("text"))
      TextOps.domainBlocklist(withUrls, col("doc_id"), col("text"),
          Seq("site3.example.com", "example.org"))
        .orderBy("id")
    }),

    "s07_centroids" -> ((s, dir) => {
      // E74: exact per-label embedding centroids — nano-quantized long
      // sums make the mean order-independent and oracle-exact.
      SimilarityOps.groupCentroids(embeddings(s, dir), col("label"),
          col("embedding"))
        .orderBy("grp", "pos")
    }),

    "s10_ann_eval" -> ((s, dir) => {
      // E102: retrieval-evaluation metrics — recall@5 and reciprocal rank
      // of the LSH index against the exact baseline, all-integer ppm grid.
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      SimilarityOps.annEvalMetrics(
          SimilarityOps.lshTopK(emb, q, k = 5),
          SimilarityOps.bruteForceTopK(emb, q, k = 5))
        .orderBy("q_id")
    }),

    "s09_hard_negatives" -> ((s, dir) => {
      // E100: hard-negative mining — top-5 most-similar vectors per query
      // excluding same-label pairs (the "known positives"); exclusion runs
      // BEFORE ranking so positives never occupy rank slots.
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val positives = q.select(col("vec_id").as("q_id"),
          col("label").as("__l"))
        .join(emb.select(col("vec_id").as("pos_id"), col("label").as("__l")),
          "__l")
        .select("q_id", "pos_id")
      SimilarityOps.hardNegatives(emb, q, positives, k = 5)
        .select(col("q_id"), col("rank"), col("nn_id"),
          rnd(col("cos")).as("cos"))
        .orderBy("q_id", "rank")
    }),

    "s08_random_proj" -> ((s, dir) => {
      // E98: JL random projection 64 -> 8 — hash-derived Rademacher signs,
      // micro-quantized int64 sums; the oracle rebuilds the sign matrix
      // from the same hash60 parities and replays every sum exactly.
      SimilarityOps.randomProject(embeddings(s, dir), col("vec_id"),
          col("embedding"), inDim = 64, outDim = 8)
        .orderBy("vec_id", "j")
    }),

    "t28_url_canon" -> ((s, dir) => {
      // E75: URL canonicalization over deterministically planted messy
      // URLs — mixed-case hosts, default ports, utm/fbclid params in
      // every position, fragments, trailing slashes.
      val m2 = pmod(col("doc_id"), lit(2)); val m3 = pmod(col("doc_id"), lit(3))
      val withUrls = documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" http://Site"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".Example.COM:80/p"), pmod(col("doc_id"), lit(11)).cast("string"),
          when(m3 === 0, lit("/")).otherwise(lit("")),
          when(m2 === 0,
            concat(lit(" https://Mirror.example.org:443/x?utm_source=a&q="),
              pmod(col("doc_id"), lit(5)).cast("string"),
              lit("&fbclid=zz#sec"))).otherwise(lit(""))
        ).as("text"))
      TextOps.canonicalizeUrls(withUrls, col("doc_id"), col("text"))
        .orderBy("id", "url")
    }),

    "t29_char_entropy" -> ((s, dir) => {
      // E81: per-document character Shannon entropy — row-local sorted
      // run-length fold, no shuffle; 6-dp rounded (fp-order-sensitive ln
      // sum, the t02 rounding convention).
      TextOps.charEntropy(documents(s, dir), col("doc_id"), col("text"))
        .select(col("id"), col("n_chars"), col("n_distinct_chars"),
          rnd6(col("entropy_bits")).as("entropy_bits"))
        .orderBy("id")
    }),

    "d10_decontam_overlap" -> ((s, dir) => {
      // E82: graded decontamination — fraction of each doc's distinct
      // 5-grams appearing in the doc_id<20 "benchmark" slice (d07's
      // boolean rule, made a score).
      val docs = documents(s, dir)
      DedupOps.decontamOverlap(docs, col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 20), col("text"), k = 5)
        .orderBy("doc_id")
    }),

    "d11_cross_dedup" -> ((s, dir) => {
      // E85: incremental-ingestion dedup — near-dups of the odd-id "new
      // shard" against the even-id "corpus" via the cross-table LSH bucket
      // join; the brute-force cross Jaccard is the oracle (same 32x4
      // recall argument as d03, so the verified output equals it).
      val docs = documents(s, dir)
      val newSh = DedupOps.shingleSets(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        col("doc_id"), col("text"), 3)
      val corpSh = DedupOps.shingleSets(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        col("doc_id"), col("text"), 3)
      DedupOps.crossNearDupPairs(newSh, corpSh, JaccardThreshold)
        .select(col("new_id"), col("corpus_id"), rnd(col("jaccard")).as("jaccard"))
        .orderBy("new_id", "corpus_id")
    }),

    "m02_frame_sample" -> ((s, dir) => {
      // E61: metadata-driven frame explode over binary payloads — every
      // 4th 32-byte "frame" as its own row; content verified via hex (the
      // oracle engine cannot slice blobs, both engines hex identically).
      val media = Multimodal.attachBinary(documents(s, dir))
      Multimodal.sampleFrames(media, frameBytes = 32, stride = 4)
        .select(col("doc_id"), col("frame_no"), col("byte_offset"),
          hex(col("frame_bytes")).as("frame_hex"))
        .orderBy("doc_id", "frame_no")
    })
  )

  /** Production-plan twin benched in place of t06's exact-rank oracle
    * variant: approximate per-stratum threshold via the mergeable
    * percentile_approx sketch + broadcast join — no per-stratum sort, the
    * plan that survives a skewed billion-row stratum. */
  val benchOverrides: Map[String, Q] = Map(
    // Media keys benched over the MATERIALIZED corpora
    // (graft.sources.MediaFixtures — rendered once per testdata dir,
    // outside the timed region): a production corpus arrives as stored
    // payloads, so the bench measures byte-level decode + signature +
    // chunk-banded mining, not the md5 fixture synthesis the gate keys
    // render inline. Same payload bytes → same pairs (EtlSpec pins
    // render parity; the oracle gate stays on the inline render).
    "m03_image_dedup" -> ((s, dir) => {
      val imgs = graft.sources.MediaFixtures.bmpCorpus(s, dir)
      Multimodal.imageNearDupPairs(imgs, col("doc_id"), col("payload"),
          maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),
    "m05_image_resize" -> ((s, dir) => {
      val imgs = graft.sources.MediaFixtures.bmpCorpus(s, dir)
      Multimodal.resizeImages(imgs, factor = 2)
        .select(col("doc_id"), col("w_in"), col("h_in"), col("w_out"),
          col("h_out"), col("sum_b"), col("sum_g"), col("sum_r"))
        .orderBy("doc_id")
    }),
    "m06_audio_dedup" -> ((s, dir) => {
      val wavs = graft.sources.MediaFixtures.wavCorpus(s, dir)
      Multimodal.audioNearDupPairs(wavs, col("doc_id"), col("payload"),
          maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),
    "t06_quality_topq" -> ((s, dir) => {
      CurationOps.qualityTopQuantile(documents(s, dir), col("doc_id"),
          col("lang"), rnd(TextOps.qualityScore(col("text"))), q = 0.5,
          exact = false)
        .select(col("id").as("doc_id"), col("stratum").as("lang"),
          col("score").as("quality"))
    }),
    "d17_containment" -> ((s, dir) => {
      // The corpus-wide containment plan we'd ship at 100 TB: the
      // density-adaptive width keeps the inverted-index enumeration
      // (Σdf²/2) linear on vocabulary-saturated corpora — the fixed k=3
      // of the oracle key is quadratic on this fixture's 31-word vocab
      // (the standing SCALING analysis; the gate sf is small enough that
      // the oracle key stays green at k=3). Same threshold and maxDf cap
      // as the gate key.
      DedupOps.containmentPairsAuto(documents(s, dir), col("doc_id"),
          col("text"), thresholdPpm = 600000L, maxDf = 500L)
        .orderBy("doc_a", "doc_b")
    }),
    "d20_dedup_recall_eval" -> ((s, dir) => {
      // The audit budget is ABSOLUTE, not proportional: ground truth is
      // O(sample²) by design, so a fixed RATE grows the brute side
      // quadratically per decade (the r10 sf10 sweep measured the first
      // cut's fixed 2% at 105 s — 10k docs, 5×10⁷ brute pairs). Target
      // ~1000 sampled docs at any corpus size (= the gate's absolute
      // scale; a production audit holds its sample constant the same
      // way); the count is parquet-metadata cheap.
      val docs = documents(s, dir)
      val rate = math.min(1.0, 1000.0 / math.max(1L, docs.count()))
      DedupOps.dedupRecallEval(docs, col("doc_id"),
        col("text"), JaccardThreshold, sampleRate = rate)
    }),
    "d21_simhash_recall_eval" -> ((s, dir) => {
      // absolute audit budget, like d20 — but the brute side is one
      // bit_count per pair (no list intersection), so the same wall-time
      // envelope affords a 2000-doc sample (4M int64 pair ops)
      val docs = documents(s, dir)
      val rate = math.min(1.0, 2000.0 / math.max(1L, docs.count()))
      DedupOps.simhashRecallEval(docs, col("doc_id"), col("text"),
        maxHamming = 3, sampleRate = rate)
    }),
    "d22_embedding_recall_eval" -> ((s, dir) => {
      // absolute audit budget: brute truth is a 64-dim dot per pair —
      // 2000 sampled vectors ≈ 2M pairs ≈ 4·10⁸ multiplies, seconds of
      // work at any corpus size (the corpus count is metadata-cheap)
      val base = embeddings(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val twins = embeddings(s, dir).filter(col("vec_id") < 50)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, x.cast("double") * lit(1.5))
              .otherwise(x.cast("double"))).as("embedding"))
      val n = embeddings(s, dir).count() + 50
      val rate = math.min(1.0, 2000.0 / math.max(1L, n))
      SimilarityOps.embeddingSketchRecallEval(base.unionByName(twins),
        threshold = 0.95, maxHamming = 3, sampleRate = rate)
    }),
    "m08_image_recall_eval" -> ((s, dir) => {
      // absolute audit budget like d21 (brute = one bit_count per pair:
      // 2000 images ≈ 4M pair ops) — and the BMP render is fixture
      // synthesis, not the operator, so render only the ids that pass
      // the audit's own deterministic sample predicate (demoBmpCorpus is
      // a typed map; a downstream filter cannot push below it). The
      // report's n_docs then counts the pre-sampled media frame — a
      // production corpus arrives as stored payloads and the audit
      // samples it directly, which is exactly what the gate key does.
      val docs = documents(s, dir)
      val rate = math.min(1.0, 2000.0 / math.max(1L, docs.count()))
      val sampledIds = graft.operators.CurationOps.stratifiedHashSample(
        docs.select(col("doc_id")), col("doc_id"), lit("all"), Map.empty,
        rate)
      Multimodal.imageRecallEval(
        Multimodal.demoBmpCorpus(sampledIds, col("doc_id")),
        col("doc_id"), col("payload"), maxHamming = 3, sampleRate = rate)
    })
  )

  // ---- oracle SQL ----------------------------------------------------------

  private val toksSql = """string_split_regex(trim(text), '\s+')"""

  /** DuckDB twin of TextOps.qualityScore (shared by t02 and t06). */
  private val qualitySqlExpr: String = {
    val swr = s"(len(list_filter($toksSql, t -> list_contains(['the','a','of','and','to','in'], t))) * 1.0 / len($toksSql))"
    val avgLen = s"(len(regexp_replace(trim(text), '\\s+', '', 'g')) * 1.0 / len($toksSql))"
    val punct = s"((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) * 1.0 / greatest(length(text), 1))"
    s"0.35 * least(length(text) * 1.0 / 500.0, 1.0) + 0.25 * (1.0 - abs($swr - 0.4)) " +
      s"+ 0.2 * least($avgLen / 8.0, 1.0) + 0.2 * (1.0 - least($punct * 4.0, 1.0))"
  }

  /** Word-3-shingle sets CTE (DuckDB twin of TextOps.wordShingles k=3). */
  private val shingleCte =
    s"""sh AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
       |  FROM (SELECT doc_id, $toksSql AS w FROM documents))""".stripMargin

  private val jaccardPairsSql =
    s"""WITH $shingleCte,
       |j AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    len(list_intersect(a.s, b.s)) * 1.0
       |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jc
       |  FROM sh a, sh b WHERE a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, ${rndSql("jc")} AS jaccard FROM j
       |WHERE jc >= $JaccardThreshold ORDER BY doc_a, doc_b""".stripMargin

  /** Unrolled logistic-GD rounds (t41 twin): per round k, the four
    * micro-quantized gradient sums over the feature frame (g_k) and the
    * floor-div weight update (w_k) — DuckDB `//` floors exactly like the
    * operator's BigInt driver arithmetic (Spark's `div` truncates and
    * would differ one micro on negative gradients). z accumulates
    * left-to-right in feature order, matching the operator's reduceLeft. */
  private val lrOracle: String = {
    val lr = 10000L; val rounds = 6
    def z(w: String) =
      s"($w.w0/1000000.0 + $w.w1/1000000.0*x1 + $w.w2/1000000.0*x2 + $w.w3/1000000.0*x3)"
    def p(w: String) = s"(1.0/(1.0 + exp(-${z(w)})))"
    val feats = Seq("1.0", "x1", "x2", "x3")
    val roundCtes = (1 to rounds).map { k =>
      val wp = s"w${k - 1}"
      val gs = feats.zipWithIndex.map { case (x, i) =>
        s"SUM(CAST(round((${p(wp)} - y) * $x * 1000000.0) AS BIGINT)) AS g$i"
      }.mkString(", ")
      val upd = (0 to 3).map { i =>
        s"CAST($wp.w$i - ($lr * g$k.g$i) // (nn.n * 1000000) AS BIGINT) AS w$i"
      }.mkString(", ")
      s"g$k AS (SELECT $gs FROM f CROSS JOIN $wp), " +
        s"w$k AS (SELECT $upd FROM $wp CROSS JOIN g$k CROSS JOIN nn)"
    }.mkString(", ")
    "WITH f AS (" +
      "SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, " +
      "CAST(length(text) // 100 AS DOUBLE) AS x1, " +
      s"CAST(len($toksSql) // 10 AS DOUBLE) AS x2, " +
      "CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) // 10 AS DOUBLE) AS x3 " +
      "FROM documents), " +
      "nn AS (SELECT count(*) AS n FROM f), " +
      "w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, " +
      "CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3), " +
      roundCtes + " " +
      s"SELECT doc_id, y, CAST(round(${p(s"w$rounds")} * 1000000.0) AS BIGINT) AS p_micro, " +
      s"CASE WHEN CAST(round(${p(s"w$rounds")} * 1000000.0) AS BIGINT) >= 500000 THEN 1 ELSE 0 END AS pred " +
      s"FROM f CROSS JOIN w$rounds ORDER BY doc_id"
  }

  /** Unrolled BPE training rounds (t36/t38 twins): w_0 is the
    * delimiter-encoded word-freq table; per round k, pair counts (p/c),
    * the argmax with the operator's tie-break (b), and the fused table
    * (w). An empty b_k empties every later round through the cross join —
    * the early-stop twin. */
  private val BpeOracleRounds = 8

  private val bpeCtes: String = {
    val rounds = (1 to BpeOracleRounds).map { k =>
      s"""p_$k AS (
         |  SELECT freq, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z
         |  FROM (SELECT freq,
         |      list_transform(list_filter(string_split(seq, chr(1)), x -> x <> ''),
         |        x -> rtrim(x, chr(2))) AS l
         |    FROM w_${k - 1})),
         |c_$k AS (
         |  SELECT z[1] AS l, z[2] AS r,
         |    CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM p_$k GROUP BY 1, 2),
         |b_$k AS (
         |  SELECT l, r, cnt FROM c_$k WHERE cnt >= 2
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |w_$k AS (
         |  SELECT replace(seq,
         |      chr(1)||b.l||chr(2)||chr(1)||b.r||chr(2),
         |      chr(1)||b.l||b.r||chr(2)) AS seq, freq
         |  FROM w_${k - 1}, b_$k b)""".stripMargin
    }.mkString(",\n")
    s"""w_0 AS (
       |  SELECT regexp_replace(w, '(.)', chr(1)||'\\1'||chr(2), 'g')
       |      || chr(1)||chr(3)||chr(2) AS seq,
       |    freq
       |  FROM (
       |    SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
       |      FROM documents) t
       |    WHERE w <> '' AND w NOT LIKE '%'||chr(1)||'%'
       |      AND w NOT LIKE '%'||chr(2)||'%' AND w NOT LIKE '%'||chr(3)||'%'
       |    GROUP BY w)),
       |$rounds""".stripMargin
  }

  private val bpeMergeUnion: String = (1 to BpeOracleRounds).map(k =>
    s"""SELECT $k AS "rank", l AS "left", r AS "right", cnt AS pair_freq FROM b_$k"""
  ).mkString("\nUNION ALL ")

  /** Sequential-fold double cosine twin of SimilarityOps.cosine (list_sum
    * over list_transform folds left-to-right like Spark's aggregate()). */
  private def cosSql(a: String, b: String): String = {
    def dotSql(x: String, y: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
  }

  // h60Sql (the Hashing.hash60 DuckDB twin) comes from QueryHelpers

  /** Twin of SimilarityOps.lshTopK (numTables=16, planes=6, dim=64): the
    * ±1 hyperplanes are rebuilt from hash60 exactly as
    * SimilarityOps.planeWeights does, projections fold left-to-right in
    * DOUBLE (bit-identical to Spark's aggregate()), so bucket ids — and the
    * candidate set — match the Spark plan exactly. */
  private val lshOracle: String = lshOracleOf(excludeSameLabel = false)

  /** Shared LSH-rank oracle: `excludeSameLabel = true` adds the s09
    * hard-negative exclusion (same-label candidates anti-joined out
    * BEFORE ranking, exactly as the operator does). */
  private def lshOracleOf(excludeSameLabel: Boolean): String =
    s"""WITH ${lshCtes(excludeSameLabel)}
       |SELECT q_id, rank, nn_id, ${rndSql("cs")} AS cos
       |FROM scored WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** The planes→buckets→candidates→scored CTE chain shared by the s02/s09
    * twins and the s10 metrics twin (`scored` carries (q_id, nn_id, cs,
    * rank)). */
  private def lshCtes(excludeSameLabel: Boolean): String = {
    val planeBit = h60Sql(
      "CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)")
    val labelJoins = if (excludeSameLabel)
      """
        |  JOIN embeddings ql ON ql.vec_id = qb.vec_id
        |  JOIN embeddings cl ON cl.vec_id = cb.vec_id""".stripMargin else ""
    val labelFilter = if (excludeSameLabel) " AND ql.label <> cl.label" else ""
    s"""planes AS (
       |  SELECT t, p, list_transform(range(0, 64), d ->
       |    CASE WHEN ($planeBit & 1) = 0 THEN 1.0 ELSE -1.0 END) AS w
       |  FROM range(0, 16) t1(t), range(0, 6) t2(p)),
       |bk AS (
       |  SELECT e.vec_id, pl.t AS tbl,
       |    SUM(CASE WHEN list_sum(list_transform(range(1, 65),
       |               i -> CAST(e.embedding[i] AS DOUBLE) * pl.w[i])) > 0
       |             THEN (CAST(1 AS BIGINT) << CAST(pl.p AS INT)) ELSE 0 END) AS bucket
       |  FROM embeddings e, planes pl GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT qb.vec_id AS q_id, cb.vec_id AS nn_id
       |  FROM bk qb JOIN bk cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket$labelJoins
       |  WHERE qb.vec_id < 10 AND cb.vec_id <> qb.vec_id$labelFilter),
       |scored AS (
       |  SELECT c.q_id, c.nn_id, ${cosSql("q.embedding", "n.embedding")} AS cs,
       |    row_number() OVER (PARTITION BY c.q_id
       |      ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, c.nn_id) AS rank
       |  FROM cand c
       |  JOIN embeddings q ON q.vec_id = c.q_id
       |  JOIN embeddings n ON n.vec_id = c.nn_id)""".stripMargin
  }

  /** Twin of SimilarityOps.ivfTopK (nCells=16, nProbe=4, k=5, dim=64): the
    * codebook is rebuilt from hash60; the argmax cell (min(struct) in Spark)
    * is ORDER BY acos DESC, cell here — identical tie-breaking. */
  private val ivfOracle: String = {
    val anchorBit = h60Sql("'ivf_' || CAST(cell AS VARCHAR) || '_' || CAST(d AS VARCHAR)")
    s"""WITH cb AS (
       |  SELECT cell, list_transform(range(0, 64), d ->
       |    CASE WHEN ($anchorBit & 1) = 0 THEN 1.0 ELSE -1.0 END) AS anchor
       |  FROM range(0, 16) t1(cell)),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSql("e.embedding", "c.anchor")} DESC, c.cell) AS r
       |    FROM embeddings e, cb c) WHERE r = 1),
       |qcells AS (
       |  SELECT q_id, cell FROM (
       |    SELECT e.vec_id AS q_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSql("e.embedding", "c.anchor")} DESC, c.cell) AS crank
       |    FROM embeddings e, cb c WHERE e.vec_id < 10) WHERE crank <= 4),
       |scored AS (
       |  SELECT qc.q_id, a.vec_id AS nn_id, ${cosSql("q.embedding", "n.embedding")} AS cs,
       |    row_number() OVER (PARTITION BY qc.q_id
       |      ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, a.vec_id) AS rank
       |  FROM qcells qc
       |  JOIN assigned a ON qc.cell = a.cell AND a.vec_id <> qc.q_id
       |  JOIN embeddings q ON q.vec_id = qc.q_id
       |  JOIN embeddings n ON n.vec_id = a.vec_id)
       |SELECT q_id, rank, nn_id, ${rndSql("cs")} AS cos
       |FROM scored WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** s14 serves the SAME search as s13 from the PERSISTED artifact
    * (build → write partitioned-by-cell → read → search): input values
    * are identical by the artifact's row-for-row union contract, so its
    * oracle is s13's verbatim — what s14 gates is that the write/read/
    * serve path preserves them bit-for-bit. */
  lazy val oracle: Map[String, String] =
    oracleBase + ("s14_ivfpq_artifact" -> oracleBase("s13_ivfpq_topk"))

  /** The s13 IVF-PQ CTE block (codebooks, assignment, probe, encode,
    * ADC table, scoring, ranking) shared by the s13 search twin and the
    * s15 recall-eval twin. Composed into full statements by PLAIN
    * concatenation (the stripMargin-nesting rule). */
  private lazy val ivfPqCtes: String = ivfPqCtesWith(trainedIvf = false)

  /** The s15/s18 retrieval-quality twin: recall@5 / reciprocal rank of the
    * `ranked` CTE (whichever coarse-quantizer chain produced it) against
    * brute exact-cosine truth, ppm integer grid. */
  private def ivfPqEvalSql(ctes: String): String =
    ("WITH " + ctes + """,
       |ipr AS (SELECT q_id, nn_id, rank FROM ranked WHERE rank <= 5),
       |exq AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS nn_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY COS_PLACEHOLDER DESC, n.vec_id) AS rank
       |  FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10),
       |truth AS (SELECT q_id, nn_id FROM exq WHERE rank <= 5),
       |hits AS (
       |  SELECT l.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
       |    MIN(l.rank) AS first_hit_rank
       |  FROM ipr l JOIN truth t ON t.q_id = l.q_id AND t.nn_id = l.nn_id
       |  GROUP BY 1),
       |relc AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_relevant
       |  FROM truth GROUP BY 1)
       |SELECT relc.q_id, relc.n_relevant,
       |  coalesce(h.n_hits, 0) AS n_hits,
       |  coalesce(h.n_hits, 0) * 1000000 // relc.n_relevant AS recall_ppm,
       |  h.first_hit_rank,
       |  coalesce(1000000 // h.first_hit_rank, 0) AS rr_ppm
       |FROM relc LEFT JOIN hits h USING (q_id) ORDER BY q_id"""
      .stripMargin
      .replace("COS_PLACEHOLDER", cosSql("q.embedding", "n.embedding")))

  /** The shared IVF-PQ oracle CTE chain, parameterized on the coarse
    * quantizer: `trainedIvf = false` rebuilds the hash ±1 codebook
    * (s13/s14/s15/s16); `true` prepends two unrolled nano-grid Lloyd
    * iterations over it (the s12 chain at 16 cells) so the `icb` the
    * search probes is the TRAINED codebook — everything downstream
    * (assignment, probing, PQ encode, ADC table, ranking) is shared
    * verbatim, which is the point: s13 vs s17 differ only in the coarse
    * quantizer, so their recall gap (s15 vs s18) isolates what training
    * the cells buys.
    *
    * `residual = true` (s19/s20) additionally switches WHAT the codes
    * encode: the per-vector residual x − μ_cell instead of x (the twin of
    * [[graft.operators.SimilarityOps.ivfPqResidualIndex]]), with the
    * per-subspace least-squares decode scale α and the reconstruction
    * score dot(q, μ) + Σ α·dot(q_sub, anchor) — every term on the nano
    * grid, exactly as the Spark plan computes it. */
  /** Twin of kmeansFit(nCells=16, iters=2, init=ivfCodebook) over the
    * named corpus CTE/table: the s12 unrolled-Lloyd chain (hash seed →
    * argmax-cosine assign → exact-long nano-grid means, twice); empty
    * cells drop out via the GROUP BY, exactly as Lloyd's does. Emits
    * CTEs icb0..icb (trailing comma included); downstream chains read
    * `icb`. Shared by the s17/s18/s19/s20 IVF-PQ chain (corpus =
    * `embeddings`) and the s21 SemDeDup twin (corpus = `aug`). */
  private def trainedIcbChain(corpus: String): String =
    trainedIcbChainN(corpus, 16)

  /** [[trainedIcbChain]] parameterized by cell count: twin of
    * kmeansFit(nCells, iters = 2, init = ivfCodebook(nCells)) over the
    * named corpus CTE. The 16-cell s12/s17/s21 chains and the s22
    * sample-fitted 8-cell chain share this body. */
  private def trainedIcbChainN(corpus: String, nCells: Int): String =
    lloydChainN(corpus, nCells, seed = "ivf", p = "icb")

  /** Twin of kmeansFit(nCells, iters = 2, init = ±1 '`seed`_cell_d' hash
    * planes) over the named corpus CTE — the fully parameterized
    * unrolled-Lloyd body: hash-plane seeds → argmax-cosine assign →
    * exact-long nano-grid means, twice; empty cells drop out via the
    * GROUP BY, exactly as Lloyd's does. Emits CTEs `${p}0..${p}`
    * (trailing comma included); downstream chains read `$p` with columns
    * (cell, anchor). `p` prefixes every internal CTE so two chains can
    * coexist in one query (the s22 cell chain + its kmeans-of-centroids
    * group chain). */
  private def lloydChainN(corpus: String, nCells: Int, seed: String,
                          p: String): String = {
    val bit = h60Sql(
      s"'${seed}_' || CAST(cell AS VARCHAR) || '_' || CAST(d AS VARCHAR)")
    def assign(from: String, cb: String, out: String): String =
      s"""$out AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cell, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.anchor")} DESC, c.cell) AS r
         |    FROM $from e, $cb c) WHERE r = 1),""".stripMargin
    def means(from: String, sums: String, out: String): String =
      s"""$sums AS (
         |  SELECT cell, t.i - 1 AS pos, COUNT(*) AS n,
         |    SUM(CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000000) AS BIGINT)) AS s
         |  FROM $from, range(1, 65) t(i) GROUP BY 1, 2),
         |$out AS (
         |  SELECT cell, list(CAST(CAST(s AS BIGINT) AS DOUBLE)
         |    / (CAST(n AS DOUBLE) * 1000000000) ORDER BY pos) AS anchor
         |  FROM $sums GROUP BY cell),""".stripMargin
    s"""${p}0 AS (
       |  SELECT cell, list_transform(range(0, 64), d ->
       |    CASE WHEN ($bit & 1) = 0 THEN 1.0 ELSE -1.0 END) AS anchor
       |  FROM range(0, $nCells) ${p}t1(cell)),
       |""".stripMargin +
      assign(corpus, s"${p}0", s"${p}a1") + "\n" +
      means(s"${p}a1", s"${p}m1", s"${p}1") + "\n" +
      assign(corpus, s"${p}1", s"${p}a2") + "\n" +
      means(s"${p}a2", s"${p}m2", p)
  }

  private def ivfPqCtesWith(trainedIvf: Boolean,
                            residual: Boolean = false): String = {
    val ivfBit = h60Sql("'ivf_' || CAST(cell AS VARCHAR) || '_' || CAST(d AS VARCHAR)")
    val pqBit = h60Sql(
      "'pq_' || CAST(s AS VARCHAR) || '_' || CAST(c AS VARCHAR) || '_' || CAST(d AS VARCHAR)")
    val icbChain =
      if (!trainedIvf)
        s"""icb AS (
           |  SELECT cell, list_transform(range(0, 64), d ->
           |    CASE WHEN ($ivfBit & 1) = 0 THEN 1.0 ELSE -1.0 END) AS anchor
           |  FROM range(0, 16) t1(cell)),""".stripMargin
      else trainedIcbChain("embeddings")
    // assignment: the non-residual chain needs only (vec_id, cell); the
    // residual chain keeps the embedding alongside (rass) and derives the
    // residual frame — CAST(emb[i] AS DOUBLE) − anchor[i] is the exact
    // IEEE twin of the Spark zip_with subtraction
    val assignChain =
      if (!residual)
        s"""assigned AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${cosSql("e.embedding", "c.anchor")} DESC, c.cell) AS r
           |    FROM embeddings e, icb c) WHERE r = 1),""".stripMargin
      else
        s"""rass AS (
           |  SELECT vec_id, embedding, cell FROM (
           |    SELECT e.vec_id, e.embedding, c.cell, row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${cosSql("e.embedding", "c.anchor")} DESC, c.cell) AS r
           |    FROM embeddings e, icb c) WHERE r = 1),
           |assigned AS (SELECT vec_id, cell FROM rass),
           |resid AS (
           |  SELECT r.vec_id, list_transform(range(1, 65),
           |    i -> CAST(r.embedding[i] AS DOUBLE) - c.anchor[i]) AS remb
           |  FROM rass r JOIN icb c USING (cell)),""".stripMargin
    // what the PQ codes quantize: the raw embedding, or the residual
    val (svFrom, svCol) =
      if (residual) ("resid", "remb") else ("embeddings", "embedding")
    val sharedMid = s"""
         |qcells AS (
         |  SELECT q_id, cell FROM (
         |    SELECT e.vec_id AS q_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.anchor")} DESC, c.cell) AS crank
         |    FROM embeddings e, icb c WHERE e.vec_id < 10) WHERE crank <= 4),
         |pcb AS (
         |  SELECT s AS sub, c AS code, list_transform(range(0, 8), d ->
         |    CASE WHEN (CASE WHEN d < 4 THEN (c >> d) & 1
         |                    ELSE $pqBit & 1 END) = 0
         |         THEN 1.0 ELSE -1.0 END) AS anchor
         |  FROM range(0, 8) t1(s), range(0, 16) t2(c)),
         |sv AS (
         |  SELECT vec_id, s AS sub,
         |    list_slice($svCol, CAST(s * 8 + 1 AS INT), CAST(s * 8 + 8 AS INT)) AS v
         |  FROM $svFrom, range(0, 8) t(s)),
         |enc AS (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT sv.vec_id, sv.sub, cb.code,
         |      row_number() OVER (PARTITION BY sv.vec_id, sv.sub
         |        ORDER BY (8.0 - 2.0 * list_sum(list_transform(range(1, 9),
         |          i -> CAST(sv.v[i] AS DOUBLE) * cb.anchor[i]))) ASC, cb.code ASC) AS rn
         |    FROM sv JOIN pcb cb ON sv.sub = cb.sub) WHERE rn = 1),""".stripMargin
    val scoreChain =
      if (!residual)
        """qdots AS (
          |  SELECT q.vec_id AS q_id, cb.sub, cb.code,
          |    CAST(round(list_sum(list_transform(range(1, 9),
          |      i -> CAST(list_slice(q.embedding, CAST(cb.sub * 8 + 1 AS INT),
          |                 CAST(cb.sub * 8 + 8 AS INT))[i] AS DOUBLE)
          |           * cb.anchor[i])) * 1000000000) AS BIGINT) AS qd
          |  FROM embeddings q, pcb cb WHERE q.vec_id < 10),
          |scored AS (
          |  SELECT qc.q_id, a.vec_id AS nn_id,
          |    CAST(SUM(qd.qd) AS BIGINT) AS adc_nano
          |  FROM qcells qc
          |  JOIN assigned a ON a.cell = qc.cell AND a.vec_id <> qc.q_id
          |  JOIN enc e ON e.vec_id = a.vec_id
          |  JOIN qdots qd ON qd.q_id = qc.q_id AND qd.sub = e.sub AND qd.code = e.code
          |  GROUP BY 1, 2),
          |ranked AS (
          |  SELECT q_id, nn_id, adc_nano, row_number() OVER (PARTITION BY q_id
          |    ORDER BY adc_nano DESC, nn_id ASC) AS rank
          |  FROM scored)""".stripMargin
      else
        // residual ADC: per-subspace least-squares decode scale α from the
        // encoded corpus (exact-long nano sums, one final division), the
        // per-(q, probed-cell) base term round(dot(q, μ)·1e9), and the
        // CELL-INDEPENDENT per-(q, sub, code) table round(α·dot·1e9); the
        // final score is the exact long sum qmu + Σ qd — the twin of
        // SimilarityOps.ivfPqResidualTopK
        """rd AS (
          |  SELECT sv.sub, CAST(round(list_sum(list_transform(range(1, 9),
          |    i -> CAST(sv.v[i] AS DOUBLE) * cb.anchor[i])) * 1000000000) AS BIGINT) AS rd
          |  FROM sv JOIN enc e ON e.vec_id = sv.vec_id AND e.sub = sv.sub
          |  JOIN pcb cb ON cb.sub = e.sub AND cb.code = e.code),
          |alphas AS (
          |  SELECT sub, CAST(CAST(SUM(rd) AS BIGINT) AS DOUBLE)
          |    / (CAST(COUNT(*) AS DOUBLE) * 8000000000.0) AS alpha
          |  FROM rd GROUP BY 1),
          |qmu AS (
          |  SELECT qc.q_id, qc.cell,
          |    CAST(round(list_sum(list_transform(range(1, 65),
          |      i -> CAST(q.embedding[i] AS DOUBLE) * c.anchor[i]))
          |      * 1000000000) AS BIGINT) AS qmu
          |  FROM qcells qc
          |  JOIN embeddings q ON q.vec_id = qc.q_id
          |  JOIN icb c ON c.cell = qc.cell),
          |qdots AS (
          |  SELECT q.vec_id AS q_id, cb.sub, cb.code,
          |    CAST(round(al.alpha * list_sum(list_transform(range(1, 9),
          |      i -> CAST(list_slice(q.embedding, CAST(cb.sub * 8 + 1 AS INT),
          |                 CAST(cb.sub * 8 + 8 AS INT))[i] AS DOUBLE)
          |           * cb.anchor[i])) * 1000000000) AS BIGINT) AS qd
          |  FROM embeddings q, pcb cb
          |  JOIN alphas al ON al.sub = cb.sub
          |  WHERE q.vec_id < 10),
          |scored AS (
          |  SELECT qc.q_id, a.vec_id AS nn_id, qc.cell,
          |    CAST(SUM(qd.qd) AS BIGINT) AS rsum
          |  FROM qcells qc
          |  JOIN assigned a ON a.cell = qc.cell AND a.vec_id <> qc.q_id
          |  JOIN enc e ON e.vec_id = a.vec_id
          |  JOIN qdots qd ON qd.q_id = qc.q_id AND qd.sub = e.sub AND qd.code = e.code
          |  GROUP BY 1, 2, 3),
          |ranked AS (
          |  SELECT s.q_id, s.nn_id, s.rsum + m.qmu AS adc_nano,
          |    row_number() OVER (PARTITION BY s.q_id
          |      ORDER BY (s.rsum + m.qmu) DESC, s.nn_id ASC) AS rank
          |  FROM scored s
          |  JOIN qmu m ON m.q_id = s.q_id AND m.cell = s.cell)""".stripMargin
    icbChain + "\n" + assignChain + sharedMid + "\n" + scoreChain
  }

  private lazy val oracleBase: Map[String, String] = Map(
    "s02_ann_lsh" -> lshOracle,

    // twin of kmeansFit(nCells=8, iters=2, init=ivfCodebook): two unrolled
    // Lloyd iterations — hash-anchor seed codebook, the s03 argmax-cosine
    // assignment shape (row_number by cos DESC, cell ASC ≡ min(struct)),
    // exact-long nano-grid means (the s07 convention; sums < 2^53 so the
    // divided doubles are bit-identical, no rounding needed)
    "s12_kmeans_iter" -> {
      val anchorBit = h60Sql("'ivf_' || CAST(cell AS VARCHAR) || '_' || CAST(d AS VARCHAR)")
      s"""WITH cb0 AS (
         |  SELECT cell, list_transform(range(0, 64), d ->
         |    CASE WHEN ($anchorBit & 1) = 0 THEN 1.0 ELSE -1.0 END) AS anchor
         |  FROM range(0, 8) t1(cell)),
         |a1 AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cell, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.anchor")} DESC, c.cell) AS r
         |    FROM embeddings e, cb0 c) WHERE r = 1),
         |m1 AS (
         |  SELECT cell, t.i - 1 AS pos, COUNT(*) AS n,
         |    SUM(CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000000) AS BIGINT)) AS s
         |  FROM a1, range(1, 65) t(i) GROUP BY 1, 2),
         |cb1 AS (
         |  SELECT cell, list(CAST(CAST(s AS BIGINT) AS DOUBLE)
         |    / (CAST(n AS DOUBLE) * 1000000000) ORDER BY pos) AS anchor
         |  FROM m1 GROUP BY cell),
         |a2 AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cell, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.anchor")} DESC, c.cell) AS r
         |    FROM embeddings e, cb1 c) WHERE r = 1),
         |m2 AS (
         |  SELECT cell, t.i - 1 AS pos, COUNT(*) AS n,
         |    SUM(CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000000) AS BIGINT)) AS s
         |  FROM a2, range(1, 65) t(i) GROUP BY 1, 2)
         |SELECT CAST(cell AS INT) AS cell, CAST(pos AS INT) AS pos,
         |  CAST(CAST(s AS BIGINT) AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000) AS centroid
         |FROM m2 ORDER BY cell, pos""".stripMargin
    },

    "s09_hard_negatives" -> lshOracleOf(excludeSameLabel = true),

    // twin of mmrRerank(k=3, lambda=0.7) over the shared LSH top-10
    // chain: per round, remaining candidates score the UNDIVIDED integer
    // 700000*rel - 300000*maxsim (no division — ordering is scale
    // invariant and Spark div / DuckDB // disagree on negatives)
    "s11_mmr_rerank" ->
      s"""WITH ${lshCtes(excludeSameLabel = false)},
         |cand10 AS (
         |  SELECT q_id, nn_id, CAST(round(cs * 1000000) AS BIGINT) AS rel
         |  FROM scored WHERE rank <= 10),
         |p1 AS (SELECT q_id, nn_id FROM (
         |    SELECT q_id, nn_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, nn_id) AS rk
         |    FROM cand10) WHERE rk = 1),
         |r2 AS (
         |  SELECT c.q_id, c.nn_id, c.rel,
         |    MAX(CAST(round(${cosSql("e1.embedding", "e2.embedding")} * 1000000) AS BIGINT)) AS maxsim
         |  FROM cand10 c
         |  JOIN p1 p ON p.q_id = c.q_id AND c.nn_id <> p.nn_id
         |  JOIN embeddings e1 ON e1.vec_id = c.nn_id
         |  JOIN embeddings e2 ON e2.vec_id = p.nn_id
         |  GROUP BY 1, 2, 3),
         |p2 AS (SELECT q_id, nn_id FROM (
         |    SELECT q_id, nn_id, row_number() OVER (PARTITION BY q_id
         |        ORDER BY (700000 * rel - 300000 * maxsim) DESC, nn_id) AS rk
         |    FROM r2) WHERE rk = 1),
         |pk AS (SELECT q_id, nn_id FROM p1 UNION ALL SELECT q_id, nn_id FROM p2),
         |r3 AS (
         |  SELECT c.q_id, c.nn_id, c.rel,
         |    MAX(CAST(round(${cosSql("e1.embedding", "e2.embedding")} * 1000000) AS BIGINT)) AS maxsim
         |  FROM cand10 c
         |  JOIN pk p ON p.q_id = c.q_id
         |  JOIN embeddings e1 ON e1.vec_id = c.nn_id
         |  JOIN embeddings e2 ON e2.vec_id = p.nn_id
         |  WHERE NOT EXISTS (SELECT 1 FROM pk x
         |                    WHERE x.q_id = c.q_id AND x.nn_id = c.nn_id)
         |  GROUP BY 1, 2, 3),
         |p3 AS (SELECT q_id, nn_id FROM (
         |    SELECT q_id, nn_id, row_number() OVER (PARTITION BY q_id
         |        ORDER BY (700000 * rel - 300000 * maxsim) DESC, nn_id) AS rk
         |    FROM r3) WHERE rk = 1)
         |SELECT q_id, 1 AS mmr_rank, nn_id FROM p1
         |UNION ALL SELECT q_id, 2, nn_id FROM p2
         |UNION ALL SELECT q_id, 3, nn_id FROM p3
         |ORDER BY q_id, mmr_rank""".stripMargin,

    // metrics twin: LSH top-5 (the shared CTE chain) semi-joined against
    // the exact brute-force top-5; integer ppm divisions mirror the
    // operator's staged `div`s
    "s10_ann_eval" ->
      s"""WITH ${lshCtes(excludeSameLabel = false)},
         |lshr AS (SELECT q_id, nn_id, rank FROM scored WHERE rank <= 5),
         |exq AS (
         |  SELECT q.vec_id AS q_id, n.vec_id AS nn_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10),
         |truth AS (SELECT q_id, nn_id FROM exq WHERE rank <= 5),
         |hits AS (
         |  SELECT l.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
         |    MIN(l.rank) AS first_hit_rank
         |  FROM lshr l JOIN truth t ON t.q_id = l.q_id AND t.nn_id = l.nn_id
         |  GROUP BY 1),
         |relc AS (
         |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_relevant
         |  FROM truth GROUP BY 1)
         |SELECT relc.q_id, relc.n_relevant,
         |  coalesce(h.n_hits, 0) AS n_hits,
         |  coalesce(h.n_hits, 0) * 1000000 // relc.n_relevant AS recall_ppm,
         |  h.first_hit_rank,
         |  coalesce(1000000 // h.first_hit_rank, 0) AS rr_ppm
         |FROM relc LEFT JOIN hits h USING (q_id) ORDER BY q_id""".stripMargin,

    "s03_ann_ivf" -> ivfOracle,

    "t01_token_count" ->
      s"""SELECT doc_id, len($toksSql) AS ws_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t02_quality_score" ->
      s"""SELECT doc_id, ${rndSql(qualitySqlExpr)} AS quality FROM documents ORDER BY doc_id""",

    "t03_lang_id" -> {
      def hits(ms: String) = s"len(list_filter($toksSql, t -> list_contains([$ms], t)))"
      val en = hits("'the','a','of','and'")
      val de = hits("'der','die','das','und'")
      val es = hits("'el','la','de','que'")
      val zh = hits("'的','是','了'")
      s"""SELECT doc_id,
         |  CASE WHEN greatest($en, $de, $es, $zh) = 0 THEN 'und'
         |       WHEN $en = greatest($en, $de, $es, $zh) THEN 'en'
         |       WHEN $de = greatest($en, $de, $es, $zh) THEN 'de'
         |       WHEN $es = greatest($en, $de, $es, $zh) THEN 'es'
         |       ELSE 'zh' END AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "t04_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "d01_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        |  min(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "d02_ngram_jaccard" -> jaccardPairsSql,

    "d03_minhash_lsh" -> jaccardPairsSql,

    "d06_dedup_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
         |    AND len(list_intersect(a.s, b.s)) * 1.0
         |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= $JaccardThreshold),
         |edges AS (
         |  SELECT doc_a AS s, doc_b AS d FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         |SELECT s AS doc_id, min(d) AS rep,
         |  CAST(s = min(d) AS INT) AS keep
         |FROM reach GROUP BY s ORDER BY doc_id""".stripMargin,

    // twin of DedupOps.boilerplateStrip(lineWords=10, minDocs=2): same
    // 10-token line windows (t07 slice construction), document frequency on
    // the same hash60 keys, ordered string_agg reassembly (string_agg
    // skips the NULLed boilerplate lines; COALESCE covers all-boiler docs)
    "d08_line_dedup" -> {
      val lineHash = h60Sql("line_text")
      s"""WITH d AS (SELECT doc_id, $toksSql AS w FROM documents),
         |ln AS (
         |  SELECT doc_id, unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS line_id, w
         |  FROM d WHERE len(w) > 0),
         |lt AS (
         |  SELECT doc_id, line_id,
         |    array_to_string(list_slice(w, CAST(line_id * 10 + 1 AS INT), CAST(line_id * 10 + 10 AS INT)), ' ') AS line_text
         |  FROM ln),
         |bo AS (
         |  SELECT h AS bh FROM (
         |    SELECT $lineHash AS h, COUNT(DISTINCT doc_id) AS nd
         |    FROM lt GROUP BY 1) WHERE nd >= 2),
         |j AS (
         |  SELECT l.doc_id, l.line_id, l.line_text,
         |    CASE WHEN b.bh IS NOT NULL THEN 1 ELSE 0 END AS rem
         |  FROM lt l LEFT JOIN bo b ON $lineHash = b.bh)
         |SELECT doc_id,
         |  COALESCE(string_agg(CASE WHEN rem = 0 THEN line_text END, ' ' ORDER BY line_id), '') AS clean_text,
         |  CAST(SUM(rem) AS BIGINT) AS n_removed
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // twin of DedupOps.decontaminate(k=5): same distinct-5-gram hash60
    // keys, IN-subquery instead of the semi-join
    "d07_decontam" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS w FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 3),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))) AS gram
         |  FROM d),
         |gh AS (SELECT doc_id, ${h60Sql("gram")} AS gram_h FROM g),
         |b AS (SELECT DISTINCT gram_h FROM gh WHERE doc_id < 20)
         |SELECT DISTINCT doc_id FROM gh WHERE gram_h IN (SELECT gram_h FROM b)
         |ORDER BY doc_id""".stripMargin,

    // twin of DedupOps.decontamOverlap(k=5): d07's distinct-gram CTE, a
    // LEFT JOIN against the benchmark gram set instead of the semi-join,
    // and exact-count division for the overlap fraction
    "d10_decontam_overlap" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS w FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 3),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))) AS gram
         |  FROM d),
         |gh AS (SELECT doc_id, ${h60Sql("gram")} AS gram_h FROM g),
         |b AS (SELECT DISTINCT gram_h FROM gh WHERE doc_id < 20)
         |SELECT gh.doc_id, COUNT(*) AS n_grams,
         |  CAST(COUNT(b.gram_h) AS BIGINT) AS n_hit,
         |  CAST(COUNT(b.gram_h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS overlap_frac
         |FROM gh LEFT JOIN b ON gh.gram_h = b.gram_h
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // twin of DedupOps.crossNearDupPairs: brute-force cross Jaccard between
    // the odd-id shard and the even-id corpus (LSH recall makes the banded
    // plan equal it, as with d03)
    "d11_cross_dedup" ->
      s"""WITH $shingleCte,
         |j AS (
         |  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
         |    len(list_intersect(a.s, b.s)) * 1.0
         |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jc
         |  FROM sh a, sh b WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0)
         |SELECT new_id, corpus_id, ${rndSql("jc")} AS jaccard FROM j
         |WHERE jc >= $JaccardThreshold ORDER BY new_id, corpus_id""".stripMargin,

    // twin of TextOps.charEntropy: per-char counts via unnest + GROUP BY
    // (the Spark side folds runs of the sorted char array — identical
    // counts), entropy divided by the SAME Ln2 double (TextOps.Ln2
    // interpolated), 6-dp rounded per the fp-order-sensitivity note
    "t29_char_entropy" ->
      s"""WITH ch AS (
         |  SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
         |    i -> substring(text, CAST(i AS INT), 1))) AS c
         |  FROM documents),
         |cnt AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY 1, 2),
         |st AS (
         |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_chars,
         |    CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
         |    SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS s
         |  FROM cnt GROUP BY 1)
         |SELECT d.doc_id AS id,
         |  COALESCE(st.n_chars, 0) AS n_chars,
         |  COALESCE(st.n_distinct_chars, 0) AS n_distinct_chars,
         |  ${rnd6Sql(s"(ln(CAST(st.n_chars AS DOUBLE)) - st.s / CAST(st.n_chars AS DOUBLE)) / ${graft.operators.TextOps.Ln2}")} AS entropy_bits
         |FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
         |ORDER BY id""".stripMargin,

    "d13_substring_dup" -> {
      val w = 40; val st = 10
      s"""WITH wins AS (
         |  SELECT doc_id, ${h60Sql(s"substr(text, CAST(o * $st + 1 AS INT), $w)")} AS k
         |  FROM (SELECT doc_id, text,
         |          unnest(range(0, (length(text) - $w) // $st + 1)) AS o
         |        FROM documents WHERE length(text) >= $w)),
         |pkd AS (SELECT k, doc_id, COUNT(*) AS n_occ FROM wins GROUP BY 1, 2),
         |fl AS (SELECT doc_id, n_occ,
         |         COUNT(*) OVER (PARTITION BY k) AS n_docs FROM pkd),
         |st AS (SELECT doc_id, CAST(SUM(n_occ) AS BIGINT) AS nw,
         |         CAST(SUM(CASE WHEN n_docs >= 2 THEN n_occ ELSE 0 END) AS BIGINT) AS nd
         |       FROM fl GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(st.nw, 0) AS n_windows,
         |  COALESCE(st.nd, 0) AS n_dup_windows,
         |  COALESCE(st.nd, 0) * 1000000 // greatest(COALESCE(st.nw, 0), 1) AS dup_ppm
         |FROM documents d LEFT JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    // twin of crossSubstringContam(window=40, stride=10) vs the doc_id<20
    // bench slice: corpus windows replay d13's strided arithmetic, the
    // bench side keys EVERY offset (stride 1), hit = key in the distinct
    // bench set
    "d15_substring_contam" -> {
      val w = 40; val st = 10
      s"""WITH dwins AS (
         |  SELECT doc_id, ${h60Sql(s"substr(text, CAST(o * $st + 1 AS INT), $w)")} AS k
         |  FROM (SELECT doc_id, text,
         |          unnest(range(0, (length(text) - $w) // $st + 1)) AS o
         |        FROM documents WHERE length(text) >= $w)),
         |pkd AS (SELECT doc_id, k, COUNT(*) AS n_occ FROM dwins GROUP BY 1, 2),
         |bkeys AS (
         |  SELECT DISTINCT ${h60Sql(s"substr(text, CAST(o + 1 AS INT), $w)")} AS k
         |  FROM (SELECT text, unnest(range(0, (length(text) - $w) + 1)) AS o
         |        FROM documents WHERE doc_id < 20 AND length(text) >= $w)),
         |st AS (SELECT doc_id, CAST(SUM(n_occ) AS BIGINT) AS nw,
         |         CAST(SUM(CASE WHEN b.k IS NOT NULL THEN n_occ ELSE 0 END) AS BIGINT) AS nc
         |       FROM pkd LEFT JOIN bkeys b USING (k) GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(st.nw, 0) AS n_windows,
         |  COALESCE(st.nc, 0) AS n_contaminated,
         |  COALESCE(st.nc, 0) * 1000000 // greatest(COALESCE(st.nw, 0), 1) AS contam_ppm
         |FROM documents d LEFT JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    // twin of sourceOverlap(k=3): per-source distinct shingle HASHES (the
    // operator's 60-bit keys, so the counts match bit-for-bit), key-equi
    // pair counts, complete matrix via the source-size self-cross, ppm on
    // the staged integer division
    "d16_source_overlap" ->
      s"""WITH sh AS (
         |  SELECT source, list_distinct(list_transform(range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
         |  FROM (SELECT source, $toksSql AS w FROM documents)),
         |e AS (SELECT DISTINCT source AS src, ${h60Sql("sg")} AS k
         |      FROM (SELECT source, unnest(s) AS sg FROM sh)),
         |ns AS (SELECT src, count(*) AS n FROM e GROUP BY 1),
         |p AS (SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_ab
         |      FROM e a JOIN e b ON a.k = b.k AND a.src < b.src GROUP BY 1, 2),
         |ap AS (SELECT x.src AS src_a, y.src AS src_b, x.n AS n_a, y.n AS n_b
         |       FROM ns x JOIN ns y ON x.src < y.src)
         |SELECT ap.src_a, ap.src_b, ap.n_a, ap.n_b,
         |  COALESCE(p.n_ab, 0) AS n_ab,
         |  COALESCE(p.n_ab, 0) * 1000000
         |    // (ap.n_a + ap.n_b - COALESCE(p.n_ab, 0)) AS jaccard_ppm
         |FROM ap LEFT JOIN p USING (src_a, src_b)
         |ORDER BY src_a, src_b""".stripMargin,

    // twin of containmentPairs(k=3, 0.6, maxDf=500): same pruned key
    // universe (both |∩| and |S_a| count only df<=500 keys), unordered
    // intersections fanned out to the ordered rows that pass
    "d17_containment" ->
      s"""WITH $shingleCte,
         |e AS (SELECT DISTINCT doc_id, ${h60Sql("sg")} AS k
         |      FROM (SELECT doc_id, unnest(s) AS sg FROM sh)),
         |dfk AS (SELECT k, count(*) AS dfc FROM e GROUP BY 1),
         |kept AS (SELECT e.doc_id, e.k FROM e JOIN dfk USING (k) WHERE dfc <= 500),
         |sz AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
         |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS nc
         |      FROM kept a JOIN kept b ON a.k = b.k AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |s2 AS (SELECT i.da, i.db, i.nc, x.n AS na, y.n AS nb FROM i
         |       JOIN sz x ON x.doc_id = i.da JOIN sz y ON y.doc_id = i.db),
         |u AS (
         |  SELECT da AS doc_a, db AS doc_b, nc AS n_common, na AS n_keys_a,
         |    nc * 1000000 // na AS containment_ppm FROM s2
         |  UNION ALL
         |  SELECT db, da, nc, nb, nc * 1000000 // nb FROM s2)
         |SELECT doc_a, doc_b, n_common, n_keys_a, containment_ppm
         |FROM u WHERE containment_ppm >= 600000
         |ORDER BY doc_a, doc_b""".stripMargin,

    "d04_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |th AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM toks),
        |votes AS (SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |          FROM th, (SELECT unnest(range(60)) AS j) t2(j) GROUP BY 1, 2),
        |fp AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
        |       FROM votes GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM fp a, fp b
        |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // twin of canonicalPerCluster over the d04 simhash pairs: same
    // fingerprint CTE, recursive-CTE components (the d06 shape), then
    // (quality desc, id asc) row_number picks the canonical member
    "d12_canonical" ->
      s"""WITH RECURSIVE toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents),
         |th AS (SELECT doc_id, ${h60Sql("t")} AS h FROM toks),
         |votes AS (SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |          FROM th, (SELECT unnest(range(60)) AS j) t2(j) GROUP BY 1, 2),
         |fp AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
         |       FROM votes GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS pa, b.doc_id AS pb FROM fp a, fp b
         |  WHERE a.doc_id < b.doc_id
         |    AND bit_count(xor(a.simhash, b.simhash)) <= 3),
         |edges AS (
         |  SELECT pa AS s, pb AS d FROM pairs
         |  UNION ALL SELECT pb, pa FROM pairs),
         |reach(s, d) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |comp AS (SELECT s AS doc_id, min(d) AS rep FROM reach GROUP BY s),
         |q AS (SELECT doc_id, CAST(round(($qualitySqlExpr) * 1000000) AS BIGINT) AS qm FROM documents),
         |ranked AS (
         |  SELECT c.doc_id, c.rep,
         |    row_number() OVER (PARTITION BY c.rep ORDER BY q.qm DESC, c.doc_id ASC) AS rn
         |  FROM comp c JOIN q USING (doc_id)),
         |canon AS (SELECT rep, doc_id AS canon FROM ranked WHERE rn = 1)
         |SELECT c.doc_id, c.rep, cn.canon,
         |  CAST(c.doc_id = cn.canon AS INT) AS keep
         |FROM comp c JOIN canon cn USING (rep) ORDER BY doc_id""".stripMargin,

    "d05_embedding_dup" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${rndSql(cosSql("a.embedding", "b.embedding"))} AS cos
         |FROM embeddings a, embeddings b
         |WHERE a.vec_id < b.vec_id AND ${cosSql("a.embedding", "b.embedding")} >= $CosineThreshold
         |ORDER BY vec_a, vec_b""".stripMargin,

    // twin of embeddingNearDupPairs(threshold=0.95, maxHamming=3) over the
    // twin-augmented corpus: planes rebuilt from hash60('esh_p_d'), the
    // same left-fold double projections, banded chunk candidates, exact
    // cosine verify — sketches are deterministic, so banded == replayed
    "d18_embedding_simhash" ->
      s"""WITH aug AS (
         |  SELECT vec_id, list_transform(range(1, 65),
         |    i -> CAST(embedding[i] AS DOUBLE)) AS embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, list_transform(range(1, 65),
         |    i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.5
         |              ELSE CAST(embedding[i] AS DOUBLE) END)
         |  FROM embeddings WHERE vec_id < 50),
         |planes AS (
         |  SELECT p, list_transform(range(0, 64), d ->
         |    CASE WHEN (${h60Sql("'esh_' || CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} & 1) = 0
         |         THEN 1.0 ELSE -1.0 END) AS w
         |  FROM range(0, 60) t(p)),
         |fp AS (
         |  SELECT e.vec_id,
         |    CAST(SUM(CASE WHEN list_sum(list_transform(range(1, 65),
         |               i -> CAST(e.embedding[i] AS DOUBLE) * pl.w[i])) > 0
         |             THEN (CAST(1 AS BIGINT) << CAST(pl.p AS INT)) ELSE 0 END) AS BIGINT) AS sh
         |  FROM aug e, planes pl GROUP BY 1),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    bit_count(xor(a.sh, b.sh)) AS hamming
         |  FROM fp a, fp b, range(0, 4) t(c)
         |  WHERE a.vec_id < b.vec_id
         |    AND ((a.sh >> CAST(c * 15 AS INT)) & 32767) = ((b.sh >> CAST(c * 15 AS INT)) & 32767)
         |    AND bit_count(xor(a.sh, b.sh)) <= 3)
         |SELECT c.vec_a, c.vec_b, CAST(c.hamming AS INT) AS hamming,
         |  ${rndSql(cosSql("ea.embedding", "eb.embedding"))} AS cos
         |FROM cand c
         |JOIN aug ea ON ea.vec_id = c.vec_a
         |JOIN aug eb ON eb.vec_id = c.vec_b
         |WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.95
         |ORDER BY vec_a, vec_b""".stripMargin,

    // twin of crossEmbeddingNearDupPairs(twins -> base): same plane/sketch
    // replay as d18 but candidates CROSS sides only — the incremental-
    // ingestion semantics (no corpus self-pairing, no ordering filter)
    "d19_cross_embedding_dedup" ->
      s"""WITH newv AS (
         |  SELECT vec_id + 1000000 AS vec_id, list_transform(range(1, 65),
         |    i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.5
         |              ELSE CAST(embedding[i] AS DOUBLE) END) AS embedding
         |  FROM embeddings WHERE vec_id < 50),
         |corp AS (
         |  SELECT vec_id, list_transform(range(1, 65),
         |    i -> CAST(embedding[i] AS DOUBLE)) AS embedding FROM embeddings),
         |planes AS (
         |  SELECT p, list_transform(range(0, 64), d ->
         |    CASE WHEN (${h60Sql("'esh_' || CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} & 1) = 0
         |         THEN 1.0 ELSE -1.0 END) AS w
         |  FROM range(0, 60) t(p)),
         |fpn AS (
         |  SELECT e.vec_id,
         |    CAST(SUM(CASE WHEN list_sum(list_transform(range(1, 65),
         |               i -> CAST(e.embedding[i] AS DOUBLE) * pl.w[i])) > 0
         |             THEN (CAST(1 AS BIGINT) << CAST(pl.p AS INT)) ELSE 0 END) AS BIGINT) AS sh
         |  FROM newv e, planes pl GROUP BY 1),
         |fpc AS (
         |  SELECT e.vec_id,
         |    CAST(SUM(CASE WHEN list_sum(list_transform(range(1, 65),
         |               i -> CAST(e.embedding[i] AS DOUBLE) * pl.w[i])) > 0
         |             THEN (CAST(1 AS BIGINT) << CAST(pl.p AS INT)) ELSE 0 END) AS BIGINT) AS sh
         |  FROM corp e, planes pl GROUP BY 1),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    bit_count(xor(a.sh, b.sh)) AS hamming
         |  FROM fpn a, fpc b, range(0, 4) t(c)
         |  WHERE ((a.sh >> CAST(c * 15 AS INT)) & 32767) = ((b.sh >> CAST(c * 15 AS INT)) & 32767)
         |    AND bit_count(xor(a.sh, b.sh)) <= 3)
         |SELECT c.vec_a, c.vec_b, CAST(c.hamming AS INT) AS hamming,
         |  ${rndSql(cosSql("ea.embedding", "eb.embedding"))} AS cos
         |FROM cand c
         |JOIN newv ea ON ea.vec_id = c.vec_a
         |JOIN corp eb ON eb.vec_id = c.vec_b
         |WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.95
         |ORDER BY vec_a, vec_b""".stripMargin,

    // twin of DedupOps.dedupRecallEval: replay the deterministic
    // half-sample (the t05 hash-bucket formula) and the brute exact-
    // Jaccard ground truth, then assert the banded miner is EXHAUSTIVE —
    // banded = matched = truth (32×4 banding misses a J≥0.8 pair with
    // probability < 5e-8, the d03 adjudication; an actual miss or a
    // verification regression hash-mismatches the counts/ppm columns)
    "d20_dedup_recall_eval" ->
      s"""-- DIAGNOSIS NOTE: this twin hard-codes banded = matched = truth —
         |-- the assertion of perfect recall, not an independent banding
         |-- replay. The analytic floor: at 32×4 banding, a J ≥ 0.8 pair is
         |-- missed with P = (1-J^4)^32 ≤ (1-0.8^4)^32 < 5e-8 (d03
         |-- adjudication). If this key ever hash-mismatches with Spark
         |-- recall_ppm < 1000000, read it as a (rare, expected-at-some-
         |-- volume) banding miss to re-adjudicate — not a logic bug.
         |WITH samp AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE (${h60Sql("'sample_' || CAST(doc_id AS VARCHAR)")} % 1000000)
         |    < 0.5 * 1000000),
         |shs AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
         |  FROM (SELECT doc_id, $toksSql AS w FROM samp)),
         |t AS (
         |  SELECT COUNT(*) AS n FROM shs a, shs b
         |  WHERE a.doc_id < b.doc_id
         |    AND len(list_intersect(a.s, b.s)) * 1.0
         |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |      >= $JaccardThreshold)
         |SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         |  (SELECT COUNT(*) FROM samp) AS n_sampled,
         |  t.n AS truth_pairs, t.n AS banded_pairs, t.n AS matched_pairs,
         |  CASE WHEN t.n = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE t.n * 1000000 // t.n END AS recall_ppm,
         |  CASE WHEN t.n = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE t.n * 1000000 // t.n END AS precision_ppm
         |FROM t""".stripMargin,

    // twin of DedupOps.simhashRecallEval: replay the deterministic
    // half-sample and the brute hamming<=3 ground truth over replayed
    // 60-bit fingerprints (the d04 CTE chain). banded = matched = truth
    // is EXACT here, not an analytic floor like d20's 5e-8: with 4
    // chunks of 15 bits, a hamming<=3 pair shares >= 1 chunk by
    // pigeonhole (exhaustive candidates), and banded pairs are
    // hamming-verified (banded ⊆ truth) — so a hash mismatch on this key
    // IS a chunk-scheme or verification bug, never sampling luck.
    "d21_simhash_recall_eval" ->
      s"""WITH samp AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE (${h60Sql("'sample_' || CAST(doc_id AS VARCHAR)")} % 1000000)
         |    < 0.5 * 1000000),
         |toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t FROM samp),
         |th AS (SELECT doc_id, ${h60Sql("t")} AS h FROM toks),
         |votes AS (SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |          FROM th, (SELECT unnest(range(60)) AS j) t2(j) GROUP BY 1, 2),
         |fp AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
         |       FROM votes GROUP BY 1),
         |t AS (SELECT COUNT(*) AS n FROM fp a, fp b
         |      WHERE a.doc_id < b.doc_id
         |        AND bit_count(xor(a.simhash, b.simhash)) <= 3)
         |SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         |  (SELECT COUNT(*) FROM fp) AS n_sampled,
         |  t.n AS truth_pairs, t.n AS banded_pairs, t.n AS matched_pairs,
         |  CASE WHEN t.n = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE t.n * 1000000 // t.n END AS recall_ppm,
         |  CASE WHEN t.n = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE t.n * 1000000 // t.n END AS precision_ppm
         |FROM t""".stripMargin,

    // twin of SimilarityOps.embeddingSketchRecallEval over d18's
    // twin-augmented corpus: replay the sample, the brute cos>=0.95
    // ground truth, and the sketch -> banded-chunk -> exact-cosine miner
    // with the same hash-derived planes. Every side is deterministic, so
    // the MEASURED recall (sketch misses: cos >= threshold but
    // hamming > 3) reproduces exactly; banded pairs are cosine-verified
    // (banded ⊆ truth), so precision is identically 1000000.
    "d22_embedding_recall_eval" ->
      s"""WITH aug AS (
         |  SELECT vec_id, list_transform(range(1, 65),
         |    i -> CAST(embedding[i] AS DOUBLE)) AS embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, list_transform(range(1, 65),
         |    i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.5
         |              ELSE CAST(embedding[i] AS DOUBLE) END)
         |  FROM embeddings WHERE vec_id < 50),
         |e AS (
         |  SELECT vec_id, embedding FROM aug
         |  WHERE (${h60Sql("'sample_' || CAST(vec_id AS VARCHAR)")} % 1000000)
         |    < 0.5 * 1000000
         |    AND list_sum(list_transform(embedding, x -> x * x)) > 0),
         |planes AS (
         |  SELECT p, list_transform(range(0, 64), d ->
         |    CASE WHEN (${h60Sql("'esh_' || CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} & 1) = 0
         |         THEN 1.0 ELSE -1.0 END) AS w
         |  FROM range(0, 60) t(p)),
         |fp AS (
         |  SELECT e.vec_id,
         |    CAST(SUM(CASE WHEN list_sum(list_transform(range(1, 65),
         |               i -> CAST(e.embedding[i] AS DOUBLE) * pl.w[i])) > 0
         |             THEN (CAST(1 AS BIGINT) << CAST(pl.p AS INT)) ELSE 0 END) AS BIGINT) AS sh
         |  FROM e, planes pl GROUP BY 1),
         |truth AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM e a, e b
         |  WHERE a.vec_id < b.vec_id
         |    AND ${cosSql("a.embedding", "b.embedding")} >= 0.95),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM fp a, fp b, range(0, 4) t(c)
         |  WHERE a.vec_id < b.vec_id
         |    AND ((a.sh >> CAST(c * 15 AS INT)) & 32767) = ((b.sh >> CAST(c * 15 AS INT)) & 32767)
         |    AND bit_count(xor(a.sh, b.sh)) <= 3),
         |banded AS (
         |  SELECT cnd.vec_a, cnd.vec_b FROM cand cnd
         |  JOIN e ea ON ea.vec_id = cnd.vec_a
         |  JOIN e eb ON eb.vec_id = cnd.vec_b
         |  WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.95),
         |m AS (SELECT COUNT(*) AS n FROM truth JOIN banded USING (vec_a, vec_b))
         |SELECT (SELECT COUNT(*) FROM aug) AS n_docs,
         |  (SELECT COUNT(*) FROM e) AS n_sampled,
         |  (SELECT COUNT(*) FROM truth) AS truth_pairs,
         |  (SELECT COUNT(*) FROM banded) AS banded_pairs,
         |  m.n AS matched_pairs,
         |  CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE m.n * 1000000 // (SELECT COUNT(*) FROM truth) END AS recall_ppm,
         |  CASE WHEN (SELECT COUNT(*) FROM banded) = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE m.n * 1000000 // (SELECT COUNT(*) FROM banded) END AS precision_ppm
         |FROM m""".stripMargin,

    "s01_ann_topk" ->
      s"""SELECT q_id, rank, nn_id, ${rndSql("c")} AS cos FROM (
         |  SELECT q.vec_id AS q_id, n.vec_id AS nn_id,
         |    ${cosSql("q.embedding", "n.embedding")} AS c,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id) AS rank
         |  FROM embeddings q, embeddings n
         |  WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id)
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // twin of SimilarityOps.pqEncode(m=8, k=16, dim=64): codebook rebuilt
    // from hash60, subvector slices, the same left-fold double dot, and the
    // same L2 score (|c|² is exactly 8.0 for the ±1 anchors, so
    // 8.0 - 2*dt reproduces pqAssign's __score double bit-for-bit) with
    // identical (score ASC, code ASC) tie-breaking to min(struct)
    "s06_pq_encode" -> {
      val anchorBit = h60Sql(
        "'pq_' || CAST(s AS VARCHAR) || '_' || CAST(c AS VARCHAR) || '_' || CAST(d AS VARCHAR)")
      s"""WITH cb AS (
         |  SELECT s AS sub, c AS code, list_transform(range(0, 8), d ->
         |    CASE WHEN (CASE WHEN d < 4 THEN (c >> d) & 1
         |                    ELSE $anchorBit & 1 END) = 0
         |         THEN 1.0 ELSE -1.0 END) AS anchor
         |  FROM range(0, 8) t1(s), range(0, 16) t2(c)),
         |sv AS (
         |  SELECT vec_id, s AS sub,
         |    list_slice(embedding, CAST(s * 8 + 1 AS INT), CAST(s * 8 + 8 AS INT)) AS v
         |  FROM embeddings, range(0, 8) t(s)),
         |d AS (
         |  SELECT sv.vec_id, sv.sub, cb.code,
         |    list_sum(list_transform(range(1, 9),
         |      i -> CAST(sv.v[i] AS DOUBLE) * cb.anchor[i])) AS dt
         |  FROM sv JOIN cb ON sv.sub = cb.sub),
         |r AS (
         |  SELECT vec_id, sub, code,
         |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY (8.0 - 2.0 * dt) ASC, code ASC) AS rn
         |  FROM d)
         |SELECT vec_id, sub, code FROM r WHERE rn = 1
         |ORDER BY vec_id, sub""".stripMargin
    },

    // twin of SimilarityOps.ivfPqTopK(nCells=16, nProbe=4, m=8, k=16,
    // topK=5): both codebooks rebuilt from hash60, cell probing as in the
    // s03 twin, PQ codes as in the s06 twin, and the ADC score as the
    // EXACT long sum of nano-grid table entries (round(dot*1e9) — the s12
    // grid convention), so ranking reproduces bit-identically
    // (the CTE block is shared with s15's recall-eval twin — composed by
    // plain concatenation per the stripMargin-nesting rule)
    "s13_ivfpq_topk" ->
      ("WITH " + ivfPqCtes + "\n" +
        "SELECT q_id, rank, nn_id, adc_nano\n" +
        "FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"),

    // E133 under the TRAINED coarse quantizer: the same search CTEs with
    // the two-iteration Lloyd chain prepended (ivfPqCtesWith) — only the
    // icb the probe and assignment read differs from s13
    "s17_ivf_trained" ->
      ("WITH " + ivfPqCtesWith(trainedIvf = true) + "\n" +
        "SELECT q_id, rank, nn_id, adc_nano\n" +
        "FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"),

    // E136: the two-stage search — s13's CTE block, shortlist at rank 20,
    // exact-cosine re-rank of the shortlist rows only
    "s16_ivfpq_rerank" ->
      ("WITH " + ivfPqCtes + """,
         |short AS (SELECT q_id, nn_id FROM ranked WHERE rank <= 20),
         |rr0 AS (
         |  SELECT s.q_id, s.nn_id, COS_PLACEHOLDER AS cos
         |  FROM short s
         |  JOIN embeddings q ON q.vec_id = s.q_id
         |  JOIN embeddings n ON n.vec_id = s.nn_id),
         |rr AS (
         |  SELECT q_id, nn_id, cos, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, nn_id ASC) AS rank
         |  FROM rr0)
         |SELECT q_id, rank, nn_id, cos
         |FROM rr WHERE rank <= 5 ORDER BY q_id, rank"""
        .stripMargin
        .replace("COS_PLACEHOLDER", cosSql("q.embedding", "n.embedding"))),

    // E135: measured retrieval quality of the PRODUCTION index — the s10
    // treatment for IVF-PQ: recall@5 / reciprocal rank of the served
    // IVF-PQ top-k against brute exact-cosine truth, both sides fully
    // oracle-replayed (s13's CTEs + s01's exact ranking), ppm grid
    "s15_ivfpq_eval" -> ivfPqEvalSql(ivfPqCtes),

    // E135 for the trained configuration — the s15 metric replay over the
    // s17 search (trained-icb CTE chain, same eval tail)
    "s18_ivf_trained_eval" -> ivfPqEvalSql(ivfPqCtesWith(trainedIvf = true)),

    // E139: the trained-icb chain with RESIDUAL encoding — codes quantize
    // x − μ_cell, score reconstructs dot(q, μ + α·anchor); differs from
    // s17 only in the residual switch, so s18-vs-s20 isolates it
    "s19_ivfpq_residual" ->
      ("WITH " + ivfPqCtesWith(trainedIvf = true, residual = true) + "\n" +
        "SELECT q_id, rank, nn_id, adc_nano\n" +
        "FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"),

    // E140: the s15/s18 metric replay over the s19 residual search
    "s20_ivfpq_residual_eval" ->
      ivfPqEvalSql(ivfPqCtesWith(trainedIvf = true, residual = true)),

    // E141: twin of SimilarityOps.semDedup over the d18 augmented corpus
    // — the 16-cell trained Lloyd chain (corpus = aug), within-cell
    // pairwise cosine, drop rule "∃ lower-id in-cell partner ≥ τ",
    // dup_of = the smallest such partner
    "s21_semdedup" ->
      (s"""WITH aug AS (
         |  SELECT vec_id, list_transform(range(1, 65),
         |    i -> CAST(embedding[i] AS DOUBLE)) AS embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, list_transform(range(1, 65),
         |    i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.5
         |              ELSE CAST(embedding[i] AS DOUBLE) END)
         |  FROM embeddings WHERE vec_id < 50),
         |""".stripMargin +
        trainedIcbChain("aug") +
        s"""
         |assigned AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cell, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.anchor")} DESC, c.cell) AS r
         |    FROM aug e, icb c) WHERE r = 1),
         |pr AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${cosSql("a.embedding", "b.embedding")} AS cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.95),
         |drp AS (
         |  SELECT vec_b AS vec_id, vec_a AS dup_of, cos FROM (
         |    SELECT vec_b, vec_a, cos, row_number() OVER (PARTITION BY vec_b
         |      ORDER BY vec_a ASC) AS rn FROM pr) WHERE rn = 1)
         |SELECT s.vec_id, CAST(s.cell AS INT) AS cell,
         |  d.dup_of IS NULL AS kept, d.dup_of, ${rndSql("d.cos")} AS cos
         |FROM assigned s LEFT JOIN drp d USING (vec_id)
         |ORDER BY s.vec_id""".stripMargin),

    // E143: twin of SimilarityOps.semDedupSampled at the gate constants
    // (8 capped cells, 256-row hash-ordered fit sample, 4 coarse groups) —
    // the full production chain replayed: sample → 2 unrolled Lloyd rounds
    // over the SAMPLE → kmeans-of-centroids group chain (2 more unrolled
    // rounds over the 8 fitted centroids, 'sdg_'-plane seeded) → its final
    // centroid→group assignment → point→live-group rank → within-group
    // centroid rank → the s21 pair/verdict tail. Every rank tie-breaks
    // (cos DESC, id ASC), exactly the Spark min(struct(-cos, id)) argmax.
    "s22_semdedup_sampled" ->
      (s"""WITH aug AS (
         |  SELECT vec_id, list_transform(range(1, 65),
         |    i -> CAST(embedding[i] AS DOUBLE)) AS embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, list_transform(range(1, 65),
         |    i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.5
         |              ELSE CAST(embedding[i] AS DOUBLE) END)
         |  FROM embeddings WHERE vec_id < 50),
         |fit AS (
         |  SELECT vec_id, embedding FROM aug
         |  ORDER BY ${h60Sql("'sdfit_' || CAST(vec_id AS VARCHAR)")}, vec_id
         |  LIMIT 256),
         |""".stripMargin +
        trainedIcbChainN("fit", 8) +
        "\ngsrc AS (SELECT cell AS vec_id, anchor AS embedding FROM icb),\n" +
        lloydChainN("gsrc", 4, seed = "sdg", p = "gicb") +
        s"""
         |gcb AS (SELECT cell AS grp, anchor AS ganchor FROM gicb),
         |cga AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cell, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.anchor")} DESC, c.cell) AS r
         |    FROM gsrc e, gicb c) WHERE r = 1),
         |cg AS (SELECT cga.vec_id AS cell, cga.embedding AS anchor,
         |  cga.cell AS grp FROM cga),
         |lgc AS (
         |  SELECT g.grp, g.ganchor FROM gcb g
         |  JOIN (SELECT DISTINCT grp FROM cg) l USING (grp)),
         |pg AS (
         |  SELECT vec_id, embedding, grp FROM (
         |    SELECT e.vec_id, e.embedding, g.grp, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "g.ganchor")} DESC, g.grp) AS r
         |    FROM aug e, lgc g) WHERE r = 1),
         |assigned AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT p.vec_id, p.embedding, c.cell, row_number() OVER (PARTITION BY p.vec_id
         |      ORDER BY ${cosSql("p.embedding", "c.anchor")} DESC, c.cell) AS r
         |    FROM pg p JOIN cg c USING (grp)) WHERE r = 1),
         |pr AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${cosSql("a.embedding", "b.embedding")} AS cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.95),
         |drp AS (
         |  SELECT vec_b AS vec_id, vec_a AS dup_of, cos FROM (
         |    SELECT vec_b, vec_a, cos, row_number() OVER (PARTITION BY vec_b
         |      ORDER BY vec_a ASC) AS rn FROM pr) WHERE rn = 1)
         |SELECT s.vec_id, CAST(s.cell AS INT) AS cell,
         |  d.dup_of IS NULL AS kept, d.dup_of, ${rndSql("d.cos")} AS cos
         |FROM assigned s LEFT JOIN drp d USING (vec_id)
         |ORDER BY s.vec_id""".stripMargin),

    // E142: twin of CurationOps.dsirSelect — same hashed buckets, same
    // add-1-smoothed double ratio structure, per-bucket ln quantized to
    // micro BEFORE the exact per-doc sum (the t37 convention), top-100
    // by (w_micro DESC, doc_id)
    "t44_dsir_select" ->
      s"""WITH tk AS (
         |  SELECT doc_id, source IN ('src0', 'src1', 'src2') AS tgt,
         |    ${h60Sql("'dsir_' || term")} % 4096 AS f
         |  FROM (SELECT doc_id, source, unnest($toksSql) AS term FROM documents)),
         |tc AS (SELECT f, COUNT(*) AS ct FROM tk WHERE tgt GROUP BY f),
         |pk AS (SELECT doc_id, f FROM tk WHERE NOT tgt),
         |rc AS (SELECT f, COUNT(*) AS cr FROM pk GROUP BY f),
         |nt AS (SELECT coalesce(SUM(ct), 0) AS nt FROM tc),
         |nr AS (SELECT coalesce(SUM(cr), 0) AS nr FROM rc),
         |lr AS (
         |  SELECT rc.f, CAST(round(ln(
         |      (CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE) / CAST(nt.nt + 4096 AS DOUBLE))
         |    / (CAST(rc.cr + 1 AS DOUBLE) / CAST(nr.nr + 4096 AS DOUBLE))) * 1000000)
         |    AS BIGINT) AS lr
         |  FROM rc LEFT JOIN tc USING (f), nt, nr),
         |sc AS (
         |  SELECT p.doc_id, COUNT(*) AS n_tokens, CAST(SUM(l.lr) AS BIGINT) AS w_micro
         |  FROM pk p JOIN lr l USING (f) GROUP BY 1),
         |rk AS (
         |  SELECT doc_id, n_tokens, w_micro,
         |    row_number() OVER (ORDER BY w_micro DESC, doc_id ASC) AS rank
         |  FROM sc)
         |SELECT doc_id, n_tokens, w_micro, CAST(rank AS INT) AS rank
         |FROM rk WHERE rank <= 100 ORDER BY rank""".stripMargin,


    // twin of SimilarityOps.quantizeInt8: same scale division, same
    // round-half-away-from-zero (Spark HALF_UP == DuckDB round on doubles)
    "s05_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings)
        |SELECT vec_id, i AS pos, scale,
        |  CASE WHEN scale = 0.0 THEN 0
        |       ELSE CAST(round(CAST(embedding[i + 1] AS DOUBLE) / scale) AS BIGINT) END AS q
        |FROM s, range(0, 64) t(i)
        |ORDER BY vec_id, pos""".stripMargin,

    "m01_media_features" ->
      // first/last UTF-8 *byte* via hex(encode(...)), not ascii(): ascii()
      // returns the code point of the first character, which diverges from
      // the byte for any multibyte text
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CASE WHEN octet_length(encode(text)) = 0 THEN -1
        |       ELSE CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS INT) END AS first_byte,
        |  CASE WHEN octet_length(encode(text)) = 0 THEN -1
        |       ELSE CAST(('0x' || substr(hex(encode(text)), octet_length(encode(text)) * 2 - 1, 2)) AS INT) END AS last_byte
        |FROM documents ORDER BY doc_id""".stripMargin,

    // twin of videoNearDupPairs(frameBytes=32, 0.6, maxDf=50): stride-1
    // hex-sliced frames (the m02 convention — both engines hex blobs
    // identically), hash60 keys, and the d17 containment report
    "m07_video_dedup" ->
      s"""WITH m AS (
         |  SELECT doc_id, encode(text) AS payload FROM documents),
         |f AS (
         |  SELECT doc_id, payload,
         |    CAST(ceil(octet_length(payload) / 32.0) AS BIGINT) AS n_frames
         |  FROM m),
         |fr AS (
         |  SELECT doc_id, payload, unnest(range(0, n_frames)) AS fno
         |  FROM f WHERE n_frames > 0),
         |e AS (
         |  SELECT DISTINCT doc_id,
         |    ${h60Sql("substring(hex(payload), CAST(fno * 64 + 1 AS BIGINT), 64)")} AS k
         |  FROM fr),
         |dfk AS (SELECT k, count(*) AS dfc FROM e GROUP BY 1),
         |kept AS (SELECT e.doc_id, e.k FROM e JOIN dfk USING (k) WHERE dfc <= 50),
         |sz AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
         |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS nc
         |      FROM kept a JOIN kept b ON a.k = b.k AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |s2 AS (SELECT i.da, i.db, i.nc, x.n AS na, y.n AS nb FROM i
         |       JOIN sz x ON x.doc_id = i.da JOIN sz y ON y.doc_id = i.db),
         |u AS (
         |  SELECT da AS doc_a, db AS doc_b, nc AS n_common, na AS n_keys_a,
         |    nc * 1000000 // na AS containment_ppm FROM s2
         |  UNION ALL
         |  SELECT db, da, nc, nb, nc * 1000000 // nb FROM s2)
         |SELECT doc_a, doc_b, n_common, n_keys_a, containment_ppm
         |FROM u WHERE containment_ppm >= 600000
         |ORDER BY doc_a, doc_b""".stripMargin,

    // twin of audioNearDupPairs over demoWavCorpus: the oracle engine
    // cannot parse RIFF bytes, but every sample is exact md5-derived
    // integer math (hash60 of "aud:<group>:<i>" mod 2^16, variant j
    // silencing frames < j), so it replays frame energies (sum of
    // squares), the 60 delta bits, and brute hamming pairs — all-integer,
    // floor divisions non-negative
    "m06_audio_dedup" ->
      """WITH samp AS (
        |  SELECT d.doc_id, i.i,
        |    CASE WHEN i.i // 64 < (d.doc_id % 4) THEN CAST(0 AS BIGINT)
        |         ELSE CAST('0x' || substr(md5('aud:' || CAST(d.doc_id // 4 AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 15) AS BIGINT) % 65536 - 32768 END AS s
        |  FROM documents d, range(0, 3904) i(i)),
        |en AS (
        |  SELECT doc_id, i // 64 AS p, SUM(s * s) AS e
        |  FROM samp GROUP BY 1, 2),
        |fp AS (
        |  SELECT a.doc_id,
        |    CAST(SUM(CASE WHEN b.e > a.e THEN (CAST(1 AS BIGINT) << CAST(a.p AS INT)) ELSE 0 END) AS BIGINT) AS sh
        |  FROM en a JOIN en b ON b.doc_id = a.doc_id AND b.p = a.p + 1
        |  WHERE a.p < 60 GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        |FROM fp a, fp b
        |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // twin of resizeImages(factor=2) over demoBmpCorpus: nearest-neighbor
    // halving keeps source pixels at even logical coordinates, so the
    // output channel sums are sums of the md5-derived channels over
    // x, y ∈ {0,2,...,14} — exact integers, no pixel parsing needed
    "m05_image_resize" ->
      """WITH raw AS (
        |  SELECT d.doc_id, x.x, y.y,
        |    CAST('0x' || substr(md5('img:' || CAST(d.doc_id // 4 AS VARCHAR) || ':' || CAST(x.x AS VARCHAR) || ':' || CAST(y.y AS VARCHAR)), 1, 15) AS BIGINT) AS h,
        |    ((y.y // 2) * 8 + (x.x // 2) < (d.doc_id % 4)) AS inv
        |  FROM documents d, range(0, 16) x(x), range(0, 16) y(y)
        |  WHERE x.x % 2 = 0 AND y.y % 2 = 0),
        |ch AS (
        |  SELECT doc_id,
        |    CASE WHEN inv THEN 255 - (h % 256) ELSE (h % 256) END AS b,
        |    CASE WHEN inv THEN 255 - ((h // 256) % 256) ELSE ((h // 256) % 256) END AS g,
        |    CASE WHEN inv THEN 255 - ((h // 65536) % 256) ELSE ((h // 65536) % 256) END AS r
        |  FROM raw)
        |SELECT doc_id, CAST(16 AS INT) AS w_in, CAST(16 AS INT) AS h_in,
        |  CAST(8 AS INT) AS w_out, CAST(8 AS INT) AS h_out,
        |  CAST(SUM(b) AS BIGINT) AS sum_b, CAST(SUM(g) AS BIGINT) AS sum_g,
        |  CAST(SUM(r) AS BIGINT) AS sum_r
        |FROM ch GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // twin of imageNearDupPairs over demoBmpCorpus: the oracle engine
    // cannot parse BMP bytes, but every pixel channel is exact md5-derived
    // integer math (hash60 of "img:<group>:<x>:<y>", variant j inverting
    // aHash cells < j), so it replays luma -> 2x2 cell means -> 60-bit
    // average hash -> brute hamming pairs (pigeonhole makes the operator's
    // chunked candidates exact at hamming <= 3, the d04 argument). All
    // divisions are non-negative, so DuckDB's floor // == JVM truncation.
    "m03_image_dedup" ->
      """WITH raw AS (
        |  SELECT d.doc_id, x.x, y.y,
        |    CAST('0x' || substr(md5('img:' || CAST(d.doc_id // 4 AS VARCHAR) || ':' || CAST(x.x AS VARCHAR) || ':' || CAST(y.y AS VARCHAR)), 1, 15) AS BIGINT) AS h,
        |    ((y.y // 2) * 8 + (x.x // 2) < (d.doc_id % 4)) AS inv
        |  FROM documents d, range(0, 16) x(x), range(0, 16) y(y)),
        |ch AS (
        |  SELECT doc_id, x, y,
        |    CASE WHEN inv THEN 255 - (h % 256) ELSE (h % 256) END AS b,
        |    CASE WHEN inv THEN 255 - ((h // 256) % 256) ELSE ((h // 256) % 256) END AS g,
        |    CASE WHEN inv THEN 255 - ((h // 65536) % 256) ELSE ((h // 65536) % 256) END AS r
        |  FROM raw),
        |cells AS (
        |  SELECT doc_id, (y // 2) * 8 + (x // 2) AS k,
        |    SUM((299 * r + 587 * g + 114 * b) // 1000) // 4 AS mean
        |  FROM ch WHERE (y // 2) * 8 + (x // 2) < 60 GROUP BY 1, 2),
        |withavg AS (
        |  SELECT doc_id, k, mean,
        |    SUM(mean) OVER (PARTITION BY doc_id) // 60 AS avg
        |  FROM cells),
        |hashes AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN mean > avg THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END) AS BIGINT) AS sh
        |  FROM withavg GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        |FROM hashes a, hashes b
        |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // twin of Multimodal.imageRecallEval over m03's planted-BMP corpus:
    // replay the deterministic half-sample, the pixel/aHash arithmetic
    // (m03's CTEs restricted to the sample), and the brute hamming truth;
    // banded = matched = truth is EXACT by the multi-index pigeonhole (the
    // d21 precedent, not an analytic floor), so both ppms are 1000000.
    "m08_image_recall_eval" ->
      s"""WITH samp AS (
         |  SELECT doc_id FROM documents
         |  WHERE (${h60Sql("'sample_' || CAST(doc_id AS VARCHAR)")} % 1000000)
         |    < 0.5 * 1000000),
         |raw AS (
         |  SELECT d.doc_id, x.x, y.y,
         |    CAST('0x' || substr(md5('img:' || CAST(d.doc_id // 4 AS VARCHAR) || ':' || CAST(x.x AS VARCHAR) || ':' || CAST(y.y AS VARCHAR)), 1, 15) AS BIGINT) AS h,
         |    ((y.y // 2) * 8 + (x.x // 2) < (d.doc_id % 4)) AS inv
         |  FROM samp d, range(0, 16) x(x), range(0, 16) y(y)),
         |ch AS (
         |  SELECT doc_id, x, y,
         |    CASE WHEN inv THEN 255 - (h % 256) ELSE (h % 256) END AS b,
         |    CASE WHEN inv THEN 255 - ((h // 256) % 256) ELSE ((h // 256) % 256) END AS g,
         |    CASE WHEN inv THEN 255 - ((h // 65536) % 256) ELSE ((h // 65536) % 256) END AS r
         |  FROM raw),
         |cells AS (
         |  SELECT doc_id, (y // 2) * 8 + (x // 2) AS k,
         |    SUM((299 * r + 587 * g + 114 * b) // 1000) // 4 AS mean
         |  FROM ch WHERE (y // 2) * 8 + (x // 2) < 60 GROUP BY 1, 2),
         |withavg AS (
         |  SELECT doc_id, k, mean,
         |    SUM(mean) OVER (PARTITION BY doc_id) // 60 AS avg
         |  FROM cells),
         |hashes AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN mean > avg THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END) AS BIGINT) AS sh
         |  FROM withavg GROUP BY 1),
         |t AS (SELECT COUNT(*) AS n FROM hashes a, hashes b
         |      WHERE a.doc_id < b.doc_id
         |        AND bit_count(xor(a.sh, b.sh)) <= 3)
         |SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         |  (SELECT COUNT(*) FROM hashes) AS n_sampled,
         |  t.n AS truth_pairs, t.n AS banded_pairs, t.n AS matched_pairs,
         |  CASE WHEN t.n = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE t.n * 1000000 // t.n END AS recall_ppm,
         |  CASE WHEN t.n = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE t.n * 1000000 // t.n END AS precision_ppm
         |FROM t""".stripMargin,

    // the naive inequality join — bucketization must be invisible
    "s04_range_join" ->
      """SELECT iv.n_nationkey, COUNT(*) AS n
        |FROM events e
        |JOIN (SELECT n_nationkey, n_nationkey * 15.0 AS lo,
        |             n_nationkey * 15.0 + 25.0 AS hi FROM nation) iv
        |  ON iv.lo <= e.value AND e.value <= iv.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // twin of CurationOps.stratifiedHashSample (hash60 bucket < rate * 1e6)
    "t05_hash_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE (${h60Sql("'sample_' || CAST(doc_id AS VARCHAR)")} % 1000000)
         |  < (CASE WHEN lang = 'en' THEN 0.3 WHEN lang = 'zh' THEN 1.0
         |          ELSE 0.6 END) * 1000000
         |ORDER BY doc_id""".stripMargin,

    // twin of CurationOps.qualityTopQuantile(exact): rank on the 4dp-rounded
    // quality (deterministic in both engines), doc_id tie-break, keep
    // rank <= ceil(n * q)
    "t06_quality_topq" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, ${rndSql(qualitySqlExpr)} AS quality FROM documents),
         |r AS (
         |  SELECT doc_id, lang, quality,
         |    row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY lang) AS n
         |  FROM q)
         |SELECT doc_id, lang, quality FROM r
         |WHERE rn <= ceil(n * 0.5) ORDER BY doc_id""".stripMargin,

    // twin of CurationOps.chunkDocuments (16-token chunks, ragged tail)
    "t07_chunking" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS w FROM documents),
         |c AS (
         |  SELECT doc_id, unnest(range(0, CAST(ceil(len(w) / 16.0) AS BIGINT))) AS chunk_id, w
         |  FROM d WHERE len(w) > 0)
         |SELECT doc_id, chunk_id,
         |  array_to_string(list_slice(w, CAST(chunk_id * 16 + 1 AS INT), CAST(chunk_id * 16 + 16 AS INT)), ' ') AS chunk_text,
         |  len(list_slice(w, CAST(chunk_id * 16 + 1 AS INT), CAST(chunk_id * 16 + 16 AS INT))) AS n_tokens
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // twin of TextOps.tfidfTopK(logIdf = false): raw-ratio idf makes every
    // arithmetic step a correctly-rounded IEEE op on integer-derived
    // doubles — scores and therefore ranks match bit-for-bit
    "t09_tfidf_topk" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term,
         |    tf.tf * ((n.n + 1.0) / (dfreq.df + 1.0)) AS score
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         |r AS (
         |  SELECT doc_id, term, score, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, term) AS rank
         |  FROM scored)
         |SELECT doc_id, rank, term, ${rnd6Sql("score")} AS score
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // twin of CurationOps.packChunks over the t07 chunks: same hash60
    // shard, same cumsum window (unique (doc_id, chunk_id) sort keys make
    // RANGE/ROWS frames identical), same floor((cum-n)/64.0) pack rule
    "t11_seq_packing" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS w FROM documents),
         |c AS (
         |  SELECT doc_id, unnest(range(0, CAST(ceil(len(w) / 16.0) AS BIGINT))) AS chunk_id, w
         |  FROM d WHERE len(w) > 0),
         |ch AS (
         |  SELECT doc_id, chunk_id,
         |    len(list_slice(w, CAST(chunk_id * 16 + 1 AS INT), CAST(chunk_id * 16 + 16 AS INT))) AS n_tokens
         |  FROM c),
         |sh AS (
         |  SELECT doc_id, chunk_id, n_tokens,
         |    CAST(${h60Sql("'pack_' || CAST(doc_id AS VARCHAR)")} % 8 AS INT) AS shard
         |  FROM ch),
         |p AS (
         |  SELECT doc_id, chunk_id, shard, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id) AS cum
         |  FROM sh)
         |SELECT doc_id, chunk_id, shard,
         |  CAST(floor((cum - n_tokens) / 64.0) AS BIGINT) AS pack_id
         |FROM p ORDER BY doc_id, chunk_id""".stripMargin,

    // twin of TextOps.repetition(k=3): all trigrams (duplicates kept) via
    // the shingleCte construction minus list_distinct
    "t12_repetition" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(w) < 3 THEN [] ELSE
         |      list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         |    END AS grams
         |  FROM (SELECT doc_id, $toksSql AS w FROM documents))
         |SELECT doc_id, len(grams) AS n_grams,
         |  CASE WHEN len(grams) > 0
         |       THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
         |       ELSE 0.0 END AS dup_ratio
         |FROM g ORDER BY doc_id""".stripMargin,

    // twin of CurationOps.stratifiedTopN(n=5): same hash, same
    // (hash, doc_id) rank order per language
    "t18_stratified_topn" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |    ORDER BY ${h60Sql("'topn_' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
         |  FROM documents) WHERE rk <= 5 ORDER BY doc_id""".stripMargin,

    // twin of CurationOps.weightedSample(k=20): identical hash-derived
    // uniform, identical pow key, identical (key DESC, id) rank
    "t30_weighted_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    CAST(len($toksSql) + 1 AS DOUBLE) AS w
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, w, row_number() OVER (PARTITION BY lang
         |    ORDER BY pow(
         |      (CAST(${h60Sql("'ws_' || CAST(doc_id AS VARCHAR)")} AS DOUBLE) + 1.0)
         |        / 1152921504606846976.0,
         |      1.0 / w) DESC, doc_id) AS samp_rank
         |  FROM d WHERE w > 0)
         |SELECT doc_id, lang, w, samp_rank FROM r
         |WHERE samp_rank <= 20 ORDER BY doc_id""".stripMargin,

    // twin of AnalyticsOps.distributionDrift: same bucket expression
    // (count of edges <= value), same eps clamp, same PSI/KL forms; ln
    // divergence terms 6-dp rounded
    "t31_drift" -> {
      val bucket = Seq(20, 35, 50, 65, 80)
        .map(e => s"CASE WHEN v >= $e THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($toksSql) AS DOUBLE) AS v FROM documents),
         |b AS (SELECT doc_id % 2 AS side, ($bucket) AS bucket FROM d),
         |c AS (SELECT bucket,
         |    CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         |    CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
         |  FROM b GROUP BY 1),
         |p AS (SELECT bucket, n_ref, n_cur,
         |    GREATEST(CAST(n_ref AS DOUBLE) / CAST(SUM(n_ref) OVER () AS DOUBLE), 1e-6) AS pr,
         |    GREATEST(CAST(n_cur AS DOUBLE) / CAST(SUM(n_cur) OVER () AS DOUBLE), 1e-6) AS pc
         |  FROM c)
         |SELECT bucket, n_ref, n_cur,
         |  ${rnd6Sql("pr")} AS p_ref, ${rnd6Sql("pc")} AS p_cur,
         |  ${rnd6Sql("(pc - pr) * ln(pc / pr)")} AS psi_term,
         |  ${rnd6Sql("pc * ln(pc / pr)")} AS kl_term
         |FROM p ORDER BY bucket""".stripMargin
    },

    // twin of CurationOps.tokenBudgetSelect: the oracle states the greedy
    // prefix rule directly (global cumsum in (quality desc, id) order);
    // the engine's bucket-cumsum plan must select the identical set
    "t33_budget_select" ->
      s"""WITH r AS (
         |  SELECT doc_id,
         |    CAST(round(($qualitySqlExpr) * 1000000) AS BIGINT) AS q_micro,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, q_micro, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY q_micro DESC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM r)
         |SELECT doc_id, q_micro, n_tokens FROM o
         |WHERE cum <= 10000 ORDER BY doc_id""".stripMargin,

    // twin of tokenBudgetMixture: per-stratum global cumsum + per-stratum
    // budget CASE — the naive rule the vectorized bucket plan must match
    "t34_budget_mixture" ->
      s"""WITH r AS (
         |  SELECT doc_id, lang,
         |    CAST(round(($qualitySqlExpr) * 1000000) AS BIGINT) AS q_micro,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents WHERE lang IN ('en', 'de', 'zh')),
         |o AS (
         |  SELECT doc_id, lang, q_micro, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY q_micro DESC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM r)
         |SELECT doc_id, lang, q_micro, n_tokens FROM o
         |WHERE cum <= CASE lang WHEN 'en' THEN 5000
         |                       WHEN 'de' THEN 2000 ELSE 2500 END
         |ORDER BY doc_id""".stripMargin,

    // twin of bigramLmScore(a=1.0) self-trained on documents: identical
    // smoothing expression shape, ln on the same double, micro-rounded
    // int64 sums, floor-through-double mean
    "t37_bigram_lm" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
         |uni AS (
         |  SELECT u AS p, CAST(COUNT(*) AS BIGINT) AS c1
         |  FROM (SELECT unnest(t) AS u FROM tk) GROUP BY 1),
         |vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
         |bi AS (
         |  SELECT z[1] AS p, z[2] AS w, CAST(COUNT(*) AS BIGINT) AS c2
         |  FROM (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
         |        FROM tk) GROUP BY 1, 2),
         |db AS (
         |  SELECT doc_id, z[1] AS p, z[2] AS w
         |  FROM (SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
         |        FROM tk)),
         |sc AS (
         |  SELECT db.doc_id,
         |    CAST(round(ln((coalesce(bi.c2, 0) + 1.0)
         |        / (coalesce(uni.c1, 0) + 1.0 * vv.v)) * 1000000.0) AS BIGINT) AS lp
         |  FROM db
         |  LEFT JOIN bi ON bi.p = db.p AND bi.w = db.w
         |  LEFT JOIN uni ON uni.p = db.p
         |  CROSS JOIN vv),
         |ag AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(lp) AS BIGINT) AS lp_sum_micro
         |  FROM sc GROUP BY 1)
         |SELECT d.doc_id, coalesce(ag.n_bigrams, 0) AS n_bigrams,
         |  coalesce(ag.lp_sum_micro, 0) AS lp_sum_micro,
         |  CASE WHEN ag.n_bigrams IS NOT NULL
         |       THEN CAST(floor(CAST(ag.lp_sum_micro AS DOUBLE) / ag.n_bigrams) AS BIGINT)
         |  END AS avg_lp_micro
         |FROM documents d LEFT JOIN ag USING (doc_id) ORDER BY doc_id""".stripMargin,

    // unrolled twin of trainBpeMerges(numMerges=8, minPairFreq=2): per
    // round, symbols from the delimiter-encoded seq (split/strip), pair
    // counts via shifted list_zip, argmax with the same tie-break, fusion
    // via the same literal replace. An empty b_k (no pair >= 2) empties
    // every later round through the cross join — the early-stop twin.
    // NOTE: built by concatenation, NOT an outer stripMargin — the
    // interpolated CTE block is already margin-stripped and its `||`
    // continuation lines would lose a pipe to a second stripMargin pass
    "t36_bpe_merges" ->
      ("WITH " + bpeCtes + "\nSELECT * FROM (\n" + bpeMergeUnion +
        "\n) ORDER BY \"rank\""),

    // vocab twin: distinct corpus characters + the end-of-word marker in
    // binary order (ids 0..B-1), then merge products at B + rank - 1
    "t38_bpe_vocab" ->
      ("WITH " + bpeCtes + ",\n" +
        """chars AS (
          |  SELECT DISTINCT unnest(string_split(w, '')) AS token FROM (
          |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
          |    FROM documents) t
          |  WHERE w <> '' AND w NOT LIKE '%'||chr(1)||'%'
          |    AND w NOT LIKE '%'||chr(2)||'%' AND w NOT LIKE '%'||chr(3)||'%'),
          |base AS (
          |  SELECT row_number() OVER (ORDER BY token) - 1 AS token_id, token
          |  FROM (SELECT token FROM chars UNION SELECT chr(3))),
          |bc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
          |mg AS (""".stripMargin + "\n" + bpeMergeUnion + "\n" +
        """)
          |SELECT * FROM (
          |  SELECT token_id, token FROM base
          |  UNION ALL
          |  SELECT bc.n + mg."rank" - 1 AS token_id,
          |    mg."left" || mg."right" AS token
          |  FROM mg, bc
          |) ORDER BY token_id""".stripMargin),

    // twin of negativeSample(k=3): global row_number over (h, id) IS the
    // bucketed prefix-sum index (the bucket is the hash's high bits, so
    // bucket-major + in-bucket order = global hash order); self-collisions
    // advance one ring position exactly as the operator does
    "t35_negative_sample" -> {
      val candH = h60Sql("'neg:' || CAST(doc_id AS VARCHAR)")
      val pickH = h60Sql(
        "'negt:' || CAST(d.doc_id AS VARCHAR) || ':' || CAST(g.j AS VARCHAR)")
      s"""WITH ix AS (
         |  SELECT doc_id AS cand_id,
         |    row_number() OVER (ORDER BY h, doc_id) - 1 AS idx
         |  FROM (SELECT doc_id, $candH AS h FROM documents)),
         |nn AS (SELECT count(*) AS n FROM documents),
         |tg AS (
         |  SELECT d.doc_id AS anchor, g.j AS j, $pickH % nn.n AS pick
         |  FROM documents d CROSS JOIN generate_series(1, 3) AS g(j)
         |  CROSS JOIN nn),
         |p1 AS (
         |  SELECT tg.anchor, tg.j, tg.pick, ix.cand_id
         |  FROM tg JOIN ix ON ix.idx = tg.pick)
         |SELECT p1.anchor, p1.j,
         |  CASE WHEN p1.cand_id <> p1.anchor THEN p1.cand_id
         |       ELSE i2.cand_id END AS neg_id
         |FROM p1 CROSS JOIN nn
         |LEFT JOIN ix i2 ON i2.idx = (p1.pick + 1) % nn.n
         |ORDER BY anchor, j""".stripMargin
    },

    // twin of CountMin.build+estimate (depth 4, width 256): the sketch is
    // rebuilt bucket-for-bucket from the portable md5 hash; every observed
    // term's 4 buckets are non-empty, so the min needs no zero fallback
    "t32_cms_freq" -> {
      val b = h60Sql("'cms' || CAST(t.j AS VARCHAR) || '_' || term")
      val kb = h60Sql("'cms' || CAST(t.j AS VARCHAR) || '_' || k.term")
      s"""WITH tk AS (SELECT unnest($toksSql) AS term FROM documents),
         |sk AS (
         |  SELECT t.j, $b % 256 AS bucket, COUNT(*) AS cnt
         |  FROM tk CROSS JOIN range(0, 4) t(j) GROUP BY 1, 2),
         |k AS (SELECT DISTINCT term FROM tk),
         |l AS (
         |  SELECT k.term, sk.cnt
         |  FROM k CROSS JOIN range(0, 4) t(j)
         |  JOIN sk ON sk.j = t.j AND sk.bucket = $kb % 256)
         |SELECT term, CAST(MIN(cnt) AS BIGINT) AS est
         |FROM l GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // twin of TextOps.vocabOov(V=100): same (tf DESC, term) vocabulary
    // rank, same exact-integer OOV division
    "t19_vocab_oov" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |vocab AS (
         |  SELECT term FROM (
         |    SELECT term, row_number() OVER (ORDER BY COUNT(*) DESC, term) AS rk
         |    FROM tk GROUP BY term) WHERE rk <= 100),
         |d AS (
         |  SELECT t.doc_id, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |  FROM tk t LEFT JOIN vocab v ON t.term = v.term
         |  GROUP BY t.doc_id)
         |SELECT doc_id, n_tokens, n_oov,
         |  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_ratio
         |FROM d ORDER BY doc_id""".stripMargin,

    // twin of TextOps.bm25Score(k1=1.2, b=0.75, terms spark/table/query):
    // constants interpolated from the SAME Scala doubles, identical
    // left-assoc op tree per term, same (score DESC, doc_id) top-10
    "t17_bm25" -> {
      val (k1, b) = (1.2, 0.75)
      val terms = Seq("spark", "table", "query")
      val tfCols = terms.map(t =>
        s"len(list_filter(w, x -> x = '$t')) AS tf_$t").mkString(",\n    ")
      val dfCols = terms.map(t =>
        s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
        .mkString(",\n    ")
      val scoreExpr = terms.map { t =>
        s"(CAST(n + 1 AS DOUBLE) / CAST(df_$t + 1 AS DOUBLE)) * " +
          s"(CAST(tf_$t AS DOUBLE) * ${k1 + 1.0} / (CAST(tf_$t AS DOUBLE) + " +
          s"$k1 * (1.0 - $b + $b * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))))"
      }.mkString("\n    + ")
      s"""WITH pd AS (
         |  SELECT doc_id, len(w) AS dl,
         |    $tfCols
         |  FROM (SELECT doc_id, $toksSql AS w FROM documents)),
         |st AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl,
         |    $dfCols
         |  FROM pd),
         |sc AS (
         |  SELECT doc_id, dl,
         |    $scoreExpr AS score
         |  FROM pd, st)
         |SELECT doc_id, rank, dl, score FROM (
         |  SELECT doc_id, dl, score,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |  FROM sc) WHERE rank <= 10 ORDER BY rank""".stripMargin
    },

    // twin of CurationOps.hashSplit(0.8/0.1/0.1): same hash60 bucket, same
    // cumulative thresholds (driver-computed doubles injected literally)
    "t15_hash_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN (${h60Sql("'split_' || CAST(doc_id AS VARCHAR)")} % 1000000) < ${0.8 * 1000000} THEN 'train'
         |       WHEN (${h60Sql("'split_' || CAST(doc_id AS VARCHAR)")} % 1000000) < ${(0.8 + 0.1) * 1000000} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    // twin of exactSplit(0.8/0.1/0.1 ppm): the global per-stratum
    // (h, id) rank IS the operator's bucket-major rank (the bucket key is
    // the hash's own top bits); boundaries replay the staged int division
    "t39_exact_split" ->
      s"""WITH b AS (
         |  SELECT doc_id, source,
         |    ${h60Sql("'xsplit_' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1 AS rk,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM b)
         |SELECT doc_id, source,
         |  CASE WHEN rk < n * 800000 // 1000000 THEN 'train'
         |       WHEN rk < n * 900000 // 1000000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM r ORDER BY doc_id""".stripMargin,

    "t41_lr_quality" -> lrOracle,

    // twin of balancedShards(nShards=4): the global per-stratum
    // (q desc, id) rank IS the operator's bucket-major rank (bucket =
    // high bits of the 1e6-q order value); shard = rank mod 4
    "t43_balanced_shards" ->
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    CAST(round(($qualitySqlExpr) * 1000000) AS BIGINT) AS q_micro
         |  FROM documents),
         |r AS (SELECT doc_id, source, q_micro,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY q_micro DESC, doc_id) - 1 AS rk
         |      FROM q)
         |SELECT doc_id, source, q_micro, CAST(rk % 4 AS INT) AS shard
         |FROM r ORDER BY doc_id""".stripMargin,

    // twin of temperatureWeights(alpha=0.3): relative-share pow, micro
    // quantization BEFORE the exact integer normalizer, staged ppm div
    "t42_temperature_mix" ->
      s"""WITH s AS (
         |  SELECT source AS stratum, count(*) AS n_docs,
         |    CAST(SUM(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM s),
         |r AS (SELECT stratum, n_docs, n_tokens,
         |        CAST(round(pow(CAST(n_tokens AS DOUBLE) / tot, 0.3) * 1000000) AS BIGINT) AS r_micro
         |      FROM s, t),
         |rt AS (SELECT CAST(SUM(r_micro) AS BIGINT) AS rt FROM r)
         |SELECT stratum, n_docs, n_tokens, r_micro,
         |  r_micro * 1000000 // rt.rt AS share_ppm
         |FROM r, rt ORDER BY stratum""".stripMargin,

    // twin of tokenFrequencySpectrum: same two aggregates, cumulative
    // windows over the spectrum frame, staged ppm divisions (sums cast
    // back to BIGINT — DuckDB widens SUM to HUGEINT)
    "t40_token_spectrum" ->
      s"""WITH tk AS (SELECT unnest($toksSql) AS t FROM documents),
         |tf AS (SELECT t, count(*) AS f FROM tk GROUP BY 1),
         |sp AS (SELECT f, count(*) AS n_types FROM tf GROUP BY 1),
         |x AS (SELECT f, n_types, f * n_types AS mass,
         |        CAST(SUM(f * n_types) OVER () AS BIGINT) AS total,
         |        CAST(SUM(n_types) OVER (ORDER BY f DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_types,
         |        CAST(SUM(f * n_types) OVER (ORDER BY f DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_mass
         |      FROM sp)
         |SELECT f, n_types, mass * 1000000 // total AS token_ppm, cum_types,
         |  cum_mass * 1000000 // total AS cum_token_ppm
         |FROM x ORDER BY f DESC""".stripMargin,

    // twin of TextOps.unigramScore: integer tf/total sums, one double
    // division of exact casts — matches unrounded
    "t16_unigram_score" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |cnt AS (SELECT term, COUNT(*) AS tf FROM tk GROUP BY term),
         |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM cnt),
         |d AS (
         |  SELECT t.doc_id, COUNT(*) AS n_tokens, CAST(SUM(c.tf) AS BIGINT) AS sum_tf
         |  FROM tk t JOIN cnt c USING (term) GROUP BY t.doc_id)
         |SELECT doc_id, n_tokens, sum_tf,
         |  CAST(sum_tf AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * CAST(total AS DOUBLE)) AS score
         |FROM d, tot ORDER BY doc_id""".stripMargin,

    // twin of CurationOps.mixtureSample: same share CASE, same
    // (share * budget) / tokens association, same hash60 bucket rule
    "t14_mixture_sample" ->
      s"""WITH r AS (SELECT doc_id, source, len($toksSql) AS n_tokens FROM documents),
         |t AS (
         |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS stratum_tokens,
         |    least(1.0, (CASE WHEN source = 'src0' THEN 0.2
         |                     WHEN source = 'src1' THEN 0.02
         |                     ELSE 0.05 END) * 5000.0
         |      / CAST(CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE)) AS rate
         |  FROM r GROUP BY source)
         |SELECT r.doc_id, r.source, r.n_tokens, t.stratum_tokens,
         |  ${rnd6Sql("t.rate")} AS rate
         |FROM r JOIN t USING (source)
         |WHERE (${h60Sql("'mix_' || CAST(doc_id AS VARCHAR)")} % 1000000) < t.rate * 1000000.0
         |ORDER BY doc_id""".stripMargin,

    // twin of TextOps.redactPii over the same deterministic augmentation:
    // staged regexp_replace with 'g' (Spark replaces all by default), each
    // count against the previous stage's text; RE2 and Java agree on these
    // restricted patterns
    "t13_pii_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phone = "\\+\\d[\\d ()-]{6,14}\\d"
      s"""WITH pii AS (
         |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
         |    || '@mail.example.com or +39 3' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
         |    || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
         |    || '.0.' || CAST(doc_id * 7 % 256 AS VARCHAR) AS t0
         |  FROM documents),
         |s1 AS (
         |  SELECT doc_id, len(regexp_extract_all(t0, '$email')) AS n_email,
         |    regexp_replace(t0, '$email', '<EMAIL>', 'g') AS t1
         |  FROM pii),
         |s2 AS (
         |  SELECT doc_id, n_email, len(regexp_extract_all(t1, '$ip')) AS n_ip,
         |    regexp_replace(t1, '$ip', '<IP>', 'g') AS t2
         |  FROM s1)
         |SELECT doc_id, regexp_replace(t2, '$phone', '<PHONE>', 'g') AS red_text,
         |  n_email, n_ip, len(regexp_extract_all(t2, '$phone')) AS n_phone
         |FROM s2 ORDER BY doc_id""".stripMargin
    },

    // twin of HeavyHitters.exactHeavyHitters(minShare=0.005): the sketch
    // pass only prunes, so the SQL twin is the full GROUP BY with a share
    // HAVING — both engines compare cnt against the same IEEE double
    // product n * 0.005
    "t10_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS term FROM documents)
         |SELECT term, COUNT(*) AS cnt FROM toks
         |GROUP BY term
         |HAVING COUNT(*) > (SELECT COUNT(*) FROM toks) * 0.005
         |ORDER BY term""".stripMargin,

    // twin of CurationOps.stripStopwords (DefaultStopwords list)
    "t08_stopword_strip" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS w FROM documents),
         |k AS (
         |  SELECT doc_id, w,
         |    list_filter(w, t -> NOT list_contains(['the','a','of','and','to','in'], t)) AS kept
         |  FROM d)
         |SELECT doc_id, array_to_string(kept, ' ') AS clean_text,
         |  len(w) - len(kept) AS n_removed
         |FROM k ORDER BY doc_id""".stripMargin,

    // twin of TextOps.sparseCosinePairs(threshold=0.3, maxDf=200,
    // normRound=6): same ratio idf, same integer df pruning, norms rounded
    // 6dp before the division (dot sums are order-dependent ~1ulp; the 4dp
    // output rounding absorbs them, the same convention as d05)
    "d09_sparse_sim" ->
      s"""WITH toks AS (SELECT doc_id AS id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
         |          HAVING COUNT(*) >= 2 AND COUNT(*) <= 200),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |w AS (
         |  SELECT tf.id, tf.term, tf.tf * ((n.n + 1.0) / (dfreq.df + 1.0)) AS w
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         |norms AS (SELECT id, ${rnd6Sql("sqrt(SUM(w * w))")} AS norm FROM w GROUP BY 1),
         |dt AS (
         |  SELECT a.id AS id_a, b.id AS id_b, SUM(a.w * b.w) AS dot
         |  FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, ${rndSql("dt.dot / (na.norm * nb.norm)")} AS cos
         |FROM dt JOIN norms na ON dt.id_a = na.id JOIN norms nb ON dt.id_b = nb.id
         |WHERE dt.dot / (na.norm * nb.norm) >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    // twin of sparseCosinePairsFrac(threshold=0.3, maxDfFrac=0.08,
    // normRound=6): identical to d09 except the df cutoff is
    // floor(0.08 * n) — same single IEEE-double multiply + floor in both
    // engines, so the kept term set matches exactly
    "d14_sparse_sim_frac" ->
      s"""WITH toks AS (SELECT doc_id AS id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |dfreq AS (SELECT term, COUNT(*) AS df, n.n AS n FROM tf CROSS JOIN n GROUP BY 1, 3
         |          HAVING COUNT(*) >= 2 AND COUNT(*) <= CAST(floor(0.08 * n.n) AS BIGINT)),
         |w AS (
         |  SELECT tf.id, tf.term, tf.tf * ((dfreq.n + 1.0) / (dfreq.df + 1.0)) AS w
         |  FROM tf JOIN dfreq USING (term)),
         |norms AS (SELECT id, ${rnd6Sql("sqrt(SUM(w * w))")} AS norm FROM w GROUP BY 1),
         |dt AS (
         |  SELECT a.id AS id_a, b.id AS id_b, SUM(a.w * b.w) AS dot
         |  FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, ${rndSql("dt.dot / (na.norm * nb.norm)")} AS cos
         |FROM dt JOIN norms na ON dt.id_a = na.id JOIN norms nb ON dt.id_b = nb.id
         |WHERE dt.dot / (na.norm * nb.norm) >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    // twin of AnalyticsOps.quantileBuckets(n=10) over the rounded quality
    // score: the (quality, doc_id) order is total, so NTILE assigns
    // identically in both engines
    "t20_quality_deciles" ->
      s"""SELECT doc_id, lang, ${rndSql(qualitySqlExpr)} AS quality,
         |  CAST(ntile(10) OVER (PARTITION BY lang
         |    ORDER BY ${rndSql(qualitySqlExpr)}, doc_id) AS INT) AS decile
         |FROM documents ORDER BY doc_id""".stripMargin,

    // twin of TextOps.repairText over the TextRepairAug-dirtied corpus:
    // the stage chain is GENERATED from the same MojibakeFixes constant
    // the operator folds over, so sequences, order, and the
    // count-on-previous-stage semantics match by construction
    "t21_text_repair" -> textRepairOracle,

    // twin of TextOps.bigramPmi(minCount=5): same left-assoc double
    // product chain over exact long counts
    "t22_bigram_pmi" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
         |w AS (SELECT doc_id, $toksSql AS w FROM documents),
         |uni AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY 1),
         |nu AS (SELECT SUM(c) AS n_uni FROM uni),
         |bil AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |    i -> w[i] || ' ' || w[i + 1])) AS bg
         |  FROM w),
         |bi AS (SELECT bg, COUNT(*) AS c_ab FROM bil GROUP BY 1),
         |nb AS (SELECT SUM(c_ab) AS n_bi FROM bi),
         |k AS (
         |  SELECT bg, c_ab, string_split(bg, ' ')[1] AS a,
         |    string_split(bg, ' ')[2] AS b
         |  FROM bi WHERE c_ab >= 5)
         |SELECT k.bg, k.c_ab, ua.c AS c_a, ub.c AS c_b,
         |  CAST(k.c_ab AS DOUBLE) * CAST(nu.n_uni AS DOUBLE) * CAST(nu.n_uni AS DOUBLE)
         |    / (CAST(nb.n_bi AS DOUBLE) * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS pmi_ratio
         |FROM k JOIN uni ua ON k.a = ua.t JOIN uni ub ON k.b = ub.t
         |CROSS JOIN nu CROSS JOIN nb
         |ORDER BY bg""".stripMargin,

    // twin of AnalyticsOps.tableChecksum: same md5-derived hash60, exact
    // HUGEINT sum, digits-only string comparison
    "b42_checksum" ->
      s"""WITH h AS (
         |  SELECT ${h60Sql("CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || COALESCE(l_returnflag, '__NULL__')")} AS h
         |  FROM lineitem)
         |SELECT COUNT(*) AS n_rows, CAST(SUM(CAST(h AS HUGEINT)) AS VARCHAR) AS checksum
         |FROM h""".stripMargin,

    // twin of the partitionChecksum diff: same hash60 keys, HUGEINT sums,
    // full-outer status compare per month partition
    "b45_partition_diff" -> {
      val hk = h60Sql("CAST(k AS VARCHAR) || '|' || " +
        "CAST(CAST(round(p * 10000) AS BIGINT) AS VARCHAR)")
      s"""WITH o AS (
         |  SELECT o_orderkey AS k, o_orderdate AS d, o_totalprice AS p FROM orders),
         |newt AS (
         |  SELECT k, d,
         |    CASE WHEN year(d) = 1997 AND k % 13 = 0 THEN p + 1.0 ELSE p END AS p
         |  FROM o WHERE NOT (year(d) = 1998 AND month(d) = 8)
         |  UNION ALL
         |  SELECT k, d + INTERVAL 84 MONTH, p FROM o
         |  WHERE year(d) = 1992 AND month(d) = 1),
         |co AS (
         |  SELECT date_trunc('month', d) AS pk, COUNT(*) AS n,
         |    SUM(CAST($hk AS HUGEINT)) AS c
         |  FROM o GROUP BY 1),
         |cn AS (
         |  SELECT date_trunc('month', d) AS pk, COUNT(*) AS n,
         |    SUM(CAST($hk AS HUGEINT)) AS c
         |  FROM newt GROUP BY 1)
         |SELECT CAST(floor(epoch(COALESCE(co.pk, cn.pk))) AS BIGINT) AS part_ts,
         |  CASE WHEN co.pk IS NULL THEN 'added'
         |       WHEN cn.pk IS NULL THEN 'removed'
         |       WHEN co.c = cn.c AND co.n = cn.n THEN 'same'
         |       ELSE 'changed' END AS status,
         |  co.n AS n_old, cn.n AS n_new
         |FROM co FULL OUTER JOIN cn ON co.pk = cn.pk
         |ORDER BY part_ts""".stripMargin
    },

    // twin of TextOps.charClassStats: same length-difference counts, one
    // exact int/int division each
    "t23_char_classes" -> {
      def cnt(re: String) = s"(len(text) - len(regexp_replace(text, '$re', '', 'g')))"
      def frac(re: String) =
        s"CASE WHEN len(text) > 0 THEN CAST(${cnt(re)} AS DOUBLE) / CAST(len(text) AS DOUBLE) ELSE 0.0 END"
      s"""SELECT doc_id, len(text) AS n_chars,
         |  ${frac("[A-Za-z]")} AS alpha_frac, ${frac("[0-9]")} AS digit_frac,
         |  ${frac("\\s")} AS space_frac, ${frac("[A-Z]")} AS upper_frac,
         |  ${frac("[^A-Za-z0-9\\s]")} AS symbol_frac
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // twin of TextOps.extractDomains over the same planted URLs
    "t24_domains" ->
      """WITH w AS (
        |  SELECT doc_id, text || ' see http://Site' || CAST(doc_id % 7 AS VARCHAR)
        |    || '.Example.COM/page'
        |    || CASE WHEN doc_id % 2 = 0 THEN ' and https://mirror.example.org/x' ELSE '' END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\s]*)?', 0)) AS url
        |  FROM w)
        |SELECT lower(regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain,
        |  COUNT(*) AS n_urls, COUNT(DISTINCT doc_id) AS n_docs
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    // exact-integer Simpson collision over per-doc term frequencies
    "t25_token_diversity" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, COUNT(*) AS c FROM tk GROUP BY 1, 2),
        |d AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(SUM(c * (c - 1)) AS BIGINT) AS coll
        |  FROM tf GROUP BY 1)
        |SELECT doc_id AS id, n_tokens,
        |  CASE WHEN n_tokens > 1
        |       THEN CAST(coll AS DOUBLE) / (n_tokens * (n_tokens - 1)) END AS collision_p,
        |  CASE WHEN n_tokens > 1
        |       THEN 1.0 - CAST(coll AS DOUBLE) / (n_tokens * (n_tokens - 1)) END AS diversity
        |FROM d ORDER BY id""".stripMargin,

    // LIKE-join twin: the suffix-explode equi-join must be invisible
    "t26_blocklist" ->
      """WITH w AS (
        |  SELECT doc_id, text || ' see http://Site' || CAST(doc_id % 7 AS VARCHAR)
        |    || '.Example.COM/page'
        |    || CASE WHEN doc_id % 2 = 0 THEN ' and https://mirror.example.org/x' ELSE '' END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\s]*)?', 0)) AS url
        |  FROM w),
        |h AS (
        |  SELECT DISTINCT doc_id,
        |    lower(regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1)) AS host
        |  FROM u),
        |m AS (
        |  SELECT doc_id, min(b.rule) AS blocked_by
        |  FROM h JOIN (VALUES ('site3.example.com'), ('example.org')) b(rule)
        |    ON h.host = b.rule OR h.host LIKE '%.' || b.rule
        |  GROUP BY 1)
        |SELECT d.doc_id AS id, m.blocked_by
        |FROM documents d LEFT JOIN m USING (doc_id) ORDER BY id""".stripMargin,

    // nano-quantized exact centroid sums (dim fixed at 64, the cosSql
    // range convention)
    "s07_centroids" ->
      """WITH x AS (
        |  SELECT label AS grp, i - 1 AS pos,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000000) AS BIGINT) AS v
        |  FROM embeddings, range(1, 65) t(i))
        |SELECT grp, pos, COUNT(*) AS n,
        |  CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1000000000) AS centroid
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // sign matrix rebuilt from the same hash60 parities (salt rp:i:j);
    // micro-quantized signed sums are exact int64 on both engines
    "s08_random_proj" -> {
      val signH = h60Sql("'rp:' || CAST(i.i AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)")
      s"""WITH q AS (
         |  SELECT vec_id, t.i - 1 AS i,
         |    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000) AS BIGINT) AS q
         |  FROM embeddings, range(1, 65) t(i)),
         |s AS (
         |  SELECT i.i, j.j,
         |    CASE WHEN $signH % 2 = 0 THEN 1 ELSE -1 END AS s
         |  FROM range(0, 64) i(i) CROSS JOIN range(0, 8) j(j))
         |SELECT q.vec_id, s.j, CAST(SUM(q.q * s.s) AS BIGINT) AS proj_micro
         |FROM q JOIN s ON s.i = q.i
         |GROUP BY 1, 2 ORDER BY vec_id, j""".stripMargin
    },

    // the same canonicalization sequence in the RE2 dialect (\1 backrefs,
    // 'g' flags); step order is the contract
    "t28_url_canon" ->
      """WITH w AS (
        |  SELECT doc_id, text
        |    || ' http://Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM:80/p'
        |    || CAST(doc_id % 11 AS VARCHAR)
        |    || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0 THEN ' https://Mirror.example.org:443/x?utm_source=a&q='
        |         || CAST(doc_id % 5 AS VARCHAR) || '&fbclid=zz#sec' ELSE '' END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id AS id,
        |    unnest(regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\s]*)?', 0)) AS url
        |  FROM w),
        |c0 AS (SELECT id, url, regexp_replace(url, '#.*$', '') AS s FROM u),
        |c1 AS (
        |  SELECT id, url,
        |    lower(regexp_extract(s, '^(https?://[^/?#]*)', 1))
        |      || regexp_extract(s, '^https?://[^/?#]*(.*)$', 1) AS s
        |  FROM c0),
        |c2 AS (SELECT id, url,
        |    regexp_replace(s, '[?&](utm_[A-Za-z0-9_]+|fbclid)=[^&#]*', '', 'g') AS s FROM c1),
        |c3 AS (SELECT id, url, regexp_replace(s, '^((?:[^?&])*)&', '\1?') AS s FROM c2),
        |c4 AS (SELECT id, url,
        |    regexp_replace(s, '^(http://[^/:?#]+):80(/|$|\?)', '\1\2') AS s FROM c3),
        |c5 AS (SELECT id, url,
        |    regexp_replace(s, '^(https://[^/:?#]+):443(/|$|\?)', '\1\2') AS s FROM c4)
        |SELECT id, url, regexp_replace(s, '/$', '') AS canon
        |FROM c5 ORDER BY id, url""".stripMargin,

    // twin of Multimodal.sampleFrames(32, 4) over the attachBinary payload
    // (utf-8 text bytes): frame content compared via hex-string slicing
    "m02_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, encode(text) AS payload FROM documents),
        |f AS (
        |  SELECT doc_id, payload,
        |    CAST(ceil(octet_length(payload) / 32.0) AS BIGINT) AS n_frames
        |  FROM m),
        |e AS (
        |  SELECT doc_id, payload, unnest(range(0, n_frames, 4)) AS frame_no
        |  FROM f WHERE n_frames > 0)
        |SELECT doc_id, frame_no, frame_no * 32 AS byte_offset,
        |  substring(hex(payload), CAST(frame_no * 64 + 1 AS BIGINT), 64) AS frame_hex
        |FROM e ORDER BY doc_id, frame_no""".stripMargin
  )

  /** DuckDB twin of [[graft.operators.TextOps.repairText]], generated from
    * [[graft.operators.TextOps.MojibakeFixes]]. */
  private lazy val textRepairOracle: String = {
    val ctrl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
    val fixes = graft.operators.TextOps.MojibakeFixes
    val stages = fixes.zipWithIndex.map { case ((seq, fix), i) =>
      val prev = if (i == 0) "c" else s"s${i - 1}"
      s"""s$i AS (
         |  SELECT *, CAST((len(m$i) - len(replace(m$i, ${sqlLit(seq)}, ''))) / ${seq.length} AS BIGINT) AS c$i,
         |    replace(m$i, ${sqlLit(seq)}, ${sqlLit(fix)}) AS m${i + 1}
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    val cSum = fixes.indices.map(i => s"c$i").mkString(" + ")
    val mLast = s"m${fixes.length}"
    s"""WITH aug AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 2 = 0 THEN chr(7) ELSE '' END
       |    || ${sqlLit(TextRepairAug)}
       |    || CASE WHEN doc_id % 3 = 0 THEN '  x' ELSE '' END AS t0
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, len(regexp_extract_all(t0, '$ctrl')) AS n_ctrl,
       |    regexp_replace(t0, '$ctrl', '', 'g') AS m0
       |  FROM aug),
       |$stages
       |SELECT doc_id,
       |  trim(regexp_replace($mLast, '\\s{2,}', ' ', 'g')) AS clean_text,
       |  n_ctrl, $cSum AS n_mojibake,
       |  len(regexp_extract_all($mLast, '\\s{2,}')) AS n_wsrun
       |FROM s${fixes.length - 1} ORDER BY doc_id""".stripMargin
  }
}
