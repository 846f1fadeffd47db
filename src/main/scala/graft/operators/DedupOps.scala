package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deduplication operators for training-data pipelines: exact (fingerprint
  * hash-groupBy), exact n-gram Jaccard (the verification/oracle path),
  * MinHash+LSH (the scale path for near-dup mining), and SimHash (hamming
  * near-dup). All candidate generation is relational (aggregate + equi-join
  * on band buckets — shuffles on bucket keys, never an O(n²) comparison at
  * scale); the O(n²) brute-force variants exist for verification and as the
  * small-input oracle twin.
  *
  * Hashes are md5-derived and portable (see [[Hashing]]) so every signature
  * can be reproduced by an external engine bit-for-bit.
  */
object DedupOps {

  /** Exact dedup by content fingerprint: per fingerprint keep the minimum id
    * and report group size. Single hash aggregate — the 100 TB-scale exact
    * dedup is exactly this shape (shuffle on fingerprint). */
  /** Decontamination: corpus documents sharing ANY word `k`-gram with the
    * benchmark set (the standard test-set-overlap rule for training data).
    * Both sides explode to distinct k-gram hashes — the 60-bit portable
    * hash, so at scale the semi-join shuffles 8-byte keys instead of
    * k-word strings, and the oracle can reproduce every key — and a
    * left-semi join flags the overlapping doc ids. Linear in corpus +
    * benchmark gram counts; the benchmark side is typically small enough
    * that the semi-join broadcasts. Returns the distinct contaminated
    * `doc_id`s. */
  def decontaminate(corpus: DataFrame, idCol: Column, textCol: Column,
                    bench: DataFrame, benchTextCol: Column, k: Int): DataFrame = {
    // allShingles, NOT shinglesOfTokens: per-doc distinctness is
    // semantically irrelevant here (semi-join + distinct doc_id), and
    // exploding the array_distinct'd array hits the measured
    // InferFiltersFromGenerate triple-evaluation trap (see
    // explodedShingleKeys) — the bench side distincts on hashes anyway
    val cg = Par.ensure(corpus)
      .select(idCol.as("doc_id"), TextOps.tokens(textCol).as("__toks"))
      .select(col("doc_id"),
        explode(TextOps.allShinglesOfTokens(col("__toks"), k)).as("__g"))
      .select(col("doc_id"), Hashing.hash60(col("__g")).as("gram_h"))
    val bg = Par.ensure(bench)
      .select(TextOps.tokens(benchTextCol).as("__toks"))
      .select(explode(TextOps.allShinglesOfTokens(col("__toks"), k)).as("__g"))
      .select(Hashing.hash60(col("__g")).as("gram_h"))
      .distinct()
    cg.join(bg, Seq("gram_h"), "left_semi").select("doc_id").distinct()
  }

  /** Graded decontamination: instead of [[decontaminate]]'s boolean "shares
    * any k-gram", score each corpus document by the FRACTION of its
    * distinct word k-grams that appear in the benchmark set — the
    * PaLM/GPT-3-style overlap metric that lets a pipeline distinguish an
    * incidental phrase collision from a verbatim test-set copy and pick
    * its own threshold.
    *
    * Same scale shape as the boolean variant: both sides reduce to 60-bit
    * portable gram hashes; per-document distinctness is `array_distinct`
    * on the shingle array BEFORE the explode (row-local — no dedup
    * shuffle), the benchmark side distincts globally (small) and
    * broadcast-joins. One left join + one aggregate on doc id; linear in
    * corpus gram count. `overlap_frac` is one exact-long division —
    * bit-reproducible unrounded. Documents with fewer than `k` tokens
    * have no grams and are absent (overlap undefined, not 0).
    * Returns (doc_id, n_grams, n_hit, overlap_frac). */
  def decontamOverlap(corpus: DataFrame, idCol: Column, textCol: Column,
                      bench: DataFrame, benchTextCol: Column, k: Int): DataFrame = {
    val cg = corpus
      .select(idCol.as("doc_id"), TextOps.tokens(textCol).as("__toks"))
      .select(col("doc_id"), explode(array_distinct(
        TextOps.shinglesOfTokens(col("__toks"), k))).as("__g"))
      .select(col("doc_id"), Hashing.hash60(col("__g")).as("gram_h"))
    val bg = bench
      .select(TextOps.tokens(benchTextCol).as("__toks"))
      .select(explode(TextOps.shinglesOfTokens(col("__toks"), k)).as("__g"))
      .select(Hashing.hash60(col("__g")).as("gram_h"))
      .distinct()
      .withColumn("__hit", lit(1L))
    cg.join(bg, Seq("gram_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_grams").cast("double"))
          .as("overlap_frac"))
  }

  def exactDedup(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(TextOps.fingerprint(text).as("fingerprint"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))

  /** (id, shingles) frame: distinct word-k-shingle sets per document. The
    * token array is materialized in its own projection so the tokenizer runs
    * once per row, not once per element_at inside the shingle lambda (the
    * two projections don't collapse — Catalyst keeps non-cheap aliases with
    * multiple references). */
  def shingleSets(df: DataFrame, id: Column, text: Column, k: Int): DataFrame =
    df.select(id.as("doc_id"), TextOps.tokens(text).as("__w"))
      .select(col("doc_id"), TextOps.shinglesOfTokens(col("__w"), k).as("shingles"))

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - inter
    // two empty sets -> 0 similarity (also keeps ANSI mode from raising
    // divide-by-zero)
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** Brute-force exact Jaccard pairs (threshold-filtered). O(n²) — the
    * verification step over LSH candidates and the oracle twin at small SF;
    * never the scale path on its own. */
  def jaccardPairsBrute(shingled: DataFrame, threshold: Double): DataFrame = {
    // BroadcastNestedLoopJoin parallelism = streamed-side partitions (see
    // SimilarityOps.bruteForceTopK); without the repartition the O(n²)
    // loop runs on one core when the input is a single parquet split
    val par = shingled.sparkSession.sparkContext.defaultParallelism
    val a = shingled.select(col("doc_id").as("doc_a"), col("shingles").as("sa"))
      .repartition(par)
    val b = shingled.select(col("doc_id").as("doc_b"), col("shingles").as("sb"))
    a.join(broadcast(b), col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jaccard(col("sa"), col("sb")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** (doc_id, hs): shingles mapped once to 60-bit hashes. Downstream minhash
    * and Jaccard verification both run on the hashed sets — md5 is evaluated
    * once per shingle for the whole pipeline, and set ops compare longs, not
    * strings. Hash-set Jaccard equals string-set Jaccard up to 60-bit
    * collisions (~n²/2^61 — negligible at any corpus size). */
  def hashedShingleSets(shingled: DataFrame): DataFrame =
    shingled.select(col("doc_id"),
      transform(col("shingles"), s => Hashing.hash60(s)).as("hs"))

  /** MinHash signature columns sig_0..sig_{h-1}: per doc, min over shingle
    * hashes of each affine permutation — one hash aggregate computing h
    * mins in a single pass (map-side partial aggregation applies).
    *
    * A zero-shuffle per-row formulation exists
    * ([[minhashSignaturesRowwise]], bit-matched in DedupSpec) and looks
    * attractive on paper, but A/B profiling with cold caches showed it
    * SLOWER end-to-end: h `transform` HOFs each allocate an |hs|-sized
    * array per row (interpreted, outside codegen), while the exploded
    * aggregate stays in codegen'd hash-agg machinery and its shuffle is
    * only h longs per doc after map-side combine. Kept as the measured
    * counter-example to "fewer shuffles is always faster" — the winner
    * depends on where the work runs, not just on shuffle count. */
  def minhashSignatures(hashedShingles: DataFrame, numHashes: Int): DataFrame = {
    val exploded = hashedShingles.select(col("doc_id"), explode(col("hs")).as("h"))
    val aggs = (0 until numHashes).map(i =>
      min(Hashing.minhashPerm(col("h"), i)).as(s"sig_$i"))
    exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Per-row HOF formulation of [[minhashSignatures]] — no shuffle, but
    * h interpreted array allocations per row; see the primary's scaladoc
    * for why the aggregate wins. Shingle-less docs are filtered to match
    * the aggregate's explode-drop semantics (null sigs would collapse
    * every empty doc into one hot LSH bucket). */
  def minhashSignaturesRowwise(hashedShingles: DataFrame, numHashes: Int): DataFrame = {
    val sigCols = (0 until numHashes).map(i =>
      array_min(transform(col("hs"), h => Hashing.minhashPerm(h, i))).as(s"sig_$i"))
    hashedShingles.filter(size(col("hs")) > 0)
      .select(col("doc_id") +: sigCols: _*)
  }

  /** MinHash+LSH near-dup pairs: band the signature (bands × rowsPerBand),
    * bucket-join on (band, band-signature), dedup candidates, then verify
    * with exact Jaccard ≥ threshold. Candidate generation is
    * explode→shuffle-on-bucket→self-join — linear in data + collisions, the
    * standard web-scale near-dup plan. Verification re-joins the two shingle
    * sets only for candidate pairs.
    *
    * Recall is 1-(1-J^r)^b per pair; defaults (32×4) give miss < 1e-14 at
    * J=0.9, <5e-8 at J=0.8. */
  def minhashLshPairs(shingled: DataFrame, threshold: Double,
                      bands: Int = 32, rowsPerBand: Int = 4,
                      release: Boolean = true): DataFrame = {
    // the hashed sets feed three plan branches (signatures + both sides of
    // the verification join); persist so shingling+md5 runs once — the
    // at-scale equivalent is materializing the signature table between
    // stages. The persist is EAGER (count action): the three branches are
    // independent shuffle-map stages of the same downstream job, and the
    // scheduler launches independent stages concurrently — with a lazy
    // persist they race to fill the cache and the shingle+md5 pipeline runs
    // up to 3× in parallel before any partition lands. One cheap count
    // serializes the materialization.
    val hashed = hashedShingleSets(shingled)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hashed.count()
    val buckets = lshBuckets(hashed, bands, rowsPerBand)
    val l = buckets.select(col("band"), col("bsig"), col("doc_id").as("doc_a"))
    val r = buckets.select(col("band"), col("bsig"), col("doc_id").as("doc_b"))
    val candidates = l.join(r, Seq("band", "bsig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sa = hashed.select(col("doc_id").as("doc_a"), col("hs").as("sa"))
    val sb = hashed.select(col("doc_id").as("doc_b"), col("hs").as("sb"))
    val verified = candidates.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard", jaccard(col("sa"), col("sb")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
    if (release) materializeReleasing(verified, hashed) else verified
  }

  /** Materialize `result` into its own storage (eager localCheckpoint — the
    * at-scale equivalent writes the stage output table) and release the
    * operator-scoped caches that back it. The checkpoint re-roots the plan,
    * so the released frames are no longer referenced by the returned frame;
    * the pair outputs this guards are orders of magnitude smaller than the
    * shingle caches they free. Without this, a composing pipeline (LSH →
    * clustering, as in d06) holds the full hashed-shingle cache across its
    * whole downstream stage — the r6 full-bench d06 ran 2.4× its isolated
    * time from exactly that pressure. Callers that want the lazy plan
    * (plan-shape tests, external cache management) pass release = false.
    *
    * The unpersist runs in `finally`: if the eager checkpoint ACTION dies
    * (executor loss, spill-disk full), the wide operator-scoped cache must
    * not stay pinned for the session — that is the exact leak this helper
    * exists to prevent, and the failure path is where session-lifetime
    * pressure hurts most (the caller's retry re-persists from scratch).
    * Shared (`private[operators]`) since r16: semDedup/semDedupSampled and
    * dsirSelect route their eager-release tails through here instead of
    * hand-rolling the same two lines without the finally. */
  private[operators] def materializeReleasing(result: DataFrame,
                                              caches: DataFrame*): DataFrame =
    try result.localCheckpoint(true)
    finally caches.foreach(_.unpersist(false))

  /** (doc_id, band, bsig) LSH bucket table from a sig_0..sig_{h-1} signature
    * frame: each doc lands in `bands` buckets keyed by the concatenation of
    * its band's `rowsPerBand` signature values. */
  private def bandBuckets(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { bnd =>
      val rows = (0 until rowsPerBand).map(r => col(s"sig_${bnd * rowsPerBand + r}"))
      struct(lit(bnd).as("band"), concat_ws("_", rows: _*).as("bsig"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bsig").as("bsig"))
  }

  /** (doc_id, band, bsig) LSH bucket table straight from hashed shingle
    * sets — the composition every signature consumer actually wants
    * ([[minhashLshPairs]], [[crossNearDupPairs]], [[corpusDedupArtifact]]
    * all go signatures → bands and never read a raw signature).
    *
    * On a graft session this is ONE per-row native scan
    * ([[graft.functions.MinHashBands]]) + posexplode: all
    * bands×rowsPerBand affine-permutation minima and the band signature
    * strings are computed in a single compiled pass over the doc's own
    * shingle hashes — no token explode, no exchange, no 128-buffer hash
    * aggregate, no 128-column concat projection. MinHash, like SimHash,
    * is per-document: the relational formulation shuffled one row per
    * shingle through the aggregate just to come back to one row per doc
    * (the [[minhashSignatures]] scaladoc's measured rejection of the HOF
    * rewrite was about INTERPRETED per-row work; the native scan is the
    * compiled version of the same idea). Falls back to the aggregate
    * formulation on vanilla sessions; bit-equivalence of the two bucket
    * tables is pinned by MinHashBandsSpec. The `size(hs) > 0` filter
    * reproduces the aggregate path's explode dropping empty/null docs. */
  def lshBuckets(hashedShingles: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    if (graft.functions.Native.has("graft_minhash_bands"))
      hashedShingles.filter(size(col("hs")) > 0)
        .select(col("doc_id"),
          posexplode(call_function("graft_minhash_bands", col("hs"),
            lit(bands), lit(rowsPerBand))).as(Seq("band", "bsig")))
    else
      bandBuckets(minhashSignatures(hashedShingles, bands * rowsPerBand),
        bands, rowsPerBand)

  /** Cross-corpus near-dup join — the incremental-ingestion dedup primitive:
    * find every (new doc, corpus doc) pair with Jaccard ≥ threshold WITHOUT
    * re-clustering the corpus. Both sides go through the same
    * shingle→minhash→band pipeline as [[minhashLshPairs]]; candidates come
    * from the cross-table (band, band-signature) equi-join, then exact
    * Jaccard over the hashed shingle sets verifies. A new doc matching
    * several corpus docs yields one row per match (callers anti-join on
    * `new_id` to admit only novel documents).
    *
    * At 100 TB the corpus-side bucket + hashed-shingle tables are the
    * persisted artifact: computed once when the corpus is built (or grown
    * incrementally from admitted shards — the same signature columns), so a
    * daily crawl shard re-hashes only ITSELF and the join cost is linear in
    * shard size + bucket collisions. The corpus never rescans. Recall per
    * pair is the [[minhashLshPairs]] 1-(1-J^r)^b bound (32×4: miss <5e-8 at
    * J=0.8), proven against the brute-force cross join at the gate. */
  def crossNearDupPairs(newShingled: DataFrame, corpusShingled: DataFrame,
                        threshold: Double, bands: Int = 32,
                        rowsPerBand: Int = 4,
                        release: Boolean = true): DataFrame = {
    // same eager-persist rationale as minhashLshPairs: each hashed side
    // feeds two sibling stages (signatures + its verification join side)
    val nh = hashedShingleSets(newShingled)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nh.count()
    val (ch, cb) = corpusDedupArtifact(corpusShingled, bands, rowsPerBand)
    val verified =
      crossNearDupPairsFromArtifact(nh, ch, cb, threshold, bands, rowsPerBand)
    if (release) materializeReleasing(verified, nh, ch) else verified
  }

  /** The corpus-side PERSISTED ARTIFACT of incremental ingestion dedup
    * (E85): (hashed shingle sets, LSH band-bucket table), computed once
    * when the corpus is built and grown incrementally from admitted
    * shards. At scale both frames are written tables; a daily crawl shard
    * re-hashes only ITSELF and joins against them
    * ([[crossNearDupPairsFromArtifact]]). The hashed side is persisted
    * eagerly here (it feeds the bucket build AND every arriving shard's
    * verification join); callers streaming many shards should keep both
    * frames materialized across triggers. */
  def corpusDedupArtifact(corpusShingled: DataFrame, bands: Int = 32,
                          rowsPerBand: Int = 4): (DataFrame, DataFrame) = {
    val ch = hashedShingleSets(corpusShingled)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ch.count()
    val cb = lshBuckets(ch, bands, rowsPerBand)
    (ch, cb)
  }

  /** [[crossNearDupPairs]] against an already-built corpus artifact — the
    * streaming/incremental form: each arriving shard (`newHashed`, the
    * shard's [[hashedShingleSets]]) computes signatures and buckets for
    * ITSELF ONLY, equi-joins the standing `corpusBuckets`, and verifies
    * candidates with exact Jaccard against `corpusHashed`. The corpus
    * never rescans; per-trigger cost is linear in shard size + bucket
    * collisions. Union over triggers ≡ one batch [[crossNearDupPairs]]
    * run (proven in StreamingSpec). */
  def crossNearDupPairsFromArtifact(newHashed: DataFrame,
                                    corpusHashed: DataFrame,
                                    corpusBuckets: DataFrame,
                                    threshold: Double, bands: Int = 32,
                                    rowsPerBand: Int = 4): DataFrame = {
    val nb = lshBuckets(newHashed, bands, rowsPerBand)
    val candidates = nb.select(col("band"), col("bsig"), col("doc_id").as("new_id"))
      .join(corpusBuckets.select(col("band"), col("bsig"),
        col("doc_id").as("corpus_id")), Seq("band", "bsig"))
      .select("new_id", "corpus_id").distinct()
    val sa = newHashed.select(col("doc_id").as("new_id"), col("hs").as("sa"))
    val sb = corpusHashed.select(col("doc_id").as("corpus_id"), col("hs").as("sb"))
    candidates.join(sa, "new_id").join(sb, "corpus_id")
      .withColumn("jaccard", jaccard(col("sa"), col("sb")))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "corpus_id", "jaccard")
  }

  /** Duplicate-cluster assignment: connected components over near-dup pairs
    * via min-label propagation with path halving — per round,
    * rep(x) := min(rep(x), min(rep(neighbors)), rep(rep(x))). The rep(rep)
    * hop doubles how far the minimum label reaches each round, so a
    * depth-d chain converges in O(log d) rounds instead of O(d).
    *
    * The hop is NOT a separate self-join: the per-round graph is the static
    * symmetric edge set augmented with the current pointer edges
    * (x ↔ rep(x)) and a self-loop (x → x), so one shuffle join + one
    * min-aggregate per round computes min(rep(x), rep(neighbors),
    * rep(rep(x)), rep(children)) all at once — the alternating-algorithm
    * shape from the MapReduce CC literature. The self-loop keeps isolated
    * docs and removes the per-round left join; the x → rep(x) direction
    * additionally lets a cluster's rep hear its children's labels, which
    * only accelerates convergence.
    *
    * Convergence is detected without a changed-rows self-join: labels are
    * monotonically non-increasing (the min always includes rep(x) via the
    * self-loop), so the exact DECIMAL(38,0) sum of reps strictly decreases
    * on any change — a 1-row aggregate doubles as the convergence check.
    *
    * Each round is materialized with an EAGER localCheckpoint, which
    * truncates the logical plan to the checkpointed blocks. This is not
    * optional: the round plan references the previous labels four times
    * (self-loops, two pointer unions, the join), so without truncation the
    * logical tree grows 4^rounds — analysis cost and plan rendering explode
    * exponentially even though execution would be cached. A superseded
    * round's checkpoint blocks are unpersisted explicitly as soon as the
    * next round materializes, so executor memory holds at most two label
    * frames regardless of round count (no reliance on the context
    * cleaner's GC timing). Returns (doc_id, rep, keep) — keep = the
    * cluster's minimum id survives.
    *
    * `ids` must cover every document (isolated docs form singleton
    * clusters); `pairs` carries (doc_a, doc_b). With `strict`, failing to
    * converge within maxIter throws instead of warning — oracle-checked
    * runs use this so a split cluster is a structured failure, not a silent
    * hash mismatch.
    *
    * ADAPTIVE: the mined pair set is first counted (the count doubles as
    * the eager cache materialization); at or below [[LocalPairThreshold]]
    * pairs the components are solved with an exact driver-side union-find
    * and broadcast back — one collect + one broadcast join instead of
    * several shuffle rounds. The distributed rounds below are the at-scale
    * path for pair sets too large to collect. Both paths produce identical
    * labels (component minimum). */
  def dedupClusters(ids: DataFrame, pairs: DataFrame, maxIter: Int = 20,
                    strict: Boolean = false,
                    localPairThreshold: Long = LocalPairThreshold): DataFrame =
    dedupClustersWithRounds(ids, pairs, maxIter, strict, localPairThreshold)._1

  /** Pair count at or below which the component structure is solved with a
    * driver-side union-find instead of distributed label-propagation rounds.
    * The near-dup EDGE set is orders of magnitude smaller than the corpus
    * (it is the mined duplicate pairs, not the documents), so even a 100 TB
    * corpus usually yields a pair set far below this; when it doesn't, the
    * distributed rounds take over. Same adaptive shape as GraphFrames'
    * connected-components small-graph optimization. 2M pairs ≈ tens of MB
    * on the driver. */
  val LocalPairThreshold: Long = 2000000L

  /** [[dedupClusters]] plus the number of distributed propagation rounds
    * executed (0 when the local union-find path was taken) — exposed so
    * tests can assert the O(log d) convergence of the distributed path by
    * forcing `localPairThreshold = 0`. */
  def dedupClustersWithRounds(ids: DataFrame, pairs: DataFrame,
                              maxIter: Int = 20,
                              strict: Boolean = false,
                              localPairThreshold: Long = LocalPairThreshold): (DataFrame, Int) = {
    val MemDisk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persist the pair set first: the symmetric edge union reads it twice,
    // and upstream pair mining (LSH) is the expensive part. The count both
    // materializes the cache EAGERLY (two union branches in one job would
    // otherwise race and compute the mining pipeline twice concurrently)
    // and sizes the graph for the local-vs-distributed decision.
    val p = pairs.persist(MemDisk)
    val nPairs = p.count()
    if (nPairs <= localPairThreshold) {
      localUnionFind(ids, p) match {
        case Some(result) =>
          p.unpersist(false)
          return (result, 0)
        case None => // unsupported id type — fall through to distributed
      }
    }
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(MemDisk)
    // eager localCheckpoint: materializes round 0 AND re-roots the plan at
    // the checkpointed blocks (see scaladoc — mandatory lineage truncation)
    var labels = ids.select(col("doc_id"), col("doc_id").as("rep"))
      .localCheckpoint(true)
    // the checkpointed blocks backing a round — unpersisted explicitly once
    // the round is superseded, so memory holds at most two label frames
    // instead of waiting on the context cleaner
    def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
        case _ => None
      }
    // exact decimal sum — long sum could silently overflow at 100 TB id
    // domains; null only for an empty ids frame
    def repSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("rep").cast("decimal(38,0)"))).first().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    // Since r14 the round loop CONTRACTS the edge set through the fresh
    // labels after every propagation round (distinct cross-label
    // (min, max) rep pairs), with two effects:
    //  - the per-round join cost SHRINKS geometrically instead of re-
    //    scanning the full edge set every round (at sf100 d12's 66.8 M
    //    verified pairs = 133 M edge rows × 15 rounds before this);
    //  - as soon as the contracted label graph + the still-compressing
    //    label pointer chains fit LocalPairThreshold, the driver
    //    union-find FINISHES the job exactly (one broadcast compose),
    //    replacing the long tail of near-converged distributed rounds —
    //    the r05 small-input escape, now reachable mid-run. The pointer
    //    pairs (label x → rep(x) ≠ x) MUST ride along: edge merging can
    //    complete while doc labels still point at stale intermediate
    //    labels, and a UF over cross-label edges alone would map those
    //    stale labels to themselves (caught by DedupSpec's chain
    //    fixtures).
    // Convergence stays "the label sum stopped moving" — the monotone
    // fixpoint test that is immune to the merging-done/compression-
    // pending gap above.
    var prevSum = repSum(labels)
    var converged = false
    var i = 0
    var edgeCache = edges // persisted backing of the current edge set
    var edgesCur = edges  // symmetric view over it
    while (!converged && i < maxIter) {
      // pointer edges regenerate each round from the checkpointed labels;
      // reps are themselves doc_ids, so every src resolves in the join below
      val ptr = labels.filter(col("doc_id") =!= col("rep"))
      val aug = edgesCur
        .union(labels.select(col("doc_id").as("src"), col("doc_id").as("dst")))
        .union(ptr.select(col("doc_id").as("src"), col("rep").as("dst")))
        .union(ptr.select(col("rep").as("src"), col("doc_id").as("dst")))
      val next = aug.join(labels, aug("src") === labels("doc_id"))
        .groupBy(col("dst").as("doc_id")).agg(min(col("rep")).as("rep"))
        .localCheckpoint(true)
      val s = repSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      val stale = backingRdd(labels)
      labels = next
      stale.foreach(_.unpersist(false))
      i += 1
      if (!converged) {
        val contracted = edgesCur
          .join(labels.select(col("doc_id").as("src"), col("rep").as("__ra")),
            Seq("src"))
          .join(labels.select(col("doc_id").as("dst"), col("rep").as("__rb")),
            Seq("dst"))
          .filter(col("__ra") =!= col("__rb"))
          .select(least(col("__ra"), col("__rb")).as("src"),
            greatest(col("__ra"), col("__rb")).as("dst"))
          .distinct()
          .persist(MemDisk)
        val ne = contracted.count()
        if (edgeCache ne edges) edgeCache.unpersist(false)
        val finished = ne <= localPairThreshold && {
          // stale-pointer pairs: labels that are themselves re-labeled.
          // Bounded by the label count; only materialized once the edge
          // graph is already small enough to attempt the escape.
          val labelSet = labels.select(col("rep").as("doc_id")).distinct()
          val ptrPairs = labels.join(labelSet, Seq("doc_id"))
            .filter(col("doc_id") =!= col("rep"))
            .select(col("doc_id").as("doc_a"), col("rep").as("doc_b"))
            .persist(MemDisk)
          val nPtr = ptrPairs.count()
          val ok = (ne + nPtr) <= localPairThreshold &&
            localUnionFind(labelSet,
              contracted.select(col("src").as("doc_a"),
                col("dst").as("doc_b")).unionByName(ptrPairs))
              .exists { lmap =>
                // every doc's label re-routes to its label's exact
                // component min; the collected mapping severs any
                // dependency on the contracted/pointer frames
                labels = labels.select(col("doc_id"), col("rep").as("__l"))
                  .join(lmap.select(col("doc_id").as("__l"),
                    col("rep").as("__fr")), Seq("__l"))
                  .select(col("doc_id"), col("__fr").as("rep"))
                true
              }
          ptrPairs.unpersist(false)
          ok
        }
        if (finished) {
          contracted.unpersist(false)
          converged = true
        } else {
          // keep iterating on the contracted label graph (symmetric view);
          // pointer edges above re-route every doc to its label's fate
          edgeCache = contracted
          edgesCur = contracted.unionByName(
            contracted.select(col("dst").as("src"), col("src").as("dst")))
        }
      }
    }
    if (edgeCache ne edges) edgeCache.unpersist(false)
    if (!converged) {
      val msg = s"[dedupClusters] not converged after $maxIter rounds " +
        "(a duplicate chain deeper than maxIter exists); clusters may be split. " +
        "Raise maxIter for deep-chain corpora."
      if (strict) throw new IllegalStateException(msg)
      System.err.println(s"WARNING: $msg")
    }
    // the final round's frame is checkpointed, so the edge caches can go —
    // the returned frame is served from the checkpoint blocks
    p.unpersist(false)
    edges.unpersist(false)
    (labels.withColumn("keep", col("doc_id") === col("rep")), i)
  }

  /** Driver-side union-find over a materialized (small) pair set: exact
    * connected components with each component labeled by its MINIMUM id —
    * identical semantics to the distributed rounds (and to the recursive-CTE
    * oracle). Only the nodes that appear in a pair are collected; everything
    * else is a singleton and never leaves the cluster (the rep mapping joins
    * back broadcast-style, isolated ids coalesce to themselves).
    *
    * Returns None when the id type has no SQL-compatible Scala ordering to
    * define "minimum" (the caller then uses the distributed min-aggregate
    * rounds, where the engine's own ordering applies). */
  private def localUnionFind(ids: DataFrame, p: DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val idType = ids.schema.fields.find(_.name == "doc_id").map(_.dataType)
      .getOrElse(return None)
    // orderings below must match SQL min() on the same type
    val supported = idType match {
      case LongType | IntegerType | ShortType | ByteType | StringType => true
      case _ => false
    }
    if (!supported) return None
    // both sides always come from the same gated column type. Strings MUST
    // compare in UTF-8 binary order (what SQL min() uses on both engines),
    // not Scala's UTF-16 code-unit order — they diverge for BMP chars in
    // U+E000..U+FFFF vs supplementary-plane chars, which would label a
    // component differently depending on which adaptive path ran.
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(x)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
      case (x: Number, y: Number) => x.longValue() < y.longValue()
      case _ => false
    }
    val rows = p.select(col("doc_a"), col("doc_b")).collect()
    val index = new java.util.HashMap[Any, Integer]()
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Any]
    def idx(v: Any): Int = {
      val existing = index.get(v)
      if (existing != null) existing.intValue()
      else { index.put(v, Integer.valueOf(nodes.length)); nodes += v; nodes.length - 1 }
    }
    val parent = scala.collection.mutable.ArrayBuffer.empty[Int]
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    rows.foreach { r =>
      val a = idx(r.get(0)); val b = idx(r.get(1))
      while (parent.length < nodes.length) parent += parent.length
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(rb) = ra
    }
    // min id per component root
    val minOf = new java.util.HashMap[Int, Any]()
    nodes.indices.foreach { i =>
      val r = find(i)
      val cur = minOf.get(r)
      if (cur == null || lt(nodes(i), cur)) minOf.put(r, nodes(i))
    }
    val spark = ids.sparkSession
    val mappingRows = nodes.indices.map { i =>
      org.apache.spark.sql.Row(nodes(i), minOf.get(find(i)))
    }
    val schema = StructType(Seq(
      StructField("__uf_id", idType), StructField("__uf_rep", idType)))
    val mapping = spark.createDataFrame(
      spark.sparkContext.parallelize(mappingRows, 1), schema)
    val out = ids.join(broadcast(mapping), col("doc_id") === col("__uf_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__uf_rep"), col("doc_id")).as("rep"))
      .withColumn("keep", col("doc_id") === col("rep"))
    Some(out)
  }

  /** 60-bit SimHash per document. 60 bits (not 64) keeps the fingerprint
    * a positive BIGINT in every engine — no signed-overflow edge at the
    * top bit. Hamming distance between simhashes tracks token-set
    * similarity.
    *
    * On a graft session this is ONE per-row native scan
    * ([[graft.functions.SimHash60]]): SimHash is a per-document function,
    * so the relational formulation below — explode tokens, hash, shuffle
    * one row per token into a 60-conditional-sum aggregate — moved the
    * entire token stream through an exchange just to come back to one
    * row per doc. The native path computes the fingerprint where the
    * text already is: no explode, no shuffle, no aggregate (the plan
    * that survives 100 TB). The aggregate formulation remains as the
    * vanilla-session fallback; bit-equivalence is pinned by
    * SimHashScanSpec, and the null-text filter reproduces explode(null)
    * dropping the row. */
  def simhash60(df: DataFrame, id: Column, text: Column): DataFrame = {
    if (graft.functions.Native.has("graft_simhash60"))
      df.filter(text.isNotNull)
        .select(id.as("doc_id"),
          call_function("graft_simhash60", text).as("simhash"))
    else simhash60Agg(df, id, text)
  }

  /** The pre-r11 explode/aggregate formulation of [[simhash60]] — the
    * bit-equivalence reference and the no-extensions fallback. */
  private[graft] def simhash60Agg(df: DataFrame, id: Column,
                                  text: Column): DataFrame = {
    val toks = df.select(id.as("doc_id"),
      explode(TextOps.tokens(text)).as("t"))
      .withColumn("h", Hashing.hash60(col("t")))
    val votes = (0 until 60).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v_$j")
    }
    val agg = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val fp = (0 until 60).map(j =>
      when(col(s"v_$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
      .reduce(_ + _)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming <= maxHamming: pigeonhole
    * chunk-bucket candidates ([[chunkBuckets]] — provably exhaustive by
    * pigeonhole), verified by bit_count(xor). Band-bucket join keeps
    * candidate generation linear — same shape as the minhash banding.
    *
    * `multiIndex` picks the band scheme (see [[chunkBuckets]] for the
    * measured tradeoff): combination bands (default — skew-robust, the
    * right plan for text/embedding fingerprints whose chunk values
    * cluster) or classic single-chunk bands (uniform fingerprints at
    * bounded corpus size, where the 5× band fan-out is pure constant
    * overhead). Both schemes produce IDENTICAL results — candidates are
    * hamming-verified either way. */
  def simhashPairs(simhashed: DataFrame, maxHamming: Int,
                   multiIndex: Boolean = true): DataFrame = {
    val l = chunkBuckets(simhashed, "doc_a", "ha", maxHamming, multiIndex)
    val r = chunkBuckets(simhashed, "doc_b", "hb", maxHamming, multiIndex)
    // hamming filter BEFORE the dedup: the verify is a per-row codegen'd
    // expression while distinct() is a shuffle — filtering first shrinks
    // the exchange from the full chunk-collision candidate mass (the
    // n²/2¹⁵ birthday term: ~10⁸ rows at 5M uniform fingerprints) to the
    // true near-dup pairs. Identical results: hamming is a pure function
    // of the pair, so filter and distinct commute.
    l.join(r, Seq("chunk", "ck"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Cross-table form of [[simhashPairs]] — the incremental-ingestion
    * shape (the E85 pattern for sign sketches): candidates are (left doc,
    * right doc) pairs sharing a 15-bit chunk, no within-side pairing, no
    * ordering filter (the sides are distinct corpora). At scale the right
    * side's bucket table is the persisted artifact; a daily shard sketches
    * only itself. Output (doc_a ∈ left, doc_b ∈ right, hamming). */
  def simhashPairsCross(left: DataFrame, right: DataFrame,
                        maxHamming: Int,
                        multiIndex: Boolean = true): DataFrame =
    chunkBuckets(left, "doc_a", "ha", maxHamming, multiIndex)
      .join(chunkBuckets(right, "doc_b", "hb", maxHamming, multiIndex),
        Seq("chunk", "ck"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming) // before the dedup shuffle —
      .distinct()                           // same commute as simhashPairs

  /** The multi-index pigeonhole banding of a (doc_id, simhash) frame —
    * the ONE place the band scheme is written: both the self-join and the
    * cross-table miners read it, so a banding change (chunk count/width,
    * combination size) cannot silently break one caller's exact-recall
    * guarantee.
    *
    * Scheme (the multi-index hashing idea from the published
    * hamming-search literature, specialized to 60 bits): split the
    * fingerprint into 6 chunks of 10 bits; a pair within hamming h has
    * errors in at most h chunks, so at least 6−h chunks match EXACTLY —
    * by pigeonhole the pair agrees on at least one (6−h)-sized chunk
    * COMBINATION. Bands are all C(6, c) combinations with c = 6−h
    * (clamped to [1, 6]), keyed by the c chunk values packed into one
    * 10c-bit long. Exhaustive for h <= 5 (at h > 5 no chunk is
    * guaranteed clean; callers stay in the verified-subset regime, as
    * they did under the old scheme for h > 3).
    *
    * Why combinations instead of the classic one-chunk-per-band split
    * (`multiIndex = false`: 4 chunks of 15 bits, exhaustive for h <= 3):
    * band-key selectivity is what bounds the verify step, and it is a
    * DISTRIBUTION question, not just n². Text/embedding sign fingerprints
    * are skewed — common-token votes bias every document toward the same
    * bit pattern, so single 15-bit chunk values cluster into hot buckets
    * whose |bucket|² candidate cost dwarfs the uniform n²·4/2¹⁵ estimate
    * (measured: the d04 pair join dominated the key at sf10, and the
    * 30-bit triple keys cut d04 11.7→7.0 s, d12 18.2→10.9 s — a product
    * of three 10-bit marginals is far more selective than one skewed
    * 15-bit marginal). UNIFORM fingerprints (md5-derived pixels/frames:
    * m03/m06/m08) sit at the opposite end: single-chunk collisions are
    * already at the n²·4/2¹⁵ floor, the combination scheme's 5× band
    * fan-out buys nothing, and its constant cost is real (measured: m03
    * 2.5→5.1 s at sf1) — those callers pass `multiIndex = false`. At
    * billion-item uniform corpora the 15-bit wall eventually bites and
    * the default flips back to multi-index; the flag is the caller's
    * statement about fingerprint distribution and corpus scale. */
  private[graft] def chunkBuckets(fp: DataFrame, idName: String,
                                  hName: String, maxHamming: Int,
                                  multiIndex: Boolean): DataFrame = {
    val (nChunks, width) = if (multiIndex) (6, 10) else (4, 15)
    val mask = (1L << width) - 1
    val c =
      if (multiIndex) math.min(nChunks, math.max(1, nChunks - maxHamming))
      else 1
    val bands = (0 until nChunks).combinations(c).zipWithIndex.map {
      case (combo, bi) =>
        val key = combo.map(ci =>
            shiftright(col("simhash"), ci * width).bitwiseAND(mask))
          .reduceLeft((acc, ck) => shiftleft(acc, width).bitwiseOR(ck))
        struct(lit(bi).as("chunk"), key.as("ck"))
    }.toSeq
    fp.select(col("doc_id"), col("simhash"),
        explode(array(bands: _*)).as("bk"))
      .select(col("doc_id").as(idName), col("simhash").as(hName),
        col("bk.chunk").as("chunk"), col("bk.ck").as("ck"))
  }

  /** Boilerplate line removal (CCNet/RefinedWeb-style): drop every "line"
    * that occurs in at least `minDocs` DISTINCT documents, keep the rest in
    * order, and report the per-document removal count. Headers, footers,
    * cookie banners — anything repeated across documents — vanish; unique
    * content survives. Documents whose lines are all boilerplate come back
    * with empty `clean_text` (never dropped); zero-token documents carry no
    * lines and are absent, same as [[CurationOps.chunkDocuments]].
    *
    * The corpus text is single-line, so "line" = a fixed `lineWords`-token
    * window (reusing chunkDocuments); with newline-structured text the
    * split column is the only thing that changes.
    *
    * Plan: explode to lines once (persisted — it feeds both the frequency
    * aggregate and the reassembly join), ONE hash aggregate on the 60-bit
    * line hash for document frequency, a left join against the boilerplate
    * hash set (8-byte keys; AQE broadcasts it when small), and one regroup
    * by document. Linear in total lines at any corpus size — the same
    * bucket-join scaling argument as the LSH pipeline, with no candidate
    * pairs at all. */
  def boilerplateStrip(df: DataFrame, idCol: Column, textCol: Column,
                       lineWords: Int = 10, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val lines = CurationOps.chunkDocuments(df, idCol, textCol, lineWords)
      .select(col("id"), col("chunk_id").as("line_id"),
        col("chunk_text").as("line_text"),
        Hashing.hash60(col("chunk_text")).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val boiler = lines.groupBy(col("__h"))
      .agg(countDistinct(col("id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__h").as("__bh"))
    lines.join(boiler, col("__h") === col("__bh"), "left")
      .groupBy(col("id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__bh").isNull,
            struct(col("line_id"), col("line_text"))))),
          x => x.getField("line_text"))).as("clean_text"),
        sum(when(col("__bh").isNotNull, 1L).otherwise(0L)).as("n_removed"))
  }

  /** Canonical-representative selection per dedup cluster: instead of
    * [[dedupClusters]]' min-id `keep`, keep the BEST member by an integer
    * score (ties to the lower id) — what a real dedup pipeline does
    * (keep the highest-quality copy, drop the rest), as a composable
    * second stage over the cluster assignment.
    *
    * `clusters` is a [[dedupClusters]] output (doc_id, rep, ...);
    * `scores` carries (idCol, scoreCol) with scoreCol an INTEGER grid
    * (the E90 convention — fp scores don't argmax reproducibly). Output:
    * (doc_id, rep, canon, keep) where canon is the cluster's argmax doc.
    *
    * Plan: one equi-join on doc_id, one `min(struct(-score, id))` hash
    * aggregate to rep-sized argmax rows (map-side combine — a mega-cluster
    * flattens in the partials, no per-cluster sort anywhere), one join
    * back on rep. */
  def canonicalPerCluster(clusters: DataFrame, scores: DataFrame,
                          idCol: Column, scoreCol: Column): DataFrame = {
    val scored = clusters.select(col("doc_id"), col("rep"))
      .join(scores.select(idCol.as("doc_id"),
        scoreCol.cast("long").as("__score")), "doc_id")
    val canon = scored.groupBy(col("rep"))
      .agg(min(struct((-col("__score")).as("n"), col("doc_id").as("id")))
        .as("__m"))
      .select(col("rep"), col("__m.id").as("canon"))
    scored.join(canon, "rep")
      .select(col("doc_id"), col("rep"), col("canon"),
        (col("doc_id") === col("canon")).cast("int").as("keep"))
  }

  /** Substring-level exact-duplication stats — the character-window variant
    * of training-data dedup (find long character spans repeated VERBATIM
    * across documents; the motivation for suffix-array dedup in the
    * published pipelines). A full distributed suffix array is overkill for
    * the decision the pipeline actually makes ("how much of this doc is
    * copied from elsewhere?"); strided fixed-width windows give the same
    * per-document duplication signal with a purely relational plan:
    *
    * every `stride` characters, take the `window`-char substring, hash it
    * to a portable 60-bit key ([[Hashing.hash60]] — the shuffle moves
    * 8-byte keys, never window strings, and the oracle replays every key),
    * and call a window POSITION duplicated when its key occurs in >= 2
    * DISTINCT documents (a span repeated only within one doc is repetition,
    * E29's business — not cross-doc duplication).
    *
    * Plan: one exchange on the window key (`repartition(key)`; the
    * (key, doc) aggregate, the per-key doc count, and the dup flag are all
    * partition-local on top of it — the pagerank-prep single-exchange
    * discipline), then one exchange on doc_id for the per-doc rollup, then
    * a left join from the id-projected corpus to re-admit docs shorter than
    * `window` with zero counts. Linear in total window count = chars/stride
    * per doc. A window string shared by B docs contributes B (key, doc)
    * rows to one key partition — bounded by the corpus's true duplication,
    * and those rows are the answer itself, not an intermediate blowup; the
    * per-(key, doc) pre-aggregate map-combines the per-doc repeats away
    * before the shuffle. The per-key doc count is a partition-local
    * `groupBy(key)` joined back on the same hash partitioning — NOT
    * `count over (partition by key)`: WindowExec buffers each key group
    * in one task's row array, so a boilerplate window shared by millions
    * of docs would buffer millions of rows in one group with no AQE skew
    * split; the hash aggregate streams (one row out per key) and the join
    * back is exchange-free on both sides.
    *
    * Offset generation is chunked (`offsetBlock` offsets per generated
    * block, outer explode over blocks, inner explode over a bounded
    * sequence): a single `sequence(0, n_offsets)` would materialize the
    * whole offset array in one row — at stride 10 a multi-hundred-MB
    * document would allocate a multi-million-element array per row, an
    * executor-OOM risk the otherwise linear plan doesn't hint at. Rows are
    * pipelined through codegen, so the bound is the per-row array, which
    * chunking caps at `offsetBlock` elements.
    *
    * Output: (doc_id, n_windows, n_dup_windows, dup_ppm) with dup_ppm the
    * exact integer floor of the duplicated-position fraction in parts per
    * million (the E87 staged-division convention — int64-exact anywhere).
    */
  def substringDupStats(docs: DataFrame, idCol: Column, textCol: Column,
                        window: Int, stride: Int,
                        offsetBlock: Int = 4096): DataFrame =
    substringDupStatsFromCounts(
      substringWindowCounts(docs, idCol, textCol, window, stride, offsetBlock),
      docs.select(idCol.as("doc_id")))

  /** Per-(window-key, doc) occurrence counts — the partial stage of
    * [[substringDupStats]], exposed because the counts are ADDITIVE: a
    * streaming monitor maintains the (key, doc_id, n_occ) state
    * incrementally (per-trigger partials merged by (key, doc)-sum in
    * foreachBatch — the E86/E87 monitor pattern) and recomputes the
    * report from state per trigger, never rescanning the corpus history;
    * proven equal to the batch operator in StreamingSpec. State size is
    * distinct (key, doc) pairs — the same frame the batch plan shuffles.
    * Output partitioning is HashPartitioning(key), which the report
    * stage's key-side operations reuse exchange-free. */
  def substringWindowCounts(docs: DataFrame, idCol: Column, textCol: Column,
                            window: Int, stride: Int,
                            offsetBlock: Int = 4096): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(stride >= 1, s"stride must be >= 1: $stride")
    require(offsetBlock >= 1, s"offsetBlock must be >= 1: $offsetBlock")
    docs
      .select(idCol.as("doc_id"), textCol.as("__t"))
      .filter(char_length(col("__t")) >= window)
      // `div` (not `/`): integer floor division — fp division would make
      // the window count a double and drift on long docs
      .withColumn("__max_i", expr(s"(char_length(__t) - $window) div $stride"))
      .select(col("doc_id"), col("__t"), col("__max_i"),
        explode(sequence(lit(0L), expr(s"__max_i div $offsetBlock")))
          .as("__blk"))
      .select(col("doc_id"),
        explode(sequence(col("__blk") * offsetBlock,
          least(col("__blk") * offsetBlock + (offsetBlock - 1),
            col("__max_i")))).as("__i"),
        col("__t"))
      .select(col("doc_id"),
        Hashing.hash60(
          col("__t").substr((col("__i") * stride + 1).cast("int"), lit(window)))
          .as("key"))
      .repartition(col("key"))
      // partition-local: HashPartitioning(key) satisfies the (key, doc)
      // aggregate's clustered distribution
      .groupBy(col("key"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
  }

  /** Cross-corpus substring contamination — the character-level
    * decontamination signal beside E82's token k-grams (and the
    * cross-corpus form of [[substringDupStats]], as E85 is to E3): per
    * corpus document, the fraction of its strided windows that appear
    * VERBATIM anywhere in a benchmark corpus. Token-gram overlap misses
    * copies that tokenize differently (punctuation, casing joins);
    * character windows don't care.
    *
    * Alignment: the corpus side strides (that's the linear-scan budget),
    * but the benchmark side is keyed at stride 1 — every character
    * offset — so a shared span is caught at ANY alignment of the copy
    * inside the corpus doc. A strided bench side would only match copies
    * that happen to land on the same stride residue (proven by the
    * misalignment fixture in DedupSpec). The benchmark is the SMALL side
    * by nature (an eval set, not a crawl), so its stride-1 key set —
    * |bench chars| 8-byte hashes, distinct — is the side a 100 TB run
    * broadcasts (AQE picks that up from size; a huge bench degrades to a
    * shuffle equi-join on 8-byte keys, never strings).
    *
    * Plan: corpus windows reuse [[substringWindowCounts]] (one exchange
    * on the key, additive partials — the streaming-monitor split works
    * here too: merge corpus partials per trigger, re-join the static
    * bench keys); distinct bench keys left-join in with a hit flag (no
    * fan-out — keys are distinct); per-doc rollup; the registry join
    * re-admits short docs with zeros. contam_ppm on the exact int64 grid
    * (the E87/E93 staged-division convention).
    *
    * Output: (doc_id, n_windows, n_contaminated, contam_ppm). A document
    * that IS in the benchmark scores 1000000 — decontamination wants
    * that (drop it), and the caller filters by id if it doesn't. */
  def crossSubstringContam(docs: DataFrame, idCol: Column, textCol: Column,
                           bench: DataFrame, benchTextCol: Column,
                           window: Int, stride: Int,
                           offsetBlock: Int = 4096): DataFrame =
    crossSubstringContamFromCounts(
      substringWindowCounts(docs, idCol, textCol, window, stride, offsetBlock),
      docs.select(idCol.as("doc_id")),
      benchKeySet(bench, benchTextCol, window, offsetBlock))

  /** Distinct stride-1 window-key set of a benchmark corpus — the STATIC
    * side of [[crossSubstringContam]], and the artifact a streaming
    * monitor computes once and re-joins every trigger. */
  def benchKeySet(bench: DataFrame, benchTextCol: Column, window: Int,
                  offsetBlock: Int = 4096): DataFrame =
    substringWindowCounts(bench, lit(0L), benchTextCol, window, stride = 1,
        offsetBlock)
      .select(col("key")).distinct()

  /** Report stage of [[crossSubstringContam]] over PRE-AGGREGATED corpus
    * (key, doc_id, n_occ) partials, the doc-id registry, and a
    * [[benchKeySet]] — the same streaming-monitor split as
    * [[substringDupStatsFromCounts]] (E93): a foreachBatch monitor merges
    * each trigger's [[substringWindowCounts]] partials into additive
    * state (sum n_occ by (key, doc_id)), union-distincts the registry,
    * and re-runs this report against the static bench keys — proven
    * batch-equal in StreamingSpec. */
  def crossSubstringContamFromCounts(docWins: DataFrame, docIds: DataFrame,
                                     benchKeys: DataFrame): DataFrame = {
    val flagged = docWins
      .join(benchKeys.withColumn("__hit", lit(1)), Seq("key"), "left")
    val stats = flagged.groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("__nw"),
        sum(when(col("__hit") === 1, col("n_occ")).otherwise(0L)).as("__nc"))
    docIds.select(col("doc_id")).join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__nw"), lit(0L)).as("n_windows"),
        coalesce(col("__nc"), lit(0L)).as("n_contaminated"),
        expr("coalesce(__nc, 0L) * 1000000 div greatest(coalesce(__nw, 0L), 1)")
          .as("contam_ppm"))
  }

  /** Source-overlap audit matrix — the dataset-level contamination /
    * provenance check a corpus audit runs before mixing sources: exact
    * pairwise shingle-set Jaccard between every pair of sources (how much
    * of source A's distinct word-k-shingle vocabulary also appears in
    * source B). Doc-level near-dup mining (E3/E85) answers "which
    * documents collide"; this answers "which SOURCES overlap, and how
    * much" — the signal that decides mixture weights and drop lists.
    *
    * Plan: one pass shingles and hashes every doc (the [[shingleSets]] /
    * 60-bit-key convention — set ops compare longs, never strings), ONE
    * exchange on the key feeds everything downstream: the (key, source)
    * distinct, the per-source vocabulary sizes, and the key-equi
    * SELF-join that counts shared keys per source pair are all
    * partition-local on HashPartitioning(key) (the E93/E96
    * single-exchange discipline; the distinct frame is checkpointed
    * eagerly because three plan branches read it). Per-key fan-out is
    * bounded by the number of sources carrying the key — pairs per key
    * ≤ S², and S (corpus sources) is small by nature; there is no
    * doc×doc term anywhere, so the plan is linear in distinct
    * (key, source) rows at any corpus size. The complete S·(S−1)/2
    * matrix is emitted (zero-overlap pairs included) by crossing the
    * source-size table with itself — S rows, broadcast both sides.
    *
    * Jaccard lands on the exact int64 ppm grid
    * (`n_ab·1e6 div (n_a + n_b − n_ab)` — the E87/E93 staged-division
    * convention; both engines floor non-negative division identically).
    * Equals string-set Jaccard up to 60-bit collisions (~n²/2^61, the
    * [[hashedShingleSets]] bound).
    *
    * Output: (src_a, src_b, n_a, n_b, n_ab, jaccard_ppm), src_a < src_b. */
  def sourceOverlap(df: DataFrame, srcCol: Column, textCol: Column,
                    k: Int): DataFrame =
    sourceOverlapFromKeys(sourceKeySet(df, srcCol, textCol, k)
      .localCheckpoint(true))

  /** Distinct (key, src) partial of [[sourceOverlap]] — the state a
    * streaming monitor maintains: per-trigger key sets union into the
    * running state with a dropDuplicates (set union is the one
    * idempotent merge — re-delivered rows are absorbed, unlike the
    * additive-count monitors E86/E87/E96), and the report recomputes
    * from state per trigger. Proven batch-equal in StreamingSpec.
    * Output partitioning is HashPartitioning(key). */
  def sourceKeySet(df: DataFrame, srcCol: Column, textCol: Column,
                   k: Int): DataFrame =
    explodedShingleKeys(df, srcCol, textCol, k, "src")
      // partition-local: HashPartitioning(key) co-locates (key, src)
      .dropDuplicates("key", "src")

  /** Report stage of [[sourceOverlap]] over a distinct (key, src) table
    * (three plan branches read it — callers materialize it first). */
  def sourceOverlapFromKeys(srcKeys: DataFrame): DataFrame = {
    val sizes = srcKeys.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val shared = srcKeys.select(col("key"), col("src").as("src_a"))
      .join(srcKeys.select(col("key"), col("src").as("src_b")), "key")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_ab"))
    val allPairs = broadcast(sizes.select(col("src").as("src_a"), col("n").as("n_a")))
      .join(broadcast(sizes.select(col("src").as("src_b"), col("n").as("n_b"))),
        col("src_a") < col("src_b"))
    allPairs.join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("n_ab"), lit(0L)).as("n_ab"),
        expr("coalesce(n_ab, 0L) * 1000000 div (n_a + n_b - coalesce(n_ab, 0L))")
          .as("jaccard_ppm"))
  }

  /** Containment (asymmetric-Jaccard) pairs — the dedup signal MinHash
    * LSH structurally misses: a short document quoted verbatim inside a
    * long one has containment |S_a∩S_b|/|S_a| = 1 but Jaccard
    * |∩|/|∪| ≈ |S_a|/|S_b| → 0, so no Jaccard threshold catches it
    * ([[minhashLshPairs]]'s banding is calibrated to Jaccard). This
    * operator finds every ORDERED pair (a, b) with containment of a's
    * shingle set inside b's ≥ `thresholdPpm` — quote/subset detection,
    * the "is this doc already inside the corpus as part of a larger
    * page" question.
    *
    * Plan: inverted index, not signatures — exact intersections come from
    * the key-equi self-join of the distinct (doc, 60-bit shingle key)
    * table, counted per pair (`groupBy(a, b).count` IS |S_a∩S_b| because
    * rows are distinct per doc). ONE exchange on the key feeds the
    * distinct, the per-key doc frequencies, the df-prune join, and the
    * pair self-join (all partition-local on HashPartitioning(key) — the
    * E93/E104 discipline). The df-prune is the scale bound: keys carried
    * by more than `maxDf` docs are dropped BEFORE pairing, capping
    * per-key fan-out at maxDf² (the standard inverted-index bound; a
    * boilerplate key shared by a million docs would otherwise emit 10¹²
    * pairs). Pruning changes the semantics deterministically — both
    * |∩| and |S_a| count ONLY keys with df ≤ maxDf (the E52 sparse-cosine
    * maxDf convention; high-df keys carry no containment signal, they
    * are corpus-wide boilerplate by definition) — and the oracle twin
    * replays the same pruned universe. Unordered intersections are
    * computed once (a < b) and fan out to the ordered rows that pass.
    *
    * Containment lands on the exact int64 ppm grid
    * (`n_common·1e6 div n_keys` — staged division, portable). Docs whose
    * every key was pruned (or with < k tokens) have no kept keys and
    * emit nothing — containment over an empty set is undefined, not 1.
    *
    * Output: (doc_a, doc_b, n_common, n_keys_a, containment_ppm) for
    * ordered pairs where doc_a's kept keys sit inside doc_b's at ≥ the
    * threshold. "Pair" means "shares at least one kept key": the inverted
    * index only ENUMERATES pairs with a non-empty pruned intersection, so
    * zero-intersection pairs are never emitted — even at
    * `thresholdPpm = 0`, where containment 0 ≥ 0 would nominally pass
    * (the DedupSpec maxDf fixture pins exactly this: pruning away the
    * only shared key leaves nothing at a zero threshold). A containment
    * of zero carries no dedup signal, so this is the contract, not a
    * gap. */
  def containmentPairs(df: DataFrame, idCol: Column, textCol: Column,
                       k: Int, thresholdPpm: Long,
                       maxDf: Long = Long.MaxValue): DataFrame =
    containmentFromKeys(docKeySet(df, idCol, textCol, k), thresholdPpm, maxDf)

  /** Density-adaptive shingle width — production knob #1 of the
    * containment-at-scale analysis (SCALING "d17 density"), as code
    * instead of advice: the exact inverted-index enumeration is
    * Σdf²/2-bound, so the width must grow until the REALIZED key space
    * out-sizes the corpus. Probes widths upward from kMin and picks the
    * first whose measured mean document frequency —
    * totalShingles(k) / approxDistinctShingles(k) — is ≤ `targetMeanDf`.
    *
    * The r12 formulation ESTIMATED the key space as vocabᵏ from one
    * vocabulary probe. That estimator assumes tokens mix freely, and a
    * sharded corpus breaks it catastrophically: when the corpus is N
    * sub-corpora with disjoint vocabularies (ScaleData's tagged copies —
    * but equally real multi-language or multi-tenant corpora), shingles
    * never cross shards, the effective key space is N·(V/N)ᵏ ≪ Vᵏ, and
    * the estimator's k left realized df ≈ 50 at sf100 — Σdf² ≈ 23 B
    * enumerated pairs, "No space left on device" (r13, measured).
    * Measuring realized df costs one linear scan per probed width
    * (early-exit: rich-vocabulary corpora stop at kMin — the common
    * production case) and is immune to ANY vocabulary structure; it also
    * accounts for the window count shrinking as k grows, which the
    * formula ignored. HLL distinct merges by per-register max, so each
    * probe — and the chosen k — is order- and partitioning-independent
    * for the same corpus. The per-probe driver action is two longs, the
    * coOccurrence-scalar discipline. */
  def autoShingleWidth(df: DataFrame, textCol: Column,
                       targetMeanDf: Double = 4.0,
                       kMin: Int = 3, kMax: Int = 8): Int = {
    require(targetMeanDf > 0, s"targetMeanDf must be > 0: $targetMeanDf")
    require(kMin >= 1 && kMax >= kMin, s"bad width range [$kMin, $kMax]")
    val toks = Par.ensure(df).select(TextOps.tokens(textCol).as("__w"))
    var k = kMin
    while (k <= kMax) {
      val r = toks
        .select(explode(TextOps.allShinglesOfTokens(col("__w"), k)).as("__s"))
        .agg(count(lit(1)).as("__total"),
          approx_count_distinct(Hashing.hash60(col("__s"))).as("__keys"))
        .head()
      val total = r.getLong(0).toDouble
      val keys = r.getLong(1).toDouble
      if (total <= 0.0) return kMin // degenerate/empty corpus
      // saturated-vocabulary short-circuit: ~1 distinct shingle at this
      // width means the corpus is one effective word — every wider window
      // is the same repeated token, so widening cannot grow the key space
      // and the remaining kMax−k probes (each a full tokenize+explode+HLL
      // scan) would buy nothing. Return kMin as the r12 formulation did.
      if (keys <= 2.0) return kMin
      if (total / math.max(keys, 1.0) <= targetMeanDf || k == kMax) return k
      k += 1
    }
    kMax
  }

  /** [[containmentPairs]] under the density-adaptive width — the form to
    * run corpus-wide at scale (the d17 bench plan since r12): the probe
    * sizes k to the corpus so the pair enumeration stays linear instead
    * of quadratic on vocabulary-saturated data. The fixed-k form remains
    * the primitive (and the oracle-gated key: a chosen-k result equals
    * `containmentPairs(k)` verbatim, pinned in DedupSpec). */
  def containmentPairsAuto(df: DataFrame, idCol: Column, textCol: Column,
                           thresholdPpm: Long,
                           maxDf: Long = Long.MaxValue,
                           targetMeanDf: Double = 4.0): DataFrame =
    containmentPairs(df, idCol, textCol,
      autoShingleWidth(df, textCol, targetMeanDf), thresholdPpm, maxDf)

  /** Distinct (key, doc_id) partial of [[containmentPairs]] — the same
    * set-union streaming state as [[sourceKeySet]] (df-pruning is NOT
    * additive — a key's document frequency grows as the corpus does, so
    * the prune must re-run in the report, over state). Output
    * partitioning is HashPartitioning(key). */
  def docKeySet(df: DataFrame, idCol: Column, textCol: Column,
                k: Int): DataFrame =
    explodedShingleKeys(df, idCol, textCol, k, "doc_id")
      .dropDuplicates("key", "doc_id")

  /** (owner, key) stream of hashed word-k-shingles, duplicates INCLUDED —
    * the exploded feeder for the distinct key-set operators. Deliberately
    * NOT [[shingleSets]]: exploding the array_distinct'd array is a
    * measured 25× per-row-cost trap — `InferFiltersFromGenerate` inlines
    * the whole generator-input expression into a scan-side filter
    * (evaluating it twice more per row), predicate pushdown slides that
    * filter below any parallelizing exchange, and `array_distinct` is the
    * dominant interpreted term (14 s vs 0.6 s over sf0.1 documents for
    * the identical downstream). The per-doc distinct here is redundant
    * anyway: every consumer immediately `dropDuplicates` on
    * (key, owner), which dedups within-doc repeats partition-locally on
    * the same exchange the plan needs regardless. [[Par.ensure]] spreads
    * the residual tokenizer/concat cost when the input arrives
    * under-split (it must wrap the SOURCE, below the inferred filter). */
  private def explodedShingleKeys(df: DataFrame, ownerCol: Column,
                                  textCol: Column, k: Int,
                                  ownerName: String): DataFrame =
    Par.ensure(df)
      .select(ownerCol.as(ownerName), TextOps.tokens(textCol).as("__w"))
      .select(col(ownerName),
        explode(TextOps.allShinglesOfTokens(col("__w"), k)).as("__s"))
      .select(col(ownerName), Hashing.hash60(col("__s")).as("key"))
      .repartition(col("key"))

  /** Report stage of [[containmentPairs]] over a distinct (key, doc_id)
    * table. */
  def containmentFromKeys(keys: DataFrame, thresholdPpm: Long,
                          maxDf: Long = Long.MaxValue): DataFrame = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000L,
      s"thresholdPpm must be in [0, 1e6]: $thresholdPpm")
    require(maxDf >= 1, s"maxDf must be >= 1: $maxDf")
    val dfk = keys.groupBy(col("key")).agg(count(lit(1)).as("__df"))
    // SERIALIZED checkpoint storage (the b55/r12 lesson): `kept` is
    // corpus-sized (one row per distinct (key, doc)), and deserialized
    // UnsafeRow blocks pin ~3× the serialized bytes — at sf100 that
    // difference (~15 GB) plus the pair-aggregation shuffle overran the
    // sandbox disk ("No space left on device", r13). Ser blocks cost one
    // deserialization per downstream read; three reads share the one
    // materialization either way.
    val kept = keys.join(dfk, Seq("key")).filter(col("__df") <= maxDf)
      .select(col("key"), col("doc_id"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("__sz"))
    val inter = kept.select(col("key"), col("doc_id").as("doc_a"))
      .join(kept.select(col("key"), col("doc_id").as("doc_b")), "key")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    val sized = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("__sz").as("__sz_a")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("__sz").as("__sz_b")),
        "doc_b")
    val fwd = sized.select(col("doc_a"), col("doc_b"), col("n_common"),
      col("__sz_a").as("n_keys_a"),
      expr("n_common * 1000000 div __sz_a").as("containment_ppm"))
    val rev = sized.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"),
      col("n_common"), col("__sz_b").as("n_keys_a"),
      expr("n_common * 1000000 div __sz_b").as("containment_ppm"))
    fwd.unionByName(rev).filter(col("containment_ppm") >= thresholdPpm)
  }

  /** Report stage of [[substringDupStats]] over a PRE-AGGREGATED
    * (key, doc_id, n_occ) table plus the doc-id registry (which re-admits
    * docs shorter than the window with zero counts — the registry is
    * additive too, a per-trigger union-distinct in the monitor). The
    * per-key doc count, dup flag, and count-join are partition-local on
    * the counts' key partitioning; only the per-doc rollup and the
    * registry join exchange. */
  def substringDupStatsFromCounts(counts: DataFrame,
                                  docIds: DataFrame): DataFrame = {
    // one row per (key, doc) going in, so count(*) IS the distinct-doc count
    val keyDocs = counts.groupBy(col("key"))
      .agg(count(lit(1)).as("__n_docs"))
    val flagged = counts.join(keyDocs, Seq("key"))
    val stats = flagged.groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("__nw"),
        sum(when(col("__n_docs") >= 2, col("n_occ")).otherwise(0L))
          .as("__nd"))
    docIds.select(col("doc_id")).join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__nw"), lit(0L)).as("n_windows"),
        coalesce(col("__nd"), lit(0L)).as("n_dup_windows"),
        expr("coalesce(__nd, 0L) * 1000000 div greatest(coalesce(__nw, 0L), 1)")
          .as("dup_ppm"))
  }

  /** Dedup-quality audit — the `s10_ann_eval` of the dedup family: MEASURED
    * recall/precision of the banded MinHash+LSH miner against brute-force
    * ground truth, computable on a USER's corpus (every banded miner ships
    * a recall CLAIM — 1-(1-J^r)^b for LSH — but without this operator the
    * claim is only provable in a spec against planted fixtures).
    *
    * The audit runs on a hash-deterministic sample (the t05
    * `stratifiedHashSample` machinery — same subset every run, replayable
    * by any engine): brute exact-Jaccard pairs on the sample are ground
    * truth, the banded miner runs on the same sample (LSH candidacy is a
    * per-PAIR property of the two signatures, so per-pair recall on the
    * sample equals per-pair recall in the full corpus), and the two pair
    * sets meet in an equi-join. `sampleRate` is the quadratic audit
    * budget: ground truth is O(sample²) BY DESIGN — at a growing corpus,
    * hold the absolute sample size constant by shrinking the rate.
    *
    * Output (one row, exact int64 ppm grid): (n_docs, n_sampled,
    * truth_pairs, banded_pairs, matched_pairs, recall_ppm,
    * precision_ppm). recall = matched/truth, precision = matched/banded;
    * an empty denominator reports the vacuous 1000000. Because the miner
    * verifies candidates with exact Jaccard, banded ⊆ truth (up to the
    * negligible 60-bit hash-collision odds) — precision < 1000000 would
    * flag a verification regression, recall < 1000000 a banding miss. */
  def dedupRecallEval(df: DataFrame, idCol: Column, textCol: Column,
                      threshold: Double, k: Int = 3,
                      sampleRate: Double = 0.5,
                      bands: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    val sample = CurationOps.stratifiedHashSample(
      df.select(idCol.as("doc_id"), textCol.as("text")),
      col("doc_id"), lit("all"), Map.empty, sampleRate)
    // the shingle sets feed the brute side twice and the LSH side once;
    // materialize so tokenize+shingle runs once (the d03 persist lesson)
    val sh = shingleSets(sample, col("doc_id"), col("text"), k)
      .localCheckpoint(true)
    val truth = jaccardPairsBrute(sh, threshold).select("doc_a", "doc_b")
      .localCheckpoint(true) // reused by the count and the match join
    val banded = minhashLshPairs(sh, threshold, bands, rowsPerBand)
      .select("doc_a", "doc_b") // already materialized (release=true)
    recallReport(df, sh, truth, banded)
  }

  /** Shared report tail of the recall evals ([[dedupRecallEval]],
    * [[simhashRecallEval]], `SimilarityOps.embeddingSketchRecallEval`):
    * one row of exact int64-ppm counts from the full corpus, the sampled
    * per-item frame, and the truth/banded pair sets (both keyed
    * (doc_a, doc_b)). Five 1-row aggregates; the crossJoins are broadcast
    * 1-row frames. n_sampled counts the CHECKPOINTED per-item frame (1:1
    * with the sample in every caller), so the sampling filter scans the
    * corpus once, not twice. */
  private[operators] def recallReport(df: DataFrame, sampled: DataFrame,
                                      truth: DataFrame,
                                      banded: DataFrame): DataFrame = {
    val matched = truth.join(banded, Seq("doc_a", "doc_b"))
    df.agg(count(lit(1)).as("n_docs"))
      .crossJoin(sampled.agg(count(lit(1)).as("n_sampled")))
      .crossJoin(truth.agg(count(lit(1)).as("truth_pairs")))
      .crossJoin(banded.agg(count(lit(1)).as("banded_pairs")))
      .crossJoin(matched.agg(count(lit(1)).as("matched_pairs")))
      .withColumn("recall_ppm",
        expr("CASE WHEN truth_pairs = 0 THEN 1000000 " +
          "ELSE matched_pairs * 1000000 div truth_pairs END"))
      .withColumn("precision_ppm",
        expr("CASE WHEN banded_pairs = 0 THEN 1000000 " +
          "ELSE matched_pairs * 1000000 div banded_pairs END"))
  }

  /** Brute all-pairs hamming twin of [[simhashPairs]] — verification/audit
    * use only (O(sample²), one bit_count per pair). Same
    * BroadcastNestedLoopJoin parallelism guard as the other brute twins:
    * the non-equi join's parallelism is the STREAMED side's partition
    * count, so spread it first. */
  def simhashPairsBrute(simhashed: DataFrame, maxHamming: Int): DataFrame = {
    val par = simhashed.sparkSession.sparkContext.defaultParallelism
    val a = simhashed.select(col("doc_id").as("doc_a"), col("simhash").as("ha"))
      .repartition(par)
    val b = simhashed.select(col("doc_id").as("doc_b"), col("simhash").as("hb"))
    a.join(broadcast(b), col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** [[dedupRecallEval]] for the SimHash miner (d04's recall claim is the
    * multi-index pigeonhole: hamming ≤ 3 pairs ALWAYS share a chunk, so the
    * banded candidate set is provably EXHAUSTIVE — measured recall below
    * 1000000 flags a chunk-extraction bug, not sampling luck; precision
    * below 1000000 flags a verification regression, since banded pairs
    * are hamming-verified). Same deterministic-sample/brute-truth/report
    * machinery as the MinHash audit: fingerprints on the hash-sample,
    * ground truth from [[simhashPairsBrute]], the banded miner
    * ([[simhashPairs]]) on the same fingerprints. The fingerprint frame
    * is 1:1 with the sample (split("") = [""], so even empty docs carry
    * one token row through the vote aggregate). */
  def simhashRecallEval(df: DataFrame, idCol: Column, textCol: Column,
                        maxHamming: Int = 3,
                        sampleRate: Double = 0.5): DataFrame = {
    val sample = CurationOps.stratifiedHashSample(
      df.select(idCol.as("doc_id"), textCol.as("text")),
      col("doc_id"), lit("all"), Map.empty, sampleRate)
    // feeds the brute side twice and the banded side once — materialize
    // so tokenize+vote runs once (the d03 persist lesson)
    val fp = simhash60(sample, col("doc_id"), col("text"))
      .localCheckpoint(true)
    val truth = simhashPairsBrute(fp, maxHamming).select("doc_a", "doc_b")
      .localCheckpoint(true) // reused by the count and the match join
    val banded = simhashPairs(fp, maxHamming).select("doc_a", "doc_b")
    recallReport(df, fp, truth, banded)
  }
}
