package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries against $SPARK_GRAFT_SF_DIR and
  * prints one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Headline = every query whose plan is the intended scale path. The
  * deliberately-O(n²) brute-force twins (d02/d05/s01) exist as verification
  * oracles for the LSH/banded variants and are benched only through those
  * variants — at bench SF and beyond, all-pairs × higher-order-function
  * cosine is not a plan we would ever ship, and timing it would measure the
  * wrong thing.
  *
  * Each query is fully materialized through the `noop` sink (count() would
  * let Catalyst prune the projections we mean to measure). AQE on: at bench
  * scale it coalesces post-shuffle partitions and re-plans skewed joins the
  * same way a real cluster run would.
  */
object Bench {

  /** Queries excluded from the bench (all-pairs verification twins). */
  private val bruteForceTwins = Set("d02_ngram_jaccard", "d05_embedding_dup", "s01_ann_topk")

  /** The driver's canonical bench sf dir (the SPARK_GRAFT_SF_DIR default).
    * bench_latest.json is THE record for this sf: a full-registry run here
    * always owns it, even if a stale different-sf record somehow landed in
    * the file (otherwise every subsequent default-sf run would route to
    * the per-sf side file forever and the canonical record would never
    * recover). */
  private[graft] val DefaultSfDir = "/root/testdata/sf0.1"

  private[graft] def sfRecordFile(dir: String): String =
    "bench_" + new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9._-]", "_") + ".json"

  private[graft] def recordSf(txt: String): Option[String] =
    """"sf":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))

  private[graft] def recordTrials(txt: String): Int =
    """"trials":(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt).getOrElse(1)

  private[graft] def recordCalib(txt: String): Option[Double] =
    """"calib":([0-9.]+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toDouble)

  private[graft] def recordTotal(txt: String): Option[Double] =
    """"value":([0-9.]+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toDouble)

  /** Machine-load marker: one fixed single-threaded CPU loop (1M md5-based
    * hash60s), timed. The workload is identical every run, so the ratio of
    * two records' calib values is the machines' relative speed that day —
    * the r11 lesson, where a loaded VM inflated every key of a same-code
    * run by a uniform 1.29x and the committed record misread as a +15%
    * regression. Stamped into every record as "calib". */
  private[graft] def calibrate(): Double = {
    def pass(n: Int): Long = {
      var i = 0; var acc = 0L
      while (i < n) {
        acc ^= graft.functions.Hashing.hash60Scalar("calib:" + i); i += 1
      }
      acc
    }
    val warm = pass(100000) // JIT warm-up, untimed
    val t0 = System.nanoTime()
    val acc = pass(1000000)
    val elapsed = (System.nanoTime() - t0) / 1e9
    if ((warm ^ acc) == 42L) System.err.println("") // defeat DCE
    elapsed
  }

  /** True when a candidate record's slowdown vs the existing same-sf
    * record is explained by machine load: the calibration loop itself ran
    * >= 20% slower AND the total got worse. Such a run must not clobber
    * the quiet-machine comparison record (it lands in bench_single.json)
    * — a slowdown on a machine whose calib is comparable IS a real
    * regression and takes the record as usual. Records predating the
    * calib field never demote (no basis for comparison). */
  private[graft] def loadInflated(existing: String, total: Double,
                                  calib: Double): Boolean =
    (recordCalib(existing), recordTotal(existing)) match {
      case (Some(c0), Some(t0)) => calib > 1.2 * c0 && total > t0
      case _ => false
    }

  /** Which file a full-registry run's record lands in, given the current
    * content of bench_latest.json (None = absent). The rules, in order
    * (BenchRecordSpec pins them):
    *  1. same-sf record: bench_latest.json iff this run has at least as
    *     many trials (the r9 overwrite hazard — a single-trial run must
    *     not clobber a 3-trial record → bench_single.json) AND the run is
    *     not load-inflated vs the existing record ([[loadInflated]] — the
    *     r11 hazard, a slow-VM day overwriting a quiet-machine number);
    *  2. different-sf record, but THIS run is at the canonical default sf:
    *     reclaim bench_latest.json (a stale non-default record must not
    *     exile the canonical sf to a side file forever — the r11 ADVICE);
    *     the caller preserves the displaced record in its per-sf side
    *     file first;
    *  3. otherwise: the per-sf side file. */
  private[graft] def recordTarget(existing: Option[String], sfDir: String,
                                  trials: Int, total: Double = 0.0,
                                  calib: Double = 0.0): String =
    if (existing.forall(recordSf(_).contains(sfDir))) {
      if (existing.forall(t => recordTrials(t) <= trials &&
          !loadInflated(t, total, calib))) "bench_latest.json"
      else "bench_single.json"
    } else if (sfDir == DefaultSfDir) "bench_latest.json"
    else sfRecordFile(sfDir)

  def main(args: Array[String]): Unit = {
    // optional args: (1) comma-separated key prefixes to bench a subset
    // while iterating (same convention as Verify; "" = all), (2) trials N
    // — run the query set N times and report per-query MEDIANS. The last
    // two rounds' apparent regressions were all sandbox timing variance
    // (up to 2x minutes apart on identical code); any perf claim in
    // SCALING should come from `sbt "runMain graft.Bench '' 3"`, not a
    // single trial. The driver passes no args: trials=1, single pass,
    // output shape unchanged.
    // sbt's batch command parser hands a '' placeholder through as the
    // LITERAL two-character token, which would silently filter out every
    // query — strip surrounding quotes before splitting
    val prefixes = args.headOption
      .map(_.trim.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\""))
      .map(_.split(',').toSeq.filter(_.nonEmpty))
      .filter(_.nonEmpty)
    val trials = if (args.length > 1) args(1).trim.toInt else 1
    require(trials >= 1, s"trials must be >= 1: $trials")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", DefaultSfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a20/a21/a23 are benched through their production percentile_approx
    // variants; the exact-percentile plans exist only as DuckDB oracle twins
    // and are exercised by Verify. NOTE the plan switch happened in r02 —
    // r01 benched the exact plans under the same keys, so r01→r02 deltas on
    // these keys measure the plan swap, not a same-plan speedup. The
    // plan_notes field in the output JSON records this for trend readers.
    // SPARK_GRAFT_BENCH_EXCLUDE: comma-separated exact keys to skip, for
    // scale sweeps where one key's cost is already adjudicated elsewhere
    // (the r9 precedent: d17's fixed-vocab fixture saturates the shingle
    // key space, so its Σdf²/2 irreducible work is quadratic in copies at
    // sf ≥ 1 — analyzed with a k=5 A/B in SCALING, excluded from decade
    // sweeps BY that analysis, not silently). The exclusion is recorded
    // in the output JSON ("excluded") — no silent caps. The driver sets
    // no env, so gate runs are unaffected.
    val excluded = sys.env.get("SPARK_GRAFT_BENCH_EXCLUDE")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val headline = (SparkEntry.queries ++ graft.entry.AQueries.benchOverrides ++
      graft.entry.DQueries.benchOverrides ++ graft.entry.OlapQueries.benchOverrides)
      .filterNot { case (k, _) => bruteForceTwins(k) || excluded(k) }
      .filter { case (k, _) => prefixes.forall(_.exists(k.startsWith)) }
    // warm the JVM against the BENCH sf dir before timing (guarded — a
    // failed warm-up must not kill the whole run). Three representative
    // plans cover the codegen, WindowExec, and streaming-state paths: on
    // a cold VM the first minute of a fresh JVM runs semi-interpreted
    // (C2 compile backlog + cold page cache) and was measured inflating
    // early window-heavy queries up to 8x; one query was not enough.
    val warmKeys = (headline.toSeq.sortBy(_._1).map(_._1).take(1) ++
      Seq("a33_moving_avg", "a05_watermark_stream")).distinct
    warmKeys.foreach { k =>
      try headline.get(k).foreach { fn =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $k failed: ${e.getMessage}")
      }
    }
    // the media corpora the m03/m05/m06 overrides read materialize once
    // per testdata dir — build them here so a cold cache is paid OUTSIDE
    // the timed region (guarded: a failed build leaves those three keys
    // to fail individually, not the run). Skipped when no m-key is in
    // the headline set: a prefix-subset probe of non-media keys (the
    // sf100 decade probes) must not pay a corpus-sized render it never
    // reads.
    // selective: only the corpora the headline set actually reads
    // (m03/m05 → BMP, m06 → WAV). A subset run without m06 must not pay —
    // or re-occupy the disk of — the ~GB-scale WAV render (at sf100 the
    // WAV corpus is 19 GB, the same order as b55's shuffle-spill headroom).
    val needsBmp = Seq("m03", "m05").exists(p => headline.keys.exists(_.startsWith(p)))
    val needsWav = headline.keys.exists(_.startsWith("m06"))
    // SPARK_GRAFT_BENCH_WAV_WINDOWED=1: do NOT hold the WAV corpus on disk
    // for the whole run — render it immediately before m06 (untimed) and
    // delete it immediately after. At sf100 the WAV cache is ~19 GB and
    // b55's pair-stage spill ~37 GB; on this sandbox's ~52 GB free they
    // cannot co-reside, which is exactly why m06 was excluded from the
    // r14-r16 sf100 records. Windowing the corpus to the one key that
    // reads it removes the co-residency instead of the key. The driver
    // sets no env, so gate/default runs keep the prebuilt-cache behavior.
    val wavWindowed = sys.env.get("SPARK_GRAFT_BENCH_WAV_WINDOWED").contains("1")
    if (needsBmp || (needsWav && !wavWindowed))
      try {
        if (needsBmp) graft.sources.MediaFixtures.bmpCorpus(spark, sfDir)
        if (needsWav && !wavWindowed) graft.sources.MediaFixtures.wavCorpus(spark, sfDir)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] media fixture build failed: ${e.getMessage}")
      }
    spark.catalog.clearCache()
    // load marker, AFTER warm-up (stable JIT) and before the timed trials
    val calib = calibrate()
    def runOnce(): Seq[(String, Double, Boolean)] =
      headline.toSeq.sortBy(_._1).map { case (name, fn) =>
        // windowed WAV lifetime: render right before m06's timer starts
        // (outside the timed region, like the upfront build it replaces)
        if (wavWindowed && name.startsWith("m06"))
          try graft.sources.MediaFixtures.wavCorpus(spark, sfDir)
          catch { case e: Throwable =>
            System.err.println(s"[bench] windowed WAV build failed: ${e.getMessage}")
          }
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // drop per-query persists so one query's cache doesn't pressure the
        // next, and collect the garbage NOW so allocation debt from this
        // query's explodes/caches isn't paid inside the next query's timed
        // window; both are outside the timed window. clearCache only covers
        // Dataset-level caches — localCheckpoint blocks (d06/d12 cluster
        // labels, b46 ranks, the released LSH pair outputs) are plain
        // persistent RDDs and would otherwise linger until the context
        // cleaner notices, pressuring every later query's heap.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        // after a heavy key, give the async ContextCleaner a moment to
        // actually DELETE the key's shuffle files (System.gc() only queues
        // them): at sf100 seven >60 s keys' leftover spills accumulated
        // past this sandbox's free disk and killed the 8th with "No space
        // left on device" — each key fit alone. Untimed, and the
        // threshold keeps full sf0.1 registry runs (most keys < 3 s)
        // overhead-free.
        if (elapsed > 30.0) Thread.sleep(3000)
        // windowed WAV lifetime: delete the corpus the moment its one
        // reader is timed, so the ~19 GB never co-resides with a later
        // key's shuffle spill (untimed, mirrors the untimed render above)
        if (wavWindowed && name.startsWith("m06"))
          graft.entry.QueryHelpers.deleteRecursively(new java.io.File(
            graft.sources.MediaFixtures.cachePath(sfDir, "wav", 4)))
        (name, elapsed, ok)
      }
    val runs = (1 to trials).map(_ => runOnce())
    // per-query median over the trials that succeeded; a query with zero
    // successful trials is a failure. For trials=1 this reduces to the
    // single pass exactly.
    val medianed = runs.head.map(_._1).map { name =>
      val times = runs.flatMap(_.collectFirst {
        case (`name`, t, true) => t
      }).sorted
      if (times.isEmpty) (name, 0.0, false)
      else (name, times(times.size / 2), true)
    }
    // Single-trial outlier re-probe: three consecutive rounds of driver
    // benches produced phantom 2.5-6x "regressions" that were pure sandbox
    // timing variance (GC/codegen pauses minutes apart on identical code —
    // b46 36 s vs a 6 s median in r8). A single-trial run therefore
    // re-probes any query whose time exceeds 2.5x its last recorded
    // full-run time at the same sf dir (bench_latest.json), up to 2
    // re-runs, reporting the MIN of all observations and tagging the key —
    // variance is one-sided (a pause only ever inflates), so min is the
    // honest estimator here, unlike the multi-trial mode where the median
    // guards both tails. The +1 s ABSOLUTE-delta floor keeps noise-band
    // churn out: a blip must both exceed 2.5x its prior and cost more
    // than a second of real wall time before a re-probe is worth two
    // extra executions.
    // per-sf record file for non-default sf dirs, so scale sweeps never
    // clobber the driver's sf0.1 record (and get their own priors);
    // record parsing/routing helpers live on the object (BenchRecordSpec)
    def readRecord(path: String): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8"))
      catch { case _: Throwable => None }
    val priors: Map[String, Double] =
      if (trials > 1) Map.empty
      else {
        // prefer the same-sf record wherever it lives: bench_latest.json
        // for the default sf, the per-sf side file for scale sweeps
        val txtOpt = readRecord("bench_latest.json")
          .filter(recordSf(_).contains(sfDir))
          .orElse(readRecord(sfRecordFile(sfDir))
            .filter(recordSf(_).contains(sfDir)))
        txtOpt.map { txt =>
          val qStart = txt.indexOf("\"queries\":{")
          if (qStart < 0) Map.empty[String, Double]
          else {
            val body = txt.substring(qStart + 11, txt.indexOf('}', qStart))
            """"([A-Za-z0-9_]+)":([0-9.]+)""".r.findAllMatchIn(body)
              .map(m => m.group(1) -> m.group(2).toDouble).toMap
          }
        }.getOrElse(Map.empty)
      }
    val reprobed = scala.collection.mutable.ListBuffer.empty[String]
    val results = medianed.map {
      case (name, t, true) if priors.get(name).exists(p =>
          t > 2.5 * p && t - p > 1.0) =>
        val fn = headline(name)
        val rebests = (1 to 2).flatMap { _ =>
          val t0 = System.nanoTime()
          val ok = try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
          } catch { case _: Throwable => false }
          val elapsed = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          System.gc()
          // same post-key ContextCleaner drain as runOnce: re-probes fire
          // precisely on slow keys, so the sf100 spill-accumulation hazard
          // the runOnce sleep fixes applies here too
          if (elapsed > 30.0) Thread.sleep(3000)
          if (ok) Some(elapsed) else None
        }
        reprobed += name
        (name, (t +: rebests).min, true)
      case other => other
    }
    // Locale.ROOT formatting: the f interpolator is default-locale-dependent
    // and a comma-decimal locale would emit invalid JSON
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.collect { case (k, v, true) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val failures = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // plan provenance for trend readers: these keys changed plans between
    // rounds, so round-over-round deltas on them measure the swap
    val planNotes = """{"a20_percentiles":"percentile_approx since r02 (r01: exact)",""" +
      """"a21_percentile_rejoin":"percentile_approx since r02 (r01: exact)",""" +
      """"a23_season_score":"percentile_approx since r02 (r01: exact)",""" +
      """"d06_dedup_clusters":"adaptive local union-find under 2M pairs + eager shared-frame materialization since r05 (r03-r04: single-join augmented-edge CC rounds, r02: 3-join path halving, r01: 1-hop propagation)",""" +
      """"d03_minhash_lsh":"eager persist materialization since r05 (lazy persist raced across sibling stages, computing the shared lineage 2-3x); a row-wise signature plan was A/B-profiled and rejected (slower than the aggregate, see SCALING)",""" +
      """"t06_quality_topq":"percentile_approx threshold plan (oracle: exact per-stratum rank); benched since r03",""" +
      """"a40_winsorize":"percentile_approx threshold plan (oracle: exact rank-defined quantiles); benched since r05",""" +
      """"b46_pagerank":"4 distributed rounds; since r07 checkpointInterval=1 (per-round materialization; an interleaved A/B showed round-fusing lengthens the checkpoint job's codegen+AQE chain by more than the saved job launches - re-confirmed at sf10 in r14) - cost is fixed prep+codegen overhead, not graph size. Since r14 all persisted state (edge/node caches + rank checkpoints) is SERIALIZED storage: interleaved A/B measured ser <= deser at every decade (sf100: 233/242 -> 219/222 s)",""" +
      """"d17_containment":"density-adaptive shingle width (containmentPairsAuto) since r12; since r13 the width is chosen by REALIZED-df probing (one scan per candidate k) instead of the vocab^k estimate, which undersized k on sharded vocabularies - r12-vs-r13 deltas on this key measure the prober swap. The oracle key stays fixed k=3 (quadratic on the saturated fixture, excluded from scale sweeps r09-r11)",""" +
      """"b40_fuzzy_match":"since r13 the scaled decades tag supplier names per copy - the untagged sf1/sf10 fixtures planted same-name cliques that made blocking candidates quadratic in copies, so pre-r13 b40 decade numbers measured that artifact (SCALING r13)",""" +
      """"m03_image_dedup":"materialized-corpus input since r12 (r09-r11: inline fixture render inside the timed region)",""" +
      """"m05_image_resize":"materialized-corpus input since r12 (r10-r11: inline fixture render inside the timed region)",""" +
      """"m06_audio_dedup":"materialized-corpus input since r12 (r09-r11: inline fixture render inside the timed region)",""" +
      """"b56_pit_lookup":"pointInTimeHashed (shuffled-hash equi-join, interval as residual - no facts-union-versions sort) since r17; the as-of sort-merge plan benched r12-r17 sf0.1/1/10 records. Interleaved PitAb: hashed wins every decade (sf100 49.0 vs 69.4 s median), candidates = facts x versions-per-key (~10 here); pointInTime stays the high-churn answer"}"""
    val reprobedJson = reprobed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val excludedJson = excluded.toSeq.sorted.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    // subset marker: a prefix-filtered run is NOT a full-registry record
    // and must say so in-band (the sf100 decade probes bench only the
    // scale-shaped keys — a reader comparing totals across sf records
    // needs to see the registry slice in the record itself)
    val subsetJson = prefixes
      .map(_.map("\"" + _ + "\"").mkString(""","subset":[""", ",", "]"))
      .getOrElse("")
    val json = s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"failures":$failures,"trials":$trials,"calib":${num(calib)},"reprobed":$reprobedJson,"excluded":$excludedJson$subsetJson,"plan_notes":$planNotes,"sf":"$sfDir"}"""
    println(json)
    // the driver keeps only the last 2000 chars of stdout, which truncates
    // the per-query map; persist the complete line so per-query numbers
    // survive the round without a re-run (full-registry runs only — a
    // prefix-subset iteration must not overwrite the round's record).
    // OVERWRITE GUARD (r9 hazard: the driver's post-commit single-trial
    // run clobbered the committed 3-trial record, degrading next round's
    // reprobe priors): bench_latest.json is only replaced by a run at the
    // SAME sf with AT LEAST as many trials; a lower-trials same-sf run
    // lands in bench_single.json, and a different-sf run lands in its own
    // per-sf record (bench_<dirname>.json) — which the priors read above
    // already consults, so scale sweeps keep their reprobe protection.
    var writtenRecord = "" // where this run's record actually landed
    if (prefixes.isEmpty) {
      val existing = readRecord("bench_latest.json")
      var target = recordTarget(existing, sfDir, trials, total, calib)
      if (target == "bench_latest.json")
        // reclaim path (rule 2): a displaced different-sf record moves to
        // its per-sf side file instead of being silently lost — it may be
        // the only full-registry record and reprobe prior for that sf
        existing.filterNot(recordSf(_).contains(sfDir)).foreach { old =>
          recordSf(old).foreach { oldSf =>
            try java.nio.file.Files.writeString(
              java.nio.file.Paths.get(sfRecordFile(oldSf)), old)
            catch { case e: Throwable =>
              System.err.println(
                s"[bench] displaced-record preserve failed: ${e.getMessage}")
            }
          }
        }
      else if (target == sfRecordFile(sfDir))
        // per-sf side files get the same load guard as bench_latest: a
        // slow-day sweep must not clobber a quiet-machine sweep record
        readRecord(target).filter(t => recordSf(t).contains(sfDir) &&
            loadInflated(t, total, calib))
          .foreach { _ => target = "bench_single.json" }
      try {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(target), json + "\n")
        writtenRecord = target
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $target write failed: ${e.getMessage}")
      }
      if (target != "bench_latest.json")
        System.err.println(s"[bench] record written to $target " +
          "(bench_latest.json preserved: " +
          existing.map(t => s"sf=${recordSf(t).getOrElse("?")} " +
            s"trials=${recordTrials(t)}").getOrElse("absent") + ")")
    } else {
      // subset runs never touch the full-registry records; an explicit
      // GRAFT_BENCH_SUBSET_RECORD=<file> opts in to persisting the probe
      // (used for the sf100 decade probes, whose registry slice is the
      // whole point). Guard: never clobber a full-registry record — a
      // file without a "subset" field belongs to a full run.
      sys.env.get("GRAFT_BENCH_SUBSET_RECORD").foreach { file =>
        val existing = readRecord(file)
        if (existing.exists(!_.contains("\"subset\":")))
          System.err.println(s"[bench] $file holds a full-registry record; " +
            "refusing to overwrite with a subset probe")
        else
          try {
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(file), json + "\n")
            writtenRecord = file
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $file write failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
    // driver-parseable summary, printed LAST: the driver keeps only the
    // tail of stdout and parses the final JSON-looking line — the full
    // record above overflows that window at 184 keys (r11/r12 both
    // recorded "parsed": null), so emit a compact line whose per-query
    // map holds the slowest keys up to a fixed char budget and says how
    // many were elided (full map lives in the record file named here).
    val slowest = results.collect { case (k, v, true) => (k, v) }
      .sortBy(-_._2)
    val budget = 1200
    // fill with a true slowest-PREFIX: stop at the first fragment that
    // doesn't fit, so no slower key is ever elided while a faster one is
    // included (otherwise "slowest keys up to the budget" would mislead)
    val kept = scala.collection.mutable.ListBuffer.empty[String]
    var used = 0
    var full = false
    slowest.foreach { case (k, v) =>
      val frag = "\"" + k + "\":" + num(v)
      if (!full) {
        if (used + frag.length + 1 <= budget) { kept += frag; used += frag.length + 1 }
        else full = true
      }
    }
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":${kept.mkString("{", ",", "}")},"queries_elided":${slowest.size - kept.size},"n_queries":${slowest.size},"failures":$failures,"trials":$trials,"calib":${num(calib)}$subsetJson,"record":"$writtenRecord","sf":"$sfDir"}""")
  }
}
