package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1.0 testdata generator — the 100×-the-gate robustness sweep's input
  * (VERDICT r8 task 1). Scales the driver's sf0.1 tables 10× by unioning
  * ten deterministically transformed copies, preserving each table's
  * workload character:
  *
  *  - `documents`: copy k offsets doc_id by k·DocStride and rewrites the
  *    text through a BIJECTIVE vocabulary substitution (word i → word
  *    (a·i + b) mod V, an affine permutation over the corpus's own
  *    ~31-word vocabulary with (a, b) injective in k — see the unit-list
  *    note in the body). A bijection preserves shingle-set Jaccard
  *    EXACTLY within a copy — the planted near-dup/exact-dup structure
  *    replicates per copy — while texts across copies share no structure
  *    (different substitution), so the dedup workload scales linearly
  *    instead of degenerating into wholesale-copy cliques. n_chars is
  *    recomputed (word lengths change under substitution).
  *  - `embeddings`: copy k rotates the 64 dims by 13k (norms and
  *    within-copy cosines exactly preserved; cross-copy decorrelated)
  *    and offsets vec_id.
  *  - `events`: id/user offsets only — same 30-day window, 10× users,
  *    10× volume, per-user cardinality constant (how user counts
  *    actually scale).
  *  - TPC-H tables: key offsets on every FK pair consistently
  *    (order/lineitem, part, supplier, customer); `nation`/`region` are
  *    fixed dimensions and copy once.
  *
  * Usage: runMain graft.tools.ScaleData [inDir] [outDir] [factor]
  * [tablesCsv] [strideMult] (defaults /root/testdata/sf0.1 →
  * ./testdata_sf1 ×10, all tables, strideMult 1). Output is written once
  * and reused; it is NOT committed (gitignored).
  *
  * COMPOSING SCALED DIRS (sf100 = sf10 × 10): pass strideMult = the
  * factor already applied to the input (100 for sf10) so the new key
  * offsets land past the input's existing offsets, and pass tablesCsv to
  * skip tables the probe doesn't read. With strideMult > 1 the documents
  * transform switches from the affine vocab permutation to a per-copy
  * WORD-TAG bijection (word → word + "xK"): composing two affine layers
  * would pigeonhole > |units|·(v−1) ≈ 900 total substitutions into the
  * same map for some copy pairs (factor 1000 needs 1000 distinct ones)
  * and plant wholesale cross-copy exact-dup cliques. The tag map is a
  * vocabulary bijection like the affine map — within-copy shingle
  * Jaccard is preserved exactly, cross-copy shingle overlap is zero —
  * and is injective against ANY prior substitution because the base
  * vocab carries no digit suffixes. embeddings/events, if requested with
  * strideMult > 1, keep offset-only semantics (the rotation trick does
  * NOT compose injectively — scale those from the base sf0.1 instead).
  */
object ScaleData {

  val DocStride = 1000000L
  val VecStride = 1000000L
  val EventStride = 10000000L
  val UserStride = 1000000L
  val OrderStride = 10000000L
  val PartStride = 1000000L
  val SuppStride = 100000L
  val CustStride = 1000000L

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "testdata_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val tables: Set[String] =
      if (args.length > 3 && args(3).nonEmpty) args(3).split(",").toSet
      else Set("documents", "embeddings", "events", "lineitem", "orders",
        "customer", "part", "supplier", "nation", "region")
    val strideMult = if (args.length > 4) args(4).toLong else 1L
    val spark = graft.GraftSession.build("graft-scaledata")
    run(spark, inDir, outDir, factor, tables, strideMult)
    spark.stop()
  }

  /** The whole scaling pass, callable without a fresh session — main is a
    * thin arg-parsing wrapper and ScaleDataSpec drives this directly on
    * miniature dirs (the composition-injectivity regression lives there). */
  def run(spark: SparkSession, inDir: String, outDir: String, factor: Int,
          tables: Set[String], strideMult: Long): Unit = {

    def copies(df: DataFrame)(xform: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => xform(df, k)).reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit = {
      df.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaledata] $name done")
    }

    def scale(name: String)(body: => Unit): Unit =
      if (tables(name)) body else println(s"[scaledata] $name skipped")

    // documents: bijective per-copy vocab substitution. An AFFINE map
    // i -> (a·i + b) mod V (gcd(a, V) = 1) stays a bijection for any copy
    // count — plain rotations repeat after V copies, which would plant
    // wholesale exact duplicates across distant copies at factor > V.
    // With strideMult > 1 (composing an already-substituted dir) the
    // per-copy bijection is the word-tag map instead — see the scaladoc.
    scale("documents") {
      val docs = spark.read.parquet(s"$inDir/documents.parquet")
      val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "").distinct()
        .collect().map(_.getString(0)).sorted // deterministic order
      val v = vocab.length
      // (a, b) must be INJECTIVE in the copy index below |units(v)|·v copies —
      // a collision would plant wholesale exact duplicates across distant
      // copies (the first cut wrapped a through 31→30 slots and pigeonholed
      // 3 copy pairs into identical substitutions at factor 100 — caught by
      // the distinct-text count: 484,224 ≠ 100 × 4,992). Enumerate the
      // multiplicative units of v ONCE and index them cyclically: injective
      // for ANY v, prime or composite (a scan-forward-to-coprime would remap
      // two residues to the same unit when v is composite).
      val units = (1 until v).filter(a => BigInt(a).gcd(BigInt(v)) == 1).toArray
      write(copies(docs) { (df, k) =>
        if (k == 0) df
        else if (strideMult > 1L) {
          // word-tag bijection: every word of copy k gets suffix "xK".
          // Tagged words never collide with the base vocab (no digits
          // there) nor across copies, so the 10 outer maps are distinct
          // from each other AND from every inner affine map of the input.
          df.withColumn("text",
              concat_ws(" ", transform(split(col("text"), " "),
                w => when(w === "", w).otherwise(concat(w, lit("x" + k))))))
            .withColumn("doc_id", col("doc_id") + lit(k * strideMult * DocStride))
            .withColumn("n_chars", length(col("text")).cast("long"))
        } else {
          val a = units(k % units.length)
          val b = 1 + (k / units.length) % (v - 1)
          val mapping = vocab.indices.map(i => vocab(i) -> vocab((a * i + b) % v))
          val mapCol = map(mapping.flatMap { case (x, y) => Seq(lit(x), lit(y)) }: _*)
          df.withColumn("text",
              concat_ws(" ", transform(split(col("text"), " "),
                w => coalesce(element_at(mapCol, w), w))))
            .withColumn("doc_id", col("doc_id") + lit(k * DocStride))
            .withColumn("n_chars", length(col("text")).cast("long"))
        }
      }, "documents")
    }

    // embeddings: rotate dims by 13k (+ a global sign flip past one full
    // rotation cycle — cosines are invariant, cross-copy dots decorrelate),
    // offset vec_id. COMPOSITION GUARD: rotations do not compose
    // injectively — an outer 13k rotation over an already-rotated dir
    // gives identical transforms for copy pairs with equal j+k mod 64 and
    // matching sign parity, planting exact cross-copy duplicate vectors
    // under distinct vec_ids (and offset-only composition would plant
    // byte-identical vectors outright). Fail fast with the scaladoc's
    // guidance instead of silently corrupting similarity/dedup fixtures.
    scale("embeddings") {
      require(strideMult == 1L,
        "embeddings cannot be composed from an already-scaled dir " +
          "(dim rotations do not compose injectively): scale embeddings " +
          "from the base sf0.1 dir with the full factor instead, e.g. " +
          "tablesCsv=embeddings strideMult=1 factor=<total>")
      require(factor < (1 << 20),
        s"embeddings factor $factor exceeds the sign-pattern injectivity " +
          "ceiling (2^20 copies)")
      val emb = spark.read.parquet(s"$inDir/embeddings.parquet")
      write(copies(emb) { (df, k) =>
        if (k == 0) df
        else {
          val rot = (13 * k) % 64
          // Copies 1..127 keep the original rotation + global-sign scheme
          // byte-for-byte (existing sf1/sf10 fixtures and their decade
          // records stay comparable). Past 128 copies that scheme repeats
          // (64 rotations × 2 signs), so copies k >= 128 compose the
          // rotation with a per-copy Rademacher DIAGONAL whose signs are
          // the low-20 bits of k (cycled across the 64 dims): any
          // per-position sign vector preserves every norm and within-copy
          // dot EXACTLY (sum s_i² x_i y_i = sum x_i y_i), and distinct
          // k < 2^20 give distinct sign patterns — no two copies of the
          // factor-1000 sf100 table share a transform. Cross-family
          // collisions (a k >= 128 diagonal equal to a legacy global sign
          // vector) need bits 0..19 of k all equal: all-zero is impossible
          // for k >= 128, but ALL-ONE happens at exactly k = 2^20 - 1
          // (all-negative diagonal == legacy copy 127's global -1, and
          // 13·(2^20-1) ≡ 13·127 ≡ 51 mod 64 matches its rotation too).
          // The STRICT `<` in the factor require above is what excludes
          // that k (copies run 0..factor-1 ≤ 2^20-2) — relaxing it to <=
          // would silently plant duplicate vectors. Load-bearing.
          val signs = (0 until 64).map { i =>
            if (k >= 128 && ((k >> (i % 20)) & 1) == 1) -1.0
            else if (k < 128 && (k / 64) % 2 == 1) -1.0
            else 1.0
          }
          // double literals (1.0D): float × double promotes to double,
          // exactly like the legacy `* 1.0` — copies < 128 stay
          // byte-identical to every fixture built before this extension
          val sArr = signs.map(s => s"${s}D").mkString("array(", ", ", ")")
          df.withColumn("vec_id", col("vec_id") + lit(k * strideMult * VecStride))
            .withColumn("embedding",
              expr(s"transform(sequence(0, 63), i -> embedding[(i + $rot) % 64]" +
                s" * element_at($sArr, i + 1))"))
        }
      }, "embeddings")
    }

    // events: id/user offsets
    scale("events") {
      val events = spark.read.parquet(s"$inDir/events.parquet")
      write(copies(events) { (df, k) =>
        df.withColumn("event_id", col("event_id") + lit(k * strideMult * EventStride))
          .withColumn("user_id", col("user_id") + lit(k * strideMult * UserStride))
      }, "events")
    }

    // TPC-H fact/dim tables with consistent FK offsets
    scale("lineitem") {
      val lineitem = spark.read.parquet(s"$inDir/lineitem.parquet")
      write(copies(lineitem) { (df, k) =>
        df.withColumn("l_orderkey", col("l_orderkey") + lit(k * strideMult * OrderStride))
          .withColumn("l_partkey", col("l_partkey") + lit(k * strideMult * PartStride))
          .withColumn("l_suppkey", col("l_suppkey") + lit(k * strideMult * SuppStride))
      }, "lineitem")
    }
    scale("orders") {
      val orders = spark.read.parquet(s"$inDir/orders.parquet")
      write(copies(orders) { (df, k) =>
        df.withColumn("o_orderkey", col("o_orderkey") + lit(k * strideMult * OrderStride))
          .withColumn("o_custkey", col("o_custkey") + lit(k * strideMult * CustStride))
      }, "orders")
    }
    scale("customer") {
      val customer = spark.read.parquet(s"$inDir/customer.parquet")
      write(copies(customer) { (df, k) =>
        df.withColumn("c_custkey", col("c_custkey") + lit(k * strideMult * CustStride))
      }, "customer")
    }
    scale("part") {
      val part = spark.read.parquet(s"$inDir/part.parquet")
      write(copies(part) { (df, k) =>
        df.withColumn("p_partkey", col("p_partkey") + lit(k * strideMult * PartStride))
      }, "part")
    }
    scale("supplier") {
      // s_name gets a per-copy tag alongside the key offset: leaving 10-
      // 1000 byte-identical copies of every name plants cross-copy
      // same-name cliques that blow the b40 deletion-neighborhood join
      // up QUADRATICALLY in the copy count (measured r13: the untagged
      // sf100 supplier spilled >45 GB and filled the disk — a fixture
      // artifact, not an operator cost; names are unique in real data).
      // The tag preserves within-copy distance-1 structure exactly (both
      // the corrupted and original side carry it) and keeps cross-copy
      // names at distance ≥ 2 (tag substitution + the corruption's
      // deletion), so candidates scale linearly in copies.
      val supplier = spark.read.parquet(s"$inDir/supplier.parquet")
      write(copies(supplier) { (df, k) =>
        if (k == 0) df
        else df
          .withColumn("s_suppkey", col("s_suppkey") + lit(k * strideMult * SuppStride))
          .withColumn("s_name", concat(col("s_name"), lit("#c" + k)))
      }, "supplier")
    }
    // fixed dimensions
    scale("nation") { write(spark.read.parquet(s"$inDir/nation.parquet"), "nation") }
    scale("region") { write(spark.read.parquet(s"$inDir/region.parquet"), "region") }
  }
}
