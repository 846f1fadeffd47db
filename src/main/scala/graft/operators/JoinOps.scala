package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for hostile key distributions at cluster scale. AQE's
  * skew-join split handles moderate skew automatically; these are the
  * explicit tools for when one key carries an unsplittable share of the
  * data (the billion-row `lang = 'en'` stratum, the one mega-city in a
  * tourism feed) or when a join must avoid its exchange entirely.
  */
object JoinOps {

  /** Skew-salted equi-join: the left (large, skewed) side spreads each key
    * over `factor` salt shards — derived deterministically from `saltBy`,
    * NOT rand(), so retried tasks salt identically — and the right side is
    * replicated `factor` times with a matching shard column; the join runs
    * on (keys..., salt). A key that hashed to one monster partition now
    * occupies `factor` partitions at the cost of a `factor`× replication of
    * the right side — the standard trade when the right side is small-ish
    * but too big (or too join-reused) to broadcast outright.
    *
    * Results are identical to the unsalted inner/left join (verified in
    * JoinSpec); `saltBy` should be a high-cardinality left column (a row
    * id) so shards balance. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     keys: Seq[(String, String)], saltBy: Column,
                     factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, s"salt factor must be positive: $factor")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salting only preserves inner/left semantics: $joinType")
    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(factor)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    val cond = keys.map { case (lk, rk) => l(lk) === r(rk) }
      .reduce(_ && _) && (l("__salt") === r("__salt"))
    l.join(r, cond, joinType)
      .drop(r("__salt")).drop(l("__salt"))
  }

  /** Bucketized range join: pair each left row with every right interval
    * containing its value (`lo <= v <= hi`). The naive inequality join
    * plans as a broadcast-nested-loop — O(|left|·|right|) comparisons, a
    * non-starter at scale. Here both sides discretize onto buckets of
    * `bucketWidth`: each interval explodes to the buckets it covers, the
    * point keys to its one bucket, and an equi-join on the bucket does the
    * candidate generation (shuffle-partitionable, AQE-coalescible) with the
    * exact range predicate as a post-filter. Cost scales with
    * |left| + Σ(interval width / bucketWidth) + matches: pick bucketWidth
    * near the median interval width so intervals explode to O(1) buckets
    * each. Results are identical to the naive join (JoinSpec). */
  def bucketedRangeJoin(left: DataFrame, valueCol: Column,
                        right: DataFrame, loCol: Column, hiCol: Column,
                        bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val l = left.withColumn("__bucket",
      floor(valueCol / bucketWidth).cast("long"))
    val r = right.withColumn("__bucket",
      explode(sequence(floor(loCol / bucketWidth).cast("long"),
        floor(hiCol / bucketWidth).cast("long"))))
    l.join(r, l("__bucket") === r("__bucket") &&
        loCol <= valueCol && valueCol <= hiCol)
      .drop(l("__bucket")).drop(r("__bucket"))
  }

  /** Bloom-pruned join: build a compact Bloom filter over the (already
    * filtered) small side's join keys, broadcast it, and drop big-side rows
    * that cannot match BEFORE the join's exchange — the manual form of
    * Spark's runtime-filter injection, for when the planner doesn't fire it
    * (non-equi post-conditions, reused frames, disabled AQE) or when the
    * pruned frame feeds further operators. At 100 TB this is the difference
    * between shuffling the whole fact table and shuffling only the ~|dim|
    * matching slice + false positives (rate `fpp`).
    *
    * False positives survive the filter but are eliminated by the actual
    * join, so the result is IDENTICAL to the plain join — which is exactly
    * how the gate checks it (b32: SQL twin is the unpruned join). The probe
    * is a two-hash `mightContain` against a broadcast sketch; it runs as a
    * (non-codegen) UDF, justified because it replaces a full shuffle of the
    * big side and Catalyst's own BloomFilterMightContain is not public API.
    * The filter is built over `xxhash64(key)` — type-agnostic (a long CAST
    * would null out string keys and silently drop their matches), and an
    * xxhash64 collision is just one more false positive for the join to
    * discard (null keys may survive the probe — xxhash64 skips nulls — but
    * the null-rejecting join condition drops them regardless). */
  def bloomPrunedJoin(big: DataFrame, bigKey: Column,
                      small: DataFrame, smallKey: Column,
                      expectedItems: Long, fpp: Double = 0.01,
                      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi").contains(joinType),
      s"bloom pruning only preserves inner/left_semi semantics: $joinType")
    val bf = small.select(xxhash64(smallKey).as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)
    val bfB = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bfB.value.mightContainLong(k))
    big.filter(mightContain(xxhash64(bigKey)))
      .join(small, bigKey === smallKey, joinType)
  }

  /** Write `df` as a bucketed, sorted table: rows are hash-distributed into
    * `numBuckets` files per partition by `bucketCols` and sorted within each
    * bucket. Two tables bucketed the same way join with NO exchange and NO
    * sort — the scan itself satisfies the join's distribution and ordering
    * requirements. At 100 TB this converts every recurring fact-fact join
    * on the bucket key from a full shuffle into a local zip of file splits;
    * the shuffle is paid once at write time. JoinSpec asserts the
    * exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
    // explicit path -> external table (data outside the session warehouse);
    // the catalog entry itself is session-scoped
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Fuzzy (edit-distance ≤ 1) equi-style join via DELETION-NEIGHBORHOOD
    * blocking (the SymSpell scheme): each name emits its single-deletion
    * variants plus itself as block keys (≤ len+1, deduped), candidates
    * come from any shared key, and an exact `levenshtein ≤ 1` filter
    * verifies. Recall is exact for EVERY name length and alphabet: a
    * substitution pair shares the variant deleting the edited position,
    * an insertion/deletion pair shares the shorter string itself.
    * Overmatches (e.g. transposed pairs sharing two deletion variants)
    * are killed by the verify step; the brute-force join is the oracle
    * twin (blocking must be invisible).
    *
    * This REPLACED the round-1..9 prefix/suffix pigeonhole blocking after
    * the sf10 sweep caught its degenerate-block quadratic: blocking on
    * the first 4 chars puts every row of a boilerplate-prefixed corpus
    * ("Supplier#…", "Customer#…" — i.e. most generated/ID-like keys) into
    * ONE block, whose candidate volume is |L|·|R| no matter how selective
    * the suffix block is (b40 at sf10: 873 s, 69× for 10× data; the
    * rewrite measures sub-linear — see SCALING "Round 10"). Deletion
    * keys carry the FULL name minus one char, so shared boilerplate
    * stays in the key and block df is bounded by genuine near-duplicate
    * multiplicity, not prefix entropy.
    *
    * Scale: each side explodes to ~len+1 rows carrying an 8-byte hashed
    * key (hash collisions only add candidates, which verify kills); the
    * join shuffles on that key; fan-out per key is the number of names
    * one deletion apart — output-sized, not corpus-sized. Returns
    * (l_id, l_name, r_id, r_name, dist). */
  def fuzzyJoinDist1(left: DataFrame, leftId: Column, leftName: Column,
                     right: DataFrame, rightId: Column,
                     rightName: Column): DataFrame = {
    def keyed(d: DataFrame, id: Column, name: Column, idAs: String,
              nameAs: String): DataFrame =
      d.select(id.as(idAs), name.as(nameAs))
        .select(col(idAs), col(nameAs),
          explode(array_distinct(concat(
            array(col(nameAs)),
            transform(sequence(lit(1), greatest(length(col(nameAs)), lit(1))),
              i => concat(
                col(nameAs).substr(lit(1), i - lit(1)),
                col(nameAs).substr(i + lit(1), length(col(nameAs)))))))).as("__v"))
        .select(col(idAs), col(nameAs),
          graft.functions.Hashing.hash60(col("__v")).as("bk"))
    val lb = keyed(left, leftId, leftName, "l_id", "l_name")
    val rb = keyed(right, rightId, rightName, "r_id", "r_name")
    lb.join(rb, Seq("bk"))
      .select("l_id", "l_name", "r_id", "r_name").distinct()
      .withColumn("dist", levenshtein(col("l_name"), col("r_name")))
      .filter(col("dist") <= 1)
  }
}
