package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinOps

/** Scale-join strategies: salted equi-join result parity and shard spread;
  * bucketed tables joining with no exchange in the physical plan. */
class JoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = (0L until 2000L)
    .map(i => (i, if (i < 1800) "HOT" else s"k${i % 50}", i.toDouble))
    .toDF("row_id", "key", "v")
  private lazy val dim = (Seq("HOT") ++ (0 until 50).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"payload_$i") }
    .toDF("dkey", "payload")

  test("saltedEquiJoin: identical rows to the unsalted join, inner and left") {
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, skewed("key") === dim("dkey"), jt)
        .select("row_id", "payload").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      val salted = JoinOps.saltedEquiJoin(skewed, dim, Seq("key" -> "dkey"),
          saltBy = col("row_id"), factor = 8, joinType = jt)
        .select("row_id", "payload").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(salted === plain, s"join type $jt")
    }
  }

  test("saltedEquiJoin: the hot key spreads over multiple salt shards") {
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
    val shards = l.filter(col("key") === "HOT")
      .select("__salt").distinct().count()
    assert(shards >= 6, s"1800 hot rows must land on most of 8 shards, got $shards")
  }

  test("bloomPrunedJoin: identical rows to the plain join, and actually prunes") {
    val big = (0L until 5000L).map(i => (i, i % 500, s"v$i")).toDF("row_id", "fk", "pay")
    val small = (0L until 500L).filter(_ % 25 == 0).map(k => (k, s"d$k")).toDF("pk", "dp")
    val plain = big.join(small, col("fk") === col("pk"))
      .select("row_id", "dp").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val pruned = JoinOps.bloomPrunedJoin(big, col("fk"), small, col("pk"),
        expectedItems = 100, fpp = 0.01)
      .select("row_id", "dp").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned === plain)
    // the pre-join filter must reject (almost) all non-matching fk values:
    // 20 of 500 fks match; with fpp=0.01 the surviving count is far below big
    val bf = small.select(col("pk").cast("long").as("__k"))
      .stat.bloomFilter("__k", 100, 0.01)
    val survivors = big.collect().count(r => bf.mightContainLong(r.getLong(1)))
    assert(survivors < 1000, s"bloom should prune most of 5000 rows, kept $survivors")
    // null keys: dropped by both plans
    val withNull = big.withColumn("fk",
      when(col("row_id") === 0, lit(null)).otherwise(col("fk")))
    val p2 = JoinOps.bloomPrunedJoin(withNull, col("fk"), small, col("pk"),
      expectedItems = 100, fpp = 0.01).count()
    val p3 = withNull.join(small, col("fk") === col("pk")).count()
    assert(p2 == p3)
    // string keys: the probe hashes, never casts — a long CAST would null
    // out every key and silently drop all matches
    val bigS = big.withColumn("fk", concat(lit("k"), col("fk")))
    val smallS = small.withColumn("pk", concat(lit("k"), col("pk")))
    val plainS = bigS.join(smallS, col("fk") === col("pk")).count()
    val prunedS = JoinOps.bloomPrunedJoin(bigS, col("fk"), smallS, col("pk"),
      expectedItems = 100, fpp = 0.01).count()
    assert(plainS > 0 && prunedS == plainS)
  }

  test("bucketedRangeJoin matches the naive inequality join on random intervals") {
    for (seed <- Seq(2, 9)) {
      val rnd = new scala.util.Random(seed)
      val points = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 100))
        .toDF("pid", "v")
      val ranges = (1 to 80).map { i =>
        val lo = rnd.nextDouble() * 95
        (1000L + i, lo, lo + rnd.nextDouble() * 10) // width 0-10
      }.toDF("rid", "lo", "hi")
      val naive = points.join(ranges, col("lo") <= col("v") && col("v") <= col("hi"))
        .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bucketed = graft.operators.JoinOps.bucketedRangeJoin(
          points, col("v"), ranges, col("lo"), col("hi"), bucketWidth = 5.0)
        .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketed === naive, s"seed $seed")
    }
  }

  test("bucketed tables join with no exchange in the plan") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (0L until 1000L).map(i => (i % 100, i.toDouble))
        .toDF("city_id", "spend")
      val dims = (0L until 100L).map(i => (i, s"city_$i")).toDF("city_id", "name")
      JoinOps.writeBucketed(facts, "graft_test_facts", Seq("city_id"), 4)
      JoinOps.writeBucketed(dims, "graft_test_dims", Seq("city_id"), 4)
      val joined = spark.table("graft_test_facts")
        .join(spark.table("graft_test_dims"), "city_id")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join must not shuffle:\n$physical")
      assert(joined.count() === 1000L)
      // parity with the shuffle plan
      val expected = facts.join(dims, "city_id").agg(sum("spend")).first().getDouble(0)
      assert(joined.agg(sum("spend")).first().getDouble(0) === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_facts")
      spark.sql("DROP TABLE IF EXISTS graft_test_dims")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("fuzzyJoinDist1: finds deletion/substitution variants, blocking invisible vs brute force") {
    val right = Seq((1L, "johnson avenue"), (2L, "johnsen avenue"),
      (3L, "completely different"), (4L, "johnson avenues")).toDF("id", "name")
    val left = Seq((10L, "johnson avenue"),   // exact (dist 0 to 1, 1 to 2/4)
      (11L, "johnson avenu"),                  // deletion variant
      (12L, "johnson boulevard")               // too far from everything
    ).toDF("id", "name")
    val blocked = JoinOps.fuzzyJoinDist1(left, col("id"), col("name"),
        right, col("id"), col("name"))
      .select("l_id", "r_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = left.select(col("id").as("l_id"), col("name").as("l_name"))
      .crossJoin(right.select(col("id").as("r_id"), col("name").as("r_name")))
      .withColumn("dist", levenshtein(col("l_name"), col("r_name")))
      .filter(col("dist") <= 1)
      .select("l_id", "r_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked === brute)
    assert(blocked.contains((10L, 1L, 0)) && blocked.contains((11L, 1L, 1)))
    assert(!blocked.exists(_._1 == 12L))
  }

  test("fuzzyJoinDist1: boilerplate-prefixed keys stay exact and block-bounded") {
    // the b40-at-sf10 regression shape: every name shares a long constant
    // prefix, so any fixed-window prefix block degenerates to all-pairs.
    // Deletion-neighborhood keys carry the whole name minus one char —
    // recall stays brute-exact and the candidate volume output-sized.
    val right = (1L to 60L).map(i => (i, f"Supplier#$i%09d")).toDF("id", "name")
    val left = (1L to 60L).map { i =>
      val name = f"Supplier#$i%09d"
      val pos = (i % name.length).toInt
      (100L + i, name.take(pos) + name.drop(pos + 1)) // one deletion
    }.toDF("id", "name")
    val blocked = JoinOps.fuzzyJoinDist1(left, col("id"), col("name"),
        right, col("id"), col("name"))
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = left.select(col("id").as("l_id"), col("name").as("l_name"))
      .crossJoin(right.select(col("id").as("r_id"), col("name").as("r_name")))
      .filter(levenshtein(col("l_name"), col("r_name")) <= 1)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === brute)
    // every corrupted name finds its own original
    (1L to 60L).foreach(i => assert(blocked.contains((100L + i, i)), s"missed $i"))
  }
}
