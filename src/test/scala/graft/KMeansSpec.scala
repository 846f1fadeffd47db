package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** kmeansFit's correctness gate: planted-cluster recovery, non-increasing
  * inertia, bounded codebook size, and — since the r11 exact-long nano-grid
  * means — bit-identical centroids regardless of input partitioning (the
  * seeded iteration chain is additionally oracle-hashed via
  * s12_kmeans_iter; only the greedy seeding remains spec-only). */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Three well-separated direction clusters on the unit sphere. */
  private lazy val planted = {
    val rnd = new scala.util.Random(23)
    val centers = Seq(
      Array.tabulate(dim)(d => if (d < 5) 1.0f else 0.0f),
      Array.tabulate(dim)(d => if (d >= 5 && d < 10) 1.0f else 0.0f),
      Array.tabulate(dim)(d => if (d >= 10) 1.0f else 0.0f))
    (0 until 120).map { i =>
      val c = i % 3
      val v = centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, c, v)
    }
  }

  private def inertia(assigned: org.apache.spark.sql.DataFrame,
                      codebook: org.apache.spark.sql.DataFrame): Double =
    assigned.join(codebook, "cell")
      .select((lit(1.0) - SimilarityOps.cosine(col("embedding"), col("anchor"))).as("d"))
      .agg(sum("d")).head().getDouble(0)

  test("recovers planted direction clusters (label-permutation invariant)") {
    val df = planted.map { case (id, _, v) => (id, v) }.toDF("vec_id", "embedding")
    val (codebook, assigned) = SimilarityOps.kmeansFit(df, nCells = 3, iters = 4, dim = dim)
    assert(codebook.count() <= 3)
    val got = assigned.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val truth = planted.map { case (id, c, _) => id -> c }.toMap
    // every true cluster must map to exactly one fitted cell (purity 100%
    // on this separation), and distinct true clusters to distinct cells
    val mapping = truth.groupBy(_._2).map { case (c, ids) =>
      c -> ids.keys.map(got).toSet
    }
    assert(mapping.values.forall(_.size == 1), s"impure clusters: $mapping")
    assert(mapping.values.flatten.toSet.size == 3, s"merged clusters: $mapping")
  }

  test("inertia is non-increasing across iterations") {
    val df = planted.map { case (id, _, v) => (id, v) }.toDF("vec_id", "embedding")
    val inertias = (1 to 4).map { it =>
      val (cb, as_) = SimilarityOps.kmeansFit(df, nCells = 3, iters = it, dim = dim)
      inertia(as_, cb)
    }
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia rose: $inertias")
    }
  }

  test("centroids are BIT-identical under different input partitionings") {
    // the r11 reproducibility contract: nano-grid long sums make the
    // per-(cell,pos) mean order-independent, so re-running the fit on the
    // same data shuffled across a different partition count must yield
    // the exact same doubles — the fp-sum formulation this replaced fails
    // this test (partition-order-dependent addition). Seed fixed via init
    // so the comparison isolates the iteration chain.
    val df = planted.map { case (id, _, v) => (id, v) }.toDF("vec_id", "embedding")
    val seed = SimilarityOps.ivfCodebook(spark, nCells = 3, dim = dim)
    def centroids(parts: Int): Array[(Int, Seq[Double])] = {
      val (cb, _) = SimilarityOps.kmeansFit(df.repartition(parts),
        nCells = 3, iters = 3, dim = dim, init = Some(seed))
      cb.select(col("cell"), col("anchor")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    }
    assert(centroids(7) === centroids(2))
  }
}
