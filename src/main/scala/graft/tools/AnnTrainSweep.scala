package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Trained-ANN scale sweep: kmeansFit and pqTrain on the real embeddings
  * table at sf ≥ 1 — both iterate with per-round localCheckpoint but had
  * only ever run on spec fixtures. Records per-iteration wall time
  * (cumulative-difference over iters = 1..N re-runs — the operators own
  * their loops, so the marginal cost of round i is t(i) − t(i−1)),
  * non-increasing k-means inertia at scale, PQ reconstruction MSE, and
  * the input-caching A/B: every iteration re-reads the corpus frame, so
  * an un-pinned parquet source pays a scan per round (the d06 lineage
  * lesson, caller-side this time — the operator cannot know whether its
  * input is worth pinning).
  *
  * Usage: runMain graft.tools.AnnTrainSweep <sfDir> [nCells] [kmIters] [pqIters]
  */
object AnnTrainSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata_sf1")
    val nCells = if (args.length > 1) args(1).toInt else 64
    val kmIters = if (args.length > 2) args(2).toInt else 4
    val pqIters = if (args.length > 3) args(3).toInt else 3
    val spark = graft.GraftSession.build("graft-ann-train-sweep")
    spark.sparkContext.setLogLevel("WARN")
    // normalize to the operators' float element contract (the driver's
    // tables are list<float>; ScaleData's regenerated decades came out
    // list<double> — the trained paths' typed seeding encoders are
    // float-locked, everything else casts per-expression)
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("float")).as("embedding"))
    val pinned = raw.localCheckpoint(true)
    val n = pinned.count()
    println(s"""[sweep] {"sf":"$sfDir","vectors":$n,"nCells":$nCells}""")

    def inertia(assigned: DataFrame, codebook: DataFrame): Double =
      assigned.join(codebook, "cell")
        .select((lit(1.0) - SimilarityOps.cosine(col("embedding"), col("anchor"))).as("d"))
        .agg(sum("d")).head().getDouble(0)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // caching A/B at the full iteration count: raw parquet source vs
    // pinned corpus (identical results — farthestInit and every
    // assignment are deterministic)
    val (_, tCold) = timed(SimilarityOps.kmeansFit(raw, nCells, kmIters))
    val (_, tWarm) = timed(SimilarityOps.kmeansFit(pinned, nCells, kmIters))
    println(f"""[sweep] {"op":"kmeansFit","iters":$kmIters,"cold_src_sec":$tCold%.2f,"pinned_src_sec":$tWarm%.2f}""")

    // per-iteration marginals + inertia trajectory (pinned input)
    var prevT = 0.0
    val inertias = (1 to kmIters).map { it =>
      val ((cb, assigned), t) = timed(SimilarityOps.kmeansFit(pinned, nCells, it))
      val in = inertia(assigned, cb)
      println(f"""[sweep] {"op":"kmeansFit","iters":$it,"total_sec":$t%.2f,"marginal_sec":${t - prevT}%.2f,"inertia":$in%.4f}""")
      prevT = t
      in
    }
    val monotone = inertias.sliding(2).forall {
      case Seq(a, b) => b <= a + 1e-6
      case _         => true
    }
    println(s"""[sweep] {"op":"kmeansFit","inertia_non_increasing":$monotone}""")

    // pqTrain: per-iteration marginals + reconstruction MSE vs the
    // untrained hash codebook baseline
    val (m, dim) = (8, 64)
    val subDim = dim / m
    def reconMse(cb: DataFrame): Double =
      SimilarityOps.pqEncode(pinned, cb, m, dim)
        .join(pinned, "vec_id")
        .join(broadcast(cb), Seq("sub", "code"))
        .select(aggregate(
          zip_with(
            slice(col("embedding"), col("sub") * subDim + 1, lit(subDim)),
            col("anchor"),
            (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0), (acc, v) => acc + v).as("d2"))
        .agg(sum("d2") / (n * dim)).head().getDouble(0)
    val hashMse = reconMse(SimilarityOps.pqCodebook(spark, m, 16, dim))
    println(f"""[sweep] {"op":"pqTrain","iters":0,"recon_mse":$hashMse%.5f,"note":"untrained hash codebook baseline"}""")
    prevT = 0.0
    (1 to pqIters).foreach { it =>
      val (cb, t) = timed(SimilarityOps.pqTrain(pinned, m, 16, it, dim))
      val mse = reconMse(cb)
      println(f"""[sweep] {"op":"pqTrain","iters":$it,"total_sec":$t%.2f,"marginal_sec":${t - prevT}%.2f,"recon_mse":$mse%.5f}""")
      prevT = t
    }
    spark.stop()
  }
}
