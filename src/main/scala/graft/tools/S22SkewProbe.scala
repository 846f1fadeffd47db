package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.operators.SimilarityOps.cosine

/** Cell-size skew A/B for s22's coarse-group routing (VERDICT r16 "What's
  * wrong" #4): the r16 implementation routed points to cells through
  * fixed ±1 hash-plane group anchors — a data-blind partition of the
  * sphere that skewed cell populations vs the full (unpruned) assignment
  * and fattened the quadratic-in-cell-size pair term. r17 swaps the
  * anchors for kmeans-of-centroids (a tiny Lloyd over the fitted
  * centroids, "sdg_"-plane seeded). This probe measures what the swap
  * buys at a real decade, holding everything else fixed:
  *
  *   - the same corpus (the s22 aug twins), same production formula
  *     (targetCellSize 512, 65,536-row repartitioned fit, ⌈√k⌉ groups),
  *     same fitted cell codebook;
  *   - three assignments: FULL (every point ranks all k cells — the
  *     unpruned ideal the pruning approximates), PLANES (the r16
  *     routing), KMEANS (the r17 routing);
  *   - per assignment: non-empty cells, max/mean cell size, the pair
  *     term Σ c·(c−1)/2 (the actual driver of the within-cell quadratic
  *     stage), and its ratio to FULL's.
  *
  * Usage: runMain graft.tools.S22SkewProbe [sfDir]
  */
object S22SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata_sf1")
    val spark = graft.GraftSession.build("s22-skew-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = graft.Tables.embeddings(spark, dir)
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val twins = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x.cast("double") * lit(1.5))
            .otherwise(x.cast("double"))).as("embedding"))
    val aug = base.unionByName(twins).localCheckpoint(true)
    val n = aug.count()
    // the production formula, verbatim from semDedupSampled's s22 call
    val nCells = math.min(65536L,
      math.max(8L, math.ceil(n / 512.0).toLong)).toInt
    val g = math.max(2, math.ceil(math.sqrt(nCells.toDouble)).toInt)
    println(s"[s22-skew] dir=$dir n=$n nCells=$nCells groups=$g")

    val fit = aug
      .select(col("vec_id"), col("embedding"),
        graft.functions.Hashing.hash60(
          concat(lit("sdfit_"), col("vec_id").cast("string"))).as("__h"))
      .orderBy(col("__h"), col("vec_id")).limit(65536)
      .select("vec_id", "embedding")
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    val (icb0, _) = SimilarityOps.kmeansFit(fit, nCells, 2,
      init = Some(SimilarityOps.ivfCodebook(spark, nCells, 64)))
    val icb = icb0.localCheckpoint(true)

    val gInit = (0 until g).map { grp =>
      val anchor = Array.tabulate(64) { d =>
        if ((graft.functions.Hashing.hash60Scalar(s"sdg_${grp}_$d") & 1L) == 0L)
          1.0 else -1.0
      }
      (grp, anchor)
    }.toDF("cell", "anchor")

    // shared pruned-assignment tail (the semDedupSampled routing), over a
    // given group codebook + centroid→group map
    def prunedAssign(gcb: DataFrame, centGrp: DataFrame): DataFrame = {
      val liveGcb = gcb.join(centGrp.select("grp").distinct(), "grp")
      val ptGrp = aug.crossJoin(broadcast(liveGcb))
        .select(col("vec_id"), col("embedding"), col("grp"),
          cosine(col("embedding"), col("ganchor")).as("__gc"))
        .groupBy("vec_id")
        .agg(min(struct((-col("__gc")).as("neg"), col("grp").as("grp"))).as("m"),
          first(col("embedding")).as("embedding"))
        .select(col("vec_id"), col("embedding"), col("m.grp").as("grp"))
      ptGrp.join(broadcast(centGrp), "grp")
        .select(col("vec_id"), col("cell"),
          cosine(col("embedding"), col("anchor")).as("__ac"))
        .groupBy("vec_id")
        .agg(min(struct((-col("__ac")).as("neg"), col("cell").as("cell"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"))
    }

    def stats(assigned: DataFrame, label: String): Unit = {
      val r = assigned.groupBy("cell").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("cells"), max(col("c")).as("mx"),
          avg(col("c")).as("mean"),
          sum(col("c") * (col("c") - 1) / 2).as("pairs"))
        .head()
      println(f"[s22-skew] $label%-7s cells=${r.getLong(0)}%6d " +
        f"max=${r.getLong(1)}%8d mean=${r.getDouble(2)}%10.1f " +
        f"pairTerm=${r.getDouble(3).toLong}%,15d")
    }

    // FULL: the unpruned ideal (every point ranks all k cells)
    stats(SimilarityOps.ivfAssign(aug, icb).select("vec_id", "cell"), "FULL")

    // PLANES (r16): group anchors ARE the raw hash planes
    val gcbPlanes = gInit.select(col("cell").as("grp"),
      col("anchor").as("ganchor"))
    val centGrpPlanes = icb.crossJoin(broadcast(gcbPlanes))
      .select(col("cell"), col("anchor"), col("grp"),
        cosine(col("anchor"), col("ganchor")).as("__gc"))
      .groupBy("cell")
      .agg(min(struct((-col("__gc")).as("neg"), col("grp").as("grp"))).as("m"),
        first(col("anchor")).as("anchor"))
      .select(col("cell"), col("anchor"), col("m.grp").as("grp"))
      .localCheckpoint(true)
    stats(prunedAssign(gcbPlanes, centGrpPlanes), "PLANES")

    // KMEANS (r17): Lloyd-refined group anchors over the centroids
    val (gFit, centAssign) = SimilarityOps.kmeansFit(
      icb.select(col("cell").as("vec_id"), col("anchor").as("embedding")),
      g, 2, init = Some(gInit))
    val gcbK = gFit.select(col("cell").as("grp"), col("anchor").as("ganchor"))
    val centGrpK = centAssign
      .select(col("vec_id").as("cell"), col("embedding").as("anchor"),
        col("cell").as("grp"))
      .localCheckpoint(true)
    stats(prunedAssign(gcbK, centGrpK), "KMEANS")

    spark.stop()
  }
}
