package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Materialized demo-media corpora — the ScaleData treatment for the
  * deterministic BMP/WAV fixtures.
  *
  * The media dedup/resize keys (m03/m05/m06/m08) exercise REAL byte-level
  * decode + signature + mining, but their input corpora are synthesized
  * from the documents frame (md5-derived pixels/samples). Rendering that
  * fixture inside every benched run measures fixture arithmetic, not the
  * operator — at sf10 the WAV render alone was the #2 key of the whole
  * sweep. A production corpus arrives as STORED payloads; this object
  * makes the bench input match that shape: each corpus renders once per
  * (testdata dir, kind, groupSize, render version) into a local parquet
  * cache and every later run reads the stored bytes.
  *
  * The cache lives outside the testdata dir (which is read-only) under
  * `$SPARK_GRAFT_MEDIA_CACHE` (default `media_cache/`, gitignored).
  * Rebuild triggers: the cache key embeds [[Version]] — bump it whenever
  * [[Multimodal.demoBmpCorpus]]/[[Multimodal.demoWavCorpus]] rendering
  * changes so a stale cache can never serve old bytes — and a directory
  * without `_SUCCESS` (interrupted write) re-renders. Payload parity with
  * the inline render is pinned in EtlSpec; the oracle gate keys keep
  * rendering inline, so correctness never depends on this cache.
  */
object MediaFixtures {

  /** Render-algorithm version — part of the cache key. */
  private[graft] val Version = 1

  private[graft] def cacheRoot: String =
    sys.props.getOrElse("spark.graft.mediaCache",
      sys.env.getOrElse("SPARK_GRAFT_MEDIA_CACHE", "media_cache"))

  private[graft] def cachePath(sfDir: String, kind: String,
                               groupSize: Int): String = {
    val tag = new java.io.File(sfDir).getName
      .replaceAll("[^A-Za-z0-9._-]", "_")
    s"$cacheRoot/${tag}_${kind}_g${groupSize}_v$Version.parquet"
  }

  private def cached(spark: SparkSession, sfDir: String, kind: String,
                     groupSize: Int)(render: => DataFrame): DataFrame = {
    val path = cachePath(sfDir, kind, groupSize)
    if (!new java.io.File(path, "_SUCCESS").isFile)
      render.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** The m03/m05/m08 image corpus, served from the cache. */
  def bmpCorpus(spark: SparkSession, sfDir: String,
                groupSize: Int = 4): DataFrame =
    cached(spark, sfDir, "bmp", groupSize)(
      Multimodal.demoBmpCorpus(graft.Tables.documents(spark, sfDir),
        col("doc_id"), groupSize))

  /** The m06 audio corpus, served from the cache. */
  def wavCorpus(spark: SparkSession, sfDir: String,
                groupSize: Int = 4): DataFrame =
    cached(spark, sfDir, "wav", groupSize)(
      Multimodal.demoWavCorpus(graft.Tables.documents(spark, sfDir),
        col("doc_id"), groupSize))

  /** Pre-build every corpus the bench keys read, so first-run cache
    * construction happens OUTSIDE the timed region (Bench calls this
    * during warm-up). */
  def ensureAll(spark: SparkSession, sfDir: String): Unit = {
    bmpCorpus(spark, sfDir) // cache build (if needed) runs eagerly here
    wavCorpus(spark, sfDir)
    ()
  }
}
