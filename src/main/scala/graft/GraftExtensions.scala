package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.{ArgMaxCos, ArgMaxCosGrouped, CharEntropyStats, DotFold, EmbeddingSimhash60, Hash60, KllMergeAgg, KllQuantiles, KllSketchAgg, LocaleClean, MinHashBands, PqCodes, SimHash60, TextScanStats, TokenDiversity}

/** Engine extensions, installed with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` on every
  * session builder (GraftSession, Verify, Bench, SparkSpec) — the public
  * `SparkSessionExtensions` route, so no catalyst-internal registry access.
  *
  * Registers the native expressions (call sites use
  * `functions.call_function("graft_dot", a, b)`) and the optimizer rule
  * that canonicalizes hand-written HOF dot folds into the native form.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** The codebook arguments of the argmax/PQ scans are driver-known
    * constants by contract — fold them at expression-construction time so
    * the expression holds plain Java arrays (codegen references them as
    * objects; no per-row literal traversal). */
  private def foldedArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, what: String): ArrayData = {
    require(e.foldable, s"$fn: $what must be a foldable array literal")
    val v = e.eval(null)
    require(v != null, s"$fn: $what must not be null")
    v.asInstanceOf[ArrayData]
  }

  private def foldInts(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, what: String): Array[Int] =
    foldedArray(e, fn, what).toIntArray()

  private def foldMatrix(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, what: String): Array[Array[Double]] = {
    val ad = foldedArray(e, fn, what)
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.DotFoldRewrite)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotFold].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_dot expects 2 arguments, got ${children.size}")
        DotFold(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_stats"),
      new ExpressionInfo(classOf[CharEntropyStats].getName, "graft_char_stats"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, s"graft_char_stats expects 1 argument, got ${children.size}")
        CharEntropyStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_text_scan"),
      new ExpressionInfo(classOf[TextScanStats].getName, "graft_text_scan"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, s"graft_text_scan expects 1 argument, got ${children.size}")
        TextScanStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, s"graft_simhash60 expects 1 argument, got ${children.size}")
        SimHash60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_diversity"),
      new ExpressionInfo(classOf[TokenDiversity].getName, "graft_token_diversity"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, s"graft_token_diversity expects 1 argument, got ${children.size}")
        TokenDiversity(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3,
          s"graft_minhash_bands expects 3 arguments (hs, bands, rowsPerBand), got ${children.size}")
        def lit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_bands: $what must be an integer literal, got $other")
        }
        MinHashBands(children.head, lit(children(1), "bands"),
          lit(children(2), "rowsPerBand"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_embedding_simhash"),
      new ExpressionInfo(classOf[EmbeddingSimhash60].getName, "graft_embedding_simhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          s"graft_embedding_simhash expects 2 arguments (emb, dim), got ${children.size}")
        val dim = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_embedding_simhash: dim must be an integer literal, got $other")
        }
        EmbeddingSimhash60(children.head, dim)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_locale_clean"),
      new ExpressionInfo(classOf[LocaleClean].getName, "graft_locale_clean"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, s"graft_locale_clean expects 1 argument, got ${children.size}")
        LocaleClean(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_kll_agg expects (value, k), got ${children.size} args")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kll_agg: k must be an integer literal, got $other")
        }
        KllSketchAgg(children.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_merge"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "graft_kll_merge"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1 || children.size == 2,
          s"graft_kll_merge expects (sketch[, k]), got ${children.size} args")
        val k = if (children.size == 2) children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kll_merge: k must be an integer literal, got $other")
        } else graft.functions.KllQuantiles.DefaultK
        KllMergeAgg(children.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantiles].getName, "graft_kll_quantiles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_kll_quantiles expects (sketch, quantiles), got ${children.size} args")
        KllQuantiles(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_argmax_cos"),
      new ExpressionInfo(classOf[ArgMaxCos].getName, "graft_argmax_cos"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3,
          s"graft_argmax_cos expects (emb, cells, anchors), got ${children.size} args")
        ArgMaxCos(children.head,
          foldInts(children(1), "graft_argmax_cos", "cells"),
          foldMatrix(children(2), "graft_argmax_cos", "anchors"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_argmax_cos_grouped"),
      new ExpressionInfo(classOf[ArgMaxCosGrouped].getName, "graft_argmax_cos_grouped"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 5,
          s"graft_argmax_cos_grouped expects (emb, grp, cells, anchors, groups), got ${children.size} args")
        ArgMaxCosGrouped(children.head, children(1),
          foldInts(children(2), "graft_argmax_cos_grouped", "cells"),
          foldMatrix(children(3), "graft_argmax_cos_grouped", "anchors"),
          foldInts(children(4), "graft_argmax_cos_grouped", "groups"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_codes"),
      new ExpressionInfo(classOf[PqCodes].getName, "graft_pq_codes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 4,
          s"graft_pq_codes expects (emb, subOffsets, codes, anchors), got ${children.size} args")
        val anchors = foldMatrix(children(3), "graft_pq_codes", "anchors")
        PqCodes(children.head,
          foldInts(children(1), "graft_pq_codes", "subOffsets"),
          foldInts(children(2), "graft_pq_codes", "codes"),
          anchors, anchors.map(ArgMaxCos.selfDot))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "graft_hash60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, s"graft_hash60 expects 1 argument, got ${children.size}")
        Hash60(children.head)
      }))
  }
}
