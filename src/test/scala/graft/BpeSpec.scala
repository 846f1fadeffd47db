package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Tokenizer/LM operators (SURVEY §2E E99/E101): the distributed BPE
  * trainer must match a driver-side reference of the Sennrich algorithm
  * (pair counts weighted by word freq, argmax with lexicographic
  * tie-break, greedy left-to-right fusion); the bigram-LM scorer must
  * match a driver-side add-k reference on exact micro-quantized sums. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val Eow = "\u0003"

  /** Reference BPE trainer over a word-frequency map. */
  private def refBpe(words: Map[String, Long], n: Int,
                     minFreq: Long): Seq[(Int, String, String, Long)] = {
    var tbl: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector :+ Eow, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= n && !done) {
      val counts = tbl.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => p -> f)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty || counts.values.max < minFreq) done = true
      else {
        val ((l, rr), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r, l, rr, cnt))
        def fuse(syms: Vector[String]): Vector[String] = {
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
              b += (l + rr); i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
        }
        tbl = tbl.map { case (syms, f) => (fuse(syms), f) }
        r += 1
      }
    }
    out.toSeq
  }

  private def wordFreqs(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)

  private def train(texts: Seq[String], n: Int, minFreq: Long = 2L,
                    parts: Int = 4): Seq[(Int, String, String, Long)] =
    TextOps.trainBpeMerges(texts.toDF("text").repartition(parts),
        col("text"), numMerges = n, minPairFreq = minFreq)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("trainBpeMerges matches the driver-side Sennrich reference") {
    val texts = Seq(
      "low low low lower lower lowest",
      "newer newer newest new new new low",
      "wider wide wide wider widest")
    val got = train(texts, n = 10)
    val want = refBpe(wordFreqs(texts), 10, 2L)
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("greedy left-to-right fusion: runs collapse pairwise, not overlapping") {
    // 'aaaa' under merge (a,a): greedy gives [aa, aa], never [aa, a, a]
    // with a stranded overlap — round 2 must therefore see (aa, aa)
    val texts = Seq("aaaa aaaa aaaa")
    val got = train(texts, n = 3, minFreq = 1L)
    val want = refBpe(wordFreqs(texts), 3, 1L)
    assert(got === want)
    // r1 (a,a) collapses 'aaaa' to [aa, aa, eow] — pairwise, no stranded
    // overlap. r2 ties (aa,aa) with (aa,eow) at 3 and the control-char
    // eow wins lexicographically; r3's (aa, aa+eow) therefore only
    // exists if the r1 collapse was pairwise.
    assert(got === Seq(
      (1, "a", "a", 9L), (2, "aa", Eow, 3L), (3, "aa", "aa" + Eow, 3L)))
  }

  test("training stops when no pair reaches minPairFreq") {
    val got = train(Seq("ab cd ef"), n = 10, minFreq = 2L)
    assert(got === refBpe(wordFreqs(Seq("ab cd ef")), 10, 2L))
    assert(got.isEmpty) // every pair occurs once
  }

  test("trainBpeMerges is partitioning-invariant") {
    val texts = Seq("low lower lowest", "low low newer newest", "wide wider")
    assert(train(texts, n = 6, parts = 1) === train(texts, n = 6, parts = 7))
  }

  test("applyBpeMerges: tokens rebuild every word and respect the merges") {
    val texts = Seq("low lower lowest newer", "low low newest wide")
    val merges = train(texts, n = 6, minFreq = 2L).map(m => (m._2, m._3))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = TextOps.applyBpeMerges(docs, col("doc_id"), col("text"), merges)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getSeq[String](3).toVector))
    // every word comes back, and its tokens concatenate to word + EOW
    val byDoc = rows.groupBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val words = t.trim.split("\\s+").toSeq
      val got = byDoc(i.toLong).sortBy(_._2)
      assert(got.map(_._3).toSeq === words)
      got.foreach { case (_, _, w, toks) =>
        assert(toks.mkString === w + Eow, s"word $w tokens $toks")
      }
    }
    // at least one multi-char token exists (merges actually applied)
    assert(rows.exists(_._4.exists(_.length > 1)))
  }

  test("bpeVocab: chars then merges, contiguous ids, binary char order") {
    val texts = Seq("low low low lower lowest")
    val df = texts.toDF("text")
    val mergesDf = TextOps.trainBpeMerges(df, col("text"), numMerges = 4,
      minPairFreq = 2L)
    val merges = mergesDf.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val got = TextOps.bpeVocab(df, col("text"), mergesDf)
      .orderBy("token_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val chars = texts.flatMap(_.replaceAll("\\s", "").map(_.toString))
      .distinct.sorted :+ Eow
    val base = chars.sorted.zipWithIndex.map { case (c, i) => (i.toLong, c) }
    val want = base ++ merges.zipWithIndex.map { case ((l, r), i) =>
      (base.size.toLong + i, l + r)
    }
    assert(got.toSeq === want)
    assert(got.map(_._1).toSeq === got.indices.map(_.toLong)) // contiguous
  }

  test("bigramLmScore matches a driver-side add-one reference") {
    val trainTexts = Seq("the cat sat", "the cat ran", "the dog sat")
    val docTexts = Seq((0L, "the cat sat"), (1L, "the dog ran"), (2L, "cat"),
      (3L, "zz unseen words"))
    // reference model
    val toks = trainTexts.map(_.split("\\s+").toSeq)
    val uni = toks.flatten.groupMapReduce(identity)(_ => 1L)(_ + _)
    val bi = toks.flatMap(t => t.zip(t.tail))
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val v = uni.size
    def lp(p: String, w: String): Long =
      math.round(math.log((bi.getOrElse((p, w), 0L) + 1.0) /
        (uni.getOrElse(p, 0L) + 1.0 * v)) * 1e6)
    val want = docTexts.map { case (id, t) =>
      val ts = t.split("\\s+").toSeq
      val lps = ts.zip(ts.tail).map { case (p, w) => lp(p, w) }
      val n = lps.size.toLong
      (id, n, lps.sum,
        if (n == 0) None else Some(math.floor(lps.sum.toDouble / n).toLong))
    }
    val got = TextOps.bigramLmScore(trainTexts.toDF("text"), col("text"),
        docTexts.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq === want)
    // single-token doc: zero bigrams, null mean
    assert(got(2) === ((2L, 0L, 0L, None)))
    // fluent text scores higher than unseen-word text
    assert(got(0)._4.get > got(3)._4.get)
  }
}
