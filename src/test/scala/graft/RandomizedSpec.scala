package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TemporalOps}

/** Seeded randomized differential tests: the distributed operator vs a
  * brute-force in-memory reference on adversarially-shaped random data
  * (key collisions, same-ts ties, multi-component graphs). Deterministic
  * seeds — failures reproduce. */
class RandomizedSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin matches the brute-force reference (random keys, heavy ts ties)") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val ks = Vector("a", "b", "c", "d")
      // ts drawn from a small domain so same-(key, ts) ties are common
      val left = (1 to 150).map(i =>
        (i.toLong, ks(rnd.nextInt(ks.size)), rnd.nextInt(60).toLong))
      val right = (1 to 150).map(i =>
        (1000L + i, ks(rnd.nextInt(ks.size)), rnd.nextInt(60).toLong, rnd.nextDouble()))
      val lDf = left.toDF("id", "k", "t")
        .withColumn("ts", timestamp_seconds(col("t")))
      val rDf = right.toDF("rid", "k", "t", "v")
        .withColumn("ts", timestamp_seconds(col("t")))
      val got = TemporalOps.asofJoin(lDf, rDf, Seq("k"), "ts",
          payload = Seq("rid"), tieBreak = col("rid"))
        .select("id", "asof_rid").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      val want = left.map { case (id, k, t) =>
        val cands = right.filter(r => r._2 == k && r._3 <= t)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(c => (c._3, c._1))._1)) // newest ts, max rid tie
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("minhashLshPairs matches brute-force jaccard pairs on random near-dup corpora") {
    for (seed <- Seq(3, 19)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 200).map(i => s"w$i")
      val bases = (0 until 30).map { i =>
        (i.toLong, Seq.fill(40)(vocab(rnd.nextInt(vocab.size))))
      }
      // plant near-dups: copy with 0-2 token substitutions (J >= ~0.85)
      val dups = bases.take(12).map { case (i, toks) =>
        val t = toks.toArray
        (0 until rnd.nextInt(3)).foreach { _ =>
          t(rnd.nextInt(t.length)) = vocab(rnd.nextInt(vocab.size))
        }
        (100L + i, t.toSeq)
      }
      val df = (bases ++ dups).map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val sh = DedupOps.shingleSets(df, col("doc_id"), col("text"), 3)
      def pairSet(f: org.apache.spark.sql.DataFrame) =
        f.select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = pairSet(DedupOps.jaccardPairsBrute(sh, 0.8))
      val lsh = pairSet(DedupOps.minhashLshPairs(sh, 0.8))
      assert(brute.nonEmpty, s"seed $seed produced no near-dup pairs — fixture broken")
      assert(lsh == brute, s"seed $seed")
    }
  }

  test("dedupClusters matches union-find on random graphs") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = (1 to 45)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val got = DedupOps.dedupClusters(
          (0L until n.toLong).toDF("doc_id"), edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: classic union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x
        else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val minOfRoot = (0 until n).groupBy(find).map { case (r, ms) => r -> ms.min.toLong }
      val want = (0 until n).map(i => i.toLong -> minOfRoot(find(i))).toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("sessionize matches brute-force gap splitting on random event times") {
    val gapS = 300L
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val ev = (1 to 200).map(i =>
        (s"u${rnd.nextInt(5)}", rnd.nextInt(5000).toLong))
      val got = TemporalOps.sessionize(
          ev.toDF("u", "t").withColumn("ts", timestamp_seconds(col("t"))),
          "ts", "5 minutes", Seq(col("u")), Seq(count(lit(1)).as("n")))
        .select(col("u"), unix_timestamp(col("session_window.start")).as("st"),
          unix_timestamp(col("session_window.end")).as("en"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // reference: sort per user, split where the gap reaches the timeout.
      // Duplicate timestamps within a user collapse into the same session.
      val want = ev.groupBy(_._1).flatMap { case (u, rows) =>
        val ts = rows.map(_._2).sorted
        val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
          if (t - acc.head.head >= gapS) List(t) :: acc
          else (t :: acc.head) :: acc.tail
        }
        sessions.map(s => (u, s.min, s.max + gapS, s.size.toLong))
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }
}
