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

  test("containmentPairs matches a driver-side set reference on random corpora") {
    for (seed <- Seq(7, 31)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 60).map(i => s"w$i")
      // random docs, some of which embed another doc's token run verbatim
      val docs = (0 until 25).map { i =>
        (i.toLong, Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))))
      }
      val quotes = docs.take(6).map { case (i, toks) =>
        val pad = Seq.fill(rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        (100L + i, pad ++ toks ++ pad.reverse)
      }
      val all = docs ++ quotes
      val df = all.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val k = 3; val maxDf = 8L; val thr = 700000L
      // reference: pruned-universe containment from first principles
      val sets = all.map { case (id, t) =>
        id -> t.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSet
      }.toMap
      val dfCount = sets.values.flatten.groupBy(identity).map {
        case (s, occ) => s -> occ.size }
      val kept = sets.map { case (id, s) =>
        id -> s.filter(g => dfCount(g) <= maxDf) }
      val want = (for {
        (a, sa) <- kept.toSeq; (b, sb) <- kept.toSeq
        if a != b && sa.nonEmpty
        inter = (sa & sb).size.toLong
        ppm = inter * 1000000L / sa.size
        if ppm >= thr
      } yield (a, b, inter, sa.size.toLong, ppm)).toSet
      val got = DedupOps.containmentPairs(df, col("doc_id"), col("text"),
          k, thr, maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(want.nonEmpty, s"seed $seed planted no containment — fixture broken")
      assert(got === want, s"seed $seed")
    }
  }

  test("exactSplit matches a driver-side rank reference on random strata incl. nulls") {
    import graft.operators.CurationOps
    for (seed <- Seq(11, 47)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 300L).map { i =>
        val src = rnd.nextInt(5) match {
          case 0 => null
          case s => s"s$s"
        }
        (i, src)
      }
      val df = rows.toDF("doc_id", "src").repartition(7)
      val got = CurationOps.exactSplit(df, col("doc_id"), col("src"),
          weights = Seq("train" -> 700000L, "val" -> 150000L,
            "test" -> 150000L), buckets = 64)
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
      // reference: per stratum (null is its own group), rank by
      // (hash60, id), exact floor boundaries
      val ref = rows.groupBy(_._2).flatMap { case (_, g) =>
        val ordered = g.map(_._1).sortBy(id =>
          (graft.functions.Hashing.hash60Scalar(s"xsplit_$id"), id))
        val n = ordered.size.toLong
        val b1 = n * 700000L / 1000000L
        val b2 = n * 850000L / 1000000L
        ordered.zipWithIndex.map { case (id, rk) =>
          id -> (if (rk < b1) "train" else if (rk < b2) "val" else "test") }
      }
      assert(got.size === 300, s"seed $seed: null-stratum rows were dropped")
      assert(got === ref, s"seed $seed")
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

  test("mergeChangelog matches a sequential seq-ordered apply (random upserts/deletes, key churn)") {
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val base = (0L until 40L).map(k => (k, Some(s"b$k"), Some(k.toDouble)))
      // keys drawn from 0..59: overlaps base, inserts new, churns repeatedly
      val ch = (1 to 200).map { seq =>
        val k = rnd.nextInt(60).toLong
        val op = if (rnd.nextInt(4) == 0) "D" else "U"
        (k, seq.toLong, op, Some(s"v$seq"), Some(seq.toDouble))
      }
      val got = graft.operators.CdcOps.mergeChangelog(
          base.toDF("k", "name", "bal"),
          ch.toDF("k", "seq", "op", "name", "bal"), "k", "seq", "op")
        .as[(Long, Option[String], Option[Double])].collect().toSet
      // reference: fold the changelog in seq order over a key -> row map
      val want = ch.sortBy(_._2).foldLeft(
        base.map(r => r._1 -> (r._2, r._3)).toMap) { (snap, c) =>
        if (c._3 == "D") snap - c._1 else snap + (c._1 -> (c._4, c._5))
      }.map { case (k, (n, b)) => (k, n, b) }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("diffSnapshots round-trips through mergeChangelog on random snapshot pairs") {
    for (seed <- Seq(9, 27)) {
      val rnd = new scala.util.Random(seed)
      def snap() = (0L until 60L).flatMap { k =>
        if (rnd.nextInt(4) == 0) None // key absent from this version
        else Some((k,
          if (rnd.nextInt(10) == 0) Option.empty[String] else Some(s"n${rnd.nextInt(5)}"),
          if (rnd.nextInt(10) == 0) Option.empty[Double] else Some(rnd.nextInt(9).toDouble)))
      }
      val older = snap().toDF("k", "name", "bal")
      val newer = snap().toDF("k", "name", "bal")
      val diff = graft.operators.CdcOps.diffSnapshots(older, newer, "k")
      val rebuilt = graft.operators.CdcOps
        .mergeChangelog(older, diff, "k", "seq", "op")
        .as[(Long, Option[String], Option[Double])].collect().toSet
      val want = newer.as[(Long, Option[String], Option[Double])].collect().toSet
      assert(rebuilt === want, s"seed $seed")
    }
  }

  test("suppressUnchanged matches a per-key sequential scan (random ties and repeats)") {
    for (seed <- Seq(11, 31)) {
      val rnd = new scala.util.Random(seed)
      val ev = (1 to 300).map { i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong,
          Vector("on", "off", "idle")(rnd.nextInt(3)))
      } // (id, key, t, value) — small t domain forces same-ts ties
      val df = ev.toDF("event_id", "user_id", "t", "st")
        .withColumn("ts", timestamp_seconds(col("t")))
      val got = TemporalOps.suppressUnchanged(df, Seq("user_id"), "ts",
          col("event_id"), col("st"))
        .select("event_id").as[Long].collect().toSet
      val want = ev.groupBy(_._2).values.flatMap { rows =>
        val ordered = rows.sortBy(r => (r._3, r._1)) // (ts, tie-break) order
        ordered.zip(None +: ordered.map(r => Some(r._4)))
          .collect { case (r, prev) if !prev.contains(r._4) => r._1 }
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("boilerplateStrip matches a brute-force line-frequency reference") {
    for (seed <- Seq(2, 17)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 30).map(i => s"w$i")
      val shared = Seq.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val docs = (0L until 25L).map { i =>
        val own = Seq.fill(3 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size)))
        // a third of docs get the shared boilerplate prefix (6 = 2 lines of 3)
        val text = if (i % 3 == 0) s"$shared ${own.mkString(" ")}"
                   else own.mkString(" ")
        (i, text)
      }
      val got = DedupOps.boilerplateStrip(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"), lineWords = 3, minDocs = 2)
        .as[(Long, String, Long)].collect().toSet
      // reference: exact line frequency by distinct doc over the same
      // 3-token windows
      val lines = docs.map { case (id, t) =>
        id -> t.split("\\s+").grouped(3).map(_.mkString(" ")).toVector
      }
      val df = lines.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val want = lines.map { case (id, ls) =>
        val kept = ls.filter(l => df(l) < 2)
        (id, kept.mkString(" "), (ls.size - kept.size).toLong)
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("rollupAdditive matches the built-in rollup on random frames") {
    import graft.operators.AnalyticsOps
    for (seed <- Seq(4, 13)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 300).map(_ => (rnd.nextInt(5), s"p${rnd.nextInt(4)}",
        rnd.nextInt(1000) / 10.0))
      val df = rows.toDF("y", "p", "v")
      val specs = Seq(
        ("n", count(lit(1)), (n: String) => sum(col(n))),
        ("s", sum(col("v").cast("decimal(18,4)")), (n: String) => sum(col(n))),
        ("mx", max(col("v")), (n: String) => max(col(n))))
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.select(col("y"), col("p"), col("n"),
            col("s").cast("double").as("s"), col("mx"), col("lvl"))
          .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2),
            r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
      val ours = canon(AnalyticsOps.rollupAdditive(df,
        Seq("y" -> col("y"), "p" -> col("p")), specs))
      val builtin = canon(df.rollup(col("y"), col("p"))
        .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,4)")).as("s"),
          max(col("v")).as("mx"), grouping_id().cast("long").as("lvl")))
      assert(ours === builtin, s"seed $seed")
    }
  }

  test("fuzzyJoinDist1 matches the brute-force levenshtein join on random edits") {
    import graft.operators.JoinOps
    for (seed <- Seq(6, 21)) {
      val rnd = new scala.util.Random(seed)
      val alpha = "abcdefgh"
      def word(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.size))).mkString
      // mixed lengths INCLUDING short names — deletion-neighborhood
      // blocking has no length contract (the old pigeonhole scheme
      // required >= 2*prefixLen)
      val orig = (1L to 40L).map(i => (i, word(2 + rnd.nextInt(11))))
      // dirty side: half get one random edit (sub/del/ins), half are far
      val dirty = orig.map { case (i, w) =>
        val edited = rnd.nextInt(3) match {
          case 0 => val p = rnd.nextInt(w.length) // substitute
            w.updated(p, alpha(rnd.nextInt(alpha.size)))
          case 1 => val p = rnd.nextInt(w.length) // delete
            w.take(p) + w.drop(p + 1)
          case _ => val p = rnd.nextInt(w.length + 1) // insert
            w.take(p) + alpha(rnd.nextInt(alpha.size)) + w.drop(p)
        }
        (100L + i, edited)
      }
      val lDf = dirty.toDF("id", "name")
      val rDf = orig.toDF("id", "name")
      val got = JoinOps.fuzzyJoinDist1(lDf, col("id"), col("name"),
          rDf, col("id"), col("name"))
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = (for ((li, ln) <- dirty; (ri, rn) <- orig
                      if lev(ln, rn) <= 1) yield (li, ri)).toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("mergeAggState equals full recompute on random base/delta splits") {
    import graft.operators.CdcOps
    for (seed <- Seq(8, 29)) {
      val rnd = new scala.util.Random(seed)
      val all = (1 to 400).map(_ => (rnd.nextInt(20).toLong,
        rnd.nextInt(1000) / 10.0, rnd.nextInt(100)))
      val (base, delta) = all.partition(_ => rnd.nextBoolean())
      def aggOf(d: org.apache.spark.sql.DataFrame) =
        d.groupBy(col("k")).agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,4)")).as("s"), min(col("m")).as("mn"))
      val merge = Seq(("n", (n: String) => sum(col(n))),
        ("s", (n: String) => sum(col(n))), ("mn", (n: String) => min(col(n))))
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.select(col("k"), col("n"), col("s").cast("double"), col("mn"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
          .toSet
      val got = canon(CdcOps.mergeAggState(
        aggOf(base.toDF("k", "v", "m")), aggOf(delta.toDF("k", "v", "m")),
        Seq("k"), merge))
      val want = canon(aggOf(all.toDF("k", "v", "m")))
      assert(got === want, s"seed $seed")
    }
  }

  test("funnel matches a sequential per-user scan on random event streams") {
    import graft.operators.AnalyticsOps
    val steps = Seq("s0", "s1", "s2")
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val evs = Seq("s0", "s1", "s2", "x", "y")
      // small ts domain -> same-ts ties are common; tie broken by id
      val rows = (1 to 400).map(i =>
        (rnd.nextInt(25).toLong, rnd.nextInt(40).toLong, i.toLong,
          evs(rnd.nextInt(evs.size))))
      val df = rows.toDF("uid", "t", "id", "ev")
        .withColumn("ts", timestamp_seconds(col("t")))
      val got = AnalyticsOps.funnel(df, col("uid"), col("ts"), col("id"),
          col("ev"), steps)
        .select("user_id", "stage").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = rows.filter(r => steps.contains(r._4))
        .groupBy(_._1).map { case (uid, rs) =>
          var stage = 0
          rs.sortBy(r => (r._2, r._3)).foreach { r =>
            if (stage < steps.length && r._4 == steps(stage)) stage += 1
          }
          uid -> stage
        }
      assert(got === want, s"seed $seed")
    }
  }

  test("eventTransitions matches a sequential per-user scan on random streams") {
    import graft.operators.AnalyticsOps
    for (seed <- Seq(13, 37)) {
      val rnd = new scala.util.Random(seed)
      val evs = Vector("a", "b", "c", "d")
      val rows = (1 to 500).map(i =>
        (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i.toLong,
          evs(rnd.nextInt(evs.size))))
      val df = rows.toDF("uid", "t", "id", "ev")
        .withColumn("ts", timestamp_seconds(col("t")))
      val got = AnalyticsOps.eventTransitions(df, col("uid"), col("ts"),
          col("id"), col("ev"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val ordered = rs.sortBy(r => (r._2, r._3)).map(_._4)
        ordered.zip(ordered.drop(1))
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      assert(got === want, s"seed $seed")
    }
  }

  test("pageRank matches the driver-side recurrence on random dense graphs") {
    import graft.operators.GraphOps
    for (seed <- Seq(4, 21)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 600).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong + 100L))
      val got = GraphOps.pageRank(edges.toDF("s", "d").repartition(5),
          col("s"), col("d"), iterations = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // same integer recurrence, driver-side
      val e = edges.distinct
      val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
      val n = nodes.length.toLong
      val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
      val r0 = 1000000000000L / n
      val base = (15L * r0) / 100L
      var ranks = nodes.map(_ -> r0).toMap
      (1 to 5).foreach { _ =>
        val inb = e.groupBy(_._2).map { case (d, es) =>
          d -> es.map { case (s, _) => ranks(s) / outdeg(s) }.sum
        }
        ranks = nodes.map(v => v -> (base + (85L * inb.getOrElse(v, 0L)) / 100L)).toMap
      }
      assert(got === ranks, s"seed $seed")
    }
  }

  test("scd2History current rows equal mergeChangelog applied to an empty base") {
    import graft.operators.CdcOps
    for (seed <- Seq(11, 31)) {
      val rnd = new scala.util.Random(seed)
      val changelog = (1 to 300).map(i =>
        (rnd.nextInt(30).toLong, i.toLong,
          if (rnd.nextInt(5) == 0) "D" else "U", s"v$i"))
        .toDF("k", "seq", "op", "v")
      val current = CdcOps.scd2History(changelog, Seq("k"), "seq", "op", Seq("v"))
        .filter(col("is_current"))
        .select(col("k"), col("v")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val empty = Seq.empty[(Long, String)].toDF("k", "v")
      val merged = CdcOps.mergeChangelog(empty, changelog,
          key = "k", seq = "seq", op = "op")
        .select(col("k"), col("v")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(current === merged, s"seed $seed")
    }
  }

  test("resampleLocf matches a brute-force grid fill (random sparse series, ts ties)") {
    val stepS = 300L
    for (seed <- Seq(9, 27)) {
      val rnd = new scala.util.Random(seed)
      val ks = Vector("a", "b", "c")
      // ts drawn from a small domain so same-(key, ts) ties are common;
      // offsets keep each key's series away from the hour boundary so the
      // leading grid points before the first observation stay null
      val rows = (1 to 120).map(i =>
        (i.toLong, ks(rnd.nextInt(ks.size)),
          600L + rnd.nextInt(6000), rnd.nextDouble()))
      val df = rows.toDF("id", "k", "t", "v")
        .withColumn("ts", timestamp_seconds(col("t")))
      val got = TemporalOps.resampleLocf(df, Seq("k"), "ts", Seq("v"),
          interval = "5 minutes", truncUnit = "hour", tieBreak = col("id"))
        .select(col("k"), unix_timestamp(col("ts")).as("t"), col("asof_v"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          Option(r.get(2)).map(_.asInstanceOf[Double]))
        .toMap
      // reference: per key, an hour-truncated stepS grid up to max ts; each
      // grid point carries the newest (ts, id)-max observation at-or-before it
      val want = rows.groupBy(_._2).flatMap { case (k, rs) =>
        val lo = (rs.map(_._3).min / 3600L) * 3600L
        val hi = rs.map(_._3).max
        Iterator.iterate(lo)(_ + stepS).takeWhile(_ <= hi).map { t =>
          val cands = rs.filter(_._3 <= t)
          (k, t) -> (if (cands.isEmpty) None
                     else Some(cands.maxBy(c => (c._3, c._1))._4))
        }
      }
      assert(got === want, s"seed $seed")
    }
  }

  test("scd2History matches a sequential per-key replay on random changelogs") {
    import graft.operators.CdcOps
    for (seed <- Seq(13, 29)) {
      val rnd = new scala.util.Random(seed)
      // global seq keeps (k, seq) unique; D ops close intervals but emit no row
      val ch = (1 to 200).map(i =>
        (rnd.nextInt(12).toLong, i.toLong,
          if (rnd.nextInt(4) == 0) "D" else "U", s"v$i"))
      val got = CdcOps.scd2History(ch.toDF("k", "seq", "op", "v"),
          Seq("k"), "seq", "op", Seq("v"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getBoolean(3), r.getString(4)))
        .toSet
      // reference: per key in seq order, every op (including D) closes its
      // predecessor's interval; non-D ops emit [seq, next-op seq) rows and
      // only a key's LAST op can be current
      val want = ch.groupBy(_._1).flatMap { case (k, ops) =>
        val sorted = ops.sortBy(_._2)
        val nexts = sorted.drop(1).map(o => Some(o._2)) :+ None
        sorted.zip(nexts).collect { case ((_, seq, op, v), nx) if op != "D" =>
          (k, seq, nx, nx.isEmpty, v)
        }
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("decontamOverlap matches brute-force distinct-gram fractions on random corpora") {
    for (seed <- Seq(7, 21)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 40).map(i => s"w$i")
      def doc(len: Int): String =
        Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val bench = (1 to 8).map(i => (100L + i, doc(6 + rnd.nextInt(6))))
      // lengths straddle k=3 (some docs have no gram at all); every third
      // doc gets a random bench snippet spliced in, planting partial
      // overlap with seam grams around the splice point
      val corpus = (1 to 60).map { i =>
        val base = doc(1 + rnd.nextInt(12))
        val text =
          if (i % 3 == 0) {
            val b = bench(rnd.nextInt(bench.size))._2.split(" ")
            base + " " + b.take(3 + rnd.nextInt(b.length - 2)).mkString(" ")
          } else base
        (i.toLong, text)
      }
      val k = 3
      val got = graft.operators.DedupOps.decontamOverlap(
          corpus.toDF("doc_id", "text"),
          col("doc_id"), col("text"),
          bench.toDF("doc_id", "text"), col("text"), k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      def grams(t: String): Set[Seq[String]] =
        t.split("\\s+").toSeq.sliding(k).filter(_.size == k).toSet
      val benchGrams = bench.flatMap(b => grams(b._2)).toSet
      val want = corpus.flatMap { case (id, t) =>
        val g = grams(t)
        if (g.isEmpty) None
        else {
          val hit = g.count(benchGrams)
          Some(id -> ((g.size.toLong, hit.toLong, hit.toDouble / g.size.toDouble)))
        }
      }.toMap
      assert(want.values.exists(_._2 > 0), s"seed $seed planted no overlap — fixture broken")
      assert(got === want, s"seed $seed")
    }
  }

  test("winsorize approx band brackets the exact band on random skewed strata") {
    import graft.operators.CurationOps
    for (seed <- Seq(2, 17)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 600).map(i => (i.toLong,
        if (rnd.nextBoolean()) "a" else "b",
        math.pow(10.0, rnd.nextDouble() * 4) + rnd.nextInt(10)))
      val df = rows.toDF("id", "s", "v")
      def bands(exact: Boolean) =
        CurationOps.winsorize(df, col("id"), col("s"), col("v"),
            0.05, 0.95, exact = exact)
          .select("stratum", "lo", "hi").distinct().collect()
          .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val ex = bands(true); val ap = bands(false)
      ex.keys.foreach { k =>
        // sketch thresholds are observed values near the exact rank — allow
        // a small rank slack by value-rank comparison
        val vs = rows.filter(_._2 == k).map(_._3).sorted
        def rankOf(v: Double) = vs.count(_ <= v)
        assert(math.abs(rankOf(ap(k)._1) - rankOf(ex(k)._1)) <= 3, s"$k lo seed $seed")
        assert(math.abs(rankOf(ap(k)._2) - rankOf(ex(k)._2)) <= 3, s"$k hi seed $seed")
      }
    }
  }

  test("audioSig60 matches a direct-samples reference through random WAV bytes") {
    import graft.operators.Multimodal.MediaDecoder
    // the byte round-trip (toWav16 encode -> RIFF walk -> sign-extend) is
    // where an encoding bug would hide; the reference computes the
    // signature straight from the sample array
    def ref(s: Array[Int], frameLen: Int): Long = {
      val e = Array.tabulate(61)(p =>
        (p * frameLen until (p + 1) * frameLen).map(i => s(i).toLong * s(i)).sum)
      (0 until 60).foldLeft(0L)((h, p) =>
        if (e(p + 1) > e(p)) h | (1L << p) else h)
    }
    for (seed <- Seq(3, 19, 77)) {
      val rnd = new scala.util.Random(seed)
      // adversarial shapes: full-range samples, long zero runs, constants
      val n = 61 * 64
      val samples = Array.tabulate(n) { i =>
        rnd.nextInt(4) match {
          case 0 => rnd.nextInt(65536) - 32768
          case 1 => 0
          case 2 => -32768 // the asymmetric extreme
          case _ => 1000
        }
      }
      val got = MediaDecoder.audioSig60(MediaDecoder.toWav16(samples)).get
      assert(got === ref(samples, 64), s"seed $seed")
    }
  }

  test("aHash60 matches a direct-pixel reference through random BMP bytes") {
    import graft.operators.Multimodal.MediaDecoder
    def refHash(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth; val h = img.getHeight
      def luma(x: Int, y: Int): Int = {
        val rgb = img.getRGB(x, y)
        (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
      }
      val means = Array.tabulate(60) { k =>
        val bx = k % 8; val by = k / 8
        val xs = bx * w / 8 until (bx + 1) * w / 8
        val ys = by * h / 8 until (by + 1) * h / 8
        xs.flatMap(x => ys.map(y => luma(x, y).toLong)).sum / (xs.size * ys.size)
      }
      val avg = means.sum / 60
      (0 until 60).foldLeft(0L)((acc, k) =>
        if (means(k) > avg) acc | (1L << k) else acc)
    }
    for (seed <- Seq(5, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      // non-multiple-of-8 dims exercise the floor cell boundaries; odd
      // widths exercise BMP row padding
      val (w, h) = (9 + rnd.nextInt(24), 8 + rnd.nextInt(25))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt(0x1000000))
      val got = MediaDecoder.aHash60(MediaDecoder.toBmp24(img)).get
      assert(got === refHash(img), s"seed $seed dims ${w}x$h")
    }
  }
}
