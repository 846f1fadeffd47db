package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** §2B batch-ETL operator library — the reference's 13 pandas dimension-build
  * scripts (under scripts/, see SURVEY.md §2B) re-expressed as distributed,
  * codegen-friendly DataFrame transforms. Each operator cites its reference
  * counterpart.
  *
  * Scale rules: no driver-side loops over data (the only driver work is
  * schema/metadata logic like delimiter sniffing and column-name resolution,
  * which is O(columns), not O(rows)); joins against small dimensions are
  * broadcast; per-key "keep one row" ops use window row_number (shuffles once
  * on the partition key, no global sort).
  */
object EtlOps {

  // --- B1: separator-sniffing CSV scan (istat_utils.py:7-26) ----------------
  /** Count candidate separators in the first 4 KB of the file and pick the
    * max — driver-side metadata peek (bytes, not rows), then a distributed
    * CSV scan with the winning delimiter. DROPMALFORMED mirrors pandas
    * on_bad_lines="skip". */
  def sniffDelimiter(spark: SparkSession, path: String,
                     candidates: Seq[Char] = Seq(';', '|', ',', '\t')): Char = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val head = {
      val file =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".csv"))
            .headOption
            .getOrElse(throw new IllegalArgumentException(
              s"sniffDelimiter: no .csv file under directory $path"))
        else p
      val in = fs.open(file)
      try {
        // loop: a single read() may legally short-read, which would silently
        // degrade the frequency count below
        val buf = new Array[Byte](4096)
        var off = 0
        var n = 0
        while (off < buf.length && { n = in.read(buf, off, buf.length - off); n >= 0 })
          off += n
        new String(buf, 0, off, "UTF-8")
      } finally in.close()
    }
    candidates.maxBy(c => head.count(_ == c))
  }

  def readSniffedCsv(spark: SparkSession, path: String): DataFrame = {
    val delim = sniffDelimiter(spark, path)
    spark.read
      .option("header", "true")
      .option("delimiter", delim.toString)
      .option("quote", "\u0000") // QUOTE_NONE (istat_utils.py:18)
      .option("mode", "DROPMALFORMED")
      .csv(path)
  }

  // --- B2: header normalization + cell trim (istat_utils.py:21-26) ----------
  /** Strip quotes/whitespace from header names; trim every string cell. */
  def normalizeHeaders(df: DataFrame): DataFrame = {
    val cleaned = df.columns.map(_.replaceAll("^[\"'\\s]+|[\"'\\s]+$", ""))
    df.toDF(cleaned.toIndexedSeq: _*)
  }

  def trimCells(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      if (f.dataType == StringType) trim(col(f.name)).as(f.name) else col(f.name)
    }.toIndexedSeq: _*)

  // --- B3: fuzzy column resolution (istat_utils.py:28-37) -------------------
  /** Resolve a logical column against messy physical headers: normalized
    * (\W+ stripped, lowercase) exact match first, then substring match.
    * Driver-side schema logic — O(columns). */
  def findColumn(columns: Seq[String], candidates: Seq[String]): Option[String] = {
    def norm(s: String) = s.toLowerCase.replaceAll("\\W+", "")
    val normed = columns.map(c => norm(c) -> c)
    candidates.iterator.flatMap { cand =>
      val n = norm(cand)
      normed.find(_._1 == n).orElse(normed.find(_._1.contains(n))).map(_._2)
    }.toSeq.headOption
  }

  // --- B5: regex domain filter (istat_utils.py:47-49) -----------------------
  def regexKeep(df: DataFrame, c: Column, pattern: String): DataFrame =
    df.filter(c.rlike(pattern))
  def regexDrop(df: DataFrame, c: Column, pattern: String): DataFrame =
    df.filter(!c.rlike(pattern))

  // --- B6: latest-year selection (clean_istat_abitazioni.py:28-29) ----------
  /** Filter to the max value of `yearCol` without a driver round-trip: the
    * 1-row max aggregate broadcast-joins onto the fact (no shuffle of the
    * fact side at any scale). */
  def latestYearFilter(df: DataFrame, yearCol: Column): DataFrame = {
    val maxY = df.agg(max(yearCol).as("__max_year"))
    df.join(broadcast(maxY), yearCol === col("__max_year")).drop("__max_year")
  }

  /** Multi-metric variant of [[latestYearFilter]]
    * (clean_istat_commuting.py:108-156): pick the newest year present for
    * EVERY metric that has any data — max of the intersection of per-metric
    * year sets — falling back to the max year seen ANYWHERE in the file
    * (all rows, requested metric or not — all_years_seen in the reference)
    * when no common year exists. The year/metric census is a distinct over
    * two small columns and two 1-row aggregates; the chosen year
    * broadcast-joins back onto the fact, which never shuffles. */
  def latestCommonYearFilter(df: DataFrame, yearCol: Column, metricCol: Column,
                             metrics: Seq[String]): DataFrame = {
    val my = df.filter(metricCol.isin(metrics: _*) && yearCol.isNotNull)
      .select(metricCol.as("__m"), yearCol.as("__y")).distinct()
    // fallback census over every row BEFORE the metric filter: the file's
    // newest year may belong only to a non-requested metric
    val anyYear = df.filter(yearCol.isNotNull).agg(max(yearCol).as("__any_y"))
    val target = my
      .crossJoin(broadcast(my.agg(count_distinct(col("__m")).as("__m_total"))))
      .groupBy(col("__y"), col("__m_total"))
      .agg(count_distinct(col("__m")).as("__nm"))
      .agg(max(when(col("__nm") === col("__m_total"), col("__y"))).as("__common_y"))
      .crossJoin(broadcast(anyYear))
      .select(coalesce(col("__common_y"), col("__any_y")).as("__target_year"))
    df.join(broadcast(target), yearCol === col("__target_year"))
      .drop("__target_year")
  }

  // --- B7: pivot long->wide (clean_istat_abitazioni.py:35) ------------------
  /** Explicit value list keeps the plan single-pass (no extra distinct scan
    * to discover pivot values) and the output schema deterministic. */
  def pivotWide(df: DataFrame, keys: Seq[Column], pivotCol: String,
                values: Seq[String], agg: Column): DataFrame =
    df.groupBy(keys: _*).pivot(pivotCol, values).agg(agg)

  /** Unpivot (melt, wide→long): the inverse of [[pivotWide]]. Each input
    * row emits one (keys..., metric, value) row per metric column, values
    * cast to a common type by `Dataset.unpivot` (Spark's native Unpivot
    * node — an Expand projection, narrow, no shuffle, no UDFs). Null
    * values are DROPPED, matching `pivot`'s sparse-wide convention
    * (unpivot(pivot(x)) round-trips modulo row order). */
  def unpivotLong(df: DataFrame, keys: Seq[String], metrics: Seq[String],
                  metricName: String = "metric",
                  valueName: String = "value"): DataFrame =
    df.unpivot(keys.map(col).toArray, metrics.map(col).toArray,
        metricName, valueName)
      .filter(col(valueName).isNotNull)

  /** Corrupt-tolerant JSONL ingest: PERMISSIVE-mode read against an
    * explicit schema with the raw line captured in `_corrupt` for any row
    * that fails to parse — the 100 TB ingestion stance (one bad line in a
    * billion must neither kill the job nor silently vanish; DROPMALFORMED
    * does the latter, FAILFAST the former). Callers route on
    * `_corrupt IS NULL` into clean/quarantine branches; the quarantine
    * carries the offending bytes for replay.
    *
    * The explicit schema is mandatory: schema inference scans the data
    * once just to guess types (2× the read at scale) and infers from
    * corrupt rows too. Line-delimited JSON splits by newline, so a
    * billion-line file still parallelizes across executors. */
  def readJsonlPermissive(spark: SparkSession, path: String,
                          schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val withCorrupt = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt", StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }

  // --- B9/B15/B19: keep-one-row-per-key family ------------------------------
  /** B9 rank-and-dedup (clean_airports_it.py:49-55), B15 latest-per-key
    * (merge_cities_all.py:54-57), B19 keep-richest
    * (rebuild_and_merge_cities_it.py:284-285): all are row_number() == 1 over
    * a per-key ordering. One shuffle on the key; no global sort. */
  def keepFirstPerKey(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("__rn", row_number().over(Window.partitionBy(key: _*).orderBy(order: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  // --- B14: ambiguity-aware key prep (merge_istat_cities.py:57-61) ----------
  /** Keep only rows whose key occurs exactly once — semi join against the
    * count-1 key set (aggregate output is small; Catalyst/AQE broadcasts). */
  def uniqueKeysOnly(df: DataFrame, key: Column): DataFrame = {
    val unique = df.groupBy(key.as("__k")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") === 1).select("__k")
    df.join(broadcast(unique), key === col("__k"), "left_semi")
  }

  // --- B17: staged fallback join (rebuild_and_merge_cities_it.py:175-224) ---
  /** Try each (leftKey, rightKey) stage in order; later stages only fill rows
    * still unmatched (combine_first semantics → coalesce per payload column).
    * Adds `matched_stage` — 1-based stage index or null when no stage
    * matched. Right side is dimension-sized → broadcast each stage. */
  def stagedFallbackJoin(left: DataFrame, right: DataFrame,
                         stages: Seq[(Column, Column)],
                         payload: Seq[String]): DataFrame = {
    // Each stage is a pure equi left join (broadcast hash join — a predicate
    // on matched_stage would force a nested-loop join); "fill only missing"
    // is a post-join projection. Right keys must be unique per stage or rows
    // would multiply.
    val init = left
      .withColumn("matched_stage", lit(null).cast("int"))
      .withColumns(payload.map(p => p -> lit(null).cast(right.schema(p).dataType)).toMap)
    stages.zipWithIndex.foldLeft(init) { case (acc, ((lk, rk), i)) =>
      val stagePayload = payload.map(p => col(p).as(s"__r_$p")) :+ rk.as("__rk")
      val r = right.select(stagePayload: _*)
      val joined = acc.join(broadcast(r), lk === col("__rk"), "left")
      val hit = col("matched_stage").isNull && col("__rk").isNotNull
      val filled = payload.foldLeft(joined) { (d, p) =>
        d.withColumn(p, when(hit, col(s"__r_$p")).otherwise(col(p)))
      }
      filled
        .withColumn("matched_stage", when(hit, lit(i + 1)).otherwise(col("matched_stage")))
        .drop(payload.map(p => s"__r_$p") :+ "__rk": _*)
    }
  }

  // --- B20: data-quality report (rebuild_and_merge_cities_it.py:300-321) ----
  /** Per-row missing-count score over `checked` columns + per-column flags;
    * worst `topN` rows (most-missing first, keyed tiebreak). The limit is
    * pushed into TakeOrderedAndProject — bounded driver/output size. */
  def qualityReport(df: DataFrame, checked: Seq[String], tiebreak: Column,
                    topN: Int): DataFrame = {
    val flags = checked.map(c => col(c).isNull.cast("int"))
    val named = checked.zip(flags).map { case (c, f) => f.as(s"missing_$c") }
    val score = flags.reduce(_ + _).as("missing_count")
    df.select(tiebreak +: named :+ score: _*)
      .orderBy(col("missing_count").desc, tiebreak)
      .limit(topN)
  }

  // --- B24: nearest-neighbor fallback join (build_hotels_yaml.py:228-258) ---
  /** For each left point, the nearest right point by squared planar distance
    * (ties → min rightKey): broadcast cross join + min(struct(d2, key, payload))
    * — a single hash aggregate, no per-group sort, right side must be
    * broadcastable (cities ≈ 10⁴ in the reference). */
  def nearestNeighborJoin(left: DataFrame, right: DataFrame,
                          lx: Column, ly: Column, rx: Column, ry: Column,
                          leftKeys: Seq[String], rightKey: String): DataFrame = {
    val d2 = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
    left.crossJoin(broadcast(right))
      .groupBy(leftKeys.map(col): _*)
      .agg(min(struct(d2.as("d2"), col(rightKey).as("nn"))).as("__m"))
      .select(leftKeys.map(col) :+ col("__m.nn").as(s"nn_$rightKey") :+
        col("__m.d2").as("nn_d2"): _*)
  }

  // --- B21: int coercion / rounding pass (final_cleaning.py:9-67) -----------
  /** floor(x+0.5) — NOT round() — so the coercion is reproducible across
    * engines (round() half-up vs half-even differs); flags cells that
    * actually had decimals, mirroring the reference's rounding report. */
  def intCoerce(c: Column): Column = floor(c + lit(0.5)).cast("long")
  def hadDecimals(c: Column): Column = (c =!= floor(c)).cast("int")

  // --- B28: CSV + YAML sinks (build_hotels_yaml.py:294-330) -----------------
  /** Ordered-column CSV sink (reference writes a fixed column order). */
  def writeOrderedCsv(df: DataFrame, columns: Seq[String], path: String): Unit =
    df.select(columns.map(col): _*)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** YAML payload with schema_version header — driver-side renderer for
    * dimension-table exports (small data by construction; rows are passed in
    * already collected/ordered). Scalars that are not plainly safe (hotel
    * names carry ':', '#', quotes, …) are emitted double-quoted with YAML
    * escapes, so the file parses regardless of the data. */
  def yamlRender(key: String, schemaVersion: Int,
                 rows: Seq[Map[String, String]]): String = {
    def scalar(v: String): String =
      if (v != null && v.matches("[A-Za-z0-9_./\\-]+")) v
      else if (v == null) "null"
      else "\"" + v.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val sb = new StringBuilder(s"schema_version: $schemaVersion\n$key:\n")
    rows.foreach { r =>
      r.toSeq.sortBy(_._1).zipWithIndex.foreach { case ((k, v), i) =>
        sb.append(if (i == 0) s"  - $k: ${scalar(v)}\n" else s"    $k: ${scalar(v)}\n")
      }
    }
    sb.toString
  }

  // --- B27: surrogate id generation (build_hotels_yaml.py:31-33,286-291) ----
  /** {group}-{slug}-{zero-padded rank}: rank via row_number over an explicit
    * deterministic ordering (the reference pads a positional index, which is
    * only stable single-threaded — an explicit ordering is the distributed
    * equivalent).
    *
    * The global (unpartitioned) window funnels all rows through one task —
    * fine for the DIMENSION-sized frames this op exists for (suppliers,
    * the ~30k-hotel dimension; the reference never ids fact rows). For a
    * fact-scale id the right plan is range-repartition on `orderKey` +
    * per-partition row_number + a broadcast per-partition-offset add
    * (zipWithIndex's shape) — not this window. `orderKey` must be unique
    * or the rank (and thus the id) is nondeterministic under retries. */
  def surrogateId(group: Column, slug: Column, orderKey: Column): Column =
    concat_ws("-", group, slug,
      lpad(row_number().over(Window.orderBy(orderKey)).cast("string"), 6, "0"))
}
