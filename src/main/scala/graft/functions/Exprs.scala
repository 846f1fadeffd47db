package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure `Column` expression helpers — the engine's scalar function library.
  *
  * Everything here composes Spark built-ins (codegen'd, no UDFs), mirroring
  * the reference's "no UDFs" design note (spark/kafka_to_metrics.py:476).
  * The single exception is [[normalizeName]] which needs java.text.Normalizer
  * (reference: merge_istat_cities.py:9-22).
  */
object Exprs {

  /** clamp(x, lo, hi) via least/greatest (kafka_to_metrics.py:480-481). */
  def clamp(x: Column, lo: Column, hi: Column): Column = least(greatest(x, lo), hi)

  /** Min-max normalization with degenerate-range guard:
    * when hi-lo <= 1e-9 -> 0.5 else clamp((x-lo)/(hi-lo), 0, 1).
    * Reference: kafka_to_metrics.py:478-481. */
  def minmaxNorm(x: Column, lo: Column, hi: Column): Column =
    when(hi - lo <= lit(1e-9), lit(0.5))
      .otherwise(clamp((x - lo) / (hi - lo), lit(0.0), lit(1.0)))

  /** Month -> meteorological season (kafka_to_metrics.py:315-323). Total:
    * every month maps to exactly one season. */
  def seasonOf(dateCol: Column): Column = {
    val m = month(dateCol)
    when(m.isin(12, 1, 2), "winter")
      .when(m.isin(3, 4, 5), "spring")
      .when(m.isin(6, 7, 8), "summer")
      .otherwise("autumn")
  }

  /** Great-circle distance in km, R=6371.0088 (build_hotels_yaml.py:36-42).
    * Pure trig on built-ins — codegen-friendly, no UDF. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = lit(6371.0088)
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    // x*x, not pow(x,2): exact IEEE multiply reproduces across engines,
    // libm pow need not
    val a = sLat * sLat + cos(radians(lat1)) * cos(radians(lat2)) * (sLon * sLon)
    r * lit(2.0) * asin(sqrt(a))
  }

  /** Locale-aware numeric coercion: strip NBSP/space, drop '.' thousands
    * separators, ',' -> '.', then try_cast double — malformed cells become
    * null rather than failing the job under ANSI mode (istat_utils.py:39-45
    * coerces with errors="coerce", i.e. null on failure).
    *
    * The cleanup runs as the native single-pass [[LocaleClean]] scan when
    * the active session has GraftExtensions installed (the regex pass's
    * backtracking lookahead dominated b04 at sf10 — 53 s in the r10 sweep,
    * the same per-row constant TextScanStats killed for t01/t23), and
    * otherwise as [[localeCleanFallback]], the original translate/regexp
    * chain — bit-equivalent (pinned by LocaleCleanSpec), so library
    * consumers on a vanilla session still coerce correctly, just at the
    * pre-native speed. In the fallback, the whitespace strip and the
    * decimal-comma swap are fixed single-char maps (translate: per-char
    * table lookup, no automaton); only the thousands-separator lookahead
    * pays for a regex engine. The first translate's char set is exactly
    * Java's \s ([ \t\n\x0B\f\r]) plus NBSP. Order matters: ',' must
    * become '.' AFTER the thousands pass, or a decimal comma ("1,234")
    * would be eaten as a thousands dot. try_cast stays in Column space on
    * both paths: Spark's cast owns number parsing. */
  def localeNumeric(s: Column): Column =
    (if (Native.has("graft_locale_clean")) call_function("graft_locale_clean", s)
     else localeCleanFallback(s)).try_cast("double")

  /** The pre-r11 Column formulation of the locale cleanup — the
    * [[LocaleClean]] bit-equivalence reference and the no-extensions
    * fallback; see localeNumeric's scaladoc for the chain's semantics. */
  def localeCleanFallback(s: Column): Column =
    translate(
      regexp_replace(
        translate(s, " \t\n\u000B\f\r\u00A0", ""),
        "\\.(?=\\d{3}(\\D|$))", ""),
      ",", ".")

  /** Stars normalization: extract first 0-5(.x) number from free text like
    * "hotel 4*" / "3.5" (build_hotels_yaml.py:83-88). */
  def starsNorm(s: Column): Column =
    nullif(regexp_extract(s, "([0-5](?:\\.\\d)?)", 1), lit("")).cast("double")

  /** WKT point parse: "POINT (lon lat)" -> (lon, lat) doubles
    * (build_hotels_yaml.py:45-54). */
  def wktLon(s: Column): Column =
    regexp_extract(s, "POINT\\s*\\(\\s*(-?\\d+(?:\\.\\d+)?)\\s+(-?\\d+(?:\\.\\d+)?)\\s*\\)", 1).cast("double")
  def wktLat(s: Column): Column =
    regexp_extract(s, "POINT\\s*\\(\\s*(-?\\d+(?:\\.\\d+)?)\\s+(-?\\d+(?:\\.\\d+)?)\\s*\\)", 2).cast("double")

  /** Unicode name normalization: NFKD, strip combining marks, lowercase,
    * strip "comune di" prefixes + punctuation, collapse spaces.
    * Reference: merge_istat_cities.py:9-22, rebuild_and_merge_cities_it.py:74-95.
    * The one true UDF in the engine (java.text.Normalizer has no built-in
    * Column equivalent); deterministic so Catalyst can still cache/reuse it. */
  val normalizeNameFn: String => String = { s =>
    if (s == null) null
    else {
      val nfkd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
      nfkd.replaceAll("\\p{M}", "")
        .toLowerCase
        .replaceAll("^(comune di|citta di|city of)\\s+", "")
        .replaceAll("[^a-z0-9]+", " ")
        .trim
        .replaceAll("\\s+", " ")
    }
  }

  /** Column form of [[normalizeNameFn]]. */
  def normalizeName(c: Column): Column = udf(normalizeNameFn).apply(c)

  /** Null-safe spend derivation: coalesce(adr,0) * coalesce(rooms,1) *
    * coalesce(nights,1) (kafka_to_metrics.py:195-198). */
  def spendEur(adr: Column, rooms: Column, nights: Column): Column =
    coalesce(adr, lit(0.0)) * coalesce(rooms, lit(1)) * coalesce(nights, lit(1))
}
