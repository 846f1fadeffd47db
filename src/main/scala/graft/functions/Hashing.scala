package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-reproducible hashing for the dedup/similarity
  * operators.
  *
  * Spark's native hash()/xxhash64 are fast but engine-specific; the dedup
  * pipeline instead derives 60-bit integers from md5 (standard algorithm,
  * identical everywhere — an external system, or the DuckDB oracle, can
  * reproduce every signature bit-for-bit). md5 here is a per-shingle setup
  * cost off the hot aggregation path; the k minhash permutations reuse one
  * md5 via cheap affine re-hashing.
  */
object Hashing {

  /** 60-bit positive hash: first 15 hex digits of md5 as a BIGINT.
    * DuckDB twin: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT).
    * Runs through the native [[Hash60]] expression (registered by
    * `GraftExtensions`) when the active session has it; on a vanilla
    * session it falls back to [[hash60Composed]] at Column-construction
    * time ([[Native.has]]), so every hash60 consumer — including the
    * no-extensions fallbacks of the native scans, which were the r11
    * gap — analyzes on any session. Same digest either way
    * (Hash60Spec pins bit equality). */
  def hash60(c: Column): Column =
    if (Native.has("graft_hash60")) call_function("graft_hash60", c)
    else hash60Composed(c)

  /** The built-in composed form of [[hash60]] — kept as the portable
    * semantic definition (Hash60Spec asserts bit equality). */
  def hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side scalar twin of [[hash60]] — for precomputing constant
    * hash-derived parameters (LSH planes, IVF codebooks) once instead of
    * evaluating md5 per row at runtime. Also runs per row inside executor
    * fixtures (demoBmpCorpus: 256 calls/doc), so the 60-bit value reads
    * straight off the first 8 digest bytes — no hex-string formatting,
    * identical result (15 hex digits = top 60 bits of the big-endian
    * digest prefix). */
  def hash60Scalar(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4 // 64 digest bits -> leading 15 hex digits (60 bits)
  }

  /** Prime modulus < 2^32 for affine minhash permutations. Coefficients are
    * kept < 2^30 so every intermediate product stays under 2^62 — no Long
    * overflow, the arithmetic is exact and portable to any engine. */
  val MinhashPrime: Long = 4294967291L
  private[functions] val CoefPrime: Long = 1073741789L // < 2^30

  /** i-th affine permutation of a base hash: (a_i * (x mod P) + b_i) mod P,
    * with deterministic coefficients derived from the permutation index. */
  def minhashPerm(baseHash: Column, i: Int): Column = {
    val ai = (2654435761L * (i + 1) + 1) % CoefPrime + 1
    val bi = (40503L * (i + 7) + 2654435769L) % MinhashPrime
    ((baseHash % MinhashPrime) * ai + bi) % MinhashPrime
  }
}
