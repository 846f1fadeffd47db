package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the SparkEntry query registry and its DuckDB oracle
  * twins. Conventions for oracle parity (the driver sorts columns by name and
  * hash-compares values):
  *  - window struct starts are emitted as epoch seconds BIGINT (`w_start`);
  *  - double outputs are rounded via scale-multiply round(x*10^n)/10^n so the
  *    oracle engine rounds the same double identically (see [[rnd]]);
  *  - sums over money-like doubles run through DECIMAL(18,4) so both engines
  *    sum exactly, then output as a 4-dp-rounded DOUBLE (see [[decOut]]);
  *  - every query orders by its key columns.
  */
object QueryHelpers {

  /** Query signature of the driver contract. */
  type Q = (SparkSession, String) => DataFrame

  def wStart(c: String = "window"): Column =
    unix_timestamp(col(s"$c.start")).as("w_start")

  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Output convention for money-like sums: the SUM itself runs in
    * DECIMAL(18,4) (exact, order-independent), but the *emitted* column is a
    * 4-dp-rounded DOUBLE. Rendering a DECIMAL(38,6) surface form differs
    * between Spark and DuckDB (trailing-zero/width conventions), which
    * hash-mismatches even when values are numerically identical; the decimal
    * sum is exact so the double conversion + scale-multiply round is
    * deterministic in both engines. */
  def decOut(c: Column): Column = rnd(c.cast("double"))

  /** 4-decimal rounding via scale-multiply, NOT round(x, 4): Spark rounds the
    * exact binary expansion of the double while DuckDB multiplies by 1e4
    * first, so the two disagree when x*1e4 lands exactly on .5. Both engines
    * then round the same double identically. */
  def rnd(c: Column): Column = round(c * lit(10000.0)) / lit(10000.0)
  def rnd3(c: Column): Column = round(c * lit(1000.0)) / lit(1000.0)
  def rnd6(c: Column): Column = round(c * lit(1000000.0)) / lit(1000000.0)

  /** The oracle gate fixture's directory LEAF name (the driver contract
    * runs Verify + the DuckDB compare on `/root/testdata/sf0.01`). Guards
    * that pin oracle-CTE constants (s21/s22's fixed Lloyd-chain sizes)
    * key on this via [[isGateDir]] — an exact leaf-name match, not a
    * substring sniff of the whole path, so an unrelated dir that happens
    * to CONTAIN "sf0.01" doesn't get gate requirements imposed on it. */
  val GateDirName: String = "sf0.01"

  /** True iff `dir` is the oracle gate fixture (leaf name == sf0.01,
    * trailing separators ignored). */
  def isGateDir(dir: String): Boolean =
    new java.io.File(dir).getName == GateDirName

  /** Scratch directory for keys whose real product is a SINK (a36's grid):
    * rooted at `GRAFT_SCRATCH_DIR` when set — at the big decades the grid's
    * disk footprint must land on the disk that was budgeted for it, not
    * whatever tmpfs backs /tmp — else the JVM tmpdir (gate/spec scale,
    * where the footprint is KBs). A shutdown hook covers the hard-kill
    * path: callers delete in their `finally`, but a JVM killed mid-write
    * would otherwise strand a grid-sized directory; the hook makes the
    * abandoned-scratch lifetime one process, not forever. */
  def scratchDir(prefix: String): java.nio.file.Path = {
    val root = sys.env.get("GRAFT_SCRATCH_DIR")
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir")))
    java.nio.file.Files.createDirectories(root)
    val dir = java.nio.file.Files.createTempDirectory(root, prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      deleteRecursively(dir.toFile)))
    dir
  }

  /** Best-effort recursive delete (scratch cleanup — both the normal
    * `finally` path and [[scratchDir]]'s shutdown hook). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }

  // ---- DuckDB SQL fragments ------------------------------------------------

  /** DuckDB twin of [[graft.functions.Hashing.hash60]]. */
  def h60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  def rndSql(e: String): String = s"round(($e) * 10000) / 10000"
  def rnd3Sql(e: String): String = s"round(($e) * 1000) / 1000"
  def rnd6Sql(e: String): String = s"round(($e) * 1000000) / 1000000"
  def wStartSql(tsExpr: String, seconds: Long): String =
    s"CAST(floor(epoch($tsExpr) / $seconds) * $seconds AS BIGINT)"
  def minuteSql(tsExpr: String): String =
    s"CAST(floor(epoch(date_trunc('minute', $tsExpr))) AS BIGINT)"
  def decSumSql(e: String): String =
    s"round(CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE) * 10000) / 10000"

  val seasonAnalogSql: String =
    "CASE (day(ts) % 4) WHEN 0 THEN 'winter' WHEN 1 THEN 'spring' WHEN 2 THEN 'summer' ELSE 'autumn' END"

  val seasonOfSql: String =
    """CASE WHEN month(o_orderdate) IN (12, 1, 2) THEN 'winter'
      |     WHEN month(o_orderdate) IN (3, 4, 5) THEN 'spring'
      |     WHEN month(o_orderdate) IN (6, 7, 8) THEN 'summer'
      |     ELSE 'autumn' END""".stripMargin
}
