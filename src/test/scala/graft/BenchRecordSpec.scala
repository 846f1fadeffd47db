package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record-routing rules (Bench.recordTarget) — pure logic, no
  * Spark session: the r9 overwrite hazard (lower-trials runs must not
  * clobber the 3-trial record), the r11 reclaim rule (a stale
  * non-default-sf record must not exile the canonical sf forever), and
  * per-sf side-file naming.
  */
class BenchRecordSpec extends AnyFunSuite {

  private def rec(sf: String, trials: Int): Some[String] =
    Some(s"""{"metric":"total","value":1.0,"trials":$trials,"sf":"$sf"}""")

  private val Default = Bench.DefaultSfDir
  private val Sf10 = "/root/repo/testdata_sf10"

  test("no existing record: any run owns bench_latest.json") {
    assert(Bench.recordTarget(None, Default, 1) === "bench_latest.json")
    assert(Bench.recordTarget(None, Sf10, 1) === "bench_latest.json")
  }

  test("same sf: >= trials replaces, fewer trials diverts to bench_single") {
    assert(Bench.recordTarget(rec(Default, 3), Default, 3) === "bench_latest.json")
    assert(Bench.recordTarget(rec(Default, 1), Default, 3) === "bench_latest.json")
    // the r9 hazard: a driver single-trial run must not clobber 3 trials
    assert(Bench.recordTarget(rec(Default, 3), Default, 1) === "bench_single.json")
  }

  test("different sf: scale sweeps land in their per-sf side file") {
    assert(Bench.recordTarget(rec(Default, 3), Sf10, 1) === "bench_testdata_sf10.json")
    assert(Bench.sfRecordFile("/x/y/weird dir!") === "bench_weird_dir_.json")
  }

  test("r11 reclaim: a stale non-default-sf record yields to a default-sf run") {
    // without the rule this returned the sf0.1 side file forever and
    // bench_latest.json stayed stale at the wrong sf
    assert(Bench.recordTarget(rec(Sf10, 1), Default, 1) === "bench_latest.json")
    assert(Bench.recordTarget(rec(Sf10, 3), Default, 1) === "bench_latest.json")
  }

  test("record field parsing: sf and trials, with the trials=1 default") {
    val txt = rec(Sf10, 3).get
    assert(Bench.recordSf(txt) === Some(Sf10))
    assert(Bench.recordTrials(txt) === 3)
    assert(Bench.recordTrials("""{"metric":"total","sf":"x"}""") === 1)
    assert(Bench.recordSf("""{"metric":"total"}""") === None)
  }

  private def recCal(sf: String, trials: Int, total: Double,
                     calib: Double): Some[String] =
    Some(s"""{"metric":"total","value":$total,"trials":$trials,""" +
      s""""calib":$calib,"sf":"$sf"}""")

  test("r12 load guard: a load-inflated same-sf run diverts to " +
      "bench_single instead of clobbering the quiet-machine record") {
    val quiet = recCal(Default, 3, 150.0, 1.0)
    // slow machine (calib 1.4x), slower total: demoted
    assert(Bench.recordTarget(quiet, Default, 3, total = 190.0,
      calib = 1.4) === "bench_single.json")
    // comparable machine, slower total: REAL regression, takes the record
    assert(Bench.recordTarget(quiet, Default, 3, total = 190.0,
      calib = 1.05) === "bench_latest.json")
    // slow machine but total IMPROVED anyway: takes the record
    assert(Bench.recordTarget(quiet, Default, 3, total = 140.0,
      calib = 1.4) === "bench_latest.json")
    // records predating the calib field never demote
    assert(Bench.recordTarget(rec(Default, 3), Default, 3, total = 190.0,
      calib = 9.9) === "bench_latest.json")
  }

  test("calib/total parsing") {
    val txt = recCal(Default, 3, 153.4, 1.23).get
    assert(Bench.recordCalib(txt) === Some(1.23))
    assert(Bench.recordTotal(txt) === Some(153.4))
    assert(Bench.recordCalib(rec(Default, 3).get) === None)
    assert(Bench.loadInflated(txt, total = 200.0, calib = 1.6))
    assert(!Bench.loadInflated(txt, total = 200.0, calib = 1.3))
    assert(!Bench.loadInflated(txt, total = 150.0, calib = 1.6))
  }

  test("calibrate returns a sane positive duration") {
    val c = Bench.calibrate()
    assert(c > 0.0 && c < 60.0, s"calibration out of range: $c")
  }
}
