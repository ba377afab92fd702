package graft

import org.scalatest.funsuite.AnyFunSuite

/** The calib-normalized cross-record sentinel (VERDICT r19 #4), under
  * synthetic calibration deltas: the r19 round's host drift (probes
  * 1.15–1.41 s vs the record day's 0.91–0.99 s) was adjudicated by
  * hand-reading calibration fields; these pins make the same judgment
  * mechanical — a slow host cannot flag a fleet of false regressions,
  * and a real regression cannot hide behind "host was slow" because
  * the drift credit is bounded by the measured probes and capped. */
class BenchSentinelSpec extends AnyFunSuite {

  test("calibScale: identical hosts → 1.0; missing probes on either side → 1.0") {
    assert(Bench.calibScale(Seq(0.95), Seq(0.95)) == 1.0)
    assert(Bench.calibScale(Seq.empty, Seq(1.2)) == 1.0)
    assert(Bench.calibScale(Seq(0.9), Seq.empty) == 1.0)
    assert(Bench.calibScale(Seq(-1.0), Seq(1.2)) == 1.0, "invalid (-1) probes filtered")
  }

  test("calibScale: min-of-probes on both sides (least-loaded moment), slower host scales up") {
    // the r19 drift, verbatim: record day 0.91–0.99, leg day 1.15–1.41
    val s = Bench.calibScale(Seq(0.91, 0.99), Seq(1.15, 1.41))
    assert(math.abs(s - 1.15 / 0.91) < 1e-9, s"expected min/min, got $s")
  }

  test("calibScale tolerance: floor 1.0 (a FASTER host must not inflate warms into flags)") {
    assert(Bench.calibScale(Seq(1.4), Seq(0.9)) == 1.0)
  }

  test("calibScale tolerance: cap 3.0 (drift credit is bounded)") {
    assert(Bench.calibScale(Seq(0.5), Seq(5.0)) == 3.0)
  }

  test("regressedVsPrior: a uniform host slowdown does not flag (the r19 false-positive mode)") {
    // prior warm 1.0 s; today reads 1.35 s on a 1.4× slower host —
    // raw ratio 1.35 is under threshold anyway, but push it: a 2.8×
    // raw reading on a 1.4× slower host normalizes to 2.0× → clean
    assert(!Bench.regressedVsPrior(warm = 2.8, priorWarm = 1.0, scale = 1.4))
    // the same 2.8× on an equal-speed host flags
    assert(Bench.regressedVsPrior(warm = 2.8, priorWarm = 1.0, scale = 1.0))
  }

  test("regressedVsPrior: a real regression cannot hide behind the cap") {
    // 10× regression, host 10× slower by probe — scale caps at 3.0,
    // normalized 3.33× > 2.5× → still flags
    val scale = Bench.calibScale(Seq(1.0), Seq(10.0))
    assert(scale == 3.0)
    assert(Bench.regressedVsPrior(warm = 10.0, priorWarm = 1.0, scale = scale))
  }

  test("regressedVsPrior: threshold is 2.5× on the normalized value") {
    assert(!Bench.regressedVsPrior(warm = 2.4, priorWarm = 1.0, scale = 1.0))
    assert(Bench.regressedVsPrior(warm = 2.6, priorWarm = 1.0, scale = 1.0))
    assert(!Bench.regressedVsPrior(warm = 7.2, priorWarm = 1.0, scale = 3.0))
  }
}
