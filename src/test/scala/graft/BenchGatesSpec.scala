package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's poison detectors and certification gates, pinned
  * against the EXACT historical artifact shapes that broke each rule —
  * three rounds of contaminated or over-flagged artifacts (r14 under-flag,
  * r15 over-flag, r17 certified-looking poison) each traced to a threshold
  * judgment call that had no test. Pure functions, no Spark session. */
class BenchGatesSpec extends AnyFunSuite {

  // ---- spread flag (r17 ask #1a) ----

  test("r17 store_morelike shape FLAGS: min 3.83, a non-first run at " +
       "66.8 — the 17x band the probe-based detector missed") {
    assert(BenchGates.spreadFlagged(minAll = 3.83, maxAfterFirst = 66.79))
  }

  test("fixture-first-run shape does NOT flag: r18 store_close ran " +
       "10.49 s first (close/reopen fixture build) then 0.62/0.64 — the " +
       "band EXCLUDING the first run is tight, the published min is a " +
       "quiet-window number") {
    // maxAfterFirst is the max over runs 2..n only
    assert(!BenchGates.spreadFlagged(minAll = 0.622, maxAfterFirst = 0.64))
  }

  test("small absolute wobble does not flag even past 3x: sub-0.5 s " +
       "deltas are scheduler noise on sub-second queries") {
    assert(!BenchGates.spreadFlagged(minAll = 0.10, maxAfterFirst = 0.45))
  }

  // ---- probe flag (relative + absolute) ----

  test("whole-run burst past the quiet-era ceiling FLAGS even when the " +
       "in-run median moved with it (the r17 blind spot: every probe " +
       "0.29-0.55 looked 'relatively' quiet)") {
    // probe 0.80 vs median 0.45: relative rule misses (0.80 < 0.90),
    // absolute ceiling catches
    assert(BenchGates.isLoaded(probe = 0.80, medianCal = 0.45))
  }

  test("quiet-host JIT-cold early probe does NOT flag under the median " +
       "reference (the r15 over-flag: a min-floor reference retro-" +
       "flagged 20 queries on a run whose worst probe was 0.61)") {
    assert(!BenchGates.isLoaded(probe = 0.61, medianCal = 0.32))
  }

  test("neighborhood burst FLAGS relative to the median: a 1.1 s probe " +
       "in a 0.3 s-median sweep") {
    assert(BenchGates.isLoaded(probe = 1.1, medianCal = 0.3))
  }

  // ---- retry bracket (strict floor, asymmetric on purpose) ----

  test("a probe a warmed floor would call loaded stays loaded for " +
       "bracket acceptance even where the median rule would pass it: " +
       "floor 0.15, probe 0.5 — accepting here would clear a flag on a " +
       "still-poisoned number") {
    assert(BenchGates.bracketLoaded(probe = 0.5, floor = 0.15))
    // the same probe against the sweep median is NOT flagged — the
    // asymmetry is the point
    assert(!BenchGates.isLoaded(probe = 0.5, medianCal = 0.3))
  }

  test("a genuinely quiet retry bracket passes: floor 0.15, probe 0.25") {
    assert(!BenchGates.bracketLoaded(probe = 0.25, floor = 0.15))
  }

  // ---- certification (r17 ask #1c) ----

  test("the poisoned r17 official artifact is NOT certified: launch " +
       "load 7.38 on 32 cpus") {
    val (loadOk, calOk, certified) =
      BenchGates.certify(launchLoad = 7.38, hostCpus = 32,
        sweepCalMax = 0.553, clean = true)
    assert(!loadOk && calOk && !certified)
  }

  test("the r18 quiet run IS certified: load 1.50/32, cal max 0.421, " +
       "clean") {
    assert(BenchGates.certify(1.50, 32, 0.421, clean = true)._3)
  }

  test("the r17 quiet 57.22 s run would have been certified: load " +
       "3.55/32, cal max ~0.43") {
    assert(BenchGates.certify(3.55, 32, 0.43, clean = true)._3)
  }

  test("a calibration probe past the ceiling blocks certification even " +
       "at low launch load (burst arrived mid-run)") {
    val (loadOk, calOk, certified) =
      BenchGates.certify(1.2, 32, sweepCalMax = 0.9, clean = true)
    assert(loadOk && !calOk && !certified)
  }

  test("still-poisoned queries or errors block certification " +
       "regardless of load and calibration") {
    assert(!BenchGates.certify(1.2, 32, 0.3, clean = false)._3)
  }

  test("a platform that cannot report load (negative) is unknown, not " +
       "a failure") {
    assert(BenchGates.certify(-1.0, 32, 0.3, clean = true)._3)
  }
}
