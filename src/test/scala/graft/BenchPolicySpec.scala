package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench re-run policy's two strong suspicion predicates
  * (Bench.runsDisagree / Bench.runDrifted). The thresholds are part of
  * the measurement contract the judge certifies against — a silent
  * loosening (e.g. back to the pre-r10 2× drift trigger that waved
  * through m06's 1.37× and d11's 1.31× drift) must fail a test, not
  * slip into an artifact. */
class BenchPolicySpec extends AnyFunSuite {

  test("runsDisagree: >3x cold/warm split or a failed run is suspect") {
    assert(!Bench.runsDisagree(Some(1.0), Some(2.9)))
    assert(!Bench.runsDisagree(Some(2.9), Some(1.0))) // symmetric
    assert(Bench.runsDisagree(Some(1.0), Some(3.1)))
    assert(Bench.runsDisagree(None, Some(1.0))) // failed cold
    assert(Bench.runsDisagree(Some(1.0), None)) // failed warm
    assert(Bench.runsDisagree(None, None))
  }

  test("runDrifted: best > 1.3x the prior snapshot's min is suspect") {
    assert(!Bench.runDrifted(Some(1.29), Some(1.0)))
    assert(Bench.runDrifted(Some(1.31), Some(1.0)))
    // the two r9 drifts the 2x trigger missed must now fire
    assert(Bench.runDrifted(Some(1.136), Some(0.832))) // m06 r9 vs r8
    assert(Bench.runDrifted(Some(1.332), Some(1.017))) // d11 r9 vs r8
    // no prior (first round / new query) or no successful run: not drift
    assert(!Bench.runDrifted(Some(5.0), None))
    assert(!Bench.runDrifted(None, Some(1.0)))
  }

  test("isHot: defer/flag above 0.25x CPUs (r11's polluted round fires, " +
      "the bench's own decay tail does not)") {
    val t = Bench.hotThreshold
    assert(t == 0.25 * Runtime.getRuntime.availableProcessors())
    assert(!Bench.isHot(t)) // boundary: exactly at threshold is calm
    assert(Bench.isHot(t + 0.01))
    // on the 32-CPU bench box (threshold 8): the r11 artifact's
    // poisoned measurements (load_before 11-20) must all defer, the
    // quiet ones (~3.5) and the bench's own decay tail (r9 median ~7)
    // must not — the policy targets external spikes, not self-load
    if (Runtime.getRuntime.availableProcessors() == 32) {
      Seq(11.7, 15.9, 18.2, 20.0).foreach(l => assert(Bench.isHot(l)))
      Seq(3.5, 3.7, 7.1).foreach(l => assert(!Bench.isHot(l)))
    }
  }

  test("isContended: a run bracketed by a hot load sample on EITHER side " +
      "is flagged (r15 verdict item 7 — d13's 34.7s extra2 spike must be " +
      "attributable from its own run row)") {
    val t = Bench.hotThreshold
    assert(!Bench.isContended(t, t)) // calm on both sides
    assert(Bench.isContended(t + 0.01, 0.0)) // hot at start only
    assert(Bench.isContended(0.0, t + 0.01)) // hot at end only (the d13 shape)
    assert(Bench.isContended(t + 1, t + 1))
    // on the 32-CPU bench box: d13's extra2 ran calm-in (1.89) but the
    // spike registered by suite end (14.4) — the marker must catch a
    // run whose interference arrives mid-measurement
    if (Runtime.getRuntime.availableProcessors() == 32) {
      assert(Bench.isContended(1.89, 14.4))
      assert(!Bench.isContended(3.5, 7.1))
    }
  }

  test("EnvMeta load stamp: /proc/loadavg horizons parse and the quota probe never throws") {
    // the r15 drift-attribution fields (r14 verdict item 5): on this
    // Linux box all three horizons must come from /proc/loadavg
    // (non-negative reals), and the cgroup quota probe must return a
    // positive core count or the documented -1 unbounded/unknown
    // sentinel — never raise
    val (l1, l5, l15) = EnvMeta.loadAvg3
    assert(l1 >= 0.0, s"1-min loadavg unreadable: $l1")
    if (java.nio.file.Files.exists(java.nio.file.Paths.get("/proc/loadavg"))) {
      assert(l5 >= 0.0 && l15 >= 0.0, s"horizons missing: $l5 / $l15")
    }
    val q = EnvMeta.cgroupCpuQuota
    assert(q == -1.0 || q > 0.0, s"quota must be positive or -1: $q")
  }
}
