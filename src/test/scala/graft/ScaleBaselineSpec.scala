package graft

import org.scalatest.funsuite.AnyFunSuite

/** The 100x scale rehearsal gets a GATE, not just a narrative: the r15
  * sf10 medians are recorded as `BASELINE_sf10.json`, and every `sbt
  * test` runs the sentinel-normalized comparison of the current
  * `bench_sf10.json` against it (`tools/compare_bench.py --gate` —
  * breach = any common row beyond 3x normalized AND +1 s, or the
  * common-row total beyond 1.5x normalized). Before this, the sf0.1
  * 2x-of-r1 bar was the only binding perf gate and 100x regressions
  * lived in round narratives only.
  *
  * FAILS (not cancels) when either artifact is missing: an `assume`
  * here made the gate inert for a whole round — the baseline was never
  * recorded and every run silently cancelled while a 4.5x sf10
  * regression shipped through the gap. Only the python-toolchain check
  * stays environmental. Re-record the baseline (copy bench_sf10.json
  * over BASELINE_sf10.json) when rows are ADDED or an adjudicated host
  * shift makes the old numbers incomparable; the gate prints uncovered
  * rows so additions are visible, never silently ungated. */
class ScaleBaselineSpec extends AnyFunSuite {

  test("bench_sf10.json stays within the recorded scale baseline") {
    assert(new java.io.File("BASELINE_sf10.json").exists(),
      "BASELINE_sf10.json missing — record it (cp bench_sf10.json " +
        "BASELINE_sf10.json after a full sf10 run); the scale gate must " +
        "never be silently inert")
    assert(new java.io.File("bench_sf10.json").exists(),
      "bench_sf10.json missing — run the sf10 rehearsal bench")
    val havePy =
      try new ProcessBuilder("python3", "-c", "import json").start().waitFor() == 0
      catch { case _: java.io.IOException => false }
    assume(havePy, "python3 not present")
    val p = new ProcessBuilder("python3", "tools/compare_bench.py",
      "--gate", "bench_sf10.json", "BASELINE_sf10.json")
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    assert(code == 0, s"sf10 scale gate breached:\n$out")
  }
}
