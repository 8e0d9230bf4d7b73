package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's window-certification logic (round-14 hardening).
  *
  * BENCH_r13.json recorded a 137 s total captured at loadavg 8.33 while
  * probe_ratio read 1.0015 — the contention was active at launch and
  * finished before the (edge-only) probe comparison could see it, so the
  * trust signal silently failed and the recorded number hallucinated a
  * 1.6x fleet-wide change for anyone diffing rounds. These specs pin the
  * gate on exactly that incident plus the mid-run-arrival case the load
  * gate cannot see, and prove the refusal path end to end on a real
  * contended CPU (synthetic busy-loop).
  */
class BenchWindowSpec extends AnyFunSuite with SparkSpec {

  // --- probeRatio -------------------------------------------------------

  test("monotone-decreasing probes (warming JVM) do not flag") {
    // measured on a provably idle box: 0.14/0.07/0.05 — the first probe
    // is reliably slowest even after off-the-clock warmup
    assert(math.abs(Bench.probeRatio(Seq(0.14, 0.07, 0.05)) - 1.0) < 1e-12)
    val (clean, _) = Bench.windowVerdict(0.5, Seq(0.14, 0.07, 0.05), 2.0, 1.5)
    assert(clean)
  }

  test("a SUSTAINED mid-run slowdown flags even when the edges look clean") {
    // competitor arrives after pass 1 starts and persists across
    // several probe gaps: edge probes read fast, only the interleaved
    // series can see it
    val probes = Seq(0.10, 0.07, 0.07, 0.21, 0.24, 0.22, 0.07, 0.07)
    assert(Bench.probeRatio(probes) > 2.0)
    val (clean, reasons) = Bench.windowVerdict(0.5, probes, 2.0, 1.5)
    assert(!clean)
    assert(reasons.exists(_.contains("probe_ratio")))
  }

  test("an ISOLATED single-probe blip is absorbed (min-of-2 covers it)") {
    // one slow probe between fast neighbors = cold-pass codegen/GC
    // churn (measured 0.1841 between 0.1161 and 0.0762 mid-warmup);
    // a transient confined to one probe gap cannot corrupt the
    // NON-ADJACENT min-of-2 totals, so refusing the window over it
    // throws away a good recording
    val probes = Seq(0.1678, 0.0992, 0.1437, 0.0875, 0.1160, 0.1161,
      0.1841, 0.0762, 0.0674, 0.0783, 0.0668, 0.0879, 0.0736)
    assert(Bench.probeRatio(probes) < 1.5,
      s"isolated blip misread as contamination: ${Bench.probeRatio(probes)}")
  }

  test("the r13 incident is refused by the load gate") {
    // exact shape of the failure: flat probes (ratio 1.0015), busy box
    // at launch (loadavg 8.33) — the old gate (load > 16) passed it
    val probes = Seq(0.1940, 0.0927, 0.0929)
    assert(Bench.probeRatio(probes) < 1.01)
    val (clean, reasons) = Bench.windowVerdict(8.3306, probes, 2.0, 1.5)
    assert(!clean)
    assert(reasons.exists(_.contains("load_avg_start")))
  }

  test("unreadable loadavg (-1) is signal-absent, not dirty") {
    val (clean, _) = Bench.windowVerdict(-1.0, Seq(0.1, 0.09, 0.09), 2.0, 1.5)
    assert(clean)
  }

  test("one lucky-fast probe must not poison the baseline (measured false positive)") {
    // the r14 first recording attempt: steady ~0.065-0.09s probes with
    // a single 0.0497s scheduling-luck dip; the old running-min bar
    // then read an ordinary 0.0738s probe as 1.48x "contamination" and
    // refused a window whose per-query times were uniform
    val probes = Seq(0.2223, 0.1223, 0.0832, 0.0809, 0.0870, 0.0923,
      0.0710, 0.0686, 0.0725, 0.0698, 0.0584, 0.0672, 0.0497, 0.0563,
      0.0738, 0.0676, 0.0591)
    assert(Bench.probeRatio(probes) < 1.5,
      s"jitter band misread as contamination: ${Bench.probeRatio(probes)}")
    val (clean, _) = Bench.windowVerdict(0.7, probes, 2.0, 1.5)
    assert(clean)
  }

  test("fewer than three probes never divides by zero or flags") {
    assert(Bench.probeRatio(Nil) === 1.0)
    assert(Bench.probeRatio(Seq(0.1)) === 1.0)
    assert(Bench.probeRatio(Seq(0.1, 0.5)) === 1.0)
  }

  // --- cleanMedians / rerunCandidates ------------------------------------

  private def histLine(
      qs: Map[String, Double],
      probe: Double = 1.02,
      hot: Boolean = false,
      windowClean: Option[Boolean] = None): String = {
    val qj = qs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val wc = windowClean.map(b => s""","window_clean":$b""").getOrElse("")
    s"""{"ts":"2026-08-16T00:00:00Z","queries":$qj,"probe_ratio":$probe,"hot_run":$hot$wc}"""
  }

  test("cleanMedians ignores dirty, hot, refused, and few-query lines") {
    val full = (1 to 250).map(i => s"q$i" -> 0.1).toMap
    val lines = Seq(
      histLine(full + ("q1" -> 0.10)),                          // clean
      histLine(full + ("q1" -> 0.20)),                          // clean
      histLine(full + ("q1" -> 0.30)),                          // clean
      histLine(full + ("q1" -> 9.99), probe = 1.30),            // dirty probe
      histLine(full + ("q1" -> 9.99), hot = true),              // hot flag
      histLine(full + ("q1" -> 9.99), windowClean = Some(false)), // refused
      histLine(Map("q1" -> 9.99)),                              // single-query probe run
      "not json at all"                                          // corrupt line
    )
    val med = Bench.cleanMedians(lines, minQueries = 200)
    assert(math.abs(med("q1") - 0.20) < 1e-12) // median of the three clean lines
    assert(math.abs(med("q2") - 0.1) < 1e-12)
  }

  test("cleanMedians takes even-count medians as the midpoint") {
    val full = (1 to 250).map(i => s"q$i" -> 1.0).toMap
    val lines = Seq(histLine(full + ("q1" -> 0.1)), histLine(full + ("q1" -> 0.3)))
    assert(math.abs(Bench.cleanMedians(lines, 200)("q1") - 0.2) < 1e-12)
  }

  test("rerunCandidates flags >1.5x-median queries, skips errors and unknowns") {
    val med = Map("q1" -> 0.2, "q2" -> 0.2, "q3" -> 0.2)
    val now = Seq(
      "q1" -> 0.31,  // 1.55x -> flagged
      "q2" -> 0.29,  // 1.45x -> not flagged
      "q3" -> -1.0,  // errored -> never rerun
      "q4" -> 99.0)  // no history -> no basis to flag
    assert(Bench.rerunCandidates(now, med, 1.5, cap = 20) === Seq("q1"))
  }

  test("rerunCandidates honors the cap") {
    val med = (1 to 30).map(i => s"q$i" -> 0.1).toMap
    val now = (1 to 30).map(i => s"q$i" -> 1.0)
    assert(Bench.rerunCandidates(now, med, 1.5, cap = 5).size === 5)
  }

  // --- end-to-end: the interleaved probe sees a real busy-loop ------------

  test("synthetic busy-loop degrades the probe past the refusal threshold") {
    // the same fixed all-core work Bench probes with, on the shared
    // 4-thread test session; min-of-2 like the harness
    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 20000000L, 1L, 4).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def probe(): Double = math.min(probeOnce(), probeOnce())
    (1 to 6).foreach(_ => probeOnce()) // off-the-clock warmup, as in Bench
    val quiet = probe()
    // saturate every core the test JVM can see with spin loops
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val threads = (1 to Runtime.getRuntime.availableProcessors()).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop.get()) { x += 1; if (x == Long.MaxValue) x = 0 }
      })
      t.setDaemon(true); t.start(); t
    }
    try {
      // SUSTAINED contention: two consecutive busy probes (the smoothed
      // detector deliberately ignores a single-probe blip)
      val busy1 = probe()
      val busy2 = probe()
      val probes = Seq(quiet, busy1, busy2)
      val (clean, reasons) = Bench.windowVerdict(0.5, probes, 2.0, 1.5)
      assert(Bench.probeRatio(probes) > 1.5,
        s"busy probes $busy1/$busy2 vs quiet $quiet should exceed the 1.5 gate")
      assert(!clean && reasons.exists(_.contains("probe_ratio")))
    } finally {
      stop.set(true)
      threads.foreach(_.join(2000))
    }
  }

  // --- probe-normalized recording (round-15) ----------------------------

  private def historyLine(probe: Double, n: Int = 200,
      clean: Boolean = true, ratio: Double = 1.0): String = {
    val qs = (1 to n).map(i => s""""q$i":0.1""").mkString("{", ",", "}")
    s"""{"queries":$qs,"probe_secs":[$probe,$probe,$probe],""" +
      s""""probe_ratio":$ratio,"hot_run":false,"window_clean":$clean,""" +
      s""""value":100.0}"""
  }

  test("cleanProbeRef: median of clean full-registry lines' probe medians") {
    assert(Bench.cleanProbeRef(
      Seq(historyLine(0.06), historyLine(0.10)), 200).contains(0.08))
    // refused windows, high-ratio lines and few-query probes are excluded
    assert(Bench.cleanProbeRef(
      Seq(historyLine(0.50, clean = false), historyLine(0.06)), 200)
      .contains(0.06))
    assert(Bench.cleanProbeRef(
      Seq(historyLine(0.50, ratio = 1.4), historyLine(0.06)), 200)
      .contains(0.06))
    assert(Bench.cleanProbeRef(Seq(historyLine(0.50, n = 10)), 200).isEmpty)
    assert(Bench.cleanProbeRef(Seq("not json", ""), 200).isEmpty)
  }

  test("a refused window's JSON names the certified fallback") {
    // round-16 (VERDICT r15 "what's wrong" #2): BENCH_r15.json recorded
    // only a refusal; the certified number lived in bench_history alone.
    // lastCertifiedJson is what a refused emission embeds — it must pick
    // the NEWEST certified full-registry line and skip refused / hot /
    // few-query / corrupt lines.
    def certLine(ts: String, value: Double, norm: Double, n: Int = 250,
        clean: Boolean = true, hot: Boolean = false): String = {
      val qs = (1 to n).map(i => s""""q$i":0.1""").mkString("{", ",", "}")
      s"""{"ts":"$ts","queries":$qs,"hot_run":$hot,"window_clean":$clean,""" +
        s""""value_norm":$norm,"value":$value}"""
    }
    val lines = Seq(
      certLine("2026-08-15T10:00:00Z", 90.0, 91.0),     // older certified
      certLine("2026-08-16T19:30:00Z", 94.27, 96.5),    // newest certified
      certLine("2026-08-16T22:00:00Z", 70.0, 70.0, n = 10), // probe run
      certLine("2026-08-16T23:00:00Z", 127.0, 113.0, clean = false), // refused
      certLine("2026-08-16T23:30:00Z", 80.0, 80.0, hot = true), // hot
      "corrupt { line")
    val j = Bench.lastCertifiedJson(lines, minQueries = 200)
    assert(j.nonEmpty)
    assert(j.get.contains(""""ts":"2026-08-16T19:30:00Z""""),
      s"must pick the newest certified line, got $j")
    assert(j.get.contains(""""value":94.27"""))
    assert(j.get.contains(""""value_norm":96.5"""))
    assert(j.get.contains(""""n":250"""))
    // no certified history at all: no fallback, not a crash
    assert(Bench.lastCertifiedJson(
      Seq(certLine("t", 1.0, 1.0, clean = false), "junk"), 200).isEmpty)
  }

  test("value_norm is suppressed (null) on a refused window") {
    // round-16 (VERDICT r15 "what's wrong" #3): dampened normalization
    // assumes a UNIFORMLY slow box; a mid-run capacity shift — what a
    // refusal detects — violates that, so the number must not be emitted
    assert(Bench.valueNormJson(windowClean = false, 113.89) == "null")
    assert(Bench.valueNormJson(windowClean = true, 96.5004) == "96.5004")
  }

  test("dampened normalization reconciles the r14 same-code pair") {
    // the measured pair that motivated value_norm: same code, 87.96 s at
    // probe-median 0.0642 vs 96.04 s at 0.0982. With elasticity 0.21 the
    // two normalize to the same total (within 1%) REGARDLESS of the
    // shared reference; a linear model (elasticity 1.0) would spread
    // them 40% apart in the opposite direction.
    def norm(value: Double, pm: Double, e: Double) =
      value / math.pow(pm / 0.08, e)
    val dampened = norm(96.04, 0.0982, 0.21) / norm(87.96, 0.0642, 0.21)
    assert(math.abs(dampened - 1.0) < 0.01, s"dampened ratio $dampened")
    val linear = norm(96.04, 0.0982, 1.0) / norm(87.96, 0.0642, 1.0)
    assert(linear < 0.75, s"linear would overcorrect: $linear")
  }
}
