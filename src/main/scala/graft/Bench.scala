package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. Each query is timed twice
  * and the minimum is reported — first execution pays one-time codegen /
  * JIT / file-listing costs that say nothing about the plan's quality;
  * min-of-2 measures steady state while keeping the run short.
  *
  * The two repeats are NON-ADJACENT: the whole registry runs as pass 1,
  * then again as pass 2, and the per-query min is taken across passes.
  * Adjacent repeats share a contamination window — a transient competitor
  * that lands on the box inflates both executions of the same query and
  * the min preserves the inflation (the round-10 recording carried three
  * 4–7x-inflated rows that way). Separated by the full registry (~40 s at
  * sf0.1), the same competitor must persist across both passes to survive
  * the min.
  *
  * == Window certification (round-14) ==
  * BENCH_r13.json recorded 137 s from a box at loadavg 8.33 while
  * probe_ratio read 1.0015 — the contention was active at LAUNCH and gone
  * by the first probe comparison, so the edge-probe trust signal silently
  * failed. The harness now refuses to certify such a window:
  *   - `load_avg_start` must be ≤ SPARK_GRAFT_BENCH_MAX_LOAD (default 2.0
  *     on a 32-core box) — catches busy-at-launch, the r13 failure mode;
  *   - probes are interleaved DURING each pass (every PROBE_EVERY
  *     queries), not just at the edges — a competitor that arrives and
  *     leaves mid-pass is now visible as a slow mid-pass probe;
  *   - probe_ratio over the full interleaved sequence must be ≤
  *     SPARK_GRAFT_BENCH_MAX_PROBE (default 1.5: quiet-box probe jitter
  *     vs the robust baseline measures ≤ ~1.3; a competitor stealing
  *     half the cores reads ≥ 2).
  * On violation the JSON line carries `window_clean:false` plus the
  * human-readable reasons, NOTHING is appended to bench_history.jsonl
  * (a contaminated number recorded as truth reads as a real regression
  * next round), and the process exits nonzero.
  *
  * == Outlier re-measurement (round-14) ==
  * A single pass can still carry per-query noise (q38 read 0.55 s in one
  * r13 pass and 0.23 s in the adjacent one). After pass 2, any query
  * whose min-of-2 exceeds 1.5x its bench_history CLEAN median is re-run
  * once more and the overall min recorded; the pre-rerun time and the
  * rerun time both ride along in the JSON's `reruns` map so the line is
  * self-describing about what was re-measured.
  */
object Bench {
  /** 1-minute system load average (−1.0 where the JVM can't read it). */
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  /** Contamination ratio over an interleaved probe sequence: the worst
    * SUSTAINED level shift against the capacity the machine had already
    * demonstrated. Three robustness rules, each from a measured false
    * positive on this box:
    *  - one-directional (later probes vs earlier baseline): a warming
    *    JVM is monotone-decreasing (measured 0.14/0.07/0.05 on a
    *    provably idle box) and reads 1.0, never a flag;
    *  - the baseline is the THIRD-smallest prior probe, not the running
    *    min: one lucky scheduling window (a 0.0497 s probe in a
    *    ~0.065 s steady series) would otherwise permanently lower the
    *    bar and make ordinary ±30% jitter read as 1.48x;
    *  - the tested value is the MEDIAN-OF-3 around each probe, not the
    *    raw probe: pass 1 runs every query cold, and its codegen/GC
    *    churn produces isolated 2x probe blips (measured 0.1841 between
    *    0.1161 and 0.0762 mid-warmup) that the non-adjacent min-of-2
    *    pass design absorbs by construction — only a competitor that
    *    PERSISTS across neighboring probes (≥ ~2 probe gaps ≈ 48
    *    queries) can corrupt a min-of-2 total, and that is exactly what
    *    survives the smoothing. The final probe is smoothed with its
    *    predecessor (min), since it has no successor; a tail competitor
    *    spans the post-pass and final probes and still flags.
    * Real contention is far outside the smoothed jitter band: a
    * competitor stealing half the cores doubles consecutive probes.
    */
  def probeRatio(probes: Seq[Double]): Double =
    if (probes.size < 3) 1.0
    else {
      var worst = 1.0
      val n = probes.size
      for (i <- 1 until n) {
        val smoothed =
          if (i == n - 1) math.min(probes(i), probes(i - 1))
          else Seq(probes(i - 1), probes(i), probes(i + 1)).sorted.apply(1)
        val prior = probes.take(i).sorted
        val baseline = prior(math.min(2, prior.size - 1))
        worst = math.max(worst, smoothed / baseline)
      }
      worst
    }

  /** The window gate, pure so the refusal logic is spec-able without a
    * SparkSession. Returns (clean, reasons). `loadStart` ≤ 0 means the
    * JVM couldn't read loadavg — that is NOT treated as dirty (the
    * signal is absent, not adverse); the probe detector still applies.
    */
  def windowVerdict(
      loadStart: Double,
      probes: Seq[Double],
      maxLoad: Double,
      maxProbeRatio: Double): (Boolean, Seq[String]) = {
    val reasons = scala.collection.mutable.ArrayBuffer[String]()
    if (loadStart > maxLoad)
      reasons += f"load_avg_start $loadStart%.2f > $maxLoad%.2f (box busy at launch)"
    val ratio = probeRatio(probes)
    if (ratio > maxProbeRatio)
      reasons += f"probe_ratio $ratio%.3f > $maxProbeRatio%.2f (capacity degraded mid-run)"
    (reasons.isEmpty, reasons.toSeq)
  }

  /** Per-query medians from bench_history.jsonl CLEAN full-registry
    * lines. Clean = probe_ratio ≤ 1.05 AND not hot AND (if the line
    * carries the round-14 flag) window_clean — the repo's trust
    * protocol. Full-registry = ≥ minQueries rows: fresh-JVM few-query
    * probes read HIGH (underwarmed) and would bias medians upward.
    * Unreadable lines are skipped, never fatal — history is advisory.
    */
  def cleanMedians(lines: Seq[String], minQueries: Int): Map[String, Double] = {
    val perQuery = scala.collection.mutable.HashMap[String, scala.collection.mutable.ArrayBuffer[Double]]()
    lines.foreach { line =>
      try {
        val o = common.Json.obj(common.Json.parse(line))
        val probeOk = o.get("probe_ratio").forall {
          case d: Double => d <= 1.05
          case _ => true
        }
        val hotOk = o.get("hot_run").forall { case b: Boolean => !b; case _ => true }
        val cleanOk = o.get("window_clean").forall { case b: Boolean => b; case _ => true }
        val qs = o.get("queries").map(common.Json.obj).getOrElse(Map.empty)
        if (probeOk && hotOk && cleanOk && qs.size >= minQueries)
          qs.foreach {
            case (name, t: Double) if t >= 0 =>
              perQuery.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer[Double]()) += t
            case _ => ()
          }
      } catch { case _: Exception => () }
    }
    perQuery.map { case (name, ts) =>
      val sorted = ts.sorted
      val n = sorted.size
      val med =
        if (n % 2 == 1) sorted(n / 2)
        else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
      name -> med
    }.toMap
  }

  /** The box's demonstrated steady probe time: the median across CLEAN
    * history lines of each line's median probe (round-15). The probe
    * workload is FIXED (sum over 50M ids at the same core count), so
    * its absolute seconds are a box-speed dial comparable across runs —
    * which is what `probe_ratio` (an in-run RELATIVE shift detector)
    * deliberately is not: a box uniformly 1.2x slow all run reads
    * probe_ratio ≈ 1.0 but probe_median 1.2x high. Dividing the total
    * by (probe_median / this reference) yields `value_norm`, the
    * quiet-box-equivalent total that makes cross-round diffs
    * machine-comparable without hand-adjudicating box speed (the r14
    * 96.04 s vs 87.96 s same-code confusion). None when history has no
    * clean full-registry line — value_norm then equals value.
    */
  def cleanProbeRef(lines: Seq[String], minQueries: Int): Option[Double] = {
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val perLine = lines.flatMap { line =>
      try {
        val o = common.Json.obj(common.Json.parse(line))
        val probeOk = o.get("probe_ratio").forall {
          case d: Double => d <= 1.05
          case _ => true
        }
        val hotOk = o.get("hot_run").forall { case b: Boolean => !b; case _ => true }
        val cleanOk = o.get("window_clean").forall { case b: Boolean => b; case _ => true }
        val qs = o.get("queries").map(common.Json.obj).getOrElse(Map.empty)
        val probes = o.get("probe_secs").map(common.Json.arr).getOrElse(Nil)
          .collect { case d: Double => d }
        if (probeOk && hotOk && cleanOk && qs.size >= minQueries &&
            probes.nonEmpty) Some(median(probes))
        else None
      } catch { case _: Exception => None }
    }
    if (perLine.isEmpty) None else Some(median(perLine))
  }

  /** JSON summary `{ts, value, value_norm, n}` of the NEWEST certified
    * full-registry history line (round-16). A refused window's emitted
    * line embeds this as `last_certified`, so a reader of BENCH_rN.json
    * alone — the driver's per-round artifact, which on a contaminated
    * box records the refusal — still lands on the trustworthy number
    * without digging through bench_history.jsonl (VERDICT r15: the r15
    * close itself was a refusal and the certified numbers lived only in
    * the history file). Certified = window_clean (or the pre-flag era),
    * not hot, full registry; newest first.
    */
  def lastCertifiedJson(lines: Seq[String], minQueries: Int): Option[String] = {
    def fmt(v: Double): String =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    lines.reverseIterator.flatMap { line =>
      try {
        val o = common.Json.obj(common.Json.parse(line))
        val hotOk = o.get("hot_run").forall { case b: Boolean => !b; case _ => true }
        val cleanOk = o.get("window_clean").forall { case b: Boolean => b; case _ => true }
        val qs = o.get("queries").map(common.Json.obj).getOrElse(Map.empty)
        val value = o.get("value").collect { case d: Double => d }
        if (hotOk && cleanOk && qs.size >= minQueries && value.nonEmpty) {
          val ts = o.get("ts").collect { case s: String => s }.getOrElse("")
          val vn = o.get("value_norm").collect { case d: Double => d }
          Some(s"""{"ts":"$ts","value":${fmt(value.get)},""" +
            vn.fold(""""value_norm":null""")(v => s""""value_norm":${fmt(v)}""") +
            s""","n":${qs.size}}""")
        } else None
      } catch { case _: Exception => None }
    }.nextOption()
  }

  /** The JSON value emitted for `value_norm`: the dampened probe
    * normalization assumes a UNIFORMLY slow box, and a refused window
    * (a mid-run capacity shift is exactly what probe_ratio detects)
    * violates that assumption — the number is not a quiet-box
    * equivalent and must not invite comparison, so it is suppressed to
    * null rather than emitted (VERDICT r15 "what's wrong" #3).
    */
  def valueNormJson(windowClean: Boolean, valueNorm: Double): String =
    if (!windowClean) "null"
    else BigDecimal(valueNorm)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

  /** Queries whose measured time exceeds `factor` x their clean-history
    * median — the candidates for a third measurement. Capped: a build
    * with a GENUINE fleet-wide regression should show it, not spend an
    * unbounded third pass hiding it; `cap` keeps the rerun budget to
    * noise-sized incident counts (r13's flagged set was 3 queries).
    */
  def rerunCandidates(
      results: Seq[(String, Double)],
      medians: Map[String, Double],
      factor: Double,
      cap: Int): Seq[String] =
    results.collect {
      case (name, t) if t >= 0 && medians.get(name).exists(m => m > 0 && t > factor * m) => name
    }.take(cap)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0").toDouble
    val maxProbe = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_PROBE", "1.5").toDouble
    val startedAt = java.time.Instant.now()
    // Settle-before-gate: 1-minute loadavg decays slowly, so a launch
    // right after a heavy (finished) step reads high without any live
    // competitor. Rather than refuse immediately, poll until the box
    // quiets (bounded); only a box that NEVER settles is refused. The
    // sample is taken BEFORE the Spark session and warmup probes exist
    // — our own 32-thread bursts inflate loadavg and would self-flag.
    val loadLaunch = loadAvg()
    val settleSecs = sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE_SECS", "300").toInt
    var loadStart = loadLaunch
    val settleDeadline = System.nanoTime() + settleSecs * 1000000000L
    while (loadStart > maxLoad && System.nanoTime() < settleDeadline) {
      System.err.println(f"[bench] load_avg $loadStart%.2f > $maxLoad%.2f - waiting for the box to settle")
      Thread.sleep(10000)
      loadStart = loadAvg()
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the whole-stage-codegen cache defaults to 100 entries; with a
      // 234-query registry run as two NON-ADJACENT passes (the round-11
      // contamination fix), the default thrashes completely and pass 2
      // recompiles every stage — measured as a uniform ~+0.15 s on every
      // query (74.8 s -> 98.5 s on the shared set). Static conf, so it
      // must be set before the session exists.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // let AQE size the materialized layout of cached plans (off by
      // default for output-partitioning stability, SPARK-34182): the
      // session-memoized graph/bipartite edge caches otherwise pin the
      // accidental partition count of their build plan — 64 near-empty
      // partitions at sf0.1, measured ~130 ms of fixed per-task cost on
      // EVERY warm scan (q140 warm: 261 tasks/22 CPU-s → 7 tasks/0.1).
      // Scale-independent: AQE coalesces by bytes, so at corpus scale
      // the cache materializes at the advisory partition size instead.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, cpus.toInt)
        .selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // min-of-2 per probe point, and a LONG off-the-clock warmup before
    // the first: the start probe runs on a cold JVM and C2 compilation
    // keeps shaving the probe for ~10 iterations (measured 0.20 s at 3
    // warmups vs 0.11 s steady) — an under-warmed start probe biases
    // the ratio toward a false hot flag
    def probe(): Double = math.min(probeOnce(), probeOnce())
    (1 to 10).foreach(_ => probeOnce())
    val probeLog = scala.collection.mutable.ArrayBuffer[Double]()
    // a probe that reads slow gets ONE immediate retry before it counts:
    // real contention persists across four back-to-back executions, a GC
    // pause or scheduler blip doesn't — without this, a single 50 ms
    // stall inside one probe would refuse an otherwise-clean 90 s window
    def gatedProbe(): Unit = {
      val p = probe()
      val confirmed =
        if (probeLog.nonEmpty && p > maxProbe * probeLog.min) math.min(p, probe())
        else p
      probeLog += confirmed
    }
    gatedProbe()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // a failed query reports -1, never a flattering time-to-throw; the
    // exception rides along in the JSON's `errors` map so a red row is
    // self-diagnosing from BENCH_rN.json alone (stderr is discarded by
    // the driver's tail-capture)
    def once(name: String, q: QueryDef): Double = {
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(160)
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    // optional comma-separated name filter for focused re-measurement
    // (bench-hygiene: re-timing one suspect query on a quiet box without
    // paying the full registry); the driver never sets it
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // Pass-state diagnostics (stderr, never the JSON line): GC time,
    // heap, pinned-RDD block count/bytes. Lets a drift investigation
    // see in ONE run whether per-pass overhead accumulates (pass 2
    // uniformly slower than pass 1 = in-process pressure, not plan).
    def diag(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      val gcs = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
      val gcMs = gcs.map(_.getCollectionTime).sum
      val gcN = gcs.map(_.getCollectionCount).sum
      val heap = java.lang.management.ManagementFactory
        .getMemoryMXBean.getHeapMemoryUsage
      val pinned = spark.sparkContext.getPersistentRDDs
      System.err.println(f"[bench-diag] $tag: gc=${gcN}x/${gcMs}ms " +
        f"heap=${heap.getUsed / (1 << 20)}MB/${heap.getMax / (1 << 20)}MB " +
        f"pinnedRdds=${pinned.size}")
    }
    val byName = SparkEntry.registry.toMap
    val active = SparkEntry.registry
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // interleaved probes: one every PROBE_EVERY queries inside each pass
    // (~12 mid-pass samples per pass at the 269-query registry), so a
    // competitor active only in the middle of a pass lands on a probe
    val probeEvery = math.max(1, sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_PROBE_EVERY", "24").toInt)
    def passWithProbes(f: ((String, QueryDef), Int) => (String, Double)): Seq[(String, Double)] =
      active.zipWithIndex.map { case (nq, i) =>
        if (i > 0 && i % probeEvery == 0) gatedProbe()
        f(nq, i)
      }
    diag("pre-pass1")
    val tPass1 = System.nanoTime()
    val pass1 = passWithProbes { case ((name, q), _) => name -> once(name, q) }
    System.err.println(f"[bench-diag] pass1 wall=${(System.nanoTime() - tPass1) / 1e9}%.1fs " +
      f"sum=${pass1.map(_._2).filter(_ >= 0).sum}%.1fs")
    diag("post-pass1")
    gatedProbe()
    val pass1ByName = pass1.toMap
    val tPass2 = System.nanoTime()
    val afterPass2 = passWithProbes { case ((name, q), _) =>
      val a = pass1ByName(name)
      val t =
        if (a < 0) a // errored in pass 1: don't pay a second failure
        else math.min(a, once(name, q))
      name -> t
    }
    System.err.println(f"[bench-diag] pass2 wall=${(System.nanoTime() - tPass2) / 1e9}%.1fs")
    diag("post-pass2")
    gatedProbe()
    // third measurement for history-flagged outliers: a query whose
    // min-of-2 still exceeds 1.5x its clean-history median is either a
    // real plan regression or two unlucky executions; one more run on
    // the SAME warmed JVM separates the two, and both numbers ride
    // along in the JSON so the adjudication is visible in the line
    val historyPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "bench_history.jsonl")
    val historyLines: Seq[String] =
      try {
        val p = java.nio.file.Paths.get(historyPath)
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.readAllLines(p).asScala.toSeq
        } else Nil
      } catch { case _: Exception => Nil }
    val medians: Map[String, Double] = cleanMedians(historyLines, minQueries = 200)
    val flagged = rerunCandidates(afterPass2, medians, factor = 1.5, cap = 20)
    val reruns = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val results = afterPass2.map { case (name, t) =>
      if (flagged.contains(name)) {
        val again = once(name, byName(name))
        reruns(name) = (t, again)
        System.err.println(
          f"[bench] outlier rerun $name: ${t}%.4fs vs clean median " +
            f"${medians(name)}%.4fs -> rerun ${again}%.4fs")
        name -> (if (again >= 0) math.min(t, again) else t)
      } else name -> t
    }
    if (flagged.nonEmpty) gatedProbe()
    val probes = probeLog.toSeq
    val ratio = probeRatio(probes)
    val (windowClean, reasons) = windowVerdict(loadStart, probes, maxLoad, maxProbe)
    if (!windowClean) System.err.println(
      s"[bench] REFUSING to certify this window: ${reasons.mkString("; ")} " +
        "- times include machine contention; rerun on a quiet box")
    // Key order: queries first, summary fields LAST. The harness that
    // collects this output keeps only the final ~2000 characters; with 80
    // queries the map alone is longer than that, so the headline total must
    // sit at the end of the line to stay visible. JSON key order is
    // insignificant to any parser. 4-decimal times (0.1 ms) keep the line
    // short without losing measurement precision.
    def f(v: Double): String = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val rerunJson = reruns.map { case (k, (before, again)) =>
      jstr(k) + ":[" + f(before) + "," + f(again) + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // probe-normalized total (round-15): probe_median_secs is the box's
    // ABSOLUTE speed dial during this run (fixed probe workload). The
    // correction is DAMPENED, not linear: the probe is pure-CPU while
    // the registry mixes I/O, shuffles, and driver round trips, so the
    // total moves far less than the probe — the r14 same-code pair
    // (87.96 s at probe 0.0642 vs 96.04 s at 0.0982) measures an
    // elasticity of log(96.04/87.96)/log(0.0982/0.0642) ≈ 0.21. A
    // linear model would "normalize" that 96.04 to 71 s — a number the
    // box never produced; the dampened model lands it at ~88 s, on top
    // of the clean measurement. Elasticity env-overridable as more
    // same-code pairs accumulate.
    val probeMedian = {
      val s = probes.sorted; val n = s.size
      if (n == 0) 0.0
      else if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val probeRef: Option[Double] =
      sys.env.get("SPARK_GRAFT_BENCH_REF_PROBE").map(_.toDouble)
        .orElse(cleanProbeRef(historyLines, minQueries = 200))
    val elasticity = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_PROBE_ELASTICITY", "0.21").toDouble
    val valueNorm = probeRef match {
      case Some(ref) if ref > 0 && probeMedian > 0 =>
        total / math.pow(probeMedian / ref, elasticity)
      case _ => total
    }
    // the clean-history medians the rerun flagging used, echoed for the
    // queries in this run: the line is then self-contained for per-query
    // drift adjudication (tools/bench_diff.py reads them back)
    val medJson = results.collect {
      case (k, _) if medians.contains(k) => "\"" + k + "\":" + f(medians(k))
    }.mkString("{", ",", "}")
    // code fingerprint (round-16): same-fingerprint clean pairs are the
    // raw material for FITTING the probe elasticity instead of pinning
    // it to the one measured r14 pair — tools/bench_diff.py aggregates
    // them. HEAD alone would mislabel an uncommitted tree, hence -dirty.
    val codeFp: String = sys.env.get("SPARK_GRAFT_CODE_FP").getOrElse {
      try {
        import scala.sys.process._
        val quiet = ProcessLogger(_ => (), _ => ())
        val head = Process(Seq("git", "rev-parse", "--short=12", "HEAD"))
          .!!(quiet).trim
        val dirty = Process(Seq("git", "status", "--porcelain"))
          .!!(quiet).trim.nonEmpty
        if (dirty) s"$head-dirty" else head
      } catch { case _: Exception => "unknown" }
    }
    val env = s""""started_at":${jstr(startedAt.toString)},""" +
      s""""code_fp":${jstr(codeFp)},""" +
      s""""load_avg_launch":${f(loadLaunch)},""" +
      s""""load_avg_start":${f(loadStart)},"load_avg_end":${f(loadAvg())},""" +
      s""""probe_secs":[${probes.map(f).mkString(",")}],""" +
      s""""probe_ratio":${f(ratio)},""" +
      s""""bench_cores":$cpus,"hot_run":${!windowClean},""" +
      s""""window_clean":$windowClean,""" +
      s""""window_reasons":[${reasons.map(jstr).mkString(",")}],""" +
      s""""reruns":$rerunJson"""
    // a REFUSED window embeds the newest certified line's summary so
    // BENCH_rN.json alone carries the trustworthy number, and nulls
    // value_norm (uniform-slow-box assumption violated) — round-16
    val certJson =
      if (windowClean) ""
      else lastCertifiedJson(historyLines, minQueries = 200)
        .fold("")(j => s""""last_certified":$j,""")
    val line =
      s"""{"queries":$qs,"clean_medians":$medJson,"errors":$errJson,$env,"sf":"$sfDir",""" +
      s""""probe_median_secs":${f(probeMedian)},""" +
      probeRef.fold("")(r => s""""probe_ref_secs":${f(r)},""") +
      certJson +
      s""""value_norm":${valueNormJson(windowClean, valueNorm)},""" +
      s""""metric":"total","value":${f(total)},"unit":"sec"}"""
    println(line)
    // per-query history: append every CERTIFIED run (timestamped) so
    // later rounds can diff query-by-query against earlier recordings,
    // not just the total — a 2x regression in one query hides inside a
    // flat total. A refused window is NOT appended: one contaminated
    // line recorded as truth poisons every later median and drift
    // adjudication (the r13 post-mortem).
    if (windowClean) {
      try {
        val entry = s"""{"ts":"${java.time.Instant.now()}",""" + line.drop(1)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(historyPath),
          entry + "\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch {
        case e: Exception =>
          System.err.println(s"[bench] history append failed: ${e.getMessage}")
      }
    }
    spark.stop()
    if (!windowClean) sys.exit(3)
  }
}
