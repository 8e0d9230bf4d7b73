package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query cost-breakdown CLI (optimization guide §1: measure first).
  *
  * For each named query it separates wall time into
  *   - plan: analyze+optimize+physical-plan time (driver, single thread)
  *   - exec: the timed action (same `.count()` the bench uses)
  * and, from a SparkListener, per-run totals of jobs / stages / tasks,
  * summed task executorRunTime, shuffle bytes written and JVM GC time —
  * the difference between wall-exec and (taskTime / cores) is scheduler +
  * driver overhead, which at sf0.1 dominates many small queries.
  *
  * Usage: runMain graft.tools.ProfileQuery <query>... (empty = all)
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // mirror Bench's session exactly so profiles predict bench numbers
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      taskMs.set(0); gcMs.set(0); shufWrite.set(0); shufRead.set(0)
    }

    // same warmup as Bench so first-query numbers aren't JIT noise
    (1 to 10).foreach { _ =>
      spark.range(0L, 50000000L, 1L, cpus.toInt)
        .selectExpr("sum(id * 3 + 1)").collect()
    }

    val wanted = args.toSet
    val active = graft.SparkEntry.registry
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
    println(f"${"query"}%-34s ${"plan_s"}%7s ${"run1_s"}%7s ${"run2_s"}%7s " +
      f"${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s ${"task_s"}%7s ${"gc_s"}%6s " +
      f"${"shW_MB"}%7s ${"shR_MB"}%7s " +
      f"${"jobs2"}%5s ${"stg2"}%5s ${"tsk2"}%6s ${"tsk2_s"}%7s")
    active.foreach { case (name, q) =>
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val df = q.fn(spark, sfDir)
      df.queryExecution.executedPlan // force planning
      val tPlan = (System.nanoTime() - t0) / 1e9
      reset()
      val t1 = System.nanoTime()
      df.count()
      val tRun1 = (System.nanoTime() - t1) / 1e9
      val (j1, s1, k1, tm1, g1, sw1, sr1) =
        (jobs.get, stages.get, tasks.get, taskMs.get, gcMs.get,
          shufWrite.get, shufRead.get)
      reset()
      val t2 = System.nanoTime()
      q.fn(spark, sfDir).count()
      val tRun2 = (System.nanoTime() - t2) / 1e9
      val (j2, s2, k2, tm2) = (jobs.get, stages.get, tasks.get, taskMs.get)
      println(f"$name%-34s $tPlan%7.3f $tRun1%7.3f $tRun2%7.3f " +
        f"$j1%5d $s1%5d $k1%6d ${tm1 / 1e3}%7.2f ${g1 / 1e3}%6.2f " +
        f"${sw1 / 1048576.0}%7.1f ${sr1 / 1048576.0}%7.1f " +
        f"$j2%5d $s2%5d $k2%6d ${tm2 / 1e3}%7.2f")
    }
    spark.stop()
  }
}
