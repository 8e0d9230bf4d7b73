package graft.tools

import org.apache.spark.sql.SparkSession

/** Transient diagnostic: run one query twice and print the SECOND
  * invocation's executed plan plus the persisted-RDD inventory — used
  * to check whether session-memoized cached frames actually serve the
  * warm path (r16 optimization round).
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_PROBE_CACHE_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args.headOption.getOrElse("q140_pagerank")
    val q = graft.SparkEntry.registry.toMap.apply(name)
    import org.apache.spark.scheduler._
    import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageNames.put(s.stageInfo.stageId,
          s.stageInfo.name.take(60) + " | " +
            s.stageInfo.details.linesIterator.take(1).mkString)
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          byStage.merge(t.stageId,
            (t.taskMetrics.executorRunTime, 1),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    })
    (1 to 3).foreach { i =>
      tasks.set(0); taskMs.set(0); byStage.clear()
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).count()
      println(f"run $i: wall ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"tasks ${tasks.get} task_s ${taskMs.get / 1e3}%.2f")
      if (i == 3) {
        import scala.jdk.CollectionConverters._
        byStage.asScala.toSeq.sortBy(-_._2._1).take(12).foreach {
          case (sid, (ms, n)) =>
            println(f"  stage $sid%4d ${ms / 1e3}%7.2fs n=$n%3d  " +
              stageNames.getOrDefault(sid, "?"))
        }
        val df = q.fn(spark, sfDir)
        df.count()
        println("=== final adaptive plan ===")
        println(df.queryExecution.executedPlan.toString.take(12000))
      }
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        println(s"  rdd $id: parts=${rdd.getNumPartitions} " +
          s"storage=${rdd.getStorageLevel} " +
          s"cachedParts=${spark.sparkContext.getRDDStorageInfo
            .find(_.id == id).map(x => s"${x.numCachedPartitions}/${x.numPartitions} mem=${x.memSize}").getOrElse("?")}")
      }
    }
    spark.stop()
  }
}
