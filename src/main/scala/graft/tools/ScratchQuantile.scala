package graft.tools

import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the r17 quantile-family rewrite:
  * times candidate physical shapes for q247/q224 side by side so the
  * committed rewrite is the measured winner, not a guess. Not part of
  * the registry; deleted or kept as a tool only.
  */
object ScratchQuantile {
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
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 10).foreach { _ =>
      spark.range(0L, 50000000L, 1L, cpus.toInt)
        .selectExpr("sum(id * 3 + 1)").collect()
    }

    // ---- q247 variants ----------------------------------------------
    // A: current shape (range-frame cum window + whole-partition window)
    def q247A(s: SparkSession, d: String): DataFrame = {
      val byMode = Window.partitionBy(col("mode"))
      val hist = load(s, d, "lineitem")
        .select(col("l_returnflag").as("mode"),
          cents(col("l_extendedprice")).as("v"),
          col("l_quantity").cast("long").as("w"))
        .groupBy(col("mode"), col("v"))
        .agg(sum(col("w")).as("wv"))
      val cum = hist
        .withColumn("cumw", sum(col("wv")).over(byMode.orderBy(col("v"))))
        .withColumn("wtot", sum(col("wv")).over(byMode))
      def at(k: Int) =
        min(when(col("cumw") * 4 >= col("wtot") * k, col("v")))
      cum.groupBy(col("mode"), col("wtot").as("w_total"))
        .agg(at(1).as("wp25"), at(2).as("wp50"), at(3).as("wp75"))
        .select(col("mode").as("l_returnflag"), col("w_total"),
          col("wp25"), col("wp50"), col("wp75"))
    }

    // B: rows-frame cum window (same two-exchange shape, cheaper frame)
    def q247B(s: SparkSession, d: String): DataFrame = {
      val byMode = Window.partitionBy(col("mode"))
      val hist = load(s, d, "lineitem")
        .select(col("l_returnflag").as("mode"),
          cents(col("l_extendedprice")).as("v"),
          col("l_quantity").cast("long").as("w"))
        .groupBy(col("mode"), col("v"))
        .agg(sum(col("w")).as("wv"))
      val cum = hist
        .withColumn("cumw", sum(col("wv")).over(
          byMode.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("wtot", sum(col("wv")).over(byMode))
      def at(k: Int) =
        min(when(col("cumw") * 4 >= col("wtot") * k, col("v")))
      cum.groupBy(col("mode"), col("wtot").as("w_total"))
        .agg(at(1).as("wp25"), at(2).as("wp50"), at(3).as("wp75"))
        .select(col("mode").as("l_returnflag"), col("w_total"),
          col("wp25"), col("wp50"), col("wp75"))
    }

    // C: driver-coarse two-phase — coarse bucket histogram collected
    // (domain-bounded), quartile buckets located driver-side, then one
    // sliver-filtered fine pass with NO corpus-sized window partitions.
    def q247C(s: SparkSession, d: String): DataFrame = {
      val B = 10000L
      val src = load(s, d, "lineitem")
        .select(col("l_returnflag").as("mode"),
          cents(col("l_extendedprice")).as("v"),
          col("l_quantity").cast("long").as("w"))
      val coarse = src
        .groupBy(col("mode"), (col("v") - pmod(col("v"), lit(B))).as("cb"))
        .agg(sum(col("w")).as("cwv"))
        .collect()
      require(coarse.length <= 500000, s"coarse histogram ${coarse.length}")
      // per mode: sorted buckets, total weight, and for k=1..3 the
      // bucket holding the k-th weighted quartile + cum weight before it
      val byMode = coarse.groupBy(_.getString(0))
      case class Tgt(mode: String, k: Int, cb: Long, cumPrev: Long, wtot: Long)
      val targets = byMode.toSeq.flatMap { case (mode, rows) =>
        val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        val wtot = sorted.map(_._2).sum
        (1 to 3).map { k =>
          var cum = 0L; var i = 0
          while (i < sorted.length && (cum + sorted(i)._2) * 4 < wtot * k)
            { cum += sorted(i)._2; i += 1 }
          Tgt(mode, k, sorted(i)._1, cum, wtot)
        }
      }
      // sliver pass: only rows in a target bucket survive the filter
      val modes = targets.map(_.mode).distinct
      val bucketOf = targets.groupBy(_.mode).view.mapValues(_.map(_.cb).distinct)
      val pred = modes.map { m =>
        col("mode") === m &&
          (col("v") - pmod(col("v"), lit(B))).isin(bucketOf(m): _*)
      }.reduce(_ || _)
      val sliver = src.filter(pred)
        .groupBy(col("mode"), col("v"))
        .agg(sum(col("w")).as("wv"))
      val byModeW = Window.partitionBy(col("mode"), col("cb"))
      // attach target metadata via literal lookup (<=9 rows)
      import s.implicits._
      val tgtDf = targets.map(t => (t.mode, t.k, t.cb, t.cumPrev, t.wtot))
        .toDF("mode", "k", "cb", "cum_prev", "wtot")
      val joined = sliver
        .withColumn("cb", col("v") - pmod(col("v"), lit(B)))
        .join(broadcast(tgtDf), Seq("mode", "cb"))
      val cum = joined
        .withColumn("cumw", col("cum_prev") + sum(col("wv")).over(
          Window.partitionBy(col("mode"), col("k")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val picks = cum
        .groupBy(col("mode"))
        .agg(max(col("wtot")).as("w_total"),
          min(when(col("cumw") * 4 >= col("wtot") * 1 && col("k") === 1,
            col("v"))).as("wp25"),
          min(when(col("cumw") * 4 >= col("wtot") * 2 && col("k") === 2,
            col("v"))).as("wp50"),
          min(when(col("cumw") * 4 >= col("wtot") * 3 && col("k") === 3,
            col("v"))).as("wp75"))
      picks.select(col("mode").as("l_returnflag"), col("w_total"),
        col("wp25"), col("wp50"), col("wp75"))
    }

    // ---- q224 variants ----------------------------------------------
    val TrimDen = 10L
    def q224A(s: SparkSession, d: String): DataFrame = {
      val byGrp = Window.partitionBy(col("grp"))
      val hist = load(s, d, "orders")
        .select(col("o_orderpriority").as("grp"),
          cents(col("o_totalprice")).as("v"))
        .groupBy(col("grp"), col("v"))
        .agg(count(lit(1)).as("c"))
      hist
        .withColumn("cum", sum(col("c")).over(byGrp.orderBy(col("v"))))
        .withColumn("n", sum(col("c")).over(byGrp))
        .withColumn("k", expr(s"n div $TrimDen"))
        .withColumn("take",
          greatest(least(col("cum"), col("n") - col("k")) -
            greatest(col("cum") - col("c"), col("k")), lit(0L)))
        .filter(col("take") > 0L)
        .groupBy(col("grp"))
        .agg(max(col("n")).as("n_rows"), max(col("k")).as("k_trim"),
          sum(col("take").cast("decimal(38,0)") * col("v"))
            .cast("long").as("kept_cents"),
          sum(col("take")).as("n_kept"))
        .select(col("grp").as("o_orderpriority"),
          col("n_rows"), col("k_trim"), col("kept_cents"),
          col("n_kept"),
          (col("kept_cents").cast("double") /
            col("n_kept").cast("double")).as("trimmed_mean_cents"))
    }

    // C: driver-coarse two-phase. F(r) = sum of r smallest cents,
    // kept = F(n-k) - F(k); coarse buckets carry (count, mass) so the
    // driver locates both boundary buckets and their prefix sums; one
    // sliver pass computes the within-bucket partial, windowless over
    // corpus-sized frames.
    def q224C(s: SparkSession, d: String): DataFrame = {
      val B = 100000L // $1000 buckets over o_totalprice
      val src = load(s, d, "orders")
        .select(col("o_orderpriority").as("grp"),
          cents(col("o_totalprice")).as("v"))
      val coarse = src
        .groupBy(col("grp"), (col("v") - pmod(col("v"), lit(B))).as("cb"))
        .agg(count(lit(1)).as("c"),
          sum(col("v").cast("decimal(38,0)")).as("m"))
        .collect()
      require(coarse.length <= 500000, s"coarse histogram ${coarse.length}")
      val byGrp = coarse.groupBy(_.getString(0))
      // rank targets per group: r1 = k (trim), r2 = n - k
      case class Tgt(grp: String, which: Int, r: Long, cb: Long,
        cumPrev: Long, massPrev: BigDecimal)
      val meta = scala.collection.mutable.Map[String, (Long, Long)]()
      val targets = byGrp.toSeq.flatMap { case (grp, rows) =>
        val sorted = rows.map(r => (r.getLong(1), r.getLong(2),
          BigDecimal(r.getDecimal(3)))).sortBy(_._1)
        val n = sorted.map(_._2).sum
        val k = n / TrimDen
        meta(grp) = (n, k)
        Seq((1, k), (2, n - k)).filter(_._2 > 0).map { case (which, r) =>
          var cum = 0L; var mass = BigDecimal(0); var i = 0
          while (i < sorted.length && cum + sorted(i)._2 < r) {
            cum += sorted(i)._2; mass += sorted(i)._3; i += 1
          }
          Tgt(grp, which, r, sorted(i)._1, cum, mass)
        }
      }
      import s.implicits._
      val tgtDf = targets.map(t => (t.grp, t.which, t.r, t.cb, t.cumPrev,
        t.massPrev.toLong)).toDF("grp", "which", "r", "cb", "cum_prev", "mass_prev")
      val grps = targets.map(_.grp).distinct
      val bucketOf = targets.groupBy(_.grp).view.mapValues(_.map(_.cb).distinct)
      val pred = grps.map { g =>
        col("grp") === g &&
          (col("v") - pmod(col("v"), lit(B))).isin(bucketOf(g): _*)
      }.reduce(_ || _)
      val sliver = src.filter(pred)
        .groupBy(col("grp"), col("v"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cb", col("v") - pmod(col("v"), lit(B)))
        .join(broadcast(tgtDf), Seq("grp", "cb"))
      val w = Window.partitionBy(col("grp"), col("which")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = sliver
        .withColumn("cumw", col("cum_prev") + sum(col("c")).over(w))
        .withColumn("massw", col("mass_prev") +
          sum(col("v").cast("decimal(38,0)") * col("c")).over(w))
      // F(r): full values below boundary + partial at the boundary value
      // boundary value vb = smallest v with cumw >= r; F(r) =
      // mass below vb + (r - cum_before_vb) * vb
      val f = cum
        .filter(col("cumw") >= col("r"))
        .groupBy(col("grp"), col("which"), col("r"))
        .agg(min(struct(col("v"), col("cumw"), col("massw"),
          col("c"))).as("b"))
        .select(col("grp"), col("which"),
          (col("b.massw") - (col("b.cumw") - col("r")).cast("decimal(38,0)")
            * col("b.v")).as("fr"))
      val fr = f.groupBy(col("grp"))
        .agg(sum(when(col("which") === 1, col("fr"))).as("f_k"),
          sum(when(col("which") === 2, col("fr"))).as("f_nk"))
        .collect()
      val out = fr.map { r =>
        val grp = r.getString(0)
        val (n, k) = meta(grp)
        val fk = if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1))
        val fnk = BigDecimal(r.getDecimal(2))
        val kept = (fnk - fk).toLong
        val nKept = n - 2 * k
        (grp, n, k, kept, nKept, kept.toDouble / nKept.toDouble)
      }
      s.createDataFrame(s.sparkContext.parallelize(out.toSeq, 1))
        .toDF("o_orderpriority", "n_rows", "k_trim", "kept_cents",
          "n_kept", "trimmed_mean_cents")
    }

    // B: rows-frame cum window for q224 (minimal change)
    def q224B(s: SparkSession, d: String): DataFrame = {
      val byGrp = Window.partitionBy(col("grp"))
      val hist = load(s, d, "orders")
        .select(col("o_orderpriority").as("grp"),
          cents(col("o_totalprice")).as("v"))
        .groupBy(col("grp"), col("v"))
        .agg(count(lit(1)).as("c"))
      hist
        .withColumn("cum", sum(col("c")).over(byGrp.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(byGrp))
        .withColumn("k", expr(s"n div $TrimDen"))
        .withColumn("take",
          greatest(least(col("cum"), col("n") - col("k")) -
            greatest(col("cum") - col("c"), col("k")), lit(0L)))
        .filter(col("take") > 0L)
        .groupBy(col("grp"))
        .agg(max(col("n")).as("n_rows"), max(col("k")).as("k_trim"),
          sum(col("take").cast("decimal(38,0)") * col("v"))
            .cast("long").as("kept_cents"),
          sum(col("take")).as("n_kept"))
        .select(col("grp").as("o_orderpriority"),
          col("n_rows"), col("k_trim"), col("kept_cents"),
          col("n_kept"),
          (col("kept_cents").cast("double") /
            col("n_kept").cast("double")).as("trimmed_mean_cents"))
    }

    // D: driver-coarse, single collect, output assembled in Spark
    def q224D(s: SparkSession, d: String): DataFrame = {
      val B = 100000L
      val src = load(s, d, "orders")
        .select(col("o_orderpriority").as("grp"),
          cents(col("o_totalprice")).as("v"))
      val coarse = src
        .groupBy(col("grp"), (col("v") - pmod(col("v"), lit(B))).as("cb"))
        .agg(count(lit(1)).as("c"),
          sum(col("v").cast("decimal(38,0)")).as("m"))
        .collect()
      require(coarse.length <= 500000, s"coarse histogram ${coarse.length}")
      val byGrp = coarse.groupBy(_.getString(0))
      case class Tgt(grp: String, which: Int, r: Long, cb: Long,
        cumPrev: Long, massPrev: BigDecimal)
      val meta = scala.collection.mutable.Map[String, (Long, Long, BigDecimal)]()
      val targets = byGrp.toSeq.flatMap { case (grp, rows) =>
        val sorted = rows.map(r => (r.getLong(1), r.getLong(2),
          BigDecimal(r.getDecimal(3)))).sortBy(_._1)
        val n = sorted.map(_._2).sum
        val k = n / TrimDen
        val tot = sorted.map(_._3).sum
        meta(grp) = (n, k, tot)
        Seq((1, k), (2, n - k)).filter(_._2 > 0).map { case (which, r) =>
          var cum = 0L; var mass = BigDecimal(0); var i = 0
          while (i < sorted.length && cum + sorted(i)._2 < r) {
            cum += sorted(i)._2; mass += sorted(i)._3; i += 1
          }
          Tgt(grp, which, r, sorted(i)._1, cum, mass)
        }
      }
      import s.implicits._
      val tgtDf = targets.map(t => (t.grp, t.which, t.r, t.cb, t.cumPrev,
        t.massPrev.bigDecimal)).toDF("grp", "which", "r", "cb", "cum_prev",
        "mass_prev")
      val grps = targets.map(_.grp).distinct
      val bucketOf = targets.groupBy(_.grp).view.mapValues(_.map(_.cb).distinct)
      val pred = grps.map { g =>
        col("grp") === g &&
          (col("v") - pmod(col("v"), lit(B))).isin(bucketOf(g): _*)
      }.reduce(_ || _)
      val sliver = src.filter(pred)
        .groupBy(col("grp"), col("v"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cb", col("v") - pmod(col("v"), lit(B)))
        .join(broadcast(tgtDf), Seq("grp", "cb"))
      val w = Window.partitionBy(col("grp"), col("which")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = sliver
        .withColumn("cumw", col("cum_prev") + sum(col("c")).over(w))
        .withColumn("massw", col("mass_prev").cast("decimal(38,0)") +
          sum(col("v").cast("decimal(38,0)") * col("c")).over(w))
      val f = cum
        .filter(col("cumw") >= col("r"))
        .groupBy(col("grp"), col("which"), col("r"))
        .agg(min(struct(col("v"), col("cumw"), col("massw"))).as("b"))
        .select(col("grp"), col("which"),
          (col("b.massw") - (col("b.cumw") - col("r")).cast("decimal(38,0)")
            * col("b.v")).as("fr"))
      val metaRows = meta.toSeq.map { case (g, (n, k, _)) => (g, n, k) }
      val metaDf = metaRows.toDF("grp", "n_rows", "k_trim")
      f.groupBy(col("grp"))
        .agg(
          coalesce(sum(when(col("which") === 1, col("fr"))), lit(0)
            .cast("decimal(38,0)")).as("f_k"),
          sum(when(col("which") === 2, col("fr"))).as("f_nk"))
        .join(broadcast(metaDf), Seq("grp"))
        .select(col("grp").as("o_orderpriority"),
          col("n_rows"), col("k_trim"),
          (col("f_nk") - col("f_k")).cast("long").as("kept_cents"),
          (col("n_rows") - lit(2) * col("k_trim")).as("n_kept"),
          ((col("f_nk") - col("f_k")).cast("long").cast("double") /
            (col("n_rows") - lit(2) * col("k_trim")).cast("double"))
            .as("trimmed_mean_cents"))
    }

    // rows-frame positionalQuartiles for q178
    def q178B(s: SparkSession, d: String): DataFrame = {
      val df = load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(load(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long").as("lead_days"))
      val (group, value) = ("o_orderpriority", "lead_days")
      val byGroup = Window.partitionBy(col(group))
      val counts = df.groupBy(col(group), col(value))
        .agg(count(lit(1)).as("c"))
      val cum = counts
        .withColumn("cum", sum(col("c"))
          .over(byGroup.orderBy(col(value))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(byGroup))
      def at(k: Int) =
        greatest(floor((col("n") + 1) * k / 4), lit(1)).cast("long")
      cum.groupBy(col(group), col("n").as("n_rows"))
        .agg(
          min(when(col("cum") >= at(1), col(value))).as("p25"),
          min(when(col("cum") >= at(2), col(value))).as("median"),
          min(when(col("cum") >= at(3), col(value))).as("p75"))
        .select(col(group), col("n_rows").cast("long").as("n_rows"),
          col("p25").cast("double").as("p25"),
          col("median").cast("double").as("median"),
          col("p75").cast("double").as("p75"))
    }

    def q178A(s: SparkSession, d: String): DataFrame =
      graft.queries.Advanced.positionalQuartiles(
        load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
          .join(load(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderdate"),
              col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"),
            datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
              .cast("long").as("lead_days")),
        "o_orderpriority", "lead_days")

    def time(name: String, f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      }
    }

    time("q247A", q247A(spark, sfDir).count())
    time("q247B", q247B(spark, sfDir).count())
    time("q247C", q247C(spark, sfDir).count())
    time("q224A", q224A(spark, sfDir).count())
    time("q224B", q224B(spark, sfDir).count())
    time("q224C", q224C(spark, sfDir).count())
    time("q224D", q224D(spark, sfDir).count())
    time("q178A", q178A(spark, sfDir).count())
    time("q178B", q178B(spark, sfDir).count())

    // cross-check results
    def dump(name: String, df: DataFrame): Unit = {
      println(s"RESULT $name")
      df.collect().map(_.toString).sorted.foreach(r => println(s"  $r"))
    }
    dump("q247A", q247A(spark, sfDir))
    dump("q247C", q247C(spark, sfDir))
    dump("q224A", q224A(spark, sfDir))
    dump("q224D", q224D(spark, sfDir))
    dump("q178A", q178A(spark, sfDir))
    dump("q178B", q178B(spark, sfDir))
    println("SCHEMA q224A " + q224A(spark, sfDir).schema.simpleString)
    println("SCHEMA q224D " + q224D(spark, sfDir).schema.simpleString)
    println("SCHEMA q247A " + q247A(spark, sfDir).schema.simpleString)
    println("SCHEMA q247C " + q247C(spark, sfDir).schema.simpleString)
    spark.stop()
  }
}
