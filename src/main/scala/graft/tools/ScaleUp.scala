package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an N×-scaled copy of a testdata scale-factor dir
  * (`ScaleUp <srcSfDir> <outDir> [factor=10]`) for scale-GROWTH
  * measurement — the round-14 evidence pass that turns the 100 TB
  * plan-shape arguments into measured exponents (PLANS.md "growth").
  *
  * Shape preservation is the design constraint: every replica k shifts
  * each KEY SPACE by k·(maxKey+1), coherently across fact/dim
  * relationships (orders.o_custkey moves with customer.c_custkey,
  * lineitem's FKs with orders/part/supplier), so joins keep their
  * fan-outs, skew keeps its ratio, and graph queries see N disjoint
  * copies of the same component structure — work scales with rows, not
  * with accidental cross-replica edges. Dates/timestamps are NOT
  * shifted: calendar-bounded frames (the q80/q203 class) must stay
  * calendar-bounded, which is exactly the claim being measured. The
  * tiny dims (nation, region) copy as-is, like a real lakehouse. Text
  * gets a per-replica suffix so dedup-family censuses keep sf-shaped
  * distinct counts instead of collapsing N× exact duplicates.
  *
  * Output is DERIVED, LOCAL, and disposable (write to /tmp) — never
  * committed; the generator is the artifact.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcSfDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleUp(spark, src, out, factor)
    spark.stop()
  }

  /** Key spaces per table: (column, spaceName). Columns sharing a
    * space shift together — the FK coherence that preserves join
    * shape.
    */
  private val KeySpaces: Map[String, Seq[(String, String)]] = Map(
    "customer" -> Seq("c_custkey" -> "cust"),
    "supplier" -> Seq("s_suppkey" -> "supp"),
    "part" -> Seq("p_partkey" -> "part"),
    "orders" -> Seq("o_orderkey" -> "order", "o_custkey" -> "cust"),
    "lineitem" -> Seq("l_orderkey" -> "order", "l_partkey" -> "part",
      "l_suppkey" -> "supp"),
    "events" -> Seq("event_id" -> "event", "user_id" -> "cust"),
    "documents" -> Seq("doc_id" -> "doc"),
    "embeddings" -> Seq("vec_id" -> "vec"))

  private val CopyAsIs = Seq("nation", "region")

  def scaleUp(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    require(factor >= 1)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    // one offset per key space: (max over every column in the space)+1,
    // so replica keys can never collide with originals or each other
    val offsets: Map[String, Long] = {
      val maxes = scala.collection.mutable.Map[String, Long]()
      KeySpaces.foreach { case (table, cols) =>
        val df = spark.read.parquet(s"$src/$table.parquet")
        cols.foreach { case (c, space) =>
          val m = df.agg(max(col(c)).cast("long")).collect()(0).getLong(0)
          maxes(space) = math.max(maxes.getOrElse(space, 0L), m)
        }
      }
      maxes.map { case (space, m) => space -> (m + 1L) }.toMap
    }
    CopyAsIs.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t copied as-is")
    }
    KeySpaces.foreach { case (table, cols) =>
      val base = spark.read.parquet(s"$src/$table.parquet")
      def replica(k: Int): DataFrame = {
        val shifted = cols.foldLeft(base) { case (df, (c, space)) =>
          df.withColumn(c, col(c) + lit(k * offsets(space)))
        }
        // keep dedup-family distinct counts sf-shaped: a replica's text
        // is a variant, not a byte-identical duplicate
        if (table == "documents" && k > 0)
          shifted.withColumn("text",
            concat(col("text"), lit(s" replica$k")))
        else shifted
      }
      val scaled = (0 until factor).map(replica).reduce(_.unionByName(_))
      scaled.write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scaleup] $table x$factor rows=" +
        spark.read.parquet(s"$out/$table.parquet").count())
    }
  }
}

/** Measure scale-growth exponents
  * (`GrowthProbe <baseDir> <scaledDir> <factor> <q1,q2,...>`): each
  * query runs min-of-2 at both scales (one off-the-clock warmup pass
  * at base first), exponent = ln(tScaled/tBase)/ln(factor). Prints one
  * JSON line; > 1.3 is the super-linear flag (PLANS.md "growth").
  */
object GrowthProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: GrowthProbe <baseDir> <scaledDir> <factor> <q1,q2,...>")
    val (base, scaled, factor) = (args(0), args(1), args(2).toDouble)
    val names = args(3).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = graft.SparkEntry.registry.toMap
    def once(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      byName(name).fn(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    // off-the-clock warmup at BOTH scales: with a base-only warmup the
    // scaled measurements ran on a strictly warmer JVM and the
    // iteration-heavy queries (many tiny jobs, overhead-dominated at
    // these sizes) measured FASTER at 10x — a pure ordering artifact
    // (first probe read q208 at -0.37 "exponent")
    names.foreach { n => once(n, base); once(n, scaled) }
    val rows = names.map { n =>
      // alternate scales inside the min-of-2 so residual warming (or a
      // transient competitor) biases both sides alike
      val b1 = once(n, base); val s1 = once(n, scaled)
      val b2 = once(n, base); val s2 = once(n, scaled)
      val tB = math.min(b1, b2)
      val tS = math.min(s1, s2)
      val exp = math.log(tS / tB) / math.log(factor)
      (n, tB, tS, exp)
    }
    def f(v: Double): String =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    println(rows.map { case (n, tB, tS, e) =>
      s""""$n":{"base_s":${f(tB)},"scaled_s":${f(tS)},"exponent":${f(e)}}"""
    }.mkString("{\"growth\":{", ",", s"},\"factor\":$factor}"))
    spark.stop()
  }
}
