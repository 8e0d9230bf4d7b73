package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs (sf0.001 testdata, UTC, tiny
  * shuffle parallelism — mirrors the reference's test fixture
  * `tests/conftest.py:10-17`).
  */
trait SparkSpec extends BeforeAndAfterAll { self: AnyFunSuite =>
  lazy val spark: SparkSession = SparkSpec.session
  val Sf = "/root/testdata/sf0.001"
}

object SparkSpec {
  // tests assert immediate reclamation after index maintenance; the
  // production default is IndexStore.maintenanceRetentionMs (round-16 —
  // a spec pins that default explicitly by clearing this prop)
  sys.props.getOrElseUpdate("graft.index.vacuum.retention.ms", "0")

  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Smoke + shape checks for the registered query surface. Exact value
  * parity is the driver's DuckDB oracle (tools/check.py locally); here we
  * assert structural invariants that don't depend on the scale factor.
  */
class QuerySurfaceSpec extends AnyFunSuite with SparkSpec {

  test("registry names are unique and every oracle key is a query key") {
    val names = SparkEntry.registry.map(_._1)
    assert(names.distinct.sizeIs == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("README's registry count matches the registry (doc-lint)") {
    // the README is the first thing a reader checks against
    // CORRECTNESS_rN.json; a stale count there misreports the surface
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")))
    val claimed = "(\\d+)-query registry".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(claimed.contains(SparkEntry.registry.size),
      s"README claims ${claimed.getOrElse(-1)} queries, registry has " +
        s"${SparkEntry.registry.size} — update the README module table")
  }

  test("q215 conserves credit: per-purchase ppm sums to exactly 1e6") {
    // the U-shape weights are integer ppm with the division remainder
    // assigned to the last touch — conservation is the contract that
    // makes per-channel rollups of the credit column trustworthy
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q215_ushape_attribution")(spark, Sf)
    val bad = df.groupBy("purchase_id")
      .agg(sum("ppm").as("s"), max("n_touches").as("n"),
        count(lit(1)).as("rows"))
      .filter(col("s") =!= 1000000L || col("rows") =!= col("n"))
      .count()
    assert(bad == 0L, s"$bad purchases violate ppm conservation")
  }

  test("q228 conserves the sample budget: allocations sum to exactly 1e6") {
    // largest-remainder apportionment's whole point is exact integer
    // conservation — a drifted total means the sampling plans downstream
    // over- or under-draw
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q228_sample_apportionment")(spark, Sf)
    val total = df.agg(sum("alloc")).head.getLong(0)
    assert(total == 1000000L, s"allocations sum to $total, not 1e6")
  }

  test("hash-surface type whitelist: no DECIMAL or ARRAY column escapes") {
    // the driver's canonical row-hash mishandles DecimalType (round 11:
    // the six DECIMAL(38,0)-emitting queries were exactly the red set —
    // values cell-exact, hash red) and ArrayType (the q89 precedent,
    // COVERAGE.md). 128-bit integer evidence must reach the emitted
    // schema as a canonical decimal STRING (or BIGINT when the query's
    // overflow analysis bounds it under 2^63); arrays as sorted
    // comma-joined strings. This walks every registered query's schema
    // recursively so a reintroduction fails the build, not the round.
    import org.apache.spark.sql.types._
    def banned(dt: DataType): Boolean = dt match {
      case _: DecimalType | _: ArrayType => true
      case s: StructType => s.fields.exists(f => banned(f.dataType))
      case m: MapType => banned(m.keyType) || banned(m.valueType)
      case _ => false
    }
    val offenders = SparkEntry.registry.flatMap { case (name, q) =>
      q.fn(spark, Sf).schema.fields.collect {
        case f if banned(f.dataType) =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"driver-unhashable column types emitted: ${offenders.mkString(", ")}")
  }

  test("every registered query executes and is non-empty at sf0.001") {
    SparkEntry.registry.foreach { case (name, q) =>
      val n = q.fn(spark, Sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("dedupe window keeps exactly one row per customer") {
    val df = SparkEntry.queries("q11_window_dedupe")(spark, Sf)
    assert(df.count() == df.select("o_custkey").distinct().count())
  }

  test("churn snapshot: orders_30d <= orders_90d <= lifetime_orders") {
    import org.apache.spark.sql.functions.col
    val bad = SparkEntry.queries("q24_churn_features")(spark, Sf)
      .filter(col("orders_30d") > col("orders_90d") ||
        col("orders_90d") > col("lifetime_orders") ||
        col("recency_days") < 0 ||
        col("recency_days") > col("customer_tenure_days"))
      .count()
    assert(bad == 0)
  }

  test("churn labels are binary and keyed by customer") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("q25_churn_labels")(spark, Sf)
    assert(df.filter(!col("churn_label").isin(0, 1)).count() == 0)
    assert(df.count() == df.select("customer_id").distinct().count())
  }

  test("collected positional quartiles match the windowed formulation " +
      "on tiny groups (r17 two-phase rewrite)") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 9.0),
      ("c", 2.0), ("c", 4.0), ("c", 6.0), ("c", 8.0)).toDF("g", "v")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val windowed = graft.queries.Advanced.positionalQuartiles(df, "g", "v")
    val collected = graft.queries.Advanced
      .positionalQuartilesCollected(spark, df, "g", "v")
    assert(canon(collected) == canon(windowed))
    assert(collected.schema.map(f => (f.name, f.dataType)) ==
      windowed.schema.map(f => (f.name, f.dataType)))
    // empty input: zero rows, same schema
    val empty = graft.queries.Advanced
      .positionalQuartilesCollected(spark, df.limit(0), "g", "v")
    assert(empty.count() == 0)
    assert(empty.schema.map(f => (f.name, f.dataType)) ==
      windowed.schema.map(f => (f.name, f.dataType)))
  }

  test("q224 trimmed mean matches a local sort-and-trim sweep " +
      "(r17 two-phase rewrite)") {
    import org.apache.spark.sql.functions.col
    val cents = graft.common.Tables.load(spark, Sf, "orders")
      .select(col("o_orderpriority"),
        graft.common.Exact.cents(col("o_totalprice")).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rows = SparkEntry.queries("q224_trimmed_mean")(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSet == cents.map(_._1).toSet)
    rows.foreach { r =>
      val grp = r.getString(0)
      val sorted = cents.filter(_._1 == grp).map(_._2).sorted
      val n = sorted.length.toLong
      val k = n / 10
      val kept = sorted.slice(k.toInt, (n - k).toInt)
      assert(r.getLong(1) == n, s"$grp n_rows")
      assert(r.getLong(2) == k, s"$grp k_trim")
      assert(r.getLong(3) == kept.map(BigInt(_)).sum.toLong, s"$grp kept")
      assert(r.getLong(4) == kept.length.toLong, s"$grp n_kept")
      assert(r.getDouble(5) ==
        kept.map(BigInt(_)).sum.toLong.toDouble / kept.length,
        s"$grp trimmed mean")
    }
  }

  test("positional quartiles clamp the rank to >= 1 on tiny groups") {
    import spark.implicits._
    // n = 1 and n = 2 make floor((n+1)k/4) = 0 for the lower ranks; the
    // clamped semantics is "the group's smallest value", never NULL or an
    // accidental always-true cum >= 0
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 9.0),
      ("c", 2.0), ("c", 4.0), ("c", 6.0), ("c", 8.0)).toDF("g", "v")
    val out = graft.queries.Advanced.positionalQuartiles(df, "g", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("a") == ((1L, 5.0, 5.0, 5.0)))
    assert(out("b") == ((2L, 1.0, 1.0, 9.0)))
    assert(out("c") == ((4L, 2.0, 4.0, 6.0)))
  }
}
