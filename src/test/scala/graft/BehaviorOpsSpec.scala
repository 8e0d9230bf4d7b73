package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the sequence / basket / outlier / fuzzy / fusion
  * operators (q117–q122). Value parity vs DuckDB is the driver's oracle
  * compare; these pin the semantic invariants and the plan shapes that
  * carry the 100 TB story.
  */
class BehaviorOpsSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q117: transition probabilities sum to 1 per from-state and " +
    "pair total = events - users") {
    val df = run("q117_event_transitions").cache()
    try {
      val sums = df.groupBy("event_type")
        .agg(sum("p_transition").as("p")).collect()
      assert(sums.nonEmpty)
      sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
        s"${r.getString(0)} probabilities sum to ${r.getDouble(1)}"))
      val ev = graft.common.Tables.load(spark, Sf, "events")
      val nEvents = ev.count()
      val nUsers = ev.select("user_id").distinct().count()
      val nPairs = df.agg(sum("n_pairs")).head().getLong(0)
      // every user contributes (its events - 1) adjacent pairs
      assert(nPairs == nEvents - nUsers)
    } finally df.unpersist()
  }

  test("q118: decayed value is positive and bounded by the undecayed sum") {
    val df = run("q118_time_decay")
    val ev = graft.common.Tables.load(spark, Sf, "events")
      .groupBy("user_id").agg(sum("value").as("raw_sum"))
    val bad = df.join(ev, "user_id")
      .filter(col("decayed_value") <= 0 ||
        col("decayed_value") > col("raw_sum") + lit(1e-9))
      .count()
    assert(bad == 0)
    assert(df.count() ==
      graft.common.Tables.load(spark, Sf, "events")
        .select("user_id").distinct().count())
  }

  test("q119: pair support bounded by both part supports, lift positive, " +
    "canonical pair order") {
    val df = run("q119_copurchase_lift")
    val bad = df.filter(
      col("part_a") >= col("part_b") ||
        col("n_orders_pair") > col("n_orders_a") ||
        col("n_orders_pair") > col("n_orders_b") ||
        col("n_orders_pair") < 2 ||
        col("lift") <= 0).count()
    assert(bad == 0)
    assert(df.count() > 0)
  }

  test("q119 plan: no fact-table self-join — pairs come from per-order " +
    "arrays, dimension joins broadcast") {
    val plan = run("q119_copurchase_lift")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "co-purchase should not shuffle-join the fact table against itself")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q120: emitted rows all exceed the threshold and med/mad are " +
    "constant per event_type") {
    val df = run("q120_robust_outliers").cache()
    try {
      assert(df.count() > 0)
      assert(df.filter(abs(col("robust_z")) <= 3.0).count() == 0)
      val distinctStats = df.select("event_type", "med", "mad").distinct()
      assert(distinctStats.count() ==
        df.select("event_type").distinct().count())
    } finally df.unpersist()
  }

  test("q121: pairs stay within their block and inside the distance cap") {
    val df = run("q121_fuzzy_name_match").cache()
    try {
      assert(df.count() > 0)
      val bad = df.filter(
        element_at(split(col("name_a"), " "), -1) =!=
          element_at(split(col("name_b"), " "), -1) ||
          col("dist") < 1 || col("dist") > 4 ||
          col("name_a") >= col("name_b")).count()
      assert(bad == 0)
    } finally df.unpersist()
  }

  test("q122: 10 fused rows per query, rrf consistent with the two ranks") {
    val df = run("q122_hybrid_rrf").cache()
    try {
      val perQuery = df.groupBy("query_id").count().collect()
      assert(perQuery.length == 20)
      perQuery.foreach(r => assert(r.getLong(1) == 10))
      val bad = df.filter(
        col("rrf") =!=
          (coalesce(lit(1.0) / (lit(60) + col("rank_lex")), lit(0.0)) +
            lit(1.0) / (lit(60) + col("rank_dense")))).count()
      assert(bad == 0)
      // a zero-overlap candidate must carry no lexical rank and vice versa
      assert(df.filter(
        (col("overlap") === 0 && col("rank_lex").isNotNull) ||
          (col("overlap") > 0 && col("rank_lex").isNull)).count() == 0)
      // the two rankers genuinely disagree (lexical overlap vs semantic
      // cosine) — if they always coincided the fusion would be a no-op
      assert(df.filter(col("rank_lex") =!= col("rank_dense")).count() > 0)
    } finally df.unpersist()
  }

  test("q125: folds partition the customers exactly") {
    val df = run("q125_group_kfold").cache()
    try {
      val folds = df.select("fold").collect().map(_.getInt(0)).sorted
      assert(folds.toSet.subsetOf((0 until 5).toSet) && folds.nonEmpty)
      val orders = graft.common.Tables.load(spark, Sf, "orders")
      // group-level assignment: fold counts must add up with NO overlap —
      // sum of per-fold distinct customers == global distinct customers
      assert(df.agg(sum("n_customers")).head().getLong(0) ==
        orders.select("o_custkey").distinct().count())
      assert(df.agg(sum("n_orders")).head().getLong(0) == orders.count())
    } finally df.unpersist()
  }

  test("q126: ablation delta sign matches whether the source is below " +
    "the overall mean") {
    val df = run("q126_source_ablation")
    val bad = df.filter(
      ((col("sum_chars").cast("double") / col("n_docs") <
        col("overall_mean")) && col("delta") <= 0) ||
        ((col("sum_chars").cast("double") / col("n_docs") >
          col("overall_mean")) && col("delta") >= 0)).count()
    assert(bad == 0)
    assert(df.count() > 1)
  }

  test("q124: salted join equals the plain join") {
    val salted = run("q124_salted_join")
    val fact = graft.common.Tables.load(spark, Sf, "lineitem")
    val dim = graft.common.Tables.load(spark, Sf, "orders")
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("long").as("n_items"),
        sum(graft.common.Exact.money(col("l_extendedprice")) *
          graft.common.Exact.oneMinus(col("l_discount")))
          .cast("double").as("revenue"))
    assert(salted.count() > 0)
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("q123: recall in [0,1], hits bounded by k, IVF recall is sane") {
    val df = run("q123_ann_recall").cache()
    try {
      assert(df.count() == 20)
      assert(df.filter(col("n_exact") =!= 10 ||
        col("n_hits") < 0 || col("n_hits") > col("n_exact") ||
        col("recall") < 0 || col("recall") > 1).count() == 0)
      // the 16-probe IVF index should find most true neighbors
      assert(df.agg(avg("recall")).head().getDouble(0) > 0.5)
    } finally df.unpersist()
  }

  test("q127: 4x event fan-out, and hour-aligned slides equal q41's " +
    "tumbling windows") {
    val df = run("q127_sliding_window").cache()
    try {
      val ev = graft.common.Tables.load(spark, Sf, "events")
      assert(df.agg(sum("n_events")).head().getLong(0) == 4 * ev.count())
      val aligned = df.filter(minute(col("window_start")) === 0)
        .select(col("window_start").as("hour_start"), col("event_type"),
          col("n_events"))
      val tumbling = run("q41_events_hourly")
        .select("hour_start", "event_type", "n_events")
      assert(aligned.exceptAll(tumbling).count() == 0)
      assert(tumbling.exceptAll(aligned).count() == 0)
    } finally df.unpersist()
  }

  test("q128: encoding shrinks the raw rate toward the prior") {
    val df = run("q128_target_encoding")
    val bad = df.filter(
      (col("encoded") < least(col("n_pos") / col("n_orders"), col("prior")) -
        lit(1e-12)) ||
        (col("encoded") >
          greatest(col("n_pos") / col("n_orders"), col("prior")) +
            lit(1e-12))).count()
    assert(bad == 0)
    assert(df.select("prior").distinct().count() == 1)
    assert(df.count() > 1)
  }

  test("q122 plan: one scan of the candidate table, probe side broadcast") {
    val plan = run("q122_hybrid_rrf").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
  test("q166: JW pair set matches a brute-force local recomputation") {
    val rows = run("q166_jw_name_match").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val names = graft.common.Tables.load(spark, Sf, "part")
      .select("p_name").distinct().collect().map(_.getString(0))
    val local = (for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last
      jw = graft.functions.JaroWinklerAlgo.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      if jw >= 0.84
    } yield (a, b, jw)).toSet
    assert(rows.toSet == local)
    assert(rows.nonEmpty)
  }
}
