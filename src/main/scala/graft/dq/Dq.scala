package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality check family (SURVEY.md §2.12; reference
  * `src/common/dq.py:12-118` and the hardcoded gate asserts in
  * `customer_features_daily.py:30-80`, `labels.py:50-79`).
  *
  * Severity gating mirrors the reference: only `critical` failures block a
  * publish; `warn` failures are reported but pass.
  *
  * Scale design: all row-predicate checks for a table are evaluated in ONE
  * scan (a single agg of conditional sums); `Unique` folds into the same
  * pass as `count(*) - countDistinct(key)`. No per-check job, no collect of
  * failed rows beyond a bounded sample.
  */
sealed trait DqCheck {
  def name: String
  def severity: String
  /** Aggregate expression counting violating rows (long). */
  def failCount: Column
  /** Row-level predicate selecting violating rows, if expressible. */
  def failPredicate: Option[Column]
}

/** Rows where any listed column is null (dq.py:19-28). */
final case class NotNull(cols: Seq[String], severity: String = "critical")
    extends DqCheck {
  val name = s"not_null_${cols.mkString("_")}"
  private val pred = cols.map(col(_).isNull).reduce(_ || _)
  def failCount: Column = sum(when(pred, 1L).otherwise(0L)).cast("long")
  def failPredicate: Option[Column] = Some(pred)
}

/** Null or outside the allowed set (dq.py:38-39). */
final case class InSet(c: String, allowed: Seq[String],
    severity: String = "critical") extends DqCheck {
  val name = s"in_set_$c"
  private val pred = col(c).isNull || !col(c).isin(allowed: _*)
  def failCount: Column = sum(when(pred, 1L).otherwise(0L)).cast("long")
  def failPredicate: Option[Column] = Some(pred)
}

/** Excess rows beyond one per key (dq.py:31-35). Counted as
  * count(*) - countDistinct(keys): zero iff the key is unique.
  */
final case class UniqueKey(cols: Seq[String], severity: String = "critical")
    extends DqCheck {
  val name = s"unique_${cols.mkString("_")}"
  def failCount: Column =
    (count(lit(1)) - countDistinct(struct(cols.map(col): _*))).cast("long")
  def failPredicate: Option[Column] = None // needs a self-join; see failedKeys
}

/** Cross-column ordering / range rule, e.g. orders_30d <= orders_90d
  * (customer_features_daily.py:55-68).
  */
final case class Predicate(name: String, violated: Column,
    severity: String = "critical") extends DqCheck {
  def failCount: Column = sum(when(violated, 1L).otherwise(0L)).cast("long")
  def failPredicate: Option[Column] = Some(violated)
}

final case class DqResult(
    checkName: String, severity: String, failedCount: Long) {
  def passed: Boolean = failedCount == 0L
}

final case class DqReport(results: Seq[DqResult]) {
  def criticalFailures: Seq[DqResult] =
    results.filter(r => !r.passed && r.severity == "critical")
  def passed: Boolean = criticalFailures.isEmpty
}

object DqRunner {
  /** All checks in one scan: a single aggregate row of violation counts. */
  def summaryDf(df: DataFrame, checks: Seq[DqCheck]): DataFrame = {
    val agg = df.agg(
      checks.head.failCount.as(checks.head.name),
      checks.tail.map(c => c.failCount.as(c.name)): _*)
    // unpivot the 1×N agg row to (check_name, n_failed) rows
    val stackArgs = checks
      .map(c => s"'${c.name}', `${c.name}`").mkString(", ")
    agg.select(expr(
      s"stack(${checks.size}, $stackArgs) as (check_name, n_failed)"))
  }

  def run(df: DataFrame, checks: Seq[DqCheck]): DqReport = {
    val row = df.agg(
      checks.head.failCount.as("c0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        c.failCount.as(s"c${i + 1}")
      }: _*).collect()(0)
    DqReport(checks.zipWithIndex.map { case (c, i) =>
      DqResult(c.name, c.severity, if (row.isNullAt(i)) 0L else row.getLong(i))
    })
  }

  /** Bounded sample of violating rows for quarantine (dq.py:101-118). */
  def failedSample(df: DataFrame, check: DqCheck, limit: Int = 100): DataFrame =
    check.failPredicate match {
      case Some(p) => df.filter(p).limit(limit)
      case None => // unique check: join back on over-represented keys
        check match {
          case UniqueKey(cols, _) =>
            val dupKeys = df.groupBy(cols.map(col): _*)
              .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
              .drop("_n")
            df.join(dupKeys, cols, "left_semi").limit(limit)
          case _ => df.limit(0)
        }
    }
}
