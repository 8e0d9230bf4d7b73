package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed prefix sum (inclusive scan) over a total order — the
  * running-total primitive behind cumulative-distribution operators
  * (KS curves, Kaplan-Meier risk sets, Lorenz/Gini curves).
  *
  * Spark's `Window.orderBy` without a `partitionBy` collapses the whole
  * frame into ONE task, which is the canonical 100 TB scale trap. This
  * operator is the two-phase scan instead: range-repartition on the
  * sort key, local in-partition running sums, then add each partition's
  * predecessor total as a broadcast offset. The only driver-side state
  * is one partial per partition (bounded by the partition count, never
  * by the data).
  *
  * Exactness: intended for LONG value columns — integer addition is
  * associative, so the two-phase association ((locals) + offset) equals
  * the sequential left fold bit-for-bit and the result is independent
  * of the partition count (DeterminismSpec pins this via q154).
  */
object PrefixSum {

  /** Appends `<v>_cum` inclusive running totals for each of
    * `valueCols` (must be LongType) over the global order given by
    * `sortCols`. The output keeps the input's range partitioning, each
    * partition internally sorted by `sortCols`.
    */
  def runningSums(df: DataFrame, sortCols: Seq[Column],
      valueCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = valueCols.map(c => sorted.schema.fieldIndex(c))
    val sortedRdd = sorted.rdd
    // phase 1: one total per (partition, valueCol) — bounded driver state
    val partTotals: Array[Array[Long]] = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        val tot = Array.fill(vIdx.length)(0L)
        it.foreach { r =>
          var j = 0
          while (j < vIdx.length) {
            if (!r.isNullAt(vIdx(j))) tot(j) += r.getLong(vIdx(j))
            j += 1
          }
        }
        Iterator.single(pid -> tot)
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    // exclusive prefix of the partition totals = each partition's offset
    val offsets = partTotals.scanLeft(Array.fill(vIdx.length)(0L)) {
      (acc, t) => acc.zip(t).map { case (a, b) => a + b }
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val outSchema = valueCols.foldLeft(sorted.schema) { (sch, c) =>
      sch.add(s"${c}_cum", LongType, nullable = false)
    }
    val withCum = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val run = bcOffsets.value(pid).clone()
      it.map { r =>
        var j = 0
        while (j < vIdx.length) {
          if (!r.isNullAt(vIdx(j))) run(j) += r.getLong(vIdx(j))
          j += 1
        }
        Row.fromSeq(r.toSeq ++ run.toSeq)
      }
    }
    spark.createDataFrame(withCum, outSchema)
  }
}
