package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe running total over a TOTAL order — the scan primitive behind
  * sequence packing, shard offset assignment, and quota-based sampling in a
  * training-data pipeline. `sum(x) over (order by ...)` plans as a
  * single-partition window: every row of a 100 TB table would serialize
  * through one reducer. This computes the identical column with the classic
  * two-pass distributed scan (same shape as [[RangedNtile]]):
  *
  *   1. `repartitionByRange` on the order keys, so partition p holds a
  *      contiguous key range and partition ids are ordered;
  *   2. per-partition sums → running offsets (a P-row single-partition
  *      window — P = shuffle partitions, never the table);
  *   3. local running sum within each range partition (window keyed by
  *      partition id), plus the partition's offset.
  *
  * The range-partitioned frame is pinned with ONE eager localCheckpoint
  * before the offsets and the local scans read it — every action over a
  * `repartitionByRange` re-samples its boundaries otherwise (see
  * RangedNtile's note; DeterminismSpec's partition sweep is the detector).
  *
  * Order keys must form a total (tie-broken) order, like every other
  * deterministic operator in this engine.
  */
object PrefixSum {

  /** Append `out` = sum of `value` over rows strictly BEFORE this row in
    * `orderCols` order (exclusive prefix sum; the inclusive sum is
    * `out + value`). Exclusive is the packing-friendly form: a document's
    * start offset is the token count of everything before it.
    */
  def apply(df: DataFrame, value: Column, orderCols: Seq[Column],
      out: String = "prefix_sum", parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.withColumn("__v", value.cast("long"))
      .repartitionByRange(p, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val wOff = Window.orderBy("__pid")
    val offsets = ranged.groupBy("__pid").agg(sum("__v").as("__psum"))
      .select(col("__pid"),
        coalesce(sum("__psum").over(wOff.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("__off"))
    val wLocal = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("__lsum", coalesce(sum("__v").over(wLocal), lit(0L)))
      .join(broadcast(offsets), "__pid")
      .withColumn(out, col("__lsum") + col("__off"))
      .drop("__pid", "__v", "__lsum", "__off")
  }
}
