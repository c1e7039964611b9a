package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe NTILE over a TOTAL order: `ntile(n) over (order by ...)` plans
  * as a single-partition window — every row serializes through one reducer,
  * which is the classic reporting-tail bottleneck at 100 TB. This operator
  * computes identical bucket assignments with the classic two-pass
  * distributed ranking shape:
  *
  *   1. `repartitionByRange` on the order keys (range exchange — the same
  *      machinery a global sort uses), so partition p holds a contiguous
  *      key range and partition ids are ordered;
  *   2. local row_number within each range partition (window keyed by
  *      partition id — the largest window group is one range partition,
  *      ~rows/P, never the whole table);
  *   3. per-partition counts → running offsets, a P-row aggregate joined
  *      back by partition id (broadcast);
  *   4. SQL NTILE arithmetic on offset + local rank: with n rows and t
  *      tiles, the first n mod t tiles get ⌈n/t⌉ rows.
  *
  * The range-partitioned frame is pinned with ONE eager localCheckpoint
  * before the counts and ranks read it. This is load-bearing: every action
  * over a `repartitionByRange` re-samples its boundaries (RangePartitioner
  * seeds from fresh RDD ids), so the counts branch and the rank branch would
  * otherwise see slightly DIFFERENT partition edges and mis-rank rows near
  * them (AQE does not reuse the exchange across the two subplans — measured,
  * not assumed; the DeterminismSpec partition-count sweep catches it).
  *
  * The order keys must form a TOTAL order (tie-broken) — the same
  * determinism requirement every oracle query already carries.
  */
object RangedNtile {

  /** @param df        input
    * @param tiles     NTILE bucket count
    * @param orderCols total-order sort keys
    * @param out       name of the appended bucket column
    * @param parts     number of range partitions (defaults to
    *                  spark.sql.shuffle.partitions)
    */
  /** SQL NTILE arithmetic over a precomputed global `__rank` (1-based) and
    * total `__n`: the first n mod t tiles hold ⌈n/t⌉ rows. All integer
    * `div` — Column `/` is DOUBLE division, whose truncation misplaces the
    * rows sitting exactly on bucket boundaries. Shared by the single-order
    * path below and multi-dimension fusions (q_rfm_segment) so the bucket
    * arithmetic cannot drift between them.
    */
  def tileExpr(tiles: Int): String =
    s"""CASE WHEN __rank <= (__n % $tiles) * (__n div $tiles + 1)
       |  THEN (__rank - 1) div (__n div $tiles + 1) + 1
       |  ELSE (__n % $tiles) +
       |    (__rank - 1 - (__n % $tiles) * (__n div $tiles + 1))
       |      div greatest(__n div $tiles, 1L) + 1
       |END""".stripMargin

  def apply(df: DataFrame, tiles: Int, orderCols: Seq[Column],
      out: String = "ntile", parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // per-partition counts -> running offset of each partition's first row
    // (P rows; the single-partition window is over P, not the table)
    val wOff = Window.orderBy("__pid")
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .select(col("__pid"),
        coalesce(sum("__cnt").over(wOff.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("__off"),
        sum("__cnt").over(wOff.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("__n"))
    // local ranks: window keyed by __pid — max group size is one range
    // partition, never the whole table
    val wLocal = Window.partitionBy("__pid").orderBy(orderCols: _*)
    val ranked = ranged
      .withColumn("__lrn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), "__pid")
    // SQL NTILE: first `rem` buckets hold q+1 rows, the rest hold q. All
    // arithmetic in integer `div` — Column `/` is DOUBLE division, whose
    // truncation misplaces the rows sitting exactly on bucket boundaries.
    ranked
      .withColumn("__rank", col("__lrn") + col("__off"))
      .withColumn(out, expr(tileExpr(tiles)).cast("long"))
      .drop("__pid", "__lrn", "__off", "__cnt", "__n", "__rank")
  }
}
