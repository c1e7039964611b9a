package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group (SURVEY.md §2.4 O3) via a ranking window.
  *
  * One shuffle by the group key; within each reducer Spark keeps a running
  * window sort. For k << group size at extreme scale, pre-aggregate with a
  * partial top-k per map partition first (`groupBy(group).agg(min/max)`-style
  * pushdown) — Catalyst already inserts a partial sort + `WindowGroupLimit`
  * for rank filters like this, so the declarative form IS the optimized form
  * (verify with .explain: `WindowGroupLimit` appears below the shuffle).
  *
  * Ordering must be total (tie-broken) for deterministic output —
  * callers pass the tie-break columns explicitly.
  */
object TopKPerGroup {
  def apply(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }
}
