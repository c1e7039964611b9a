package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join (SURVEY.md §2.5 J5): for every left row, attach the
  * most recent right row with the same key at-or-before the left row's time.
  *
  * Implemented as union + last-ignoring-nulls window rather than a per-row
  * range probe: ONE shuffle by key, then a linear scan per key — the shape
  * that survives 100 TB (a correlated subquery or point-in-interval join
  * re-scans the right side per left row). Right rows sort before left rows
  * on timestamp ties, matching "at-or-before" semantics.
  *
  * The reference has no joins at all; this is the relational generalization
  * of its "latest reading for the selected device" dashboard pattern
  * (iot_dashboard.py:147-157).
  *
  * @param left      probe side
  * @param right     reference side whose latest-at-or-before row is wanted
  * @param key       equi key column name present on both sides
  * @param leftTime  event-time column on `left`
  * @param rightTime event-time column on `right`
  * @param rightVals right columns to carry (renamed as given)
  */
object AsOfJoin {
  def apply(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val lCols = left.columns
    // The carried right columns travel as ONE struct filled by a single
    // last(ignoreNulls) — filling each column independently would mix
    // columns from different right rows whenever the latest right row holds
    // a NULL in one of them (and would fill a genuinely-null latest value
    // through from an older row).
    val rvStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => right.schema(v).copy(name = v)))
    val l = left.select(
      col(key) +: col(leftTime).as("__t") +: lit(1).as("__tag") +:
        lCols.filterNot(c => c == key).map(col) ++:
        Seq(lit(null).cast(rvStructType).as("__rv")): _*)
    val r = right.select(
      col(key) +: col(rightTime).as("__t") +: lit(0).as("__tag") +:
        lCols.filterNot(c => c == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        Seq(struct(rightVals.map(v => col(v).as(v)): _*).as("__rv")): _*)
    // Tie-break: right rows sharing (key, time) would otherwise leave
    // last() partition-order-dependent; ordering by the carried struct
    // makes "latest" deterministic (greatest value tuple wins).
    val w = Window.partitionBy(key)
      .orderBy(col("__t"), col("__tag"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = l.unionByName(r)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    filled.filter(col("__tag") === 1)
      .select(
        col(key) +: col("__t").as(leftTime) +:
          lCols.filterNot(c => c == key || c == leftTime).map(col) ++:
          rightVals.map(v => col("__rv").getField(v).as(v)): _*)
  }
}
