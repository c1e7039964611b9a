package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan locality
  * (SURVEY.md §4 scale notes; Morton '66, the clustering scheme behind
  * Delta/Iceberg OPTIMIZE ZORDER).
  *
  * A table range-partitioned and sorted on ONE column prunes beautifully on
  * that column and not at all on any other: a predicate on the second
  * column touches every file. Interleaving the bits of two (or more)
  * rank-quantized columns into one sort key gives every involved column
  * partial locality — an n-file table answers a narrow predicate on EITHER
  * column from ~sqrt-scale file subsets instead of all files. At 100 TB
  * this is a write-once layout decision exactly like bucketing
  * ([[Bucketed]]): pay one global sort at ingest, every later selective
  * scan reads a small fraction of files (parquet row-group/file min-max
  * stats make the skipped files actual skipped IO).
  *
  * The z-value is pure integer bit arithmetic over pre-quantized inputs —
  * deterministic, portable, and codegen-friendly (a fixed 16-term
  * shift/mask expression tree, no UDF).
  */
object ZOrder {

  /** Interleave the low 16 bits of two quantized columns (a in even bit
    * positions, b in odd): z = Σ_i bit_i(a)·4^i·1 + bit_i(b)·4^i·2.
    */
  def zValue(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Quantize a numeric column to 16-bit rank space given its min/max (a
    * layout decision made from table stats, like choosing bucket counts).
    */
  def quantize(c: Column, min: Double, max: Double): Column =
    least(lit(65535L), greatest(lit(0L),
      ((c.cast("double") - min) / (max - min) * 65535.0).cast("long")))

  /** Write `df` z-ordered on two numeric columns: range-partition by the
    * z-value into `files` output files and sort within each, so file-level
    * min/max stats of BOTH columns are tight.
    */
  def write(df: DataFrame, colA: String, colB: String,
      aMin: Double, aMax: Double, bMin: Double, bMax: Double,
      path: String, files: Int): Unit = {
    val z = zValue(quantize(col(colA), aMin, aMax),
      quantize(col(colB), bMin, bMax))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
