package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed parquet tables (SURVEY.md §4 scale notes): pre-shuffle a fact
  * table ONCE at write time so every subsequent equi join / aggregation on
  * the bucket key runs shuffle-free.
  *
  * At 100 TB this is the difference between re-shuffling 100 TB per join and
  * reading co-located buckets: `orders` and `lineitem` bucketed by order key
  * into the same bucket count join with zero Exchange in the plan
  * (BucketedJoinSpec asserts exactly that). Bucket count is a capacity
  * decision: target ~128-256 MB per bucket file at production scale.
  */
object Bucketed {

  /** Write `df` as a bucketed, bucket-sorted managed parquet table. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi join of two tables previously bucketed on the join keys with equal
    * bucket counts — planned with no shuffle on either side.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
