package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Targeted-deletion rewrite — the "right to be forgotten" table operation:
  * drop every row whose `keyCol` matches the deletion set, rewrite the
  * parquet directory, swap atomically (FileSwap — a failed rewrite can
  * never destroy the only copy), and return (kept, dropped) as the audit
  * record a deletion request needs.
  *
  * Scale shape: the deletion list is always small relative to the table, so
  * the rewrite is ONE scan with a broadcast anti-join (never a shuffle of
  * the table on the key); at 100 TB this runs per partition-directory on a
  * schedule, exactly like [[Compact]], and only partitions that can contain
  * a deleted key (partition pruning / min-max stats) need rewriting at all.
  */
object Forget {

  /** Small in-memory deletion lists. */
  def apply(spark: SparkSession, path: String, keyCol: String,
      keys: Seq[Any]): (Long, Long) = {
    import spark.implicits._
    val keyDf = keys.map(_.toString).toDF("__forget_key")
    rewrite(spark, path, col(keyCol).cast("string"), keyDf)
  }

  /** Deletion set as a DataFrame (single column) — the queue-of-requests
    * form; anti-joined broadcast.
    */
  def apply(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame): (Long, Long) = {
    val keyDf = keys.toDF("__forget_key")
      .select(col("__forget_key").cast("string"))
    rewrite(spark, path, col(keyCol).cast("string"), keyDf)
  }

  private def rewrite(spark: SparkSession, path: String,
      keyExpr: org.apache.spark.sql.Column, keyDf: DataFrame): (Long, Long) = {
    val df = spark.read.parquet(path)
    val total = df.count()
    val keep = df.join(broadcast(keyDf),
      keyExpr === col("__forget_key"), "left_anti")
    val tmp = path + ".forget"
    keep.write.mode(SaveMode.Overwrite).parquet(tmp)
    val kept = spark.read.parquet(tmp).count()
    FileSwap.replace(new java.io.File(path), new java.io.File(tmp))
    (kept, total - kept)
  }
}
