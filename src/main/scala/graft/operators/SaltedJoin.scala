package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigating equi join (SURVEY.md §4 / the 100 TB design notes):
  * append a random salt in [0, buckets) to the skewed (large) side's key and
  * replicate the small side once per salt value, so a hot key's rows spread
  * over `buckets` reducers instead of landing on one.
  *
  * Result is row-identical to `big.join(small, keys)` — salting only changes
  * the partitioning, never the match set. AQE's skew-join handles the same
  * problem adaptively for sort-merge joins; this is the explicit form for
  * when the skew is known up front (e.g. null-heavy foreign keys, power-law
  * device ids — the reference partitions its stream by device_id,
  * iot-data-stream.py:281, exactly the kind of key that goes power-law).
  *
  * The salt is a deterministic hash rather than rand(): a re-executed task
  * under retries/speculation must salt identically or rows are lost. Hash
  * input is the join keys plus the FIRST non-key column only — enough to
  * spread a hot key's rows (they differ in the payload), without paying a
  * per-row hash over an arbitrarily wide row.
  */
object SaltedJoin {
  def apply(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int = 16): DataFrame = {
    val saltCols = keys ++ big.columns.find(c => !keys.contains(c))
    val salted = big.withColumn(
      "__salt", pmod(hash(saltCols.map(col): _*), lit(buckets)))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
