package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-cost data-quality counters via `Dataset.observe`: metrics are
  * accumulated inside the existing job (no second scan — at 100 TB a
  * separate `count()`-style audit pass doubles the read). Attach before the
  * action; read the observation after it completes.
  *
  * Built on [[org.apache.spark.sql.Observation]] (listener-based), so the
  * metrics populate for ANY action on the returned DataFrame — including
  * `write.parquet`, which runs through DataFrameWriter's own QueryExecution
  * and would be invisible to `queryExecution.observedMetrics` on the plan
  * handle.
  *
  * The reference does this client-side after the fetch
  * (iot_dashboard.py:77-82 existence checks, :134 record count); observe
  * moves the audit into the distributed plan.
  *
  * {{{
  * val (audited, get) = QualityMetrics.audit(df, "load", Seq("temperature"))
  * audited.write.parquet(out)       // metrics accumulate during the write
  * val m = get()                    // rows, nulls per column
  * }}}
  */
object QualityMetrics {
  def audit(df: DataFrame, name: String, nullCheckCols: Seq[String])
      : (DataFrame, () => Map[String, Long]) = {
    val metrics =
      count(lit(1)).as("rows") +:
        nullCheckCols.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    val obs = new Observation(name)
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    val read = () =>
      obs.get.map { case (k, v) =>
        // count/sum(long) both surface as Long; sum over an empty frame is null
        k -> Option(v).map(_.asInstanceOf[Long]).getOrElse(0L)
      }
    (observed, read)
  }
}
