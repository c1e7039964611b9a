package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the rows-only dashboard queries (they run on generated
  * data, so the driver's DuckDB oracle can't see them; these assertions are
  * their contract).
  */
class DashboardSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, SparkTestSession.sfDir)

  test("status counts sum to the total reading count and sort desc") {
    val counts = q("q_iot_status_counts").as[(String, Long)].collect()
    assert(counts.map(_._2).sorted.reverse.sameElements(counts.map(_._2)),
      "must be sorted desc by n")
    val total = q("q_iot_flatten").count()
    assert(counts.map(_._2).sum == total)
    // weighted statuses: operational dominates (0.95 weight)
    assert(counts.head._1 == "operational")
  }

  test("latest-per-device has exactly one row per device") {
    val latest = q("q_iot_latest").select("device_id").as[String].collect()
    assert(latest.distinct.length == latest.length)
    val devices = q("q_iot_devices").select("device_id").distinct().count()
    assert(latest.length == devices)
  }

  test("location filter returns only the selected location's readings") {
    val rows = q("q_iot_location_filter").collect()
    assert(rows.length <= 2000, "O2 limit applies")
    // joined back: every row's device belongs to warehouse_a
    val devByLoc = q("q_iot_devices").as[(String, String)].collect().toMap
    rows.foreach(r => assert(devByLoc(r.getString(0)) == "warehouse_a"))
  }

  test("location stats cover every location with consistent counts") {
    val stats = q("q_iot_location_stats")
      .select("location_id", "n").as[(String, Long)].collect().toMap
    val total = q("q_iot_flatten").count()
    assert(stats.values.sum == total)
    assert(stats.keySet == q("q_iot_devices").select("location_id")
      .distinct().as[String].collect().toSet)
  }

  test("battery audit: battery only ever decreases absent anomalies' resets") {
    val audit = q("q_iot_battery_audit")
      .select("device_id", "n_readings", "n_increases")
      .as[(String, Long, Long)].collect()
    assert(audit.nonEmpty)
    // anomaly rate is 1%; increases can only come from anomaly pins
    val totalReadings = audit.map(_._2).sum
    val totalIncreases = audit.map(_._3).sum
    assert(totalIncreases.toDouble / totalReadings < 0.05,
      s"$totalIncreases increases over $totalReadings readings")
  }
}
