package graft.gen

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Deterministic, distributed re-implementation of the reference's data
  * generator (SensorDevice / DataGenerator, iot-data-stream.py:115-257):
  * per-device sensor subset (4-6 of 6), random-walk drift with clamp+round,
  * monotone battery decay, 1% anomaly spike/drop, weighted status, 98%
  * per-cycle reporting.
  *
  * Scale design: one task generates one device's whole timeline
  * (`spark.range(nDevices).flatMap`), so the work is embarrassingly parallel
  * across devices and the per-device sequential drift state (the one
  * genuinely stateful computation in the reference) stays local to a task —
  * no shuffle, no driver loop. 1e6 devices x 1e3 ticks distributes evenly.
  * Determinism: every device's RNG is seeded with (seed, deviceIndex), so the
  * output is identical regardless of partitioning or cluster size.
  */
object Generator {

  /** Weighted choice via cumulative CDF walk (iot-data-stream.py:182). */
  private[gen] def weightedChoice(rng: Random, weighted: Seq[(String, Double)]): String = {
    val x = rng.nextDouble()
    var acc = 0.0
    for ((v, w) <- weighted) { acc += w; if (x < acc) return v }
    weighted.last._1
  }

  private[gen] def roundTo(v: Double, p: Int): Double = {
    val m = math.pow(10, p.toDouble)
    math.round(v * m) / m
  }

  /** Generate the full timeline of one device. Mirrors generate_reading
    * (iot-data-stream.py:139-209) tick by tick.
    */
  private[gen] def deviceTimeline(
      deviceIdx: Long, ticks: Int, seed: Long, t0Millis: Long,
      tickMillis: Long): Iterator[Reading] = {
    val rng = new Random(seed * 1000003L + deviceIdx)
    // "device_" + 8 hex chars (iot-data-stream.py:227)
    val deviceId = f"device_${rng.nextLong() & 0xFFFFFFFFL}%08x"
    val loc = locations(rng.nextInt(locations.length))
    // per-device sensor subset: 4-6 of the 6 types (iot-data-stream.py:234-236)
    val nSensors = 4 + rng.nextInt(3)
    val mySensors = rng.shuffle(sensorConfigs).take(nSensors).sortBy(_.name)
    // initial values uniform in range (iot-data-stream.py:128-137)
    val state = scala.collection.mutable.Map[String, Double]()
    mySensors.foreach { sc =>
      state(sc.name) = roundTo(sc.min + rng.nextDouble() * (sc.max - sc.min), sc.precision)
    }
    (0 until ticks).iterator.flatMap { t =>
      // 98% per-cycle report probability (iot-data-stream.py:254)
      if (rng.nextDouble() >= reportProbability) None
      else {
        val readings = mySensors.map { sc =>
          val prev = state(sc.name)
          val next0 =
            if (rng.nextDouble() < anomalyProbability) {
              // anomaly: 50/50 pin to max / min (iot-data-stream.py:185-193)
              if (rng.nextBoolean()) sc.max else sc.min
            } else if (sc.monotoneDecay) {
              prev - rng.nextDouble() * sc.driftFactor // battery only decays
            } else {
              prev + (rng.nextDouble() * 2 - 1) * sc.driftFactor
            }
          val next = roundTo(math.max(sc.min, math.min(next0, sc.max)), sc.precision)
          state(sc.name) = next
          sc.name -> SensorValue(next, sc.unit)
        }.toMap
        val jLat = loc.lat + (rng.nextDouble() * 2 - 1) * 0.0001
        val jLon = loc.lon + (rng.nextDouble() * 2 - 1) * 0.0001
        Some(Reading(
          device_id = deviceId,
          timestamp = new java.sql.Timestamp(t0Millis + t * tickMillis),
          location_id = loc.id,
          location_name = loc.name,
          coordinates = Coordinates(roundTo(jLat, 6), roundTo(jLon, 6)),
          readings = readings,
          status = weightedChoice(rng, statuses)))
      }
    }
  }

  /** Distributed batch generation: `nDevices` devices x `ticks` cycles. */
  def readings(spark: SparkSession, nDevices: Int, ticks: Int,
      seed: Long = 42L, t0Millis: Long = 1704067200000L, // 2024-01-01T00:00Z
      tickMillis: Long = 1000L): Dataset[Reading] = {
    import spark.implicits._
    // slices scale with the cluster (4 waves per core), capped by device
    // count; per-device seeding keeps output identical at any slicing
    val slices = math.max(1,
      math.min(nDevices, spark.sparkContext.defaultParallelism * 4))
    spark.range(0, nDevices.toLong, 1, slices)
      .flatMap(i => deviceTimeline(i, ticks, seed, t0Millis, tickMillis))
  }

  /** Flatten the nested record to the reference's wide CSV schema
    * (iot-data-stream.py:326-341; FIXTURES.md §A2): one `{sensor}_value` /
    * `{sensor}_unit` pair per sensor type, null when the device lacks it
    * (MapType element_at is null-safe on missing keys).
    */
  def flatten(ds: Dataset[Reading]): DataFrame = {
    val base = ds.toDF().select(
      col("device_id"), col("timestamp"), col("location_id"), col("location_name"),
      col("coordinates.latitude").as("latitude"),
      col("coordinates.longitude").as("longitude"),
      col("status"), col("readings"))
    sensorConfigs.foldLeft(base) { (df, sc) =>
      df.withColumn(s"${sc.name}_value",
          element_at(col("readings"), sc.name).getField("value"))
        .withColumn(s"${sc.name}_unit",
          element_at(col("readings"), sc.name).getField("unit"))
    }.drop("readings")
  }
}
