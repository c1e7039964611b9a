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
  *
  * Determinism: the device PROFILE (id, location, sensor subset, initial
  * values) is a pure function of (seed, deviceIndex), and every tick draws
  * from a Random seeded by splitmix64(seed, deviceIndex, tick) — so output
  * is identical at any partitioning AND the per-tick step can be replayed
  * incrementally by the STREAMING twin (streaming.Streams.generatorStream),
  * which carries only the sensor-value map as keyed state and produces
  * bit-identical readings (StreamingSpec pins stream == batch).
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

  /** splitmix64 finalizer (Steele et al., public domain): full-avalanche
    * mixing so per-tick Random seeds are uncorrelated (java.util.Random's
    * own scrambler is too weak for sequential seeds).
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def tickRng(seed: Long, deviceIdx: Long, tick: Long): Random =
    new Random(mix(seed * 0x9E3779B97F4A7C15L + deviceIdx * 0xBF58476D1CE4E5B9L + tick))

  /** Static per-device identity + the initial sensor values — pure in
    * (seed, deviceIdx), so batch and streaming twins derive the same device.
    */
  final case class DeviceProfile(
      deviceId: String, loc: Location, sensors: Seq[SensorConfig],
      initialValues: Map[String, Double])

  private[graft] def deviceProfile(deviceIdx: Long, seed: Long): DeviceProfile = {
    val rng = new Random(seed * 1000003L + deviceIdx)
    // "device_" + 8 hex chars (iot-data-stream.py:227)
    val deviceId = f"device_${rng.nextLong() & 0xFFFFFFFFL}%08x"
    val loc = locations(rng.nextInt(locations.length))
    // per-device sensor subset: 4-6 of the 6 types (iot-data-stream.py:234-236)
    val nSensors = 4 + rng.nextInt(3)
    val mySensors = rng.shuffle(sensorConfigs).take(nSensors).sortBy(_.name)
    // initial values uniform in range (iot-data-stream.py:128-137)
    val init = mySensors.map { sc =>
      sc.name -> roundTo(sc.min + rng.nextDouble() * (sc.max - sc.min), sc.precision)
    }.toMap
    DeviceProfile(deviceId, loc, mySensors, init)
  }

  /** One generation cycle (generate_reading, iot-data-stream.py:139-209):
    * given the carried sensor values, emit the new values and the reading
    * (None on the 2% non-reporting cycles). Shared verbatim by the batch
    * timeline and the streaming stateful twin.
    */
  private[graft] def tickStep(
      profile: DeviceProfile, values: Map[String, Double],
      deviceIdx: Long, tick: Long, seed: Long,
      tsMillis: Long): (Map[String, Double], Option[Reading]) = {
    val rng = tickRng(seed, deviceIdx, tick)
    // 98% per-cycle report probability (iot-data-stream.py:254)
    if (rng.nextDouble() >= reportProbability) (values, None)
    else {
      var next = values
      val readings = profile.sensors.map { sc =>
        val prev = next(sc.name)
        val next0 =
          if (rng.nextDouble() < anomalyProbability) {
            // anomaly: 50/50 pin to max / min (iot-data-stream.py:185-193)
            if (rng.nextBoolean()) sc.max else sc.min
          } else if (sc.monotoneDecay) {
            prev - rng.nextDouble() * sc.driftFactor // battery only decays
          } else {
            prev + (rng.nextDouble() * 2 - 1) * sc.driftFactor
          }
        val v = roundTo(math.max(sc.min, math.min(next0, sc.max)), sc.precision)
        next = next.updated(sc.name, v)
        sc.name -> SensorValue(v, sc.unit)
      }.toMap
      val jLat = profile.loc.lat + (rng.nextDouble() * 2 - 1) * 0.0001
      val jLon = profile.loc.lon + (rng.nextDouble() * 2 - 1) * 0.0001
      (next, Some(Reading(
        device_id = profile.deviceId,
        timestamp = new java.sql.Timestamp(tsMillis),
        location_id = profile.loc.id,
        location_name = profile.loc.name,
        coordinates = Coordinates(roundTo(jLat, 6), roundTo(jLon, 6)),
        readings = readings,
        status = weightedChoice(rng, statuses))))
    }
  }

  /** Generate the full timeline of one device, tick by tick. */
  private[gen] def deviceTimeline(
      deviceIdx: Long, ticks: Int, seed: Long, t0Millis: Long,
      tickMillis: Long): Iterator[Reading] = {
    val profile = deviceProfile(deviceIdx, seed)
    var values = profile.initialValues
    (0 until ticks).iterator.flatMap { t =>
      val (nv, reading) = tickStep(profile, values, deviceIdx, t.toLong, seed,
        t0Millis + t * tickMillis)
      values = nv
      reading
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
