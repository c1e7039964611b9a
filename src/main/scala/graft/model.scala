package graft

/** Typed data model for the reference's one logical entity — the IoT sensor
  * reading (SURVEY.md §1; record assembled at iot-data-stream.py:196-207).
  */
object model {

  /** coordinates struct (iot-data-stream.py:201-204). */
  final case class Coordinates(latitude: Double, longitude: Double)

  /** One sensor's reading: value + unit (iot-data-stream.py:176-179). */
  final case class SensorValue(value: Double, unit: String)

  /** The nested reading record. `readings` is a map because each device
    * carries only 4-6 of the 6 sensor types (iot-data-stream.py:234-236).
    */
  final case class Reading(
      device_id: String,
      timestamp: java.sql.Timestamp,
      location_id: String,
      location_name: String,
      coordinates: Coordinates,
      readings: Map[String, SensorValue],
      status: String)

  /** Sensor domain table, transcribed from iot-data-stream.py:54-98. */
  final case class SensorConfig(
      name: String, min: Double, max: Double, unit: String,
      precision: Int, driftFactor: Double, monotoneDecay: Boolean)

  val sensorConfigs: Seq[SensorConfig] = Seq(
    SensorConfig("temperature", -10.0, 45.0, "C", 1, 0.1, monotoneDecay = false),
    SensorConfig("humidity", 0.0, 100.0, "%", 1, 2.0, monotoneDecay = false),
    SensorConfig("pressure", 970.0, 1050.0, "hPa", 1, 0.5, monotoneDecay = false),
    SensorConfig("light_level", 0.0, 10000.0, "lux", 0, 50.0, monotoneDecay = false),
    SensorConfig("air_quality", 0.0, 500.0, "PM2.5", 1, 5.0, monotoneDecay = false),
    // battery only ever decays (iot-data-stream.py:96,161-163)
    SensorConfig("battery_level", 0.0, 100.0, "%", 0, 0.1, monotoneDecay = true))

  /** Locations table (iot-data-stream.py:101-107): id, name, base lat/lon. */
  final case class Location(id: String, name: String, lat: Double, lon: Double)

  val locations: Seq[Location] = Seq(
    Location("warehouse_a", "Warehouse A", 40.7128, -74.0060),
    Location("warehouse_b", "Warehouse B", 34.0522, -118.2437),
    Location("office_main", "Main Office", 41.8781, -87.6298),
    Location("production_floor", "Production Floor", 29.7604, -95.3698),
    Location("storage_cold", "Cold Storage", 47.6062, -122.3321))

  /** Status enum + weights (iot-data-stream.py:110-111). */
  val statuses: Seq[(String, Double)] = Seq(
    "operational" -> 0.95, "maintenance" -> 0.03, "warning" -> 0.015, "error" -> 0.005)

  /** Per-cycle reporting probability (iot-data-stream.py:254). */
  val reportProbability: Double = 0.98

  /** Anomaly injection rate (iot-data-stream.py:185). */
  val anomalyProbability: Double = 0.01
}
