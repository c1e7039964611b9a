package graft.tools

import graft.gen.Generator
import org.apache.spark.sql.{SaveMode, SparkSession}

/** CLI twin of the reference generator (`iot-data-stream.py` EP1,
  * README.md:7-17): emit `--devices` device timelines for `--ticks` cycles to
  * console / JSON / CSV / keyed parquet — the reference's console, --output
  * json|csv, and Kinesis (keyed store) fan-outs, Spark-shaped.
  *
  *   runMain graft.tools.GenerateMain --devices 10 --ticks 60 \
  *     --format json --out /tmp/readings
  *
  * `--format json-array` writes the reference's exact single-file
  * pretty-printed JSON array (iot-data-stream.py:299-309); `json` is the
  * distributed JSON-lines form.
  *
  * `--format parquet` partitions by device_id — the Kinesis
  * `PartitionKey=device_id` analog (iot-data-stream.py:281). No `--out`
  * prints a sample to the console like the reference's batch logging
  * (iot-data-stream.py:378-379).
  */
object GenerateMain {

  /** The reference's exact file shape: ONE pretty-printed JSON array
    * (iot-data-stream.py:299-309, json.dump(data, f, indent=2)). The rows
    * stream through the driver one partition at a time (`toLocalIterator`)
    * straight to the file — single-file output inherently serializes
    * through one writer, but nothing accumulates in memory; the distributed
    * path is `--format json` (JSON-lines).
    */
  def writeJsonArray(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val w = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path))
    try {
      w.write("[")
      val it = df.toJSON.toLocalIterator()
      var first = true
      while (it.hasNext) {
        w.write(if (first) "\n  " else ",\n  ")
        w.write(it.next())
        first = false
      }
      w.write("\n]")
    } finally w.close()
  }

  def main(args: Array[String]): Unit = {
    val a = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val devices = a.getOrElse("--devices", "10").toInt
    val ticks = a.getOrElse("--ticks", "60").toInt
    val seed = a.getOrElse("--seed", "42").toLong
    val format = a.getOrElse("--format", "console")
    val out = a.get("--out")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-generate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val readings = Generator.readings(spark, devices, ticks, seed)
    val flat = Generator.flatten(readings)

    (format, out) match {
      case ("json", Some(p)) => readings.toDF().write.mode(SaveMode.Overwrite).json(p)
      case ("json-array", Some(p)) => writeJsonArray(readings.toDF(), p)
      case ("csv", Some(p)) =>
        flat.write.mode(SaveMode.Overwrite).option("header", "true").csv(p)
      case ("parquet", Some(p)) =>
        flat.write.mode(SaveMode.Overwrite).partitionBy("device_id").parquet(p)
      case _ =>
        println(s"generated ${readings.count()} readings from $devices devices x $ticks ticks")
        flat.show(10, truncate = false)
    }
    spark.stop()
  }
}
