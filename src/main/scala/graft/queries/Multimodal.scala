package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.11 X5): image/audio/video carried as
  * opaque `binary` columns beside typed metadata, with decode / feature
  * extraction as batch-shaped per-partition transforms.
  *
  * The container has no image/audio codecs, so `decodeImageStub` is a
  * clearly-marked deterministic fake — but every piece of Spark plumbing
  * around it is real and tested: the binary schema, the partition-parallel
  * batched decode (mapPartitions — the Scala analog of mapInPandas batches),
  * the typed feature struct it returns, and the downstream aggregations.
  * Swapping the stub for a real JNI/codec call changes no plan shape.
  */
object Multimodal {

  /** A synthetic "image" payload derived deterministically from document
    * text: a fake 8-byte header (magic "GRFT", u16 width/height derived from
    * doc stats) followed by the utf-8 text bytes as the "pixel" payload.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("lang"),
      concat(
        to_binary(lit("47524654"), lit("hex")), // "GRFT" magic
        to_binary(lpad(hex(pmod(col("n_chars"), lit(256))), 4, "0"), lit("hex")),
        to_binary(lpad(hex(pmod(length(col("text")), lit(256))), 4, "0"), lit("hex")),
        encode(col("text"), "UTF-8")).as("payload"))

  final case class ImageFeatures(
      doc_id: Long, n_bytes: Long, magic_ok: Boolean,
      width: Int, height: Int, mean_byte: Double)

  /** STUB decoder — deterministic fake standing in for a real image codec.
    * Batch shape is real: one partition = one batch, rows streamed through
    * without materializing the partition.
    */
  def decodeImageStub(withPayloadDf: DataFrame): Dataset[ImageFeatures] = {
    import withPayloadDf.sparkSession.implicits._
    withPayloadDf.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, bytes) =>
          // ??? real codec goes here; fake parse of our synthetic header:
          val magicOk = bytes.length >= 8 &&
            bytes(0) == 'G' && bytes(1) == 'R' && bytes(2) == 'F' && bytes(3) == 'T'
          val w = if (bytes.length >= 6) ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff) else 0
          val h = if (bytes.length >= 8) ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff) else 0
          val body = bytes.drop(8)
          val mean = if (body.isEmpty) 0.0
            else body.map(b => (b & 0xff).toLong).sum.toDouble / body.length
          ImageFeatures(docId, bytes.length.toLong, magicOk, w, h,
            math.round(mean * 10000).toDouble / 10000)
        }
      }
  }

  /** "Frame sampling" for a video-like payload: every k-th byte window of the
    * body, as binary slices — pure expression-level slicing, no codec.
    */
  def sampleFrames(withPayloadDf: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    withPayloadDf.select(
      col("doc_id"),
      posexplode(
        transform(
          sequence(lit(9), length(col("payload")) - frameBytes, lit(stride)),
          off => substring(col("payload"), off, lit(frameBytes)))).as(Seq("frame_no", "frame")))

  /** "Resize" for an image-like payload: STUB downsample keeping every k-th
    * body byte (a real resize swaps the kernel, not the plumbing) — header
    * preserved, body decimated, still a `binary` column.
    */
  def resizeStub(withPayloadDf: DataFrame, factor: Int): DataFrame =
    withPayloadDf.withColumn("payload_small",
      concat(
        substring(col("payload"), 1, 8),
        call_function("to_binary",
          concat_ws("",
            transform(
              sequence(lit(9), length(col("payload")), lit(factor)),
              off => hex(substring(col("payload"), off, lit(1))))),
          lit("hex"))))

  val all: Seq[Q] = Seq(

    // ---- binary metadata surface: byte length / checksum / magic — all
    // engine-neutral functions, so this one IS oracle-checked
    Q("x5_multimodal_meta",
      (s, dir) =>
        withPayload(Tables.load(s, dir, "documents"))
          .select(
            col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            // md5 over the hex string (DuckDB's md5 is VARCHAR-only)
            md5(encode(hex(col("payload")), "UTF-8")).as("checksum"),
            substring(hex(col("payload")), 1, 8).as("magic_hex"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  octet_length(payload) AS n_bytes,
             |  md5(hex(payload)) AS checksum,
             |  substring(hex(payload), 1, 8) AS magic_hex
             |FROM (SELECT doc_id,
             |        ('\x47\x52\x46\x54'::BLOB ||
             |         from_hex(lpad(hex(n_chars % 256), 4, '0')) ||
             |         from_hex(lpad(hex(LENGTH(text) % 256), 4, '0')) ||
             |         encode(text)) AS payload
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ---- stubbed decode + feature aggregation (rows-only; plumbing pinned
    // by MultimodalSpec)
    Q("x5_multimodal_decode",
      (s, dir) => {
        val feats = decodeImageStub(withPayload(Tables.load(s, dir, "documents")))
        feats.toDF()
          .groupBy("magic_ok")
          .agg(count(lit(1)).as("n"),
            round(avg("mean_byte"), 2).as("avg_mean_byte"),
            max("n_bytes").as("max_bytes"))
          .orderBy("magic_ok")
      },
      None)
  )
}
