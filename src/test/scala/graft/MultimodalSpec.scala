package graft

import graft.queries.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val payloads =
    Multimodal.withPayload(Tables.load(spark, sfDir, "documents"))

  test("payload carries the 8-byte header + utf8 body") {
    val r = payloads
      .join(Tables.load(spark, sfDir, "documents"), "doc_id")
      .select(col("doc_id"), length(col("payload")).as("nb"),
        length(col("text")).as("nt"))
      .collect()
    r.foreach(row => assert(row.getInt(1) == row.getInt(2) + 8))
  }

  test("stub decoder parses header fields and is batch-shaped per partition") {
    val feats = Multimodal.decodeImageStub(payloads.repartition(4)).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.magic_ok), "magic bytes mismatch")
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    feats.foreach { f =>
      assert(f.width == (docs(f.doc_id) % 256).toInt, s"doc ${f.doc_id} width")
      assert(f.mean_byte > 0.0 && f.mean_byte < 256.0)
    }
  }

  test("PPM parser decodes hand-crafted golden bytes exactly") {
    // 2x2 P6 with a header comment and known pixel values
    val header = "P6\n# golden\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array[Byte](
      10, 20, 30,   40, 50, 60,
      70, 80, 90,   100, 110, 120)
    val f = Multimodal.parsePpm(7L, header ++ raster)
    assert(f.width == 2 && f.height == 2 && f.maxval == 255 && f.n_pixels == 4)
    assert(f.mean_r == (10 + 40 + 70 + 100) / 4.0)
    assert(f.mean_g == (20 + 50 + 80 + 110) / 4.0)
    assert(f.mean_b == (30 + 60 + 90 + 120) / 4.0)
    assert(f.mean_gray == 65.0)
    // raster bytes above 127 must read unsigned
    val bright = Multimodal.parsePpm(8L,
      "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](-1, -1, -1))
    assert(bright.mean_gray == 255.0)
  }

  test("PPM writer emits valid P6 that the decoder round-trips") {
    val docs = Tables.load(spark, sfDir, "documents")
    val feats = Multimodal.decodePpm(
      Multimodal.withPpmPayload(docs).repartition(4)).collect()
    assert(feats.length == 500)
    val byId = docs.select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    feats.foreach { f =>
      assert(f.width == 4 && f.maxval == 255)
      assert(f.height == math.max(1, math.ceil(byId(f.doc_id) / 12.0).toInt),
        s"doc ${f.doc_id} height")
      assert(f.n_pixels == 4L * f.height)
      assert(f.mean_gray >= 0.0 && f.mean_gray <= 255.0)
    }
  }

  test("WAV parser decodes golden bytes exactly, including reordered chunks") {
    // writer round-trip: known samples -> known RMS/peak
    val samples = Array[Short](0, 100, -200, 300)
    val f = Multimodal.parseWav(3L, Multimodal.wavBytes(samples, 8000))
    assert(f.sample_rate == 8000 && f.n_channels == 1 && f.bits_per_sample == 16)
    assert(f.n_samples == 4 && f.peak == 300)
    val expectedRms = math.round(math.sqrt((0.0 + 100 * 100 + 200 * 200 + 300 * 300) / 4)
      * 10000).toDouble / 10000
    assert(f.rms == expectedRms)
    // a conforming-but-unusual file: data chunk BEFORE fmt, plus an unknown
    // odd-length chunk with its pad byte — a fixed-offset peek would fail
    val bb = java.nio.ByteBuffer.allocate(100)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(92).put("WAVE".getBytes("US-ASCII"))
    bb.put("junk".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3)).put(0.toByte)
    bb.put("data".getBytes("US-ASCII")).putInt(4).putShort(1000).putShort(-1000)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000).putShort(2).putShort(16)
    val g = Multimodal.parseWav(4L, java.util.Arrays.copyOf(bb.array(), bb.position()))
    assert(g.sample_rate == 16000 && g.n_samples == 2 && g.peak == 1000)
    assert(g.rms == 1000.0)
  }

  test("WAV writer emits valid RIFF that the decoder round-trips over documents") {
    val docs = Tables.load(spark, sfDir, "documents")
    val feats = Multimodal.decodeWav(
      Multimodal.withWavPayload(docs).repartition(4)).collect()
    assert(feats.length == 500)
    val byId = docs.select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    feats.foreach { f =>
      assert(f.sample_rate == 8000 && f.n_channels == 1 && f.bits_per_sample == 16)
      assert(f.n_samples == byId(f.doc_id).toLong, s"doc ${f.doc_id} samples")
      assert(f.peak <= 32768 && f.rms >= 0.0)
    }
  }

  test("resize stub keeps the header and decimates the body by the factor") {
    val df = Multimodal.resizeStub(payloads.limit(20), factor = 4)
      .select("doc_id", "payload", "payload_small").collect()
    df.foreach { r =>
      val full = r.getAs[Array[Byte]]("payload")
      val small = r.getAs[Array[Byte]]("payload_small")
      assert(small.take(8).sameElements(full.take(8)), "header preserved")
      val body = full.drop(8)
      val expect = body.indices.collect { case i if i % 4 == 0 => body(i) }
      assert(small.drop(8).sameElements(expect), "every 4th body byte kept")
    }
  }

  test("frame sampling slices the body into fixed-size binary frames") {
    val frames = Multimodal.sampleFrames(payloads, frameBytes = 16, stride = 64)
    val r = frames.select(col("doc_id"), length(col("frame")).as("fl")).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getInt(1) == 16))
    // every doc long enough yields at least one frame
    val docsWithFrames = r.map(_.getLong(0)).toSet
    val longDocs = Tables.load(spark, sfDir, "documents")
      .filter(length(col("text")) >= 24).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(longDocs.subsetOf(docsWithFrames))
  }
}
