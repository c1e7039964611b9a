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
