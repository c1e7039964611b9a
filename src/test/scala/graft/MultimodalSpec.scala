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
