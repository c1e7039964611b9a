package graft

import graft.queries.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

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

  test("row-gradient phash on golden rasters: widths the oracle can't cover") {
    // 2-wide, 4-row raster with known row sums 60, 330, 60, 330:
    // gradients (60>330)=0, (330>60)=1, (60>330)=0 -> hash 0b010 = 2
    val h4 = "P6\n2 4\n255\n".getBytes("US-ASCII")
    val r4 = Array[Byte](
      10, 10, 10,   10, 10, 10, // row 0 sum 60
      55, 55, 55,   55, 55, 55, // row 1 sum 330
      10, 10, 10,   10, 10, 10, // row 2 sum 60
      55, 55, 55,   55, 55, 55) // row 3 sum 330
    val (_, hash, rows) = Multimodal.ppmRowHash(1L, h4 ++ r4)
    assert(rows == 4 && hash == 2L, s"hash $hash rows $rows")
    // single-row image: no gradients, hash 0
    val h1 = "P6\n3 1\n255\n".getBytes("US-ASCII")
    val r1 = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    assert(Multimodal.ppmRowHash(2L, h1 ++ r1) == ((2L, 0L, 1)))
    // unsigned read: a 0xFF row must outweigh a 0x01 row
    val h2 = "P6\n1 2\n255\n".getBytes("US-ASCII")
    val r2 = Array[Byte](-1, -1, -1, 1, 1, 1)
    assert(Multimodal.ppmRowHash(3L, h2 ++ r2)._2 == 1L)
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

  test("y4m parser decodes golden bytes: tag order, X tags, frame params") {
    // hand-crafted stream our writer never emits: reordered header tags,
    // an X extension tag, and a parameterized FRAME marker — a parser
    // hard-wired to the writer's layout would fail all three
    val golden = ("YUV4MPEG2 F25:1 Ip A1:1 XCOLORRANGE=FULL W2 H2 C444\n" +
      "FRAME\n" + "ABCD" + "EFGH" + "IJKL" +
      "FRAME IX\n" + "MNOP" + "QRST" + "UVWX").getBytes("US-ASCII")
    val f = Multimodal.parseY4m(7L, golden)
    assert(f.width == 2 && f.height == 2 && f.fps_num == 25 && f.fps_den == 1)
    assert(f.n_frames == 2 && f.duration_ms == 2 * 1000 / 25)
    // luma = the Y plane (first 4 bytes of each frame)
    val sums = Multimodal.y4mLumaSums(7L, golden).map(_._2)
    assert(sums == Seq("ABCD".map(_.toLong).sum, "MNOP".map(_.toLong).sum))
  }

  test("y4m writer emits valid streams the decoder round-trips over documents") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val feats = Multimodal.withY4mPayload(docs).repartition(4)
      .mapPartitions(_.map { case (id, b) => Multimodal.parseY4m(id, b) })
      .collect()
    assert(feats.length == 500)
    val byId = docs.select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    feats.foreach { f =>
      assert(f.width == 2 && f.height == 2 && f.fps_num == 8)
      assert(f.n_frames == math.max(1, (byId(f.doc_id) + 11) / 12).toLong,
        s"doc ${f.doc_id} frames")
      assert(f.duration_ms == f.n_frames * 125)
    }
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

      test("PPM resize: nearest-neighbor on a golden raster, output is valid P6") {
    // 4x2, each pixel r=10*idx so positions are distinguishable
    val header = "P6\n4 2\n255\n".getBytes("US-ASCII")
    val raster = (0 until 8).flatMap(i =>
      Seq((10 * i).toByte, 1.toByte, 2.toByte)).toArray
    val small = Multimodal.resizePpm(1L, header ++ raster, factor = 2)
    // 4x2 / 2 -> 2x1: kept pixels are (0,0) and (2,0) -> r values 0 and 20
    val f = Multimodal.parsePpm(1L, small)
    assert(f.width == 2 && f.height == 1 && f.n_pixels == 2)
    assert(f.mean_r == (0 + 20) / 2.0)
    // ceil-divided dims: 3x3 / 2 -> 2x2, kept (0,0),(2,0),(0,2),(2,2)
    val h3 = "P6\n3 3\n255\n".getBytes("US-ASCII")
    val r3 = (0 until 9).flatMap(i => Seq(i.toByte, 0.toByte, 0.toByte)).toArray
    val f3 = Multimodal.parsePpm(2L, Multimodal.resizePpm(2L, h3 ++ r3, 2))
    assert(f3.width == 2 && f3.height == 2)
    assert(f3.mean_r == (0 + 2 + 6 + 8) / 4.0)
    // factor 1 is identity
    val id1 = Multimodal.resizePpm(3L, header ++ raster, 1)
    assert(Multimodal.parsePpm(3L, id1) == Multimodal.parsePpm(3L, header ++ raster))
  }

  test("WAV frame sampler: frame edges and energies on golden samples") {
    import spark.implicits._
    // 5 samples, frameLen=2, hop=2 -> frames [0,1],[2,3],[4] (tail kept)
    val samples = Array[Short](100, -100, 200, -200, 300)
    val wav = Multimodal.wavBytes(samples, sampleRate = 8000)
    val frames = Multimodal.frameWav(Seq((9L, wav)).toDS(), frameLen = 2, hop = 2)
      .collect().sortBy(_.frame_no)
    assert(frames.length == 3)
    assert(frames.map(_.n_samples).toSeq == Seq(2, 2, 1))
    assert(frames(0).rms == 100.0 && frames(0).peak == 100)
    assert(frames(1).rms == 200.0 && frames(1).peak == 200)
    assert(frames(2).rms == 300.0 && frames(2).peak == 300)
    // strided hop skips samples: hop=4 -> frames start at 0 and 4
    val strided = Multimodal.frameWav(Seq((9L, wav)).toDS(), frameLen = 2, hop = 4)
      .collect().sortBy(_.frame_no)
    assert(strided.map(_.n_samples).toSeq == Seq(2, 1))
    assert(strided(1).peak == 300)
    // empty data chunk -> no frames... a zero-sample wav still yields one
    // zero-length frame record (the `max(n,1)` guard), rms 0
    val empty = Multimodal.frameWav(
      Seq((10L, Multimodal.wavBytes(Array.empty[Short], 8000))).toDS(), 2, 2)
      .collect()
    assert(empty.length == 1 && empty(0).n_samples == 0 && empty(0).rms == 0.0)
  }

  test("radix-2 FFT: impulse, pure tones, naive-DFT agreement, Parseval") {
    import graft.functions.Fft
    // impulse -> flat spectrum of 1s
    val re = new Array[Double](16); val im = new Array[Double](16)
    re(0) = 1.0
    Fft.transform(re, im)
    (0 until 16).foreach { k =>
      assert(math.abs(re(k) - 1.0) < 1e-12 && math.abs(im(k)) < 1e-12)
    }
    // pure tone at bin b of an n-point frame peaks exactly at bin b
    for (n <- Seq(16, 64, 256); b <- Seq(1, 3, n / 4)) {
      val x = Array.tabulate(n)(i => math.cos(2 * math.Pi * b * i / n) * 1000)
      val spec = Fft.powerSpectrum(x, n)
      val peak = (1 until n / 2).maxBy(k => spec(k))
      assert(peak == b, s"n=$n tone at $b peaked at $peak")
      // |X_b|^2 = (A*n/2)^2 for an exact-bin cosine
      assert(math.abs(spec(b) - math.pow(1000.0 * n / 2, 2)) < 1e-3 * spec(b))
    }
    // agreement with the naive O(n^2) DFT on a fixed pseudo-random signal
    val n = 64
    var seed = 12345L
    val sig = Array.fill(n) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33).toInt % 32768).toDouble
    }
    val fft = Fft.powerSpectrum(sig, n)
    val dft = Array.tabulate(n / 2 + 1) { k =>
      var sr = 0.0; var si = 0.0
      for (i <- 0 until n) {
        sr += sig(i) * math.cos(2 * math.Pi * k * i / n)
        si += sig(i) * math.sin(2 * math.Pi * k * i / n)
      }
      sr * sr + si * si
    }
    (0 to n / 2).foreach { k =>
      assert(math.abs(fft(k) - dft(k)) <= 1e-9 * (dft(k) + 1.0),
        s"bin $k fft=${fft(k)} dft=${dft(k)}")
    }
    // Parseval: sum|x|^2 == (1/n) sum|X|^2
    val reP = sig.clone(); val imP = new Array[Double](n)
    Fft.transform(reP, imP)
    val lhs = sig.map(v => v * v).sum
    val rhs = (0 until n).map(k => reP(k) * reP(k) + imP(k) * imP(k)).sum / n
    assert(math.abs(lhs - rhs) < 1e-6 * lhs)
  }

  test("spectral fingerprint catches amplitude-enveloped copies that the " +
      "energy hash misses, and separates a different melody") {
    // a melody: per-16-sample-frame pure tones at these bins (2..7)
    val melody = Seq(2, 5, 3, 7, 4, 6, 2, 7, 3, 5, 6, 2, 4, 7, 5, 3, 6, 4, 2, 5)
    def toneWav(bins: Seq[Int], amps: Seq[Int]): Array[Byte] = {
      val samples = bins.zip(amps).flatMap { case (b, a) =>
        (0 until 16).map(i =>
          math.round(a * math.cos(2 * math.Pi * b * i / 16)).toShort)
      }.toArray
      Multimodal.wavBytes(samples, 8000)
    }
    // A: zig-zag loudness; B: the same melody at constant loudness — the
    // "re-normalized copy" a curation dedup must still catch
    val ampsA = melody.indices.map(i => if (i % 2 == 0) 9000 else 3000)
    val ampsB = melody.indices.map(_ => 6000)
    // C: a different melody, same loudness pattern as A
    val melodyC = Seq(7, 2, 6, 3, 5, 4, 7, 2, 6, 3, 4, 5, 7, 2, 3, 6, 4, 5, 7, 2)
    val wavA = toneWav(melody, ampsA)
    val wavB = toneWav(melody, ampsB)
    val wavC = toneWav(melodyC, ampsA)
    val (_, sfpA, nfA) = Multimodal.wavSpectralHash(1L, wavA)
    val (_, sfpB, _) = Multimodal.wavSpectralHash(2L, wavB)
    val (_, sfpC, _) = Multimodal.wavSpectralHash(3L, wavC)
    val (_, afpA, _) = Multimodal.wavEnergyHash(1L, wavA)
    val (_, afpB, _) = Multimodal.wavEnergyHash(2L, wavB)
    assert(nfA == melody.length)
    // spectral: the enveloped copy keeps its pitch contour -> identical
    assert(sfpA == sfpB, s"spectral fp should ignore amplitude: $sfpA vs $sfpB")
    // energy: the zig-zag vs flat envelope scrambles the loudness contour
    val energyHamming = java.lang.Long.bitCount(afpA ^ afpB)
    assert(energyHamming > 2,
      s"fixture should defeat the energy hash (hamming $energyHamming)")
    // and a genuinely different melody is far from A spectrally
    val specHamming = java.lang.Long.bitCount(sfpA ^ sfpC)
    assert(specHamming > 2, s"different melody too close: hamming $specHamming")
  }
}
