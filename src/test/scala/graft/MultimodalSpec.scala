package graft

import graft.multimodal.{MediaHeaders, MediaRecord, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: the typed mapPartitions pipeline agrees with the
  * SQL surface, and the stub codec stages behave. */
class MultimodalSpec extends SparkSpec {

  test("extractFeatures (mapPartitions) matches the SQL-surface query on hash+length") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val viaDs = Multimodal.extractFeatures(media)
      .select($"media_id", $"payload_len", $"content_hash")
    val viaSql = Multimodal.q37MediaFeatures(spark, sf0001)
      .select($"media_id", $"payload_len", $"content_hash")
    assert(viaDs.except(viaSql).count() === 0)
    assert(viaSql.except(viaDs).count() === 0)
  }

  test("decode fallback: deterministic byte-statistic features for non-PNG bytes") {
    val f = Multimodal.Codecs.decodeFeatures("abc".getBytes)
    assert(f.toSeq === Seq(3.0, (97 + 98 + 99) / 3.0, 97.0, 99.0))
    assert(Multimodal.Codecs.decodeFeatures(Array.emptyByteArray).toSeq === Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("pngPixelBytes/pngPixels invert exactly across all 5 scanline filter types " +
    "and a multi-IDAT stream; corrupt/foreign bytes decode to None, not a throw") {
    // 6 rows ⇒ filter types 0,1,2,3,4,0 all exercised; adversarial pixel
    // pattern spans the byte range so filter deltas wrap mod 256
    val (w, h) = (7, 6)
    val px = Array.tabulate(w * h)(i => (i * 37 + (i * i) % 251) % 256)
    val png = MediaHeaders.pngPixelBytes(w, h, px)
    val Some((dw, dh, dpx)) = MediaHeaders.pngPixels(png)
    assert((dw, dh) === (w.toLong, h.toLong))
    assert(dpx.toSeq === px.toSeq)
    // header-level parser agrees on the dims of a pixel-bearing PNG
    assert(MediaHeaders.pngDims(png) === Some((w.toLong, h.toLong)))
    // a 1x1 image (no left/up neighbors anywhere) roundtrips too
    assert(MediaHeaders.pngPixels(MediaHeaders.pngPixelBytes(1, 1, Array(200)))
      .get._3.toSeq === Seq(200))
    // failure paths: truncated zlib stream, non-PNG, header-only PNG
    // (q110's uncompressed-IDAT writer), unsupported color type
    assert(MediaHeaders.pngPixels(png.dropRight(30)) === None)
    assert(MediaHeaders.pngPixels("not a png".getBytes) === None)
    assert(MediaHeaders.pngPixels(MediaHeaders.pngBytes(4, 4, "xx".getBytes)) === None)
    assert(MediaHeaders.pngPixels(Array.emptyByteArray) === None)
  }

  test("JpegCodec: block-constant images round-trip BIT-EXACTLY across every " +
    "8-bit value (the q163 exactness contract), including cropped odd dims") {
    import graft.multimodal.JpegCodec
    // 32x64 = 4x8 blocks = 32 blocks/image; 8 images cover all 256 values
    for (base <- 0 until 256 by 32) {
      val (w, h) = (32, 64)
      val px = Array.tabulate(w * h) { i =>
        (base + (i / w / 8) * 4 + (i % w / 8)) % 256
      }
      val jpg = JpegCodec.encode(w, h, px)
      val Some((dw, dh, dpx)) = JpegCodec.decode(jpg)
      assert((dw, dh) === (w.toLong, h.toLong))
      assert(dpx.toSeq === px.toSeq, s"block-constant mismatch at base $base")
    }
    // odd dims + whole-image constant: edge-replicated pad blocks stay
    // constant, so the cropped result is still exact
    val odd = JpegCodec.encode(13, 11, Array.fill(13 * 11)(177))
    assert(JpegCodec.decode(odd).get._3.toSeq === Seq.fill(13 * 11)(177))
    // the header-level parser reads the same dims from a pixel JPEG
    assert(MediaHeaders.jpegDims(odd) === Some((13L, 11L)))
  }

  test("JpegCodec: arbitrary images round-trip within the quantization error " +
    "budget (lossy but close); corrupt/foreign bytes decode to None, not a throw") {
    import graft.multimodal.JpegCodec
    val (w, h) = (24, 17) // non-multiple-of-8 height
    val px = Array.tabulate(w * h)(i => (i % w * 5 + i / w * 7) % 256)
    val Some((dw, dh, dpx)) = JpegCodec.decode(JpegCodec.encode(w, h, px))
    assert((dw, dh) === (w.toLong, h.toLong))
    val errs = px.indices.map(i => math.abs(dpx(i) - px(i)))
    assert(errs.max <= 40, s"max |err| ${errs.max} exceeds the lossy budget")
    assert(errs.sum.toDouble / errs.size <= 8.0, "mean |err| exceeds the lossy budget")
    // failure paths: truncation, header-only synthetic JPEG (q110's
    // writer has no DQT/DHT/SOS), PNG bytes, empty
    val good = JpegCodec.encode(16, 16, Array.fill(256)(90))
    assert(JpegCodec.decode(good.dropRight(20)) === None)
    assert(JpegCodec.decode(MediaHeaders.jpegBytes(4, 4, "xx".getBytes)) === None)
    assert(JpegCodec.decode(MediaHeaders.pngPixelBytes(4, 3, Array.fill(12)(5))) === None)
    assert(JpegCodec.decode(Array.emptyByteArray) === None)
  }

  test("JpegCodec decoder is table-driven, not encoder-shaped: a spliced DRI " +
    "segment and a COM segment are honored/skipped, and MJPEG boundary " +
    "detection stays sound on real entropy streams (stuffing keeps raw " +
    "SOI/EOI out of scan data)") {
    import graft.multimodal.JpegCodec
    val px = Array.tabulate(64)(i => (i * 41) % 256)
    val jpg = JpegCodec.encode(8, 8, px)
    val Some((_, _, base)) = JpegCodec.decode(jpg)
    // splice DRI (interval 7 > 1 block => never fires) + a COM right after SOI
    val dri = Array(0xFF, 0xDD, 0x00, 0x04, 0x00, 0x07).map(_.toByte)
    val com = Array(0xFF, 0xFE, 0x00, 0x06) .map(_.toByte) ++ "note".getBytes
    val spliced = jpg.take(2) ++ dri ++ com ++ jpg.drop(2)
    assert(JpegCodec.decode(spliced).get._3.toSeq === base.toSeq)
    // three real frames concatenate and split back on exact boundaries
    val frames = (0 to 2).map(k => JpegCodec.encode(8, 8, px.map(v => (v + k) % 256)))
    val split = MediaHeaders.mjpegFrames(MediaHeaders.mjpegBytes(frames))
    assert(split.size === 3)
    split.zip(frames).foreach { case (got, want) => assert(got.toSeq === want.toSeq) }
  }

  test("Codecs.decodeFeatures on a decodable baseline JPEG returns REAL pixel " +
    "moments (the PNG path's sibling)") {
    import graft.multimodal.JpegCodec
    val px = Array.fill(16 * 8)(140) // one constant 2-block image: exact decode
    val jpg = JpegCodec.encode(16, 8, px)
    assert(Multimodal.Codecs.decodeFeatures(jpg).toSeq === Seq(128.0, 140.0, 0.0, 16.0))
  }

  test("q164 finds the PLANTED cross-container dups — pixel-identical images " +
    "stored as PNG vs JPEG pair up, same-container and different-content " +
    "pairs never do, and every reported pair decode-verifies equal") {
    import graft.multimodal.JpegCodec
    val rows = Multimodal.q164CrossContainerDups(spark, sf0001).collect()
    assert(rows.nonEmpty, "the fixture plants quad dups; none found")
    // every reported pair is cross-container by construction of the query;
    // re-decode both payloads and verify the pixels REALLY are identical
    val payloads = Multimodal.mixedContainerImages(spark, sf0001)
      .collect().map(m => m.media_id -> m.data).toMap
    def pixels(id: Long): Seq[Int] = {
      val d = payloads(id)
      MediaHeaders.pngPixels(d).orElse(JpegCodec.decode(d)).get._3.toSeq
    }
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getString(2) !== r.getString(3), s"same-container pair ($a, $b)")
      assert(pixels(a) === pixels(b), s"pair ($a, $b) reported but pixels differ")
    }
    // parity of the fixture: even ids are PNG, odd are JPEG — so every
    // pair joins one even and one odd id
    rows.foreach { r =>
      assert((r.getLong(0) + r.getLong(1)) % 2 === 1,
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) has same-parity ids")
    }
  }

  test("Codecs.decodeFeatures on a decodable PNG returns REAL pixel moments, " +
    "not byte statistics") {
    val px = Array.tabulate(12)(i => i * 20) // 4x3, mean 110, known variance
    val png = MediaHeaders.pngPixelBytes(4, 3, px)
    val f = Multimodal.Codecs.decodeFeatures(png)
    val mean = px.sum.toDouble / px.length
    val variance = px.map(v => v.toDouble * v).sum / px.length - mean * mean
    assert(f.toSeq === Seq(12.0, mean, variance, 4.0))
  }

  test("resize stub: batch shape") {
    assert(Multimodal.Codecs.resize("abcdef".getBytes, 3).toSeq === "abc".getBytes.toSeq)
  }

  test("MJPEG frame split/sample: real marker-walk frame extraction — " +
    "split inverts concat, sampling keeps every stride-th frame, and " +
    "trailing garbage is dropped") {
    val frames = (0 until 5).map(i =>
      MediaHeaders.jpegBytes(100 + i, 50 + i, s"frame$i".getBytes("US-ASCII")))
    val stream = MediaHeaders.mjpegBytes(frames)
    val split = MediaHeaders.mjpegFrames(stream)
    assert(split.size == 5)
    assert(split.zip(frames).forall { case (a, b) => a.sameElements(b) })
    // dims of each recovered frame decode independently
    assert(split.zipWithIndex.forall { case (f, i) =>
      MediaHeaders.jpegDims(f).contains((100L + i, 50L + i)) })
    val sampled = MediaHeaders.mjpegFrames(Multimodal.frameSample(stream, 2))
    assert(sampled.size == 3) // frames 0, 2, 4
    assert(MediaHeaders.jpegDims(sampled.last).contains((104L, 54L)))
    // a truncated tail (half a frame) must not break the earlier frames
    val truncated = stream.dropRight(3)
    assert(MediaHeaders.mjpegFrames(truncated).size == 4)
  }

  test("binary payloads roundtrip through parquet and features survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("media").toString + "/t"
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    media.write.partitionBy("kind").parquet(dir)
    val back = spark.read.parquet(dir).as[MediaRecord]
    assert(back.count() === media.count())
    val origFeats = Multimodal.extractFeatures(media)
      .select($"media_id", $"content_hash")
    val backFeats = Multimodal.extractFeatures(back)
      .select($"media_id", $"content_hash")
    assert(origFeats.except(backFeats).count() === 0) // bytes identical after roundtrip
  }

  test("metadata-only reads never touch the payload column (column pruning)") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001).toDF()
    val plan = media.select("media_id", "kind").queryExecution.optimizedPlan.toString
    assert(!plan.contains("data#") || !plan.toLowerCase.contains("cast(text"),
      s"payload column should be pruned from metadata-only scan:\n$plan")
  }

  import graft.multimodal.MediaHeaders

  test("PNG writer/parser invert exactly, incl. dims past 16 bits; non-PNG bytes " +
    "parse to None") {
    val body = "pixels".getBytes
    assert(MediaHeaders.pngDims(MediaHeaders.pngBytes(1, 1, body)) === Some((1L, 1L)))
    assert(MediaHeaders.pngDims(MediaHeaders.pngBytes(70000, 131072, body)) ===
      Some((70000L, 131072L))) // 4-byte dims: beyond JPEG's 16-bit range
    assert(MediaHeaders.pngBytes(640, 480, body).length === 57 + body.length)
    assert(MediaHeaders.pngDims("not a png at all".getBytes) === None)
    assert(MediaHeaders.pngDims(Array.emptyByteArray) === None)
    // truncated mid-signature
    assert(MediaHeaders.pngDims(MediaHeaders.pngBytes(9, 9, body).take(20)) === None)
  }

  test("JPEG writer/parser invert exactly; the parser walks real marker streams " +
    "(APP0 before SOF0) and stops safely at SOS or truncation") {
    val body = "entropy".getBytes
    assert(MediaHeaders.jpegDims(MediaHeaders.jpegBytes(1280, 720, body)) ===
      Some((1280L, 720L)))
    assert(MediaHeaders.jpegBytes(64, 64, body).length === 23 + body.length)
    // a real camera file leads with APP0/JFIF before the frame header:
    // SOI + APP0(16 bytes incl len) + SOF0 — parser must skip by length
    val app0 = Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte) ++ Array.fill[Byte](14)(0)
    val withApp0 = Array(0xff.toByte, 0xd8.toByte) ++ app0 ++
      MediaHeaders.jpegBytes(320, 240, body).drop(2)
    assert(MediaHeaders.jpegDims(withApp0) === Some((320L, 240L)))
    // SOS before any SOF → dims unknowable → None, not a misparse
    val sosOnly = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0).map(_.toByte)
    assert(MediaHeaders.jpegDims(sosOnly) === None)
    assert(MediaHeaders.jpegDims("garbage".getBytes) === None)
  }

  test("WAV writer/parser invert exactly: sample rate and floor-division duration " +
    "from the fmt/data chunks; chunk walk survives extra chunks and garbage") {
    // 16000 Hz mono 16-bit → byteRate 32000; 64000 bytes = 2000 ms
    val twoSec = MediaHeaders.wavBytes(16000, 1, 16, Array.fill[Byte](64000)(7))
    assert(MediaHeaders.wavFormat(twoSec) === Some((16000L, 2000L)))
    assert(MediaHeaders.wavChannels(twoSec) === 1)
    // floor: 1000 bytes at 32000 B/s = 31.25 ms → 31
    assert(MediaHeaders.wavFormat(MediaHeaders.wavBytes(16000, 1, 16,
      Array.fill[Byte](1000)(0))) === Some((16000L, 31L)))
    assert(MediaHeaders.wavBytes(8000, 1, 16, Array.fill[Byte](10)(0)).length === 54)
    assert(MediaHeaders.wavFormat("RIFFnope".getBytes) === None)
    assert(MediaHeaders.wavFormat(Array.emptyByteArray) === None)
  }

  test("wavSamples: LE int16 PCM decode inverts the writer on the full signed " +
    "range; truncated data yields the complete prefix; non-16-bit refused") {
    val vals = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val bb = java.nio.ByteBuffer.allocate(vals.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putShort)
    val wav = MediaHeaders.wavBytes(8000, 1, 16, bb.array())
    assert(MediaHeaders.wavSamples(wav).toSeq === vals.toSeq)
    // truncation: drop the last byte → last (half) sample is dropped
    assert(MediaHeaders.wavSamples(wav.dropRight(1)).toSeq === vals.init.toSeq)
    // 8-bit WAV: sample decode refuses (the 16-bit contract), header still parses
    val wav8 = MediaHeaders.wavBytes(8000, 1, 8, Array.fill[Byte](16)(3))
    assert(MediaHeaders.wavSamples(wav8).isEmpty)
    assert(MediaHeaders.wavFormat(wav8).nonEmpty)
    assert(MediaHeaders.wavSamples("not a wav at all".getBytes).isEmpty)
  }

  test("decodeMetadata reads REAL header values back from the generated payloads " +
    "and a corrupt payload yields container=unknown with null metadata, not a throw") {
    import spark.implicits._
    val decoded = Multimodal.decodeMetadata(Multimodal.mediaWithHeaders(spark, sf0001))
      .collect()
    assert(decoded.nonEmpty)
    decoded.foreach { m =>
      m.kind match {
        case "image" =>
          assert(m.container === "png")
          assert(m.width.exists(w => w >= 1 && w <= 1920) &&
            m.height.exists(h => h >= 1 && h <= 1080), m.toString)
          assert(m.sample_rate.isEmpty && m.duration_ms.isEmpty)
        case "audio" =>
          assert(m.container === "wav")
          assert(m.sample_rate.exists(r => r >= 8000 && r <= 15000), m.toString)
          assert(m.duration_ms.nonEmpty && m.width.isEmpty)
        case "video" =>
          assert(m.container === "jpeg")
          assert(m.width.exists(w => w >= 1 && w <= 1280) &&
            m.height.exists(h => h >= 1 && h <= 720), m.toString)
        case other => fail(s"unexpected kind $other")
      }
    }
    // corruption path: truncated/garbage payloads decode to unknown/null
    val corrupt = Seq(
      graft.multimodal.MediaPayload(1L, "image", "JUNK".getBytes),
      graft.multimodal.MediaPayload(2L, "audio", Array.emptyByteArray)).toDS()
    val out = Multimodal.decodeMetadata(corrupt).collect()
    assert(out.forall(m => m.container == "unknown" && m.width.isEmpty &&
      m.sample_rate.isEmpty))
  }

  test("ahash64: uniform image sets all 64 bits; a vertical half-split sets " +
    "exactly the bright half; the comparison is integer-exact") {
    // 16×16 uniform: every cell mean equals the image mean → every bit set.
    val (uhi, ulo, un) = Multimodal.ahash64(16, 16, Array.fill(256)(77))
    assert((uhi, ulo, un) === (0xFFFFFFFFL, 0xFFFFFFFFL, 64))
    // left half 255, right half 0 (w=h=16 → each 8×8 cell is a 2×2 block):
    // cells with cx < 4 are all-bright → bit set; cx ≥ 4 all-dark → clear.
    val split = Array.tabulate(256)(i => if (i % 16 < 8) 255 else 0)
    val (shi, slo, sn) = Multimodal.ahash64(16, 16, split)
    assert(sn === 32)
    assert(slo === 0x0F0F0F0FL && shi === 0x0F0F0F0FL) // low nibble per row of cells
    // inverting the image complements the hash up to ≥-vs-< ties (none here).
    val inv = split.map(255 - _)
    val (ihi, ilo, in_) = Multimodal.ahash64(16, 16, inv)
    assert((ihi & shi) === 0L && (ilo & slo) === 0L && in_ === 32)
  }

  test("q132 drops exactly the images that appear as the larger id of a q131 " +
    "pair (greedy lower-id-keeper convention), keeps everything else") {
    val dropped = Multimodal.q131ImageNeardup(spark, sf0001)
      .collect().map(_.getLong(1)).toSet
    val verdicts = Multimodal.q132ImageDedupKeep(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts.nonEmpty)
    verdicts.foreach { case (id, keep) =>
      assert(keep === !dropped(id), s"media $id keep=$keep dropped=${dropped(id)}")
    }
  }

  test("q133: every clip reports its 3 PCM windows, keep is n_active >= 2, and " +
    "the median bar splits the corpus (not all kept, not all dropped, unless " +
    "degenerate)") {
    val rows = Multimodal.q133AudioEnergyGate(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === 3L, s"n_windows: $r")
      assert(r.getBoolean(4) === (r.getLong(2) >= 2L), s"keep flag: $r")
    }
    val kept = rows.count(_.getBoolean(4))
    assert(kept > 0 && kept < rows.length,
      s"median gate should split the corpus: $kept of ${rows.length}")
  }

  test("q131 banding is exact at the ≤3 threshold: pairs equal the brute-force " +
    "all-pairs Hamming scan over q130's hashes (pigeonhole recall = 1)") {
    val hashes = Multimodal.q130ImageAhash(spark, sf0001)
      .select("media_id", "ahash_hi", "ahash_lo")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hashes.length > 5, "fixture should decode several images")
    val brute = (for {
      (a, ahi, alo) <- hashes; (b, bhi, blo) <- hashes if a < b
      d = java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    val banded = Multimodal.q131ImageNeardup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.get(2).asInstanceOf[Number].longValue)).toSet
    assert(banded === brute)
  }

  test("q165 decodes SAMPLED MJPEG frames to pixels: counts follow the stride-2 " +
    "policy, the dim-qualified frame-dup hash folds the planted period-3 content " +
    "cycle, and a spot-checked video's frames decode to the block formula exactly") {
    import graft.multimodal.JpegCodec
    val rows = Multimodal.q165VideoFramePixels(spark, sf0001).collect()
    assert(rows.nonEmpty, "fixture should produce videos")
    rows.foreach { r =>
      val (nf, ns, nu) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ns === (nf + 1) / 2, s"sampled count: $r")
      assert(nu === math.min(ns, 2L), s"distinct-content count: $r")
    }
    // at least one video in the 2..6-frame range has >= 5 frames, where the
    // held-for-2 scene cycle makes a SAMPLED frame pair collide (sampled
    // indices 0 and 4 both carry scene A): the dup hash must fold it (nu < ns)
    assert(rows.exists(r => r.getLong(3) < r.getLong(2)),
      "no video exercised the frame-dup fold")
    // spot-check one fixture video end-to-end: every frame (not just the
    // sampled ones) decodes to the planted per-frame block formula
    val m = Multimodal.videosWithDecodableFrames(spark, sf0001).head()
    val frames = MediaHeaders.mjpegFrames(m.data)
    assert(frames.nonEmpty)
    frames.zipWithIndex.foreach { case (f, j) =>
      val Some((w, _, px)) = JpegCodec.decode(f)
      val wi = w.toInt
      px.zipWithIndex.foreach { case (v, i) =>
        val expect =
          ((m.media_id * 7 + ((j % 4) / 2) * 11 + (i / wi / 8) * 13 + (i % wi / 8) * 31) % 256).toInt
        assert(v === expect, s"frame $j pixel $i")
      }
    }
  }

  test("RGB truecolor PNG (color type 2) round-trips exactly across all 5 " +
    "scanline filters with BYTEWISE bpp=3 neighbors; the grayscale wrapper " +
    "refuses color payloads and pngSamples tags channel counts right") {
    val (w, h) = (7, 6) // 6 rows: filter types 0,1,2,3,4,0 all exercised
    val px = Array.tabulate(w * h * 3)(i => (i * 37 + (i * i) % 251) % 256)
    val png = MediaHeaders.pngPixelBytesRgb(w, h, px)
    val Some((dw, dh, nc, dpx)) = MediaHeaders.pngSamples(png)
    assert((dw, dh, nc) === (w.toLong, h.toLong, 3))
    assert(dpx.toSeq === px.toSeq)
    assert(MediaHeaders.pngPixels(png) === None, "gray wrapper must refuse color")
    // gray PNGs flow through pngSamples with nc = 1
    val gpx = Array.tabulate(12)(i => i * 20)
    val Some((_, _, gnc, gdpx)) = MediaHeaders.pngSamples(MediaHeaders.pngPixelBytes(4, 3, gpx))
    assert(gnc === 1)
    assert(gdpx.toSeq === gpx.toSeq)
  }

  test("3-component 4:4:4 baseline JPEG: per-channel block-constant images " +
    "round-trip BIT-EXACTLY (the q163 contract per channel, interleaved MCUs " +
    "with per-component DC predictors), the gray wrapper refuses color, and " +
    "a general color image decodes with bounded lossy error") {
    import graft.multimodal.JpegCodec
    val (w, h) = (24, 16)
    val px = Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      val c = i % 3
      (c * 89 + (p / w / 8) * 5 + (p % w / 8) * 11) % 256
    }
    val jpg = JpegCodec.encodeInterleaved(w, h, 3, px)
    val Some((dw, dh, nc, dpx)) = JpegCodec.decodeInterleaved(jpg)
    assert((dw, dh, nc) === (w.toLong, h.toLong, 3))
    assert(dpx.toSeq === px.toSeq)
    assert(JpegCodec.decode(jpg) === None, "gray wrapper must refuse color")
    // grayscale still flows through the interleaved decoder with nc = 1
    val gray = Array.tabulate(16 * 8)(i => (i * 3) % 256)
    val Some((_, _, gnc, _)) = JpegCodec.decodeInterleaved(JpegCodec.encode(16, 8, gray))
    assert(gnc === 1)
    // non-block-constant color content is lossy but bounded: a smooth
    // gradient survives the AC quant step 16 within a loose band
    val grad = Array.tabulate(w * h * 3) { i => ((i / 3) % w) * 8 % 256 }
    val Some((_, _, _, gd)) = JpegCodec.decodeInterleaved(JpegCodec.encodeInterleaved(w, h, 3, grad))
    val maxErr = gd.zip(grad).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 48, s"lossy error $maxErr out of band")
  }

  test("Codecs.decodeFeatures on COLOR payloads returns real sample " +
    "moments for both containers (no byte-stat fallback now that the " +
    "color codecs exist)") {
    import graft.multimodal.JpegCodec
    // constant 140 everywhere: mean 140, var 0, across both containers
    val px = Array.fill(16 * 8 * 3)(140)
    assert(Multimodal.Codecs.decodeFeatures(
      MediaHeaders.pngPixelBytesRgb(16, 8, px)).toSeq === Seq(384.0, 140.0, 0.0, 16.0))
    assert(Multimodal.Codecs.decodeFeatures(
      JpegCodec.encodeInterleaved(16, 8, 3, px)).toSeq === Seq(384.0, 140.0, 0.0, 16.0))
  }

  test("q167 finds the PLANTED cross-container COLOR dups — sample-identical " +
    "images stored as RGB PNG vs 3-component JPEG pair up, every reported " +
    "pair joins opposite parities and decode-verifies equal") {
    import graft.multimodal.JpegCodec
    val rows = Multimodal.q167ColorCrossDups(spark, sf0001).collect()
    assert(rows.nonEmpty, "the fixture plants quad dups; none found")
    val payloads = Multimodal.mixedContainerColorImages(spark, sf0001)
      .collect().map(m => m.media_id -> m.data).toMap
    def samples(id: Long): Seq[Int] = {
      val d = payloads(id)
      MediaHeaders.pngSamples(d).orElse(JpegCodec.decodeInterleaved(d)).get._4.toSeq
    }
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert((a + b) % 2 === 1, s"pair ($a, $b) has same-parity ids")
      assert(samples(a) === samples(b), s"pair ($a, $b) reported but samples differ")
    }
  }

  test("q169 audio banding is exact at the <=3 threshold: pairs equal the " +
    "brute-force all-pairs Hamming scan over q168's fingerprints, and the " +
    "planted quad dups (same PCM, different wav headers) all surface at " +
    "Hamming 0") {
    val hashes = Multimodal.q168AudioFingerprint(spark, sf0001)
      .select("media_id", "fp_hi", "fp_lo")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hashes.length > 5, "fixture should decode several clips")
    val brute = (for {
      (a, ahi, alo) <- hashes; (b, bhi, blo) <- hashes if a < b
      d = java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    val banded = Multimodal.q169AudioNeardup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.get(2).asInstanceOf[Number].longValue)).toSet
    assert(banded === brute)
    // the planted ground truth: every same-quad clip pair is a dup
    val byQuad = hashes.map(_._1).groupBy(_ / 4).values.filter(_.length > 1)
    assert(byQuad.nonEmpty, "fixture should place >= 2 audio docs in some quad")
    byQuad.foreach { ids =>
      for (a <- ids; b <- ids if a < b)
        assert(banded.contains((a, b, 0L)), s"planted quad dup ($a, $b) missed")
    }
    // and the fixture is NOT degenerate: distinct gids rarely collide
    assert(banded.size < hashes.length,
      s"${banded.size} pairs from ${hashes.length} clips — fingerprints degenerate")
  }

  test("q170 keeps exactly one clip per duplicate neighborhood: a clip is " +
    "dropped iff a lower-id clip sits within Hamming 3") {
    val rows = Multimodal.q170AudioDedupKeep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getBoolean(3))).toMap
    val pairs = Multimodal.q169AudioNeardup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val removed = pairs.map(_._2).toSet
    rows.foreach { case (id, keep) =>
      assert(keep === !removed.contains(id), s"clip $id verdict")
    }
    assert(rows.values.count(identity) < rows.size, "nothing was deduped")
  }

  test("q176 finds TRIMMED audio dups that the whole-clip fingerprint is " +
    "structurally blind to (VERDICT r15 #2): every reported pair is a planted " +
    "within-quad trim at the constant 9-window offset with full window overlap, " +
    "every plantable pair IS reported, and each pair's global Hamming exceeds " +
    "q169's <=3 gate — the banded global matcher would drop all of them") {
    val pairs = Multimodal.q176AudioTrimmedDups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(pairs.nonEmpty, "fixture should plant at least one trimmed dup")
    pairs.foreach { case (a, b, nShared, offsetW, nOffsets, gHam) =>
      assert(a / 4 === b / 4, s"cross-quad pair ($a, $b)")
      // the only quad surviving the doc_id % 3 = 1 corpus filter with two
      // members is {12k+4, 12k+7}: trims 0 and 288 samples = 9 hops
      assert(offsetW === -9L, s"recovered trim offset for ($a, $b)")
      assert(nOffsets === 1L, s"a true trim has ONE offset, got $nOffsets")
      assert(nShared === 23L - 9L, s"window overlap for ($a, $b)")
      assert(gHam > 3L,
        s"($a, $b) global Hamming $gHam inside q169's gate — fixture " +
          "no longer demonstrates the blindness")
    }
    // completeness: every quad with two corpus members is found
    val ids = Multimodal.audioWithTrimmedDups(spark, sf0001)
      .select("media_id").collect().map(_.getLong(0)).toSeq
    val plantable = ids.groupBy(_ / 4).values.filter(_.length > 1)
      .flatMap(g => for (a <- g; b <- g if a < b) yield (a, b)).toSet
    assert(plantable.nonEmpty && pairs.map(p => (p._1, p._2)).toSet === plantable)
  }

  test("q175 window fingerprints are position-anchored: a trimmed copy shares " +
    "exactly the overlapped windows of its quad sibling, shifted by the trim") {
    val fps = Multimodal.q175AudioWindowFp(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val byId = fps.groupBy(_._1)
    val sib = byId.keys.groupBy(_ / 4).values.find(_.size > 1).map(_.toSeq.sorted)
    assert(sib.nonEmpty, "fixture should keep a 2-member quad")
    val (a, b) = (sib.get.head, sib.get(1))
    val fa = byId(a).map(t => t._2 -> t._3).toMap
    val fb = byId(b).map(t => t._2 -> t._3).toMap
    // b is trimmed 9 hops deeper: its window w equals a's window w + 9
    (0L to 13L).foreach(w => assert(fb(w) === fa(w + 9), s"window $w"))
    // b's tail (recording content past a's end) must NOT collide with
    // any window of a — the nonlinear mix keeps distinct content distinct
    val faSet = fa.values.toSet
    (14L to 22L).foreach(w =>
      assert(!faSet.contains(fb(w)), s"tail window $w collides"))
  }

  test("q177 scene-change keyframes catch the planted ONE-FRAME scene that " +
    "stride-2 thinning structurally misses (VERDICT r15 #3): keyframes are " +
    "exactly {0, 3, 4} (clip start + both cuts), the single-frame scene B " +
    "lives only at odd index 3 — outside every even stride-2 position — and " +
    "held frames report zero change") {
    val byMedia = Multimodal.q177SceneKeyframes(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
      .groupBy(_._1)
    assert(byMedia.nonEmpty, "fixture should produce videos")
    byMedia.foreach { case (id, rows) =>
      val k = rows.head._3
      assert(rows.length.toLong === k, s"video $id: a row per frame")
      val keyframes = rows.filter(_._6).map(_._2).toSet
      assert(keyframes === Set(0L, 3L, 4L).filter(_ < k),
        s"video $id keyframes")
      // held frames (1, 2 and 5+) have zero changed pixels; cuts (3, 4)
      // change EVERY pixel (scenes differ by 11 mod 256 in every block),
      // so both cuts tie at the clip max and clear the quarter threshold
      rows.foreach { case (_, j, _, nChanged, diffEnergy, _) =>
        if (j == 3L || j == 4L) {
          assert(nChanged > 0, s"video $id cut frame $j")
          assert(diffEnergy > 0, s"video $id cut frame $j energy")
        } else {
          assert(nChanged === 0L, s"video $id held frame $j")
          assert(diffEnergy === 0L, s"video $id held frame $j energy")
        }
      }
      val cuts = rows.filter(r => r._2 == 3L || r._2 == 4L).map(_._4)
      assert(cuts.distinct.length === 1, s"video $id cuts must tie at w*h")
      // the stride-2 positions are even; scene B exists ONLY at index 3
      assert(!Range(0, k.toInt, 2).contains(3), "stride-2 cannot see B")
    }
  }

  test("q180 video scene dedup pairs quad re-posts on exactly their shared " +
    "scene set (scenes 0 and 1 always, scene 2 when BOTH clips run 5+ " +
    "frames) — and the count is only right because keyframes see the " +
    "one-frame scene at odd index 3 that stride-2 sampling cannot") {
    import org.apache.spark.sql.functions.col
    val pairs = Multimodal.q180VideoSceneDups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty, "fixture should plant quad video pairs")
    val vids = Tables(spark, sf0001, "documents")
      .where(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1) % 4 + 4)).toSeq
    val expected = vids.groupBy(_._1 / 4).values.filter(_.size > 1).flatMap { g =>
      for (a <- g; b <- g if a._1 < b._1)
        yield (a._1, b._1, 2L + (if (a._2 >= 5 && b._2 >= 5) 1L else 0L))
    }.toSet
    assert(pairs.toSet === expected, "shared-scene pair report")
    // the planted single-frame scene (index 3) contributes to EVERY
    // pair's count — a stride-2 register would never hash it, so at
    // least the scene-1 share would vanish from every pair
    assert(pairs.forall(_._3 >= 2), "scene 1 (keyframe-only) must count")
  }

  test("q181 keeps exactly one clip per trimmed-dup family — the decision " +
    "q170 cannot make: the global-fingerprint keeper keeps BOTH halves of " +
    "every planted trimmed pair, the windowed keeper drops the later one") {
    val keep181 = Multimodal.q181TrimmedDedupKeep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val removed = Multimodal.q176AudioTrimmedDups(spark, sf0001).collect()
      .map(_.getLong(1)).toSet
    assert(removed.nonEmpty, "fixture should plant trimmed dups")
    keep181.foreach { case (id, keep) =>
      assert(keep === !removed.contains(id), s"clip $id verdict")
    }
    // q170's global keeper, run over the SAME trimmed fixture, keeps both
    // halves of every trimmed pair (q169 pairs only Hamming<=3, and the
    // trims sit far above it) — the blindness the windowed family fixes
    val pairs176 = Multimodal.q176AudioTrimmedDups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(pairs176.forall(_._3 > 3),
      "a trimmed pair fell inside the global gate; the contrast is void")
  }

  test("q185 keeps exactly one video per shared-footage family: a video is " +
    "dropped iff a lower-id video shares >= 2 scene keyframes") {
    val keep = Multimodal.q185VideoDedupKeep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val removed = Multimodal.q180VideoSceneDups(spark, sf0001).collect()
      .filter(_.getLong(2) >= 2).map(_.getLong(1)).toSet
    assert(removed.nonEmpty, "fixture should plant shared-footage videos")
    keep.foreach { case (id, k) =>
      assert(k === !removed.contains(id), s"video $id verdict")
    }
    assert(keep.values.count(identity) < keep.size, "nothing was deduped")
  }

  test("color decode rejects out-of-profile payloads instead of misdecoding: " +
    "sampling factors above 2 return None, truncated color scans return None, " +
    "and an unsupported PNG color type returns None") {
    import graft.multimodal.JpegCodec
    val px = Array.tabulate(16 * 16 * 3)(i => (i * 7) % 256)
    val jpg = JpegCodec.encodeInterleaved(16, 16, 3, px)
    assert(JpegCodec.decodeInterleaved(jpg).nonEmpty, "baseline fixture broke")
    // patch component 1's sampling factors 1x1 -> 4x1 in SOF0: factors
    // above 2 (4:1:1) are outside the profile and MUST refuse
    val sof = jpg.indices.find(i => (jpg(i) & 0xFF) == 0xFF &&
      i + 1 < jpg.length && (jpg(i + 1) & 0xFF) == 0xC0).get
    val quadSampled = jpg.clone()
    quadSampled(sof + 4 + 7) = 0x41.toByte
    assert(JpegCodec.decodeInterleaved(quadSampled) === None)
    // truncation mid-entropy: the bit reader runs dry -> None, no throw
    assert(JpegCodec.decodeInterleaved(jpg.dropRight(40)) === None)
    // PNG color type 6 (RGBA) is outside the profile: patch the IHDR
    // color-type byte of a valid truecolor PNG
    val png = MediaHeaders.pngPixelBytesRgb(4, 3, Array.tabulate(36)(_ % 256))
    val rgba = png.clone()
    rgba(8 + 8 + 9) = 6.toByte // sig(8) + len+type(8) + w(4)+h(4)+depth(1)
    assert(MediaHeaders.pngSamples(rgba) === None)
  }

  test("4:2:0 decode (VERDICT r15 #1): block-constant luma + MCU-constant " +
    "chroma round-trips encode420 -> decodeInterleaved BIT-EXACTLY at full " +
    "resolution, including non-multiple-of-16 dims; a general color image " +
    "decodes with bounded lossy error on every channel") {
    import graft.multimodal.JpegCodec
    // exactness profile: luma constant per 8x8 block, chroma constant
    // per 16x16 MCU (the q174 fixture shape)
    for ((w, h) <- Seq((32, 16), (48, 32), (24, 20))) { // last: ragged MCUs
      val px = new Array[Int](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val p = (y * w + x) * 3
        px(p) = ((y / 8) * 13 + (x / 8) * 31 + 7) % 256
        px(p + 1) = ((y / 16) * 17 + (x / 16) * 23 + 11) % 256
        px(p + 2) = ((y / 16) * 29 + (x / 16) * 37 + 3) % 256
      }
      val Some((dw, dh, nc, out)) = JpegCodec.decodeInterleaved(
        JpegCodec.encode420(w, h, px))
      assert((dw, dh, nc) === (w.toLong, h.toLong, 3))
      assert(out === px, s"${w}x$h 4:2:0 exactness round-trip")
    }
    // general (non-constant) content: lossy but bounded — luma within
    // the AC-quant error bar, chroma additionally box-filtered +
    // nearest-upsampled so neighboring-cell gradients bound the error
    val w = 32; val h = 32
    val gen = Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      (((p % w) * 2 + (p / w) + (i % 3) * 5) % 64) + 96 // gentle gradient
    }
    val Some((_, _, _, lossy)) = JpegCodec.decodeInterleaved(
      JpegCodec.encode420(w, h, gen))
    val maxErr = lossy.indices.map(i => math.abs(lossy(i) - gen(i))).max
    assert(maxErr <= 96, s"max 4:2:0 lossy error $maxErr out of bounds")
  }

  test("4:2:2 decode: block-constant luma + 16x8-cell-constant chroma " +
    "round-trips encode422 -> decodeInterleaved BIT-EXACTLY, including " +
    "ragged dims — the decoder's horizontal-only sampling path (the " +
    "second-most-common crawled layout) proven, not just declared") {
    import graft.multimodal.JpegCodec
    for ((w, h) <- Seq((32, 16), (48, 8), (24, 16))) { // last: ragged MCUs
      val px = new Array[Int](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val p = (y * w + x) * 3
        px(p) = ((y / 8) * 13 + (x / 8) * 31 + 7) % 256
        px(p + 1) = ((y / 8) * 17 + (x / 16) * 23 + 11) % 256
        px(p + 2) = ((y / 8) * 29 + (x / 16) * 37 + 3) % 256
      }
      val Some((dw, dh, nc, out)) = JpegCodec.decodeInterleaved(
        JpegCodec.encode422(w, h, px))
      assert((dw, dh, nc) === (w.toLong, h.toLong, 3))
      assert(out === px, s"${w}x$h 4:2:2 exactness round-trip")
    }
    // lossy-but-bounded on a general gradient, like the 4:2:0 case
    val w = 32; val h = 16
    val gen = Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      (((p % w) * 3 + (p / w) * 2 + (i % 3) * 7) % 64) + 96
    }
    val Some((_, _, _, lossy)) = JpegCodec.decodeInterleaved(
      JpegCodec.encode422(w, h, gen))
    val maxErr = lossy.indices.map(i => math.abs(lossy(i) - gen(i))).max
    assert(maxErr <= 96, s"max 4:2:2 lossy error $maxErr out of bounds")
  }

  test("decode dims budget (ADVICE r15): a crafted header claiming huge " +
    "dimensions returns None instead of overflowing the allocation — JPEG " +
    "SOF0 65535x65535x3 and PNG IHDR alike; legitimate payloads still decode") {
    import graft.multimodal.JpegCodec
    val px = Array.tabulate(8 * 8 * 3)(i => (i * 3) % 256)
    val jpg = JpegCodec.encodeInterleaved(8, 8, 3, px)
    val sof = jpg.indices.find(i => (jpg(i) & 0xFF) == 0xFF &&
      (jpg(i + 1) & 0xFF) == 0xC0).get
    val huge = jpg.clone()
    // SOF0 body: len(2) precision(1) h(2) w(2): claim 65535 x 65535
    huge(sof + 5) = 0xFF.toByte; huge(sof + 6) = 0xFF.toByte
    huge(sof + 7) = 0xFF.toByte; huge(sof + 8) = 0xFF.toByte
    assert(JpegCodec.decodeInterleaved(huge) === None) // no throw, no 12GB alloc
    val png = MediaHeaders.pngPixelBytesRgb(4, 3, Array.tabulate(36)(_ % 256))
    val hugePng = png.clone()
    // IHDR body at sig(8)+len+type(8): w(4) h(4) — claim 2^30 x 2^30
    hugePng(16) = 0x40.toByte; hugePng(20) = 0x40.toByte
    assert(MediaHeaders.pngSamples(hugePng) === None)
    assert(JpegCodec.decodeInterleaved(jpg).nonEmpty, "valid payload regressed")
    assert(MediaHeaders.pngSamples(png).nonEmpty, "valid payload regressed")
  }

  test("JpegCodec.encode rejects dims beyond the 16-bit SOF0 fields instead of " +
    "silently truncating them into a misparsing header") {
    import graft.multimodal.JpegCodec
    intercept[IllegalArgumentException] {
      JpegCodec.encode(65536, 1, new Array[Int](65536))
    }
    intercept[IllegalArgumentException] {
      JpegCodec.encode(1, 65536, new Array[Int](65536))
    }
  }

  test("dropHotKeys removes exactly the over-cap keys — the hot cohort goes, " +
    "every under-cap row stays (VERDICT r16 #1)") {
    import spark.implicits._
    val df = Seq.tabulate(40)(i => (if (i < 30) "hot" else s"k$i", i)).toDF("k", "x")
    val kept = Multimodal.dropHotKeys(df, Seq("k"), 10).collect()
    assert(kept.length === 10)
    assert(kept.forall(_.getString(0) != "hot"))
    // cap exactly at the group size keeps it (the cap is >, not >=)
    assert(Multimodal.dropHotKeys(df, Seq("k"), 30).count() === 40)
  }

  test("q189 pairs re-encoded videos that EXACT scene hashing is blind to: " +
    "every pair is a quad sibling at aHash Hamming 0 (+1 on a 0..254 plane " +
    "provably preserves the threshold) with ZERO exact-hash scene matches " +
    "— the blindness witness in-row; the nonlinear pixel mix keeps " +
    "unrelated videos from pairing at all") {
    val rows = Multimodal.q189ReencodedSceneDups(spark, sf0001).collect()
    assert(rows.nonEmpty, "fixture should plant re-encode pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("media_id_a") / 4 === r.getAs[Long]("media_id_b") / 4,
        s"non-quad pair: $r (decorrelation regressed)")
      assert(r.getAs[Long]("max_hamming") === 0L, s"re-encode moved the aHash: $r")
      assert(r.getAs[Long]("n_exact_shared") === 0L,
        s"exact hashes matched — the +1 shift is not being applied: $r")
      assert(r.getAs[Long]("n_similar_scenes") >= 2L)
    }
  }

  test("q190 pairs gain-scaled clips that EXACT window md5s are blind to: " +
    "every pair is a quad sibling sharing ALL 23 sign-of-delta windows at " +
    "offset 0 with ZERO exact-window matches; the quartic PCM mix keeps " +
    "unrelated clips from sharing any window") {
    val rows = Multimodal.q190GainRobustDups(spark, sf0001).collect()
    assert(rows.nonEmpty, "fixture should plant gain pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("media_id_a") / 4 === r.getAs[Long]("media_id_b") / 4,
        s"non-quad pair: $r (decorrelation regressed)")
      assert(r.getAs[Long]("n_shared") === 23L, s"gain broke sign windows: $r")
      assert(r.getAs[Long]("offset_w") === 0L)
      assert(r.getAs[Long]("n_offsets") === 1L)
      assert(r.getAs[Long]("n_exact_shared") === 0L,
        s"exact window md5s matched — the gain is not being applied: $r")
    }
  }

  test("q195 classifies cross-modal pairs consistently (flags ⇔ relation, " +
    "ordered pair key, no flagless rows) and the image arm is CONTENT-keyed: " +
    "identical captions produce byte-identical PNGs, different captions " +
    "different ones — the seam that makes 'recaptioned' a reachable class") {
    val rows = Multimodal.q195CrossModalPairs(spark, sf0001).collect()
    assert(rows.nonEmpty, "fixture should surface at least one pair")
    rows.foreach { r =>
      val i = r.getAs[Boolean]("image_dup")
      val c = r.getAs[Boolean]("caption_dup")
      assert(i || c, s"flagless pair: $r")
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"), s"unordered: $r")
      val expected = if (i && c) "dup_pair"
        else if (i) "recaptioned" else "reillustrated"
      assert(r.getAs[String]("relation") === expected, s"misclassified: $r")
    }
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (6L, "totally different words make another caption here"))
      .toDF("doc_id", "text")
    val pay = Multimodal.captionedImagesFromDocs(docs).collect().sortBy(_.media_id)
    assert(pay.length === 3)
    assert(pay(0).data.toSeq == pay(1).data.toSeq,
      "same caption must give the byte-identical image")
    assert(pay(0).data.toSeq != pay(2).data.toSeq,
      "different captions should give different images")
  }

  test("captionSig (the stream's JVM mirror of the q30 signature chain) " +
    "equals the DataFrame chain slice-for-slice on real corpus text, " +
    "including the no-shingle None ↔ absent-row correspondence") {
    import spark.implicits._
    val docs = Tables(spark, sf0001, "documents").select($"doc_id", $"text")
    val viaDf = docs
      .select($"doc_id", graft.functions.TextOps.tokens($"text").as("toks"))
      .select($"doc_id",
        explode(expr(graft.functions.TextOps.shinglesExpr)).as("shingle"))
      .select($"doc_id", md5($"shingle").as("h"))
      .groupBy($"doc_id")
      .agg(min(substring($"h", 1, 4)).as("h0"),
        min(substring($"h", 5, 4)).as("h1"), min(substring($"h", 9, 4)).as("h2"),
        min(substring($"h", 13, 4)).as("h3"), min(substring($"h", 17, 4)).as("h4"),
        min(substring($"h", 21, 4)).as("h5"), min(substring($"h", 25, 4)).as("h6"),
        min(substring($"h", 29, 4)).as("h7"))
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getString).toArray).toMap
    var compared = 0
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      (Multimodal.captionSig(text), viaDf.get(id)) match {
        case (None, None) => ()
        case (Some(a), Some(b)) =>
          assert(a.toSeq == b.toSeq, s"doc $id signature drift")
          compared += 1
        case other => fail(s"doc $id presence drift: $other")
      }
    }
    assert(compared > 100, "the corpus should exercise real signatures")
  }

  test("signBits is exactly invariant under exact positive gain and changes " +
    "under a content change") {
    val pcm: Array[Short] = Array.tabulate(70)(i =>
      ((i * 37 + (i * i) % 251) % 16000 - 8000).toShort)
    val doubled = pcm.map(v => (v * 2).toShort)
    assert(Multimodal.signBits(pcm, 0) === Multimodal.signBits(doubled, 0))
    val tweaked = pcm.clone(); tweaked(5) = (tweaked(5) + 2000).toShort
    assert(Multimodal.signBits(pcm, 0) !== Multimodal.signBits(tweaked, 0))
  }

  test("q186 hot-band instrument: the planted flat cohort concentrates into " +
    "ONE band value per slot (constant image => all-ones aHash), the demo " +
    "cap drops it with every member accounted, and the capped join's pair " +
    "work stays bounded by cap * bands") {
    import spark.implicits._
    val flats = Tables(spark, sf0001, "documents")
      .where(col("doc_id") % 15 === 1).count()
    assert(flats > Multimodal.InstrumentBandCap, "fixture too small to bind the cap")
    val rep = Multimodal.q186HotBandReport(spark, sf0001).collect()
    assert(rep.length === 4)
    rep.foreach { r =>
      assert(r.getAs[Long]("n_hot_bands") >= 1L)
      assert(r.getAs[Long]("max_band_size") >= flats)
      assert(r.getAs[Long]("n_dropped_rows") >= flats)
      // the structural bound the cap buys: each kept band contributes at
      // most cap*(cap-1)/2 pairs, so candidates <= bands * cap^2/2 — and
      // far fewer here; the UNCAPPED flat cohort alone would contribute
      // flats*(flats-1)/2 > that
      val c = Multimodal.InstrumentBandCap.toLong
      assert(r.getAs[Long]("n_candidate_pairs") <=
        r.getAs[Long]("n_bands") * c * (c - 1) / 2)
    }
  }
}
