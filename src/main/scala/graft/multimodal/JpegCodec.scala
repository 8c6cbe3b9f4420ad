package graft.multimodal

/** Pure-JVM BASELINE JPEG codec for 8-bit images with 1–3 components
  * at 4:4:4 (grayscale and full-resolution color in one interleaved
  * scan) — the pixel-level JPEG path that completes [[MediaHeaders]]'
  * decode depth (PNG pixels were already real; JPEG stopped at the
  * SOF0 header). Everything here is plain ITU T.81 byte/bit
  * arithmetic: no codec library, binary never crosses a shuffle.
  *
  * Encoder ([[encode]]): level shift → per-8×8 forward DCT (double
  * precision) → quantize → zigzag → canonical-Huffman entropy coding
  * with DC prediction, 0xFF byte stuffing and 1-padding to the byte
  * boundary, wrapped in SOI / DQT / SOF0 / DHT / SOS / EOI. Non-
  * multiple-of-8 dimensions pad by edge replication (the spec's
  * recommended fill); SOF0 carries the true dimensions and the decoder
  * crops.
  *
  * Decoder ([[decode]]/[[decodeInterleaved]]): a GENERIC baseline scan
  * — quant and Huffman tables are read from the file's own DQT/DHT
  * segments (mincode / maxcode / valptr decoding per T.81 F.2.2.3, any
  * conforming table works, nothing is hard-coded to this encoder),
  * DRI/RSTn restart intervals are honored, entropy data is un-stuffed,
  * each block is dequantized, inverse-zigzagged, IDCT'd, level-shifted
  * and clamped. Per-component sampling factors 1–2 are supported in
  * any combination — 4:4:4, 4:2:2 and the 4:2:0 that dominates real
  * crawled JPEGs — via per-component planes upsampled nearest-neighbor
  * to the full-resolution interleaved result. Anything unparseable —
  * progressive scans, truncated streams, corrupt tables, sampling
  * factors above 2, over-budget dimensions — returns None, never a
  * throw: one bad blob must not kill a 100 TB scan.
  *
  * Exactness contract the q163 gate rides on: JPEG is lossy in
  * general, but an image whose every (padded) 8×8 block is CONSTANT
  * round-trips bit-exactly through this codec — a constant block's
  * DCT has a single nonzero coefficient DC = 8·(v−128) (|error| <
  * 1e-10 ulp noise from the cosine products), the quant table's DC
  * step of 8 divides it losslessly into v−128 ∈ [−128, 127], every AC
  * quantizes to 0, and the IDCT of a lone DC coefficient is the
  * constant (v−128)·(1 ± 1e-15), which rounds back to exactly v. The
  * oracle can therefore regenerate the block formula in SQL and
  * hash-match the decoded pixels.
  *
  * Reference behavior: coldshrine/calorista has no media decode at
  * all (images appear only as Streamlit UI assets); this module is
  * extension surface for the multimodal pipeline mandate.
  */
object JpegCodec {

  /** Natural-order index of each zigzag-scan position (T.81 Figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Quant table, natural order: DC step 8 (divides 8·(v−128) exactly —
    * the block-constant exactness contract), AC step 16 (a real
    * mid-quality luminance-ish coarseness for the lossy general case). */
  private val QTable: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)

  /** DC Huffman spec: the 12 difference categories, all at code length
    * 4 (12 of 16 slots used — the all-ones code stays unassigned as
    * T.81 requires). Tables travel IN the file; a decoder never needs
    * to know these were not the Annex K defaults. */
  private val DcBits: Array[Int] = { val b = new Array[Int](17); b(4) = 12; b }
  private val DcVals: Array[Int] = Array.tabulate(12)(identity)

  /** AC Huffman spec: EOB, ZRL and every (run 0–15, size 1–10) symbol —
    * all 162 baseline AC symbols — at code length 8 (162 of 256 slots;
    * all-ones unassigned). Uniform lengths cost compression, not
    * validity; generic table-driven decoders read them like any other. */
  private val AcVals: Array[Int] =
    Array(0x00, 0xF0) ++ (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)
  private val AcBits: Array[Int] = { val b = new Array[Int](17); b(8) = AcVals.length; b }

  /** Canonical code assignment (T.81 C.2): symbol i of the BITS/VALS
    * spec gets consecutive codes within ascending lengths. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](vals.length)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var c = 0
      while (c < bits(l)) { out(k) = (code, l); code += 1; k += 1; c += 1 }
      code <<= 1
      l += 1
    }
    out
  }

  /** cos((2a+1)·b·π/16) for a, b ∈ 0–7, precomputed once — the DCT and
    * IDCT inner loops index this table instead of calling math.cos
    * 8,192 times per block. */
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((a, b) => math.cos((2 * a + 1) * b * math.Pi / 16.0))
  @inline private def cos(a: Int, b: Int): Double = CosT(a)(b)
  private def cNorm(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** MSB-first bit writer with JPEG 0xFF→0xFF00 stuffing. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(value: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00)
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1s (T.81 F.1.2.3). */
    def flush(): Unit = if (nBits > 0) put((1 << (8 - nBits)) - 1, 8 - nBits)
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int,
      body: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write(body, 0, body.length)
  }

  /** Encode `pixels` (row-major, values masked to 0–255) as a baseline
    * grayscale JPEG. Runs per-row inside a task: O(w·h) with a 64×64
    * multiply per block — scan-speed work, no shuffle ever sees it. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] =
    encodeInterleaved(width, height, 1, pixels)

  /** Forward DCT + quantization of the 8×8 block at block coords
    * (bx, by) of `plane` (pw × ph, edge-replicated beyond the true
    * bounds — the spec's recommended pad) into `coef` (natural order).
    * Flat-block fast path: a constant block's DCT is a lone DC
    * coefficient 8·(v−128) (every AC integrates a cosine over full
    * periods → 0, and the float loop's ~1e-10 residue quantizes to 0
    * anyway — identical output, none of the 64×64 product work). Flat
    * blocks are the common case in screenshots/diagrams and dominate
    * the exactness fixtures. */
  private def dctQuantBlock(plane: Array[Int], pw: Int, ph: Int,
      bx: Int, by: Int, coef: Array[Int]): Unit = {
    var flat = true
    val v0 = plane(math.min(by * 8, ph - 1) * pw + math.min(bx * 8, pw - 1)) & 0xFF
    var fy = 0
    while (flat && fy < 8) {
      val py = math.min(by * 8 + fy, ph - 1)
      var fx = 0
      while (flat && fx < 8) {
        val px = math.min(bx * 8 + fx, pw - 1)
        if ((plane(py * pw + px) & 0xFF) != v0) flat = false
        fx += 1
      }
      fy += 1
    }
    if (flat) {
      java.util.Arrays.fill(coef, 0)
      coef(0) = math.round(8.0 * (v0 - 128) / QTable(0)).toInt
    } else {
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0
          var y = 0
          while (y < 8) {
            val py = math.min(by * 8 + y, ph - 1)
            var x = 0
            while (x < 8) {
              val px = math.min(bx * 8 + x, pw - 1)
              s += ((plane(py * pw + px) & 0xFF) - 128) * cos(x, v) * cos(y, u)
              x += 1
            }
            y += 1
          }
          val q = QTable(u * 8 + v)
          coef(u * 8 + v) = math.round(0.25 * cNorm(u) * cNorm(v) * s / q).toInt
          v += 1
        }
        u += 1
      }
    }
  }

  /** Entropy-code one quantized block: DC difference against `pred`
    * (category + offset bits), then the zigzag AC run/size stream with
    * ZRL and EOB. Returns the new DC predictor (this block's DC). */
  private def entropyBlock(bw: BitWriter, coef: Array[Int], pred: Int,
      dcCodes: Array[(Int, Int)], acCodes: Array[(Int, Int)],
      acIndex: Array[Int]): Int = {
    val diff = coef(0) - pred
    val dcCat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    val (dcCode, dcLen) = dcCodes(dcCat)
    bw.put(dcCode, dcLen)
    if (dcCat > 0)
      bw.put(if (diff >= 0) diff else diff + (1 << dcCat) - 1, dcCat)
    var lastNz = 63
    while (lastNz >= 1 && coef(Zigzag(lastNz)) == 0) lastNz -= 1
    var run = 0
    var k = 1
    while (k <= lastNz) {
      val c = coef(Zigzag(k))
      if (c == 0) run += 1
      else {
        while (run >= 16) {
          val (z, zl) = acCodes(acIndex(0xF0)); bw.put(z, zl); run -= 16
        }
        val size = 32 - Integer.numberOfLeadingZeros(math.abs(c))
        val (code, len) = acCodes(acIndex((run << 4) | size))
        bw.put(code, len)
        bw.put(if (c >= 0) c else c + (1 << size) - 1, size)
        run = 0
      }
      k += 1
    }
    if (lastNz < 63) { val (e, el) = acCodes(acIndex(0x00)); bw.put(e, el) }
    coef(0)
  }

  /** Encode `samples` (pixel-major interleaved: component c of the
    * pixel at (x, y) is samples((y·width + x)·ncomp + c)) as a baseline
    * JPEG with `ncomp` components at 4:4:4 (every sampling factor 1×1)
    * in ONE interleaved scan — each MCU is one 8×8 block per component
    * in component order, and each component carries its own DC
    * predictor (T.81 A.2.3). ncomp = 1 is the grayscale profile;
    * ncomp = 3 is how a color image ships. The codec stores the three
    * planes verbatim (no RGB↔YCbCr transform — that integer-rounding
    * step is the caller's choice), so the per-channel block-constant
    * exactness contract holds for color exactly as q163 proved it for
    * gray. Runs per-row inside a task: O(w·h·ncomp) — scan-speed work,
    * no shuffle ever sees it. */
  def encodeInterleaved(width: Int, height: Int, ncomp: Int,
      samples: Array[Int]): Array[Byte] = {
    require(ncomp >= 1 && ncomp <= 3,
      s"JpegCodec.encodeInterleaved: $ncomp components")
    require(width > 0 && height > 0 && samples.length == width * height * ncomp,
      s"JpegCodec.encodeInterleaved: ${samples.length} samples for " +
        s"${width}x$height x$ncomp")
    // SOF0 stores dimensions in 16-bit fields; larger values would
    // silently truncate into a structurally valid JPEG with wrong dims
    require(width <= 65535 && height <= 65535,
      s"JpegCodec.encodeInterleaved: ${width}x$height exceeds the 16-bit SOF0 limit")
    val out = new java.io.ByteArrayOutputStream(samples.length / 2 + 512)
    out.write(0xFF); out.write(0xD8) // SOI
    // DQT: Pq=0 (8-bit) Tq=0, values in zigzag order (shared by all comps)
    seg(out, 0xDB, (Array(0x00) ++ Zigzag.map(QTable(_))).map(_.toByte))
    // SOF0: precision 8; ncomp components (ids 1..n, sampling 1x1, qtable 0)
    seg(out, 0xC0, (Array(8, (height >> 8) & 0xFF, height & 0xFF,
      (width >> 8) & 0xFF, width & 0xFF, ncomp) ++
      (1 to ncomp).flatMap(c => Array(c, 0x11, 0))).map(_.toByte))
    // DHT: DC class 0 id 0, then AC class 1 id 0 (shared by all comps)
    seg(out, 0xC4, ((Array(0x00) ++ DcBits.drop(1) ++ DcVals) ++
      (Array(0x10) ++ AcBits.drop(1) ++ AcVals)).map(_.toByte))
    // SOS: every component (DC table 0 / AC table 0), Ss=0 Se=63 Ah/Al=0
    seg(out, 0xDA, (Array(ncomp) ++ (1 to ncomp).flatMap(c => Array(c, 0x00)) ++
      Array(0, 63, 0)).map(_.toByte))

    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val acIndex = new Array[Int](256) // symbol → position in AcVals
    java.util.Arrays.fill(acIndex, -1)
    AcVals.zipWithIndex.foreach { case (s, i) => acIndex(s) = i }

    val bw = new BitWriter(out)
    // deinterleave into per-component planes (pre-masked) so the block
    // work is the same plane-based [[dctQuantBlock]] the 4:2:0 fixture
    // writer uses — one source of truth for the DCT/quant math
    val planes = Array.tabulate(ncomp) { c =>
      val p = new Array[Int](width * height)
      var i = 0
      while (i < p.length) { p(i) = samples(i * ncomp + c) & 0xFF; i += 1 }
      p
    }
    val wBlocks = (width + 7) / 8
    val hBlocks = (height + 7) / 8
    val coef = new Array[Int](64)
    val pred = new Array[Int](ncomp)
    var by = 0
    while (by < hBlocks) {
      var bx = 0
      while (bx < wBlocks) {
        var ci = 0
        while (ci < ncomp) {
          dctQuantBlock(planes(ci), width, height, bx, by, coef)
          pred(ci) = entropyBlock(bw, coef, pred(ci), dcCodes, acCodes, acIndex)
          ci += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Encode `samples` (pixel-major interleaved, 3 components) as a
    * baseline JPEG with 4:2:0 chroma subsampling — component 0 at full
    * resolution (sampling 2×2), components 1–2 box-filtered to half
    * resolution (1×1; each chroma sample is the rounded mean of its
    * up-to-2×2 full-resolution cell), entropy-coded as 4-luma+Cb+Cr
    * MCUs in T.81 A.2.3 raster order. This is the FIXTURE face of the
    * subsampled profile [[decodeInterleaved]] now reads (VERDICT r15
    * #1 keeps the production encoder 4:4:4): a corpus whose luma is
    * constant per 8×8 block and whose chroma is constant per 16×16 MCU
    * round-trips exactly — constant cells box-filter to the same
    * constant, every block is a lone DC, and nearest-neighbor
    * upsampling of a constant plane is exact — so q174's oracle can
    * regenerate the block/MCU formulas in SQL and hash-match. */
  def encode420(width: Int, height: Int, samples: Array[Int]): Array[Byte] =
    encodeSubsampled(width, height, samples, 2, 2)

  /** [[encode420]]'s horizontal-only sibling: 4:2:2 (luma 2×1, chroma
    * half-width full-height — the second-most-common crawled layout).
    * The exactness cell is 16×8: chroma constant per cell box-filters
    * to itself and nearest-upsamples back exactly. */
  def encode422(width: Int, height: Int, samples: Array[Int]): Array[Byte] =
    encodeSubsampled(width, height, samples, 2, 1)

  /** The shared subsampled-baseline encoder: luma at sampling sh×sv
    * (each ∈ {1, 2}), chroma box-filtered to (w/sh)×(h/sv), MCUs of
    * sh·sv luma blocks + Cb + Cr in T.81 A.2.3 raster order. */
  private def encodeSubsampled(width: Int, height: Int, samples: Array[Int],
      sh: Int, sv: Int): Array[Byte] = {
    require(width > 0 && height > 0 && samples.length == width * height * 3,
      s"JpegCodec.encodeSubsampled: ${samples.length} samples for ${width}x$height x3")
    require(width <= 65535 && height <= 65535,
      s"JpegCodec.encodeSubsampled: ${width}x$height exceeds the 16-bit SOF0 limit")
    val n = width * height
    val luma = new Array[Int](n)
    var i = 0
    while (i < n) { luma(i) = samples(i * 3) & 0xFF; i += 1 }
    val cw = (width + sh - 1) / sh
    val ch = (height + sv - 1) / sv
    val cbP = new Array[Int](cw * ch)
    val crP = new Array[Int](cw * ch)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        var sb = 0
        var sr = 0
        var cnt = 0
        var dy = 0
        while (dy < sv) {
          val yy = cy * sv + dy
          if (yy < height) {
            var dx = 0
            while (dx < sh) {
              val xx = cx * sh + dx
              if (xx < width) {
                sb += samples((yy * width + xx) * 3 + 1) & 0xFF
                sr += samples((yy * width + xx) * 3 + 2) & 0xFF
                cnt += 1
              }
              dx += 1
            }
          }
          dy += 1
        }
        cbP(cy * cw + cx) = (sb + cnt / 2) / cnt
        crP(cy * cw + cx) = (sr + cnt / 2) / cnt
        cx += 1
      }
      cy += 1
    }
    val out = new java.io.ByteArrayOutputStream(samples.length / 4 + 512)
    out.write(0xFF); out.write(0xD8) // SOI
    seg(out, 0xDB, (Array(0x00) ++ Zigzag.map(QTable(_))).map(_.toByte))
    // SOF0: luma id 1 sampling sh x sv, chroma ids 2-3 sampling 1x1
    seg(out, 0xC0, (Array(8, (height >> 8) & 0xFF, height & 0xFF,
      (width >> 8) & 0xFF, width & 0xFF, 3,
      1, (sh << 4) | sv, 0, 2, 0x11, 0, 3, 0x11, 0)).map(_.toByte))
    seg(out, 0xC4, ((Array(0x00) ++ DcBits.drop(1) ++ DcVals) ++
      (Array(0x10) ++ AcBits.drop(1) ++ AcVals)).map(_.toByte))
    seg(out, 0xDA, (Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)).map(_.toByte))

    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val acIndex = new Array[Int](256)
    java.util.Arrays.fill(acIndex, -1)
    AcVals.zipWithIndex.foreach { case (s, idx) => acIndex(s) = idx }

    val bw = new BitWriter(out)
    val coef = new Array[Int](64)
    val pred = new Array[Int](3)
    val mcusX = (width + 8 * sh - 1) / (8 * sh)
    val mcusY = (height + 8 * sv - 1) / (8 * sv)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // sh x sv luma blocks, raster order within the MCU, then Cb, Cr
        var bv = 0
        while (bv < sv) {
          var bh = 0
          while (bh < sh) {
            dctQuantBlock(luma, width, height, mx * sh + bh, my * sv + bv, coef)
            pred(0) = entropyBlock(bw, coef, pred(0), dcCodes, acCodes, acIndex)
            bh += 1
          }
          bv += 1
        }
        dctQuantBlock(cbP, cw, ch, mx, my, coef)
        pred(1) = entropyBlock(bw, coef, pred(1), dcCodes, acCodes, acIndex)
        dctQuantBlock(crP, cw, ch, mx, my, coef)
        pred(2) = entropyBlock(bw, coef, pred(2), dcCodes, acCodes, acIndex)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** A parsed Huffman table in T.81 F.2.2.3 decode form. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l); k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    * surfaces restart/EOI markers, fails (−1) on anything else. */
  private final class BitReader(d: Array[Byte], private var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var atMarker: Int = -1 // marker byte seen instead of data, or -1

    def bit(): Int = {
      if (nBits == 0) {
        if (atMarker >= 0 || pos >= d.length) return -1
        var b = d(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= d.length) return -1
          val m = d(pos) & 0xFF
          pos += 1
          if (m != 0x00) { atMarker = m; return -1 }
          b = 0xFF
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bitsValue(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { val b = bit(); if (b < 0) return -1; v = (v << 1) | b; i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Boolean = {
      nBits = 0
      if (atMarker < 0) {
        if (pos + 1 >= d.length || (d(pos) & 0xFF) != 0xFF) return false
        atMarker = d(pos + 1) & 0xFF
        pos += 2
      }
      val ok = atMarker >= 0xD0 && atMarker <= 0xD7
      if (ok) atMarker = -1
      ok
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (code > t.maxCode(l)) {
        val b = bit()
        if (b < 0 || l >= 16) return -1
        code = (code << 1) | b
        l += 1
      }
      t.value(l, code)
    }
  }

  /** T.81 EXTEND: map `v` (the `size` raw bits) to the signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  /** Decode a baseline grayscale JPEG to (width, height, pixels
    * row-major), or None for anything outside the 1-component profile
    * (color frames decode via [[decodeInterleaved]]). */
  def decode(d: Array[Byte]): Option[(Long, Long, Array[Int])] =
    decodeInterleaved(d) match {
      case Some((w, h, 1, px)) => Some((w, h, px))
      case _ => None
    }

  /** Hard ceiling on decoded samples (w·h·ncomp) per blob: 2²⁵ ints ≈
    * 128 MB of heap — a bounded, predictable slice of one task's
    * memory. SOF0/IHDR dimensions are UNTRUSTED: a crafted ~100-byte
    * header claiming 65535×65535×3 overflows the Int product into a
    * NegativeArraySizeException (killing the task) or, non-overflowing,
    * forces a multi-GB allocation from a tiny blob (ADVICE r15). Checked
    * in Long arithmetic BEFORE any allocation; over-budget → None, the
    * same loud-silence contract as any other unparseable blob. */
  private[multimodal] val MaxDecodeSamples: Long = 1L << 25

  /** Decode a baseline JPEG with 1–3 components in one interleaved
    * scan to (width, height, ncomp, samples pixel-major interleaved at
    * FULL resolution), or None for anything this profile doesn't cover
    * — progressive/arithmetic frames, truncated streams, corrupt
    * tables, sampling factors above 2: never a throw; one bad blob
    * must not kill a 100 TB scan. Per-component sampling factors of 1
    * and 2 are supported in any combination — 4:4:4, 4:2:2 and the
    * 4:2:0 that dominates real crawled JPEGs (VERDICT r15 #1) — by
    * decoding each component into its own plane at its natural
    * resolution (T.81 A.1.1: ceil(w·Hᵢ/Hmax) × ceil(h·Vᵢ/Vmax)) from
    * Hᵢ×Vᵢ blocks per MCU in raster order (A.2.3), then upsampling
    * nearest-neighbor to the full-resolution interleaved result. All
    * tables come from the stream's own DQT/DHT segments (T.81 F.2.2.3
    * — any conforming table works, nothing is hard-coded to this
    * encoder); the scan may list components in any order (mapped back
    * by component id); DRI/RSTn restart intervals count MCUs per T.81.
    *
    * Exactness contract, extended to subsampling: a 4:2:0 stream whose
    * luma is constant per 8×8 block and whose chroma is constant per
    * MCU decodes to exactly those constants — each block is a lone DC
    * coefficient, and nearest-neighbor upsampling of a constant plane
    * is exact — so a SQL oracle can regenerate the block/MCU formulas
    * and hash-match the full-resolution samples (q174's gate). */
  def decodeInterleaved(d: Array[Byte]): Option[(Long, Long, Int, Array[Int])] = {
    if (d.length < 4 || (d(0) & 0xFF) != 0xFF || (d(1) & 0xFF) != 0xD8) return None
    def be16(i: Int): Int = ((d(i) & 0xFF) << 8) | (d(i + 1) & 0xFF)

    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var w = -1
    var h = -1
    var nc = -1
    val compIds = new Array[Int](3)
    val compH = new Array[Int](3)
    val compV = new Array[Int](3)
    val compQ = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    var restartInterval = 0
    var scanStart = -1

    var i = 2
    while (scanStart < 0) {
      if (i + 3 >= d.length || (d(i) & 0xFF) != 0xFF) return None
      val marker = d(i + 1) & 0xFF
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) { i += 2 }
      else {
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > d.length) return None
        val body = i + 4
        marker match {
          case 0xDB => // DQT: one or more (Pq/Tq, 64 values) entries
            var p = body
            while (p < i + 2 + len) {
              val pq = (d(p) & 0xF0) >> 4
              val tq = d(p) & 0x0F
              if (pq != 0 || tq > 3 || p + 65 > i + 2 + len) return None
              val t = new Array[Int](64)
              var z = 0
              while (z < 64) { t(Zigzag(z)) = d(p + 1 + z) & 0xFF; z += 1 }
              qTables(tq) = t
              p += 65
            }
          case 0xC4 => // DHT: one or more (Tc/Th, BITS, VALS) entries
            var p = body
            while (p < i + 2 + len) {
              val tc = (d(p) & 0xF0) >> 4
              val th = d(p) & 0x0F
              if (tc > 1 || th > 3 || p + 17 > i + 2 + len) return None
              val bits = new Array[Int](17)
              var n = 0
              var l = 1
              while (l <= 16) { bits(l) = d(p + l) & 0xFF; n += bits(l); l += 1 }
              if (p + 17 + n > i + 2 + len) return None
              val vals = Array.tabulate(n)(k => d(p + 17 + k) & 0xFF)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              p += 17 + n
            }
          case 0xC0 => // SOF0 baseline; 8-bit, 1-3 comps, sampling 1-2
            if (len < 8 || (d(body) & 0xFF) != 8) return None
            h = be16(body + 1)
            w = be16(body + 3)
            nc = d(body + 5) & 0xFF
            if (nc < 1 || nc > 3 || len < 8 + 3 * nc) return None
            var c = 0
            while (c < nc) {
              compIds(c) = d(body + 6 + 3 * c) & 0xFF
              compH(c) = (d(body + 7 + 3 * c) & 0xF0) >> 4
              compV(c) = d(body + 7 + 3 * c) & 0x0F
              if (compH(c) < 1 || compH(c) > 2 ||
                compV(c) < 1 || compV(c) > 2) return None // factors 1-2 only
              compQ(c) = d(body + 8 + 3 * c) & 0x0F
              c += 1
            }
            // single-component scans are non-interleaved: the MCU is
            // ONE data unit and sampling factors don't apply (T.81
            // A.2.2) — some real gray JPEGs still declare 2x2 here
            if (nc == 1) { compH(0) = 1; compV(0) = 1 }
          case m if m >= 0xC1 && m <= 0xCF && m != 0xC4 && m != 0xC8 =>
            return None // progressive/arithmetic/other frame types
          case 0xDD => // DRI
            if (len < 4) return None
            restartInterval = be16(body)
          case 0xDA => // SOS: all frame components, then entropy data
            if (nc < 0) return None
            val ns = d(body) & 0xFF
            if (ns != nc || len < 6 + 2 * ns) return None
            var c = 0
            while (c < ns) {
              val id = d(body + 1 + 2 * c) & 0xFF
              var ci = -1
              var j = 0
              while (j < nc) { if (compIds(j) == id && ci < 0) ci = j; j += 1 }
              if (ci < 0) return None
              compDc(ci) = (d(body + 2 + 2 * c) & 0xF0) >> 4
              compAc(ci) = d(body + 2 + 2 * c) & 0x0F
              c += 1
            }
            scanStart = i + 2 + len
          case 0xD9 => return None // EOI before any scan
          case _ => () // APPn/COM/etc: skip
        }
        i += 2 + len
      }
    }
    if (w <= 0 || h <= 0) return None
    // Untrusted-dims budget gate BEFORE any allocation (ADVICE r15):
    // Long arithmetic so 65535x65535x3 can't overflow the check itself.
    // Plane allocations below are each <= this product.
    if (w.toLong * h * nc > MaxDecodeSamples) return None
    var cv = 0
    while (cv < nc) {
      if (qTables(compQ(cv)) == null || dcTables(compDc(cv)) == null ||
        acTables(compAc(cv)) == null) return None
      cv += 1
    }
    var hMax = 1
    var vMax = 1
    cv = 0
    while (cv < nc) {
      if (compH(cv) > hMax) hMax = compH(cv)
      if (compV(cv) > vMax) vMax = compV(cv)
      cv += 1
    }

    // One plane per component at its natural resolution (T.81 A.1.1);
    // for all-1x1 frames the planes ARE full resolution and the final
    // interleave is an identity copy.
    val planeW = Array.tabulate(nc)(c => (w * compH(c) + hMax - 1) / hMax)
    val planeH = Array.tabulate(nc)(c => (h * compV(c) + vMax - 1) / vMax)
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * planeH(c)))
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val coef = new Array[Int](64)
    val br = new BitReader(d, scanStart)
    val pred = new Array[Int](nc)
    var mcuIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          if (!br.restart()) return None
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < nc) {
          val q = qTables(compQ(ci))
          val dc = dcTables(compDc(ci))
          val ac = acTables(compAc(ci))
          val plane = planes(ci)
          val pw = planeW(ci)
          val ph = planeH(ci)
          // Hi x Vi blocks of this component per MCU, raster order
          var bv = 0
          while (bv < compV(ci)) {
            var bh = 0
            while (bh < compH(ci)) {
              java.util.Arrays.fill(coef, 0)
              val dcCat = br.decodeHuff(dc)
              if (dcCat < 0 || dcCat > 11) return None
              val dcBits = br.bitsValue(dcCat)
              if (dcBits < 0) return None
              pred(ci) += extend(dcBits, dcCat)
              coef(0) = pred(ci) * q(0)
              var hasAc = false
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = br.decodeHuff(ac)
                if (rs < 0) return None
                if (rs == 0x00) eob = true
                else if (rs == 0xF0) k += 16
                else {
                  k += (rs >> 4)
                  val size = rs & 0x0F
                  if (k > 63) return None
                  val raw = br.bitsValue(size)
                  if (raw < 0) return None
                  coef(Zigzag(k)) = extend(raw, size) * q(Zigzag(k))
                  hasAc = true
                  k += 1
                }
              }
              // IDCT + level shift + clamp into the plane, cropped to
              // the component's true dimensions
              val x0 = (mx * compH(ci) + bh) * 8
              val y0 = (my * compV(ci) + bv) * 8
              if (!hasAc) {
                // DC-only fast path: the IDCT of a lone DC coefficient
                // is constant — computed with EXACTLY the float-product
                // order of the general loop's single (u=0, v=0) term
                // (cos(·,0) is math.cos(0.0) = 1.0 exactly), so the
                // rounded sample is bit-identical, at 1/64th the work.
                // DC-only blocks are every flat block — the common case
                // in screenshots/diagrams and all exactness fixtures.
                val s = cNorm(0) * cNorm(0) * coef(0) * cos(0, 0) * cos(0, 0)
                val out = math.round(0.25 * s).toInt + 128
                val v = math.max(0, math.min(255, out))
                var y = 0
                while (y < 8) {
                  val py = y0 + y
                  if (py < ph) {
                    var x = 0
                    while (x < 8) {
                      if (x0 + x < pw) plane(py * pw + x0 + x) = v
                      x += 1
                    }
                  }
                  y += 1
                }
              } else {
                var y = 0
                while (y < 8) {
                  val py = y0 + y
                  var x = 0
                  while (x < 8) {
                    val pxx = x0 + x
                    if (py < ph && pxx < pw) {
                      var s = 0.0
                      var u = 0
                      while (u < 8) {
                        var v = 0
                        while (v < 8) {
                          val c = coef(u * 8 + v)
                          if (c != 0) s += cNorm(u) * cNorm(v) * c * cos(x, v) * cos(y, u)
                          v += 1
                        }
                        u += 1
                      }
                      val out = math.round(0.25 * s).toInt + 128
                      plane(py * pw + pxx) = math.max(0, math.min(255, out))
                    }
                    x += 1
                  }
                  y += 1
                }
              }
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcuIdx += 1
        mx += 1
      }
      my += 1
    }

    // Upsample nearest-neighbor (floor index — T.81 leaves the filter
    // to the decoder; nearest keeps constant planes exact) and
    // interleave to the full-resolution result.
    val px = new Array[Int](w * h * nc)
    var py = 0
    while (py < h) {
      var ci = 0
      while (ci < nc) {
        val plane = planes(ci)
        val pw = planeW(ci)
        val rowOff = (py * compV(ci) / vMax) * pw
        val hi = compH(ci)
        var pxx = 0
        while (pxx < w) {
          px((py * w + pxx) * nc + ci) = plane(rowOff + pxx * hi / hMax)
          pxx += 1
        }
        ci += 1
      }
      py += 1
    }
    Some((w.toLong, h.toLong, nc, px))
  }
}
