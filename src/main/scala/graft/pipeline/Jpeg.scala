package graft.pipeline

/** REAL baseline-sequential JPEG entropy codec, pure JVM, zero libraries —
  * the same no-dependency constraint the PNG (Inflater + hand filters),
  * GIF (hand LZW) and TIFF codecs already met. Everything here is written
  * from the public spec (ITU-T T.81 / ISO 10918-1): the FDCT/IDCT closed
  * forms (§A.3.3), the zigzag order (Figure A.6), magnitude-category
  * coding (§F.1.2.1), byte stuffing (§F.1.2.3), restart markers (§F.2.1.3)
  * and the Annex K.3 "typical" Huffman tables, which are spec constants.
  *
  * Encoder: 8-bit grayscale OR 3-component 4:4:4 YCbCr, one uniform
  * quantization table of 8s. The DC quantizer 8 divides the flat-block DC
  * coefficient 8·(v−128) exactly, so an image that is CONSTANT WITHIN
  * EACH 8×8 TILE round-trips BIT-EXACTLY through the lossy pipeline
  * (FDCT → quant → Huffman → decode → IDCT): every AC coefficient of a
  * flat tile is zero and the DC survives quantization unchanged. That is
  * what lets a lossy codec feed a hash-exact DuckDB oracle — the gate
  * encodes tile-constant pixels, the oracle replays the tile arithmetic
  * (SparkEntry q_multimodal_jpeg). Arbitrary pixels encode fine too, with
  * ordinary lossy error (spec-tested against ImageIO both directions).
  *
  * Decoder: general sequential (SOF0/SOF1), progressive (SOF2, round 9)
  * AND lossless (SOF3, round 9) — multiple DQT (8/16-bit) and DHT
  * segments, 1- or 3-component frames, sampling factors 1-2 each way
  * (4:4:4 / 4:2:2 / 4:2:0), DRI/RSTn restart handling, byte-unstuffing,
  * nearest-neighbor chroma upsampling, JFIF YCbCr→RGB. Progressive scans
  * implement the full Annex G Huffman procedures: spectral selection, DC
  * and AC successive approximation (EOB-run coding and refinement
  * correction bits), coefficients accumulated per component and IDCT'd
  * at EOI. Lossless scans implement the Annex H Huffman procedures: the
  * seven predictors, point transform, modulo-2^16 reconstruction,
  * category 16, interleaved and per-component scans ([[encodeLossless]]
  * provides the exactness-tested encoder face — lossless decode must
  * reproduce encoder input BIT-EXACTLY on arbitrary content, a stronger
  * contract than the flat-tile one the lossy paths pin). Arithmetic-coded
  * and hierarchical streams are rejected here and still served
  * geometry-only by [[Multimodal.decodeJpeg]]'s marker walk.
  *
  * Reference behavior note: the reference engine has no binary columns at
  * all (Supersonic's type system is numeric/string/date —
  * supersonic/base/infrastructure/types.h); this codec exists for the
  * 100 TB multimodal-pipeline surface, where JPEG dominates.
  */
object Jpeg {

  // ---- spec constants (ITU T.81 Annex K) ----

  /** Zigzag scan order: zigzag(k) = natural index of the k-th coefficient. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 typical luminance DC table: code counts per length 1..16,
    * then the symbol values (categories 0-11). */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K.3.2 typical luminance AC table. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** The uniform quantization table this encoder writes: every divisor 8.
    * Chosen so the DC of a level-shifted flat tile (8·(v−128), v∈[0,255])
    * quantizes losslessly — see the object scaladoc. */
  private val QuantAll8: Array[Int] = Array.fill(64)(8)

  // ---- canonical Huffman code construction (T.81 §C.2) ----

  /** (code, length) per symbol value, from a BITS/HUFFVAL pair. */
  private def buildEncodeTable(bits: Array[Int],
                               vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  /** Decoder table in the T.81 §F.2.2.3 MINCODE/MAXCODE/VALPTR form. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  // ---- DCT (T.81 §A.3.3 closed forms, separable double arithmetic) ----

  private val CosTable: Array[Double] = {
    // cos((2x+1) u π / 16) for x,u in 0..7
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Forward DCT of one level-shifted 8×8 block (row-major doubles). */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    // rows
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * CosTable(x * 8 + u); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    // columns + normalization
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * CosTable(yy * 8 + v); yy += 1 }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        out(v * 8 + u) = 0.25 * cu * cv * s
        u += 1
      }
      v += 1
    }
  }

  /** Inverse DCT of one dequantized 8×8 block; output still level-shifted. */
  private def idct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    // columns
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          s += cv * in(v * 8 + x) * CosTable(y * 8 + v)
          v += 1
        }
        tmp(y * 8 + x) = s
        y += 1
      }
      x += 1
    }
    // rows
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          s += cu * tmp(yy * 8 + u) * CosTable(xx * 8 + u)
          u += 1
        }
        out(yy * 8 + xx) = 0.25 * s
        xx += 1
      }
      yy += 1
    }
  }

  // ---- bit I/O with byte stuffing ----

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // §F.1.2.3 byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per spec
      put(0x7f, 8 - nbits)
    }
  }

  /** JPEG magnitude category: number of bits needed for |v|. */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  // ---- encoder ----

  /** Component sample at (comp, x, y), edge-replicated (a spec-allowed
    * pad that keeps flat tiles flat on partial edge blocks). */
  private def makeSampler(width: Int, height: Int, channels: Int,
                          pixels: Array[Byte]): (Int, Int, Int) => Double =
    (comp: Int, x: Int, y: Int) => {
      val xx = math.min(x, width - 1)
      val yy = math.min(y, height - 1)
      if (channels == 1) (pixels(yy * width + xx) & 0xff).toDouble
      else {
        val p = 3 * (yy * width + xx)
        val r = pixels(p) & 0xff
        val g = pixels(p + 1) & 0xff
        val b = pixels(p + 2) & 0xff
        comp match { // JFIF color transform
          case 0 => 0.299 * r + 0.587 * g + 0.114 * b
          case 1 => 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
          case _ => 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        }
      }
    }

  /** Encode 8-bit pixels as a baseline-sequential JFIF. `channels` is 1
    * (grayscale: pixels = w·h bytes) or 3 (RGB row-major interleaved,
    * encoded as 4:4:4 YCbCr). See object scaladoc for the flat-tile
    * exactness contract (grayscale only — the RGB path pays color-space
    * rounding like every JPEG). */
  def encodeBaseline(width: Int, height: Int, channels: Int,
                     pixels: Array[Byte], restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      "encodeBaseline: dimensions must be in [1, 65535]")
    require(channels == 1 || channels == 3,
      "encodeBaseline: channels must be 1 (gray) or 3 (RGB)")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      "encodeBaseline: restartInterval must be in [0, 65535]")
    require(pixels.length == channels * width * height,
      s"encodeBaseline: expected ${channels * width * height} pixel bytes, " +
        s"got ${pixels.length}")
    val out = new java.io.ByteArrayOutputStream(1024 + pixels.length / 2)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0/JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(67); u8(0) // DQT: table 0, 8-bit
    var i = 0
    while (i < 64) { u8(QuantAll8(Zigzag(i))); i += 1 }
    marker(0xc0); u16(8 + 3 * channels); u8(8) // SOF0
    u16(height); u16(width); u8(channels)
    var c = 0
    while (c < channels) { u8(c + 1); u8(0x11); u8(0); c += 1 }
    // one DHT segment carrying both tables (class 0 id 0, class 1 id 0)
    val dhtLen = 2 + (1 + 16 + DcVals.length) + (1 + 16 + AcVals.length)
    marker(0xc4); u16(dhtLen)
    u8(0x00); DcBits.foreach(u8); DcVals.foreach(u8)
    u8(0x10); AcBits.foreach(u8); AcVals.foreach(u8)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda); u16(6 + 2 * channels); u8(channels) // SOS
    c = 0
    while (c < channels) { u8(c + 1); u8(0x00); c += 1 }
    u8(0); u8(63); u8(0)

    val dcTab = buildEncodeTable(DcBits, DcVals)
    val acTab = buildEncodeTable(AcBits, AcVals)
    val bw = new BitWriter(out)
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val prevDc = new Array[Int](channels)
    val samp = new Array[Double](64)
    val coef = new Array[Double](64)
    val quant = new Array[Int](64)

    val sample = makeSampler(width, height, channels, pixels)

    def putCoded(tab: Array[(Int, Int)], sym: Int): Unit = {
      val e = tab(sym)
      require(e != null, s"encodeBaseline: no Huffman code for symbol $sym")
      bw.put(e._1, e._2)
    }

    // non-interleaved would need one scan per component; baseline 4:4:4
    // with 1×1 sampling interleaves one block per component per MCU
    var rstN = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        val mcuIdx = by * blocksX + bx
        if (restartInterval > 0 && mcuIdx > 0 &&
          mcuIdx % restartInterval == 0) { // §F.2.1.3: align, RSTn, reset DC
          bw.flush()
          marker(0xd0 + rstN)
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(prevDc, 0)
        }
        c = 0
        while (c < channels) {
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              samp(y * 8 + x) = sample(c, bx * 8 + x, by * 8 + y) - 128.0
              x += 1
            }
            y += 1
          }
          fdct(samp, coef)
          var k = 0
          while (k < 64) {
            val q = QuantAll8(k)
            quant(k) = math.round(coef(Zigzag(k)) / q).toInt
            k += 1
          }
          // DC: category + magnitude bits of the difference
          val diff = quant(0) - prevDc(c)
          prevDc(c) = quant(0)
          val dcCat = category(diff)
          putCoded(dcTab, dcCat)
          if (dcCat > 0) {
            val bits = if (diff < 0) diff + (1 << dcCat) - 1 else diff
            bw.put(bits, dcCat)
          }
          // AC: (run, size) symbols with ZRL and EOB
          var run = 0
          var k2 = 1
          while (k2 < 64) {
            val v = quant(k2)
            if (v == 0) run += 1
            else {
              while (run > 15) { putCoded(acTab, 0xf0); run -= 16 }
              val cat = category(v)
              putCoded(acTab, (run << 4) | cat)
              val bits = if (v < 0) v + (1 << cat) - 1 else v
              bw.put(bits, cat)
              run = 0
            }
            k2 += 1
          }
          if (run > 0) putCoded(acTab, 0x00) // EOB
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Grayscale convenience face (the oracle-gate encoder). */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] =
    encodeBaseline(width, height, 1, pixels)

  /** Encode 8-bit pixels as a PROGRESSIVE (SOF2) JFIF using the classic
    * spectral-selection + DC-successive-approximation script:
    *
    *   scan 1: DC all components interleaved, Ah=0 Al=1
    *   scan 2: DC refinement, Ah=1 Al=0 (one raw bit per block)
    *   per component: AC band 1–5, then AC band 6–63 (Ah=Al=0)
    *
    * Same quantization and Annex-K Huffman tables as [[encodeBaseline]]
    * and the same coefficient values, so the flat-tile bit-exactness
    * contract carries over unchanged: the DC point transform is lossless
    * here because scan 2 restores bit 0 exactly ((v>>1)<<1 | (v&1) = v
    * in two's complement), and flat tiles have no AC at all. A baseline
    * and a progressive encode of the same tile-constant image therefore
    * decode to IDENTICAL pixels while sharing no payload bytes — the
    * planted cross-coding twin for the image-dedup gates. */
  def encodeProgressive(width: Int, height: Int, channels: Int,
                        pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      "encodeProgressive: dimensions must be in [1, 65535]")
    require(channels == 1 || channels == 3,
      "encodeProgressive: channels must be 1 (gray) or 3 (RGB)")
    require(pixels.length == channels * width * height,
      s"encodeProgressive: expected ${channels * width * height} pixel bytes, " +
        s"got ${pixels.length}")
    val out = new java.io.ByteArrayOutputStream(1024 + pixels.length / 2)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0/JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(67); u8(0) // DQT: table 0, 8-bit
    var i = 0
    while (i < 64) { u8(QuantAll8(Zigzag(i))); i += 1 }
    marker(0xc2); u16(8 + 3 * channels); u8(8) // SOF2
    u16(height); u16(width); u8(channels)
    var c = 0
    while (c < channels) { u8(c + 1); u8(0x11); u8(0); c += 1 }
    val dhtLen = 2 + (1 + 16 + DcVals.length) + (1 + 16 + AcVals.length)
    marker(0xc4); u16(dhtLen)
    u8(0x00); DcBits.foreach(u8); DcVals.foreach(u8)
    u8(0x10); AcBits.foreach(u8); AcVals.foreach(u8)

    // all quantized coefficients up front (zigzag order per block) —
    // progressive scans revisit every block several times
    val sample = makeSampler(width, height, channels, pixels)
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val nBlocks = blocksX * blocksY
    val coefQ = Array.ofDim[Int](channels, nBlocks * 64)
    val samp = new Array[Double](64)
    val coef = new Array[Double](64)
    var b = 0
    while (b < nBlocks) {
      val bx = b % blocksX
      val by = b / blocksX
      c = 0
      while (c < channels) {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            samp(y * 8 + x) = sample(c, bx * 8 + x, by * 8 + y) - 128.0
            x += 1
          }
          y += 1
        }
        fdct(samp, coef)
        var k = 0
        while (k < 64) {
          coefQ(c)(b * 64 + k) = math.round(coef(Zigzag(k)) / QuantAll8(k)).toInt
          k += 1
        }
        c += 1
      }
      b += 1
    }

    val dcTab = buildEncodeTable(DcBits, DcVals)
    val acTab = buildEncodeTable(AcBits, AcVals)

    def sosHeader(scanChannels: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); u16(6 + 2 * scanChannels.length); u8(scanChannels.length)
      scanChannels.foreach { ci => u8(ci + 1); u8(0x00) }
      u8(ss); u8(se); u8((ah << 4) | al)
    }

    // scan 1: DC first, all components interleaved, point transform Al=1
    sosHeader(0 until channels, 0, 0, 0, 1)
    locally {
      val bw = new BitWriter(out)
      val prevDc = new Array[Int](channels)
      var blk = 0
      while (blk < nBlocks) { // 1×1 sampling: MCU raster == block raster
        c = 0
        while (c < channels) {
          val dc = coefQ(c)(blk * 64) >> 1 // arithmetic: floor toward -inf
          val diff = dc - prevDc(c)
          prevDc(c) = dc
          val cat = category(diff)
          val e = dcTab(cat)
          bw.put(e._1, e._2)
          if (cat > 0)
            bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
          c += 1
        }
        blk += 1
      }
      bw.flush()
    }

    // scan 2: DC refinement (Ah=1, Al=0) — bit 0 of each DC, raw
    sosHeader(0 until channels, 0, 0, 1, 0)
    locally {
      val bw = new BitWriter(out)
      var blk = 0
      while (blk < nBlocks) {
        c = 0
        while (c < channels) {
          bw.put(coefQ(c)(blk * 64) & 1, 1)
          c += 1
        }
        blk += 1
      }
      bw.flush()
    }

    // AC scans: two spectral bands per component, full precision (Al=0);
    // per-block EOB (symbol 0x00 = EOB run of 1) ends each band
    val bands = Seq((1, 5), (6, 63))
    c = 0
    while (c < channels) {
      bands.foreach { case (ss, se) =>
        sosHeader(Seq(c), ss, se, 0, 0)
        val bw = new BitWriter(out)
        var blk = 0
        while (blk < nBlocks) {
          var run = 0
          var k = ss
          while (k <= se) {
            val v = coefQ(c)(blk * 64 + k)
            if (v == 0) run += 1
            else {
              while (run > 15) { val e = acTab(0xf0); bw.put(e._1, e._2); run -= 16 }
              val cat = category(v)
              val e = acTab((run << 4) | cat)
              require(e != null, s"encodeProgressive: no AC code for run=$run size=$cat")
              bw.put(e._1, e._2)
              bw.put(if (v < 0) v + (1 << cat) - 1 else v, cat)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val e = acTab(0x00); bw.put(e._1, e._2) } // EOB
          blk += 1
        }
        bw.flush()
      }
      c += 1
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- lossless (SOF3, T.81 Annex H) ----

  /** Lossless-process Huffman table: the difference categories run 0..16
    * (16 = the modulo-65536 difference +32768, coded with NO extra bits —
    * H.1.2.2), so the Annex K DC table (symbols 0..11) cannot serve.
    * Seventeen symbols all at code length 5 is a valid canonical table
    * (Kraft 17/32 ≤ 1; the all-ones 5-bit code stays unassigned). */
  private val LosslessBits = Array(0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val LosslessVals: Array[Int] = (0 to 16).toArray

  /** Predictor Px from reconstructed neighbors (T.81 H.1.2.1). The /2 in
    * selectors 5-7 is the spec's one-bit right shift (arithmetic — rb−rc
    * may be negative). */
  private def losslessPredict(sel: Int, ra: Int, rb: Int, rc: Int): Int =
    sel match {
      case 1 => ra
      case 2 => rb
      case 3 => rc
      case 4 => ra + rb - rc
      case 5 => ra + ((rb - rc) >> 1)
      case 6 => rb + ((ra - rc) >> 1)
      case _ => (ra + rb) >> 1
    }

  /** Encode 8-bit pixels as a LOSSLESS (SOF3) JPEG — predictor-coded
    * sample differences, no DCT, no quantization: decode reproduces the
    * input bytes EXACTLY (the property the spec test pins on arbitrary
    * content, where the baseline path is lossy). `channels` 3 writes the
    * components as literal R,G,B — T.81's lossless process defines no
    * color transform, and the decoder reads them back the same way.
    *
    * Restart semantics (both codec directions, documented because H.2.3
    * leaves the mid-row case interpretable): after scan start or an RSTn,
    * the NEXT sample of each scan component predicts from the default
    * 2^(P−1−Pt); every other sample uses the positional rules (first line
    * → Ra, first column → Rb, else the selected predictor) over the full
    * reconstructed plane. */
  def encodeLossless(width: Int, height: Int, channels: Int,
                     pixels: Array[Byte], predictor: Int = 1, pt: Int = 0,
                     restartInterval: Int = 0,
                     separateScans: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      "encodeLossless: dimensions must be in [1, 65535]")
    require(channels == 1 || channels == 3,
      "encodeLossless: channels must be 1 (gray) or 3 (RGB)")
    require(predictor >= 1 && predictor <= 7,
      "encodeLossless: predictor selector must be in [1, 7]")
    require(pt >= 0 && pt <= 7, "encodeLossless: point transform in [0, 7]")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      "encodeLossless: restartInterval must be in [0, 65535]")
    require(pixels.length == channels * width * height,
      s"encodeLossless: expected ${channels * width * height} pixel bytes, " +
        s"got ${pixels.length}")
    val out = new java.io.ByteArrayOutputStream(1024 + pixels.length / 2)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xc3); u16(8 + 3 * channels); u8(8) // SOF3, 8-bit precision
    u16(height); u16(width); u8(channels)
    var c = 0
    while (c < channels) { u8(c + 1); u8(0x11); u8(0); c += 1 }
    marker(0xc4); u16(2 + 1 + 16 + LosslessVals.length) // DHT class 0 id 0
    u8(0x00); LosslessBits.foreach(u8); LosslessVals.foreach(u8)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }

    val tab = buildEncodeTable(LosslessBits, LosslessVals)
    // point-transformed source samples, per component plane
    val planes = Array.tabulate(channels) { ci =>
      val p = new Array[Int](width * height)
      var i = 0
      while (i < width * height) {
        p(i) = (pixels(i * channels + ci) & 0xff) >> pt
        i += 1
      }
      p
    }
    val default = 1 << (7 - pt) // 2^(P−1−Pt), P = 8
    // one interleaved scan (MCU = one sample per component), or — the
    // other shape Annex H allows — one full scan per component
    val scans: Seq[Array[Int]] =
      if (separateScans) (0 until channels).map(Array(_))
      else Seq(Array.range(0, channels))
    for (scanComps <- scans) {
      marker(0xda); u16(6 + 2 * scanComps.length); u8(scanComps.length) // SOS
      scanComps.foreach { ci => u8(ci + 1); u8(0x00) }
      u8(predictor); u8(0); u8(pt) // Ss = selector, Se = 0, Ah = 0, Al = Pt
      val bw = new BitWriter(out)
      val needReset = Array.fill(scanComps.length)(true)
      var rstN = 0
      var mcu = 0
      val nMcus = width * height
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + rstN)
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(needReset, true)
        }
        val y = mcu / width
        val x = mcu % width
        var si = 0
        while (si < scanComps.length) {
          val pl = planes(scanComps(si))
          val s = pl(y * width + x)
          val pred =
            if (needReset(si)) { needReset(si) = false; default }
            else if (y == 0) pl(x - 1)
            else if (x == 0) pl((y - 1) * width)
            else losslessPredict(predictor, pl(y * width + x - 1),
              pl((y - 1) * width + x), pl((y - 1) * width + x - 1))
          val d0 = (s - pred) & 0xffff
          if (d0 == 32768) { // H.1.2.2: +32768 ⇒ category 16, no extra bits
            val e = tab(16); bw.put(e._1, e._2)
          } else {
            val d = if (d0 >= 32768) d0 - 65536 else d0
            val cat = category(d)
            val e = tab(cat)
            bw.put(e._1, e._2)
            if (cat > 0) {
              val bits = if (d < 0) d + (1 << cat) - 1 else d
              bw.put(bits, cat)
            }
          }
          si += 1
        }
        mcu += 1
      }
      bw.flush()
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ----

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawMarker = false
    /** Next bit of entropy-coded data; unstuffs FF 00, stops at markers. */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length) { sawMarker = true; return 0 }
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) { sawMarker = true; return 0 }
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed FF
          else { sawMarker = true; pos -= 1; b = 0 } // real marker: stop
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def alignToMarker(): Unit = { nbits = 0 }
  }

  private def decodeHuffSym(br: BitReader, h: HuffDecoder): Int = {
    var code = br.bit()
    var len = 1
    while (len <= 16) {
      if (h.maxCode(len) >= 0 && code <= h.maxCode(len))
        return h.values(h.valPtr(len) + code - h.minCode(len))
      code = (code << 1) | br.bit()
      len += 1
    }
    throw new IllegalArgumentException("jpeg: invalid Huffman code")
  }

  /** JPEG "extend": magnitude bits → signed value (T.81 §F.2.2.1). */
  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int,
                                     var dcTab: Int = 0, var acTab: Int = 0)

  /** Full pixel decode of a baseline-sequential JPEG. Returns
    * (mime, width, height, RGB bytes — gray replicated to 3 channels).
    * None for anything that is not baseline-sequential Huffman 8-bit with
    * 1 or 3 components and sampling factors ≤ 2. */
  def decodePixels(bytes: Array[Byte]): Option[(String, Int, Int, Array[Byte])] = {
    if (bytes.length < 4 ||
      (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    try decodePixelsImpl(bytes)
    catch { case _: Exception => None } // malformed stream ⇒ not decodable
  }

  private def decodePixelsImpl(bytes: Array[Byte]): Option[(String, Int, Int, Array[Byte])] = {
    val quantTabs = Array.ofDim[Int](4, 64) // natural order
    val dcHuff = new Array[HuffDecoder](4)
    val acHuff = new Array[HuffDecoder](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    // progressive (SOF2) state: per-component quantized-coefficient
    // buffers accumulated across scans, IDCT'd only at EOI
    var progressive = false
    var sawScan = false
    var coefs: Array[Array[Int]] = null
    // lossless (SOF3) state: full-resolution reconstructed sample planes,
    // one per component, assembled at EOI (scans may be interleaved or
    // one-component-at-a-time)
    var lossless = false
    var losslessPlanes: Array[Array[Int]] = null
    var losslessScanned: Array[Boolean] = null
    var losslessPt: Array[Int] = null
    var mcusX = 0
    var mcusY = 0
    var maxH = 1
    var maxV = 1
    var blocksW: Array[Int] = null // padded (interleaved) block grid
    var blocksH: Array[Int] = null
    var compBlocksW: Array[Int] = null // true grid for non-interleaved scans
    var compBlocksH: Array[Int] = null
    var pos = 2
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)

    while (pos + 1 < bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      var p = pos + 1
      while (p < bytes.length && (bytes(p) & 0xff) == 0xff) p += 1
      if (p >= bytes.length) return None
      val m = bytes(p) & 0xff
      p += 1
      if (m == 0xd9) { // EOI: progressive / lossless frames complete here
        return if (progressive && sawScan)
          finishProgressive(width, height, comps, coefs, quantTabs,
            blocksW, blocksH, maxH, maxV)
        else if (lossless && sawScan && losslessScanned.forall(identity))
          finishLossless(width, height, comps, losslessPlanes, losslessPt)
        else None
      }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { pos = p }
      else {
        if (p + 1 >= bytes.length) return None
        val len = u16(p)
        if (len < 2 || p + len > bytes.length) return None
        var posOverride = -1
        m match {
          case 0xdb => // DQT: one or more tables
            var q = p + 2
            while (q < p + len) {
              val pq = (bytes(q) & 0xff) >> 4
              val tq = bytes(q) & 0x0f
              q += 1
              var k = 0
              while (k < 64) {
                val v = if (pq == 0) bytes(q) & 0xff else { val x = u16(q); q += 1; x }
                q += 1
                quantTabs(tq)(Zigzag(k)) = v
                k += 1
              }
            }
          case 0xc4 => // DHT: one or more tables
            var q = p + 2
            while (q < p + len) {
              val tc = (bytes(q) & 0xff) >> 4
              val th = bytes(q) & 0x0f
              q += 1
              val bits = new Array[Int](16)
              var n = 0
              var k = 0
              while (k < 16) { bits(k) = bytes(q + k) & 0xff; n += bits(k); k += 1 }
              q += 16
              val vals = new Array[Int](n)
              k = 0
              while (k < n) { vals(k) = bytes(q + k) & 0xff; k += 1 }
              q += n
              val dec = new HuffDecoder(bits, vals)
              if (tc == 0) dcHuff(th) = dec else acHuff(th) = dec
            }
          case 0xc0 | 0xc1 | 0xc2 | 0xc3 =>
            // SOF0 baseline / SOF1 ext seq / SOF2 progressive / SOF3 lossless
            // (SOF1 with 8-bit samples decodes identically to baseline)
            if ((bytes(p + 2) & 0xff) != 8) return None // 8-bit only
            progressive = m == 0xc2
            lossless = m == 0xc3
            height = u16(p + 3); width = u16(p + 5)
            val nc = bytes(p + 7) & 0xff
            if (width == 0 || height == 0 || (nc != 1 && nc != 3)) return None
            comps = (0 until nc).map { i =>
              val b = p + 8 + 3 * i
              val hv = bytes(b + 1) & 0xff
              Component(bytes(b) & 0xff, hv >> 4, hv & 0x0f, bytes(b + 2) & 0x0f)
            }.toArray
            if (comps.exists(cp => cp.h < 1 || cp.h > 2 || cp.v < 1 || cp.v > 2))
              return None
            if (lossless) {
              // subsampling is legal in lossless but vanishingly rare —
              // full-resolution components only (Hi = Vi = 1)
              if (comps.exists(cp => cp.h != 1 || cp.v != 1)) return None
              losslessPlanes = comps.indices.map(_ =>
                new Array[Int](width * height)).toArray
              losslessScanned = new Array[Boolean](nc)
              losslessPt = new Array[Int](nc)
            }
            maxH = comps.map(_.h).max
            maxV = comps.map(_.v).max
            mcusX = (width + 8 * maxH - 1) / (8 * maxH)
            mcusY = (height + 8 * maxV - 1) / (8 * maxV)
            blocksW = comps.map(cp => mcusX * cp.h)
            blocksH = comps.map(cp => mcusY * cp.v)
            // ceil(ceil(dim·sampling/max)/8) = ceil(dim·sampling/(8·max))
            compBlocksW = comps.map(cp => (width * cp.h + 8 * maxH - 1) / (8 * maxH))
            compBlocksH = comps.map(cp => (height * cp.v + 8 * maxV - 1) / (8 * maxV))
            if (progressive)
              coefs = comps.indices.map(i =>
                new Array[Int](blocksW(i) * blocksH(i) * 64)).toArray
          case x if x >= 0xc5 && x <= 0xcf && x != 0xc8 && x != 0xcc =>
            return None // arithmetic-coded / hierarchical frames
          case 0xdd => restartInterval = u16(p + 2)
          case 0xda => // SOS: entropy data follows
            if (comps == null) return None
            val ns = bytes(p + 2) & 0xff
            if (ns < 1 || ns > comps.length) return None
            val scanComps = new Array[Int](ns)
            var q = p + 3
            var i = 0
            while (i < ns) {
              val cid = bytes(q) & 0xff
              val tabs = bytes(q + 1) & 0xff
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return None
              comps(ci).dcTab = tabs >> 4
              comps(ci).acTab = tabs & 0x0f
              scanComps(i) = ci
              q += 2
              i += 1
            }
            val ss = bytes(q) & 0xff
            val se = bytes(q + 1) & 0xff
            val ahal = bytes(q + 2) & 0xff
            q += 3
            if (lossless) {
              // Ss = predictor selector, Al = point transform (H.2)
              if (ss < 1 || ss > 7 || se != 0 || (ahal >> 4) != 0) return None
              val pt = ahal & 0x0f
              if (pt > 7) return None
              val next = decodeLosslessScan(bytes, q, comps, scanComps,
                losslessPlanes, width, height, dcHuff, ss, pt, restartInterval)
              if (next < 0) return None
              scanComps.foreach { ci =>
                losslessScanned(ci) = true; losslessPt(ci) = pt
              }
              sawScan = true
              posOverride = next
            } else if (!progressive) {
              if (ns != comps.length) return None
              return decodeScan(bytes, q, width, height, comps, quantTabs,
                dcHuff, acHuff, restartInterval)
            } else {
              val next = decodeProgScan(bytes, q, comps, scanComps, coefs,
                blocksW, compBlocksW, compBlocksH, mcusX, mcusY,
                dcHuff, acHuff, ss, se, ahal >> 4, ahal & 0x0f, restartInterval)
              if (next < 0) return None
              sawScan = true
              posOverride = next
            }
          case _ => () // APPn / COM / others: skip by length
        }
        pos = if (posOverride >= 0) posOverride else p + len
      }
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int,
                         width: Int, height: Int, comps: Array[Component],
                         quantTabs: Array[Array[Int]],
                         dcHuff: Array[HuffDecoder], acHuff: Array[HuffDecoder],
                         restartInterval: Int): Option[(String, Int, Int, Array[Byte])] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    // per-component planes at the component's own resolution
    val planeW = comps.map(cp => mcusX * cp.h * 8)
    val planeH = comps.map(cp => mcusY * cp.v * 8)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * planeH(i))).toArray
    val br = new BitReader(bytes, scanStart)
    val prevDc = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val px = new Array[Double](64)

    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // RSTn: byte-aligned marker, DC predictors reset
        br.alignToMarker()
        var p = br.pos
        while (p + 1 < bytes.length &&
          !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) >= 0xd0 &&
            (bytes(p + 1) & 0xff) <= 0xd7)) p += 1
        if (p + 1 >= bytes.length) return None
        br.pos = p + 2
        br.sawMarker = false
        java.util.Arrays.fill(prevDc, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val qt = quantTabs(comp.tq)
        val dcT = dcHuff(comp.dcTab)
        val acT = acHuff(comp.acTab)
        if (dcT == null || acT == null) return None
        var v = 0
        while (v < comp.v) {
          var h = 0
          while (h < comp.h) {
            java.util.Arrays.fill(coef, 0.0)
            val dcCat = decodeHuffSym(br, dcT)
            val diff = extend(br.bits(dcCat), dcCat)
            prevDc(ci) += diff
            coef(0) = prevDc(ci).toDouble * qt(0)
            var k = 1
            while (k < 64) {
              val rs = decodeHuffSym(br, acT)
              if (rs == 0x00) k = 64 // EOB
              else if (rs == 0xf0) k += 16 // ZRL
              else {
                k += rs >> 4
                if (k > 63) return None
                val cat = rs & 0x0f
                coef(Zigzag(k)) = extend(br.bits(cat), cat).toDouble * qt(Zigzag(k))
                k += 1
              }
            }
            idct(coef, px)
            val bx0 = (mx * comp.h + h) * 8
            val by0 = (my * comp.v + v) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val s = math.round(px(y * 8 + x) + 128.0).toInt
                val cl = if (s < 0) 0 else if (s > 255) 255 else s
                planes(ci)((by0 + y) * planeW(ci) + bx0 + x) = cl.toByte
                x += 1
              }
              y += 1
            }
            h += 1
          }
          v += 1
        }
        ci += 1
      }
      if (br.sawMarker && mcu < nMcus - 1 &&
        !(restartInterval > 0 && (mcu + 1) % restartInterval == 0))
        return None // entropy data ran out early
      mcu += 1
    }

    assembleRgb(width, height, comps, planes, planeW, maxH, maxV)
  }

  /** One lossless scan (T.81 Annex H, Huffman): predictor-decoded sample
    * differences written into the full-resolution component planes.
    * Interleaved (MCU = one sample per scan component, raster order) and
    * single-component scans share the loop — Hi = Vi = 1 makes every
    * component full-resolution. Categories run 0..16 (16 ⇒ +32768, no
    * extra bits); reconstruction is modulo 2^16 (H.1.2.2). Returns the
    * byte position of the next real marker, or -1 on malformed data.
    * Restart semantics documented at [[encodeLossless]]. */
  private def decodeLosslessScan(bytes: Array[Byte], scanStart: Int,
                                 comps: Array[Component], scanComps: Array[Int],
                                 planes: Array[Array[Int]],
                                 width: Int, height: Int,
                                 dcHuff: Array[HuffDecoder],
                                 predictor: Int, pt: Int,
                                 restartInterval: Int): Int = {
    val br = new BitReader(bytes, scanStart)
    val tabs = scanComps.map(ci => dcHuff(comps(ci).dcTab))
    if (tabs.exists(_ == null)) return -1
    val needReset = Array.fill(scanComps.length)(true)
    val default = 1 << (7 - pt) // 2^(P−1−Pt), P = 8
    val nMcus = width * height
    var mcu = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.alignToMarker()
        var p = br.pos
        while (p + 1 < bytes.length &&
          !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) >= 0xd0 &&
            (bytes(p + 1) & 0xff) <= 0xd7)) p += 1
        if (p + 1 >= bytes.length) return -1
        br.pos = p + 2
        br.sawMarker = false
        java.util.Arrays.fill(needReset, true)
      }
      val y = mcu / width
      val x = mcu % width
      var si = 0
      while (si < scanComps.length) {
        val pl = planes(scanComps(si))
        val s = decodeHuffSym(br, tabs(si))
        val diff = if (s == 16) 32768 else extend(br.bits(s), s)
        val pred =
          if (needReset(si)) { needReset(si) = false; default }
          else if (y == 0) pl(x - 1)
          else if (x == 0) pl((y - 1) * width)
          else losslessPredict(predictor, pl(y * width + x - 1),
            pl((y - 1) * width + x), pl((y - 1) * width + x - 1))
        pl(y * width + x) = (pred + diff) & 0xffff
        si += 1
      }
      if (br.sawMarker && mcu < nMcus - 1 &&
        !(restartInterval > 0 && (mcu + 1) % restartInterval == 0))
        return -1 // entropy data ran out early
      mcu += 1
    }
    // position of the next real marker (skips stuffed FF00 and RSTn)
    br.alignToMarker()
    var p = br.pos
    while (p + 1 < bytes.length && !((bytes(p) & 0xff) == 0xff && {
      val mm = bytes(p + 1) & 0xff
      mm != 0x00 && !(mm >= 0xd0 && mm <= 0xd7)
    })) p += 1
    if (p + 1 >= bytes.length) -1 else p
  }

  /** Lossless finish at EOI: undo each component's point transform
    * (output = sample << Pt, H.1.2.3) and assemble RGB. Three-component
    * frames are literal R,G,B — T.81's lossless process defines no color
    * transform (and [[encodeLossless]] writes components the same way). */
  private def finishLossless(width: Int, height: Int, comps: Array[Component],
                             planes: Array[Array[Int]], ptPerComp: Array[Int])
      : Option[(String, Int, Int, Array[Byte])] = {
    val rgb = new Array[Byte](3 * width * height)
    def clamp8(v: Int): Byte = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
    var i = 0
    val n = width * height
    if (comps.length == 1) {
      val pt = ptPerComp(0)
      while (i < n) {
        val g = clamp8(planes(0)(i) << pt)
        rgb(3 * i) = g; rgb(3 * i + 1) = g; rgb(3 * i + 2) = g
        i += 1
      }
    } else {
      while (i < n) {
        rgb(3 * i) = clamp8(planes(0)(i) << ptPerComp(0))
        rgb(3 * i + 1) = clamp8(planes(1)(i) << ptPerComp(1))
        rgb(3 * i + 2) = clamp8(planes(2)(i) << ptPerComp(2))
        i += 1
      }
    }
    Some(("image/jpeg", width, height, rgb))
  }

  /** One progressive scan (T.81 Annex G, Huffman): updates the
    * per-component quantized-coefficient buffers in place and returns the
    * byte position of the next marker, or -1 on a malformed stream.
    * Handles all four scan kinds — DC first (Ah=0, diff-coded at point
    * transform Al), DC refinement (one raw bit per block), AC first
    * (spectral band [Ss,Se] with EOB-run coding, §G.1.2.2) and AC
    * refinement (correction bits, §G.1.2.3). DC scans may interleave
    * several components (MCU order); AC scans are single-component by
    * spec (non-interleaved block raster over the component's own grid). */
  private def decodeProgScan(bytes: Array[Byte], scanStart: Int,
                             comps: Array[Component], scanComps: Array[Int],
                             coefs: Array[Array[Int]],
                             blocksW: Array[Int],
                             compBlocksW: Array[Int], compBlocksH: Array[Int],
                             mcusX: Int, mcusY: Int,
                             dcHuff: Array[HuffDecoder], acHuff: Array[HuffDecoder],
                             ss: Int, se: Int, ah: Int, al: Int,
                             restartInterval: Int): Int = {
    if (ss < 0 || se > 63 || (ss == 0 && se != 0) || (ss > 0 && ss > se)) return -1
    val isDc = ss == 0
    if (!isDc && scanComps.length != 1) return -1
    if (ah != 0 && ah != al + 1) return -1 // successive approximation steps by 1 bit
    val br = new BitReader(bytes, scanStart)
    val prevDc = new Array[Int](comps.length)
    var eobrun = 0

    // RSTn: byte-aligned marker, DC predictors and EOB run reset
    def restartCheck(unit: Int): Boolean = {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.alignToMarker()
        var p = br.pos
        while (p + 1 < bytes.length &&
          !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) >= 0xd0 &&
            (bytes(p + 1) & 0xff) <= 0xd7)) p += 1
        if (p + 1 >= bytes.length) return false
        br.pos = p + 2
        br.sawMarker = false
        java.util.Arrays.fill(prevDc, 0)
        eobrun = 0
      }
      true
    }

    def decodeDcBlock(ci: Int, blockIdx: Int): Boolean = {
      val base = blockIdx * 64
      if (ah == 0) { // first DC scan: diff-coded values at point transform Al
        val cat = decodeHuffSym(br, dcHuff(comps(ci).dcTab))
        if (cat > 15) return false
        prevDc(ci) += extend(br.bits(cat), cat)
        coefs(ci)(base) = prevDc(ci) << al
      } else { // refinement: one raw bit per block
        if (br.bit() == 1) coefs(ci)(base) |= 1 << al
      }
      true
    }

    def decodeAcFirst(ci: Int, blockIdx: Int): Boolean = {
      val cf = coefs(ci)
      val base = blockIdx * 64
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = decodeHuffSym(br, acHuff(comps(ci).acTab))
        val r = rs >> 4
        val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else { // EOBn: run of (1<<r)-1+bits(r) further all-done blocks
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.bits(r)
            return true
          }
        } else {
          k += r
          if (k > se) return false
          cf(base + Zigzag(k)) = extend(br.bits(s), s) << al
          k += 1
        }
      }
      true
    }

    // §G.1.2.3: newly-significant coefficients arrive as ±1<<Al; every
    // already-nonzero coefficient passed on the way reads one correction
    // bit (appended toward zero-magnitude side growth)
    def decodeAcRefine(ci: Int, blockIdx: Int): Boolean = {
      val cf = coefs(ci)
      val base = blockIdx * 64
      val p1 = 1 << al
      val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var inBand = true
        while (k <= se && inBand) {
          val rs = decodeHuffSym(br, acHuff(comps(ci).acTab))
          var r = rs >> 4
          val s = rs & 0x0f
          var newval = 0
          if (s == 0) {
            if (r < 15) {
              // EOBn INCLUDES the current block: the tail pass below must
              // still read correction bits through the rest of this band
              // (then decrements), so the run is 1<<r + bits, not -1
              eobrun = 1 << r
              if (r > 0) eobrun += br.bits(r)
              inBand = false
            } // r == 15: skip 16 zero-history coefficients
          } else {
            if (s != 1) return false // refinement magnitudes are exactly 1
            newval = if (br.bit() == 1) p1 else m1
          }
          if (inBand) {
            var placed = false
            while (k <= se && !placed) {
              val z = base + Zigzag(k)
              if (cf(z) != 0) {
                if (br.bit() == 1 && (cf(z) & p1) == 0)
                  cf(z) += (if (cf(z) >= 0) p1 else m1)
              } else if (r == 0) {
                if (newval != 0) cf(z) = newval
                placed = true
              } else r -= 1
              k += 1
            }
            if (!placed && s != 0) return false // no slot left for the new coeff
          }
        }
      }
      if (eobrun > 0) { // correction bits through the rest of the band
        while (k <= se) {
          val z = base + Zigzag(k)
          if (cf(z) != 0 && br.bit() == 1 && (cf(z) & p1) == 0)
            cf(z) += (if (cf(z) >= 0) p1 else m1)
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    def decodeUnit(ci: Int, blockIdx: Int): Boolean =
      if (isDc) decodeDcBlock(ci, blockIdx)
      else if (ah == 0) decodeAcFirst(ci, blockIdx)
      else decodeAcRefine(ci, blockIdx)

    if (scanComps.length > 1) { // interleaved (DC) scan: MCU raster
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (!restartCheck(mcu)) return -1
        val my = mcu / mcusX
        val mx = mcu % mcusX
        var si = 0
        while (si < scanComps.length) {
          val ci = scanComps(si)
          val comp = comps(ci)
          var v = 0
          while (v < comp.v) {
            var h = 0
            while (h < comp.h) {
              if (!decodeUnit(ci, (my * comp.v + v) * blocksW(ci) + mx * comp.h + h))
                return -1
              h += 1
            }
            v += 1
          }
          si += 1
        }
        mcu += 1
      }
    } else { // non-interleaved: block raster over the component's own grid
      val ci = scanComps(0)
      val bw = compBlocksW(ci)
      val nB = bw * compBlocksH(ci)
      var b = 0
      while (b < nB) {
        if (!restartCheck(b)) return -1
        if (!decodeUnit(ci, (b / bw) * blocksW(ci) + b % bw)) return -1
        b += 1
      }
    }

    // position of the next real marker (skips stuffed FF00 and RSTn)
    br.alignToMarker()
    var p = br.pos
    while (p + 1 < bytes.length && !((bytes(p) & 0xff) == 0xff && {
      val mm = bytes(p + 1) & 0xff
      mm != 0x00 && !(mm >= 0xd0 && mm <= 0xd7)
    })) p += 1
    if (p + 1 >= bytes.length) -1 else p
  }

  /** Progressive finish at EOI: dequantize + IDCT every accumulated
    * coefficient block into component planes, then assemble RGB. */
  private def finishProgressive(width: Int, height: Int, comps: Array[Component],
                                coefs: Array[Array[Int]],
                                quantTabs: Array[Array[Int]],
                                blocksW: Array[Int], blocksH: Array[Int],
                                maxH: Int, maxV: Int): Option[(String, Int, Int, Array[Byte])] = {
    if (comps == null || coefs == null) return None
    val planeW = comps.indices.map(i => blocksW(i) * 8).toArray
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * blocksH(i) * 8)).toArray
    val coefD = new Array[Double](64)
    val px = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val qt = quantTabs(comps(ci).tq)
      val cf = coefs(ci)
      var by = 0
      while (by < blocksH(ci)) {
        var bx = 0
        while (bx < blocksW(ci)) {
          val base = (by * blocksW(ci) + bx) * 64
          var k = 0
          while (k < 64) { coefD(k) = cf(base + k).toDouble * qt(k); k += 1 }
          idct(coefD, px)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val s = math.round(px(y * 8 + x) + 128.0).toInt
              val cl = if (s < 0) 0 else if (s > 255) 255 else s
              planes(ci)((by * 8 + y) * planeW(ci) + bx * 8 + x) = cl.toByte
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    assembleRgb(width, height, comps, planes, planeW, maxH, maxV)
  }

  /** Component planes → interleaved RGB with nearest-neighbor upsampling
    * of subsampled planes (shared by the sequential and progressive
    * decode paths). */
  private def assembleRgb(width: Int, height: Int, comps: Array[Component],
                          planes: Array[Array[Byte]], planeW: Array[Int],
                          maxH: Int, maxV: Int): Option[(String, Int, Int, Array[Byte])] = {
    val rgb = new Array[Byte](3 * width * height)
    if (comps.length == 1) {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = planes(0)(y * planeW(0) + x)
          val o = 3 * (y * width + x)
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sampleAt(i: Int): Int = {
            val sx = x * comps(i).h / maxH
            val sy = y * comps(i).v / maxV
            planes(i)(sy * planeW(i) + sx) & 0xff
          }
          val yy = sampleAt(0).toDouble
          val cb = sampleAt(1) - 128.0
          val cr = sampleAt(2) - 128.0
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = 3 * (y * width + x)
          rgb(o) = clamp(yy + 1.402 * cr)
          rgb(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          rgb(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    Some(("image/jpeg", width, height, rgb))
  }
}
