package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The baseline JPEG ENTROPY codec (Huffman + quant + DCT — [[Jpeg]]),
  * cross-validated against the JDK's own JPEG codec in BOTH directions:
  * ImageIO must decode our files, and our decoder must decode ImageIO's.
  * The flat-tile bit-exactness contract (what lets a lossy codec feed a
  * hash-exact oracle gate) is asserted directly. */
class JpegCodecSpec extends SparkSpec {
  import spark.implicits._

  private def seeded(n: Int, seed: Int): Array[Byte] = {
    // deterministic LCG bytes — no Random so runs are identical everywhere
    val out = new Array[Byte](n)
    var s = seed.toLong & 0xffffffffL
    var i = 0
    while (i < n) {
      s = (s * 1103515245L + 12345L) & 0x7fffffffL
      out(i) = ((s >> 16) & 0xff).toByte
      i += 1
    }
    out
  }

  private def imageioRead(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def rgbOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new Array[Byte](3 * img.getWidth * img.getHeight)
    val gray = img.getRaster.getNumBands == 1
    var i = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      if (gray) {
        // raster samples ARE the decoded Y values; getRGB would push them
        // through a gray→sRGB color-space conversion and distort them
        val v = img.getRaster.getSample(x, y, 0).toByte
        out(i) = v; out(i + 1) = v; out(i + 2) = v
      } else {
        val p = img.getRGB(x, y)
        out(i) = ((p >> 16) & 0xff).toByte
        out(i + 1) = ((p >> 8) & 0xff).toByte
        out(i + 2) = (p & 0xff).toByte
      }
      i += 3
    }
    out
  }

  private def maxAbsDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length, s"length ${a.length} vs ${b.length}")
    var m = 0
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
      if (d > m) m = d
      i += 1
    }
    m
  }

  test("JPEG entropy codec: flat-tile grayscale round-trips BIT-EXACTLY " +
    "through the lossy pipeline (non-multiple-of-8 geometry)") {
    val seed = Array[Byte](10, 200.toByte, 30, 255.toByte, 0, 127)
    val w = 19; val h = 13 // partial edge blocks on both axes
    val jpg = Multimodal.encodeJpegGrayTiled(w, h, seed)
    val decoded = Jpeg.decodePixels(jpg)
    assert(decoded.isDefined, "decoder rejected its own encoder's output")
    val (fmt, dw, dh, rgb) = decoded.get
    assert(fmt == "image/jpeg" && dw == w && dh == h)
    val tilesAcross = (w + 7) / 8
    for (y <- 0 until h; x <- 0 until w) {
      val v = seed(((y / 8) * tilesAcross + (x / 8)) % seed.length) & 0xff
      val o = 3 * (y * w + x)
      assert((rgb(o) & 0xff) == v && (rgb(o + 1) & 0xff) == v &&
        (rgb(o + 2) & 0xff) == v,
        s"pixel ($x,$y): got ${rgb(o) & 0xff}, want $v")
    }
    // the JDK's OWN decoder reads the same exact pixels — the marker
    // stream, Huffman tables and entropy data are spec-conformant
    val img = imageioRead(jpg)
    assert(img.getWidth == w && img.getHeight == h)
    assert(maxAbsDiff(rgbOf(img), rgb) == 0,
      "ImageIO and our decoder disagree on flat-tile content")
  }

  test("JPEG entropy codec: arbitrary grayscale content — our decode " +
    "matches ImageIO's and stays near the source") {
    val w = 37; val h = 23
    val px = seeded(w * h, seed = 7)
    val jpg = Jpeg.encodeGray(w, h, px)
    // random content at uniform quant 8 exercises byte stuffing for real
    var stuffed = 0
    for (i <- 0 until jpg.length - 1)
      if ((jpg(i) & 0xff) == 0xff && jpg(i + 1) == 0) stuffed += 1
    assert(stuffed > 0, "no stuffed 0xFF00 in entropy data — test too weak")
    val (_, dw, dh, ours) = Jpeg.decodePixels(jpg).get
    assert(dw == w && dh == h)
    val theirs = rgbOf(imageioRead(jpg))
    // IDCT implementations may legitimately differ by ±1 per sample
    assert(maxAbsDiff(ours, theirs) <= 2,
      s"our IDCT diverges from ImageIO by ${maxAbsDiff(ours, theirs)}")
    // lossy error vs the source stays small at uniform quant 8
    val srcRgb = new Array[Byte](3 * w * h)
    for (i <- 0 until w * h) {
      srcRgb(3 * i) = px(i); srcRgb(3 * i + 1) = px(i); srcRgb(3 * i + 2) = px(i)
    }
    assert(maxAbsDiff(ours, srcRgb) <= 24,
      s"lossy error ${maxAbsDiff(ours, srcRgb)} larger than expected")
  }

  test("JPEG entropy codec: 4:4:4 RGB color — ImageIO agreement and " +
    "restart-marker stream decodes") {
    val w = 24; val h = 17
    val px = seeded(3 * w * h, seed = 11)
    val jpg = Jpeg.encodeBaseline(w, h, 3, px)
    val (_, dw, dh, ours) = Jpeg.decodePixels(jpg).get
    assert(dw == w && dh == h)
    val theirs = rgbOf(imageioRead(jpg))
    // color adds YCbCr round-trip rounding on top of the ±1 IDCT slack
    assert(maxAbsDiff(ours, theirs) <= 4,
      s"color decode diverges from ImageIO by ${maxAbsDiff(ours, theirs)}")
    // restart markers: DRI + RSTn every 2 MCUs, DC predictors reset —
    // both our decoder and ImageIO must read the interleaved stream
    val jpgRst = Jpeg.encodeBaseline(w, h, 3, px, restartInterval = 2)
    assert(jpgRst.length > jpg.length, "restart stream should carry markers")
    val (_, _, _, oursRst) = Jpeg.decodePixels(jpgRst).get
    assert(maxAbsDiff(oursRst, ours) == 0,
      "restart-interval stream decoded differently from the plain stream")
    assert(maxAbsDiff(rgbOf(imageioRead(jpgRst)), oursRst) <= 4)
  }

  test("JPEG entropy codec: decodes the JDK encoder's files (foreign " +
    "Huffman tables, subsampled color)") {
    val w = 40; val h = 32
    // smooth low-frequency content so chroma-upsampling differences
    // (nearest-neighbor here vs ImageIO's interpolating filter) stay small
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = 32 + 3 * x + 2 * y
      gray.getRaster.setSample(x, y, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "jpeg", bos), "JDK JPEG writer missing")
    val foreign = bos.toByteArray
    val dec = Jpeg.decodePixels(foreign)
    assert(dec.isDefined, "our decoder rejected a JDK-written baseline JPEG")
    val (_, dw, dh, ours) = dec.get
    assert(dw == w && dh == h)
    assert(maxAbsDiff(ours, rgbOf(imageioRead(foreign))) <= 2)
    // color: the JDK writer subsamples chroma (4:2:0) at default quality —
    // exercises the sampling-factor MCU layout and upsampling path
    val color = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + 2 * x; val g = 30 + 2 * y; val b = 60 + x + y
      color.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos2 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(color, "jpeg", bos2))
    val foreignColor = bos2.toByteArray
    val dec2 = Jpeg.decodePixels(foreignColor)
    assert(dec2.isDefined, "our decoder rejected a JDK-written color JPEG")
    val (_, cw, ch, oursC) = dec2.get
    assert(cw == w && ch == h)
    // upsampling filters differ, so allow a wider band on smooth content
    assert(maxAbsDiff(oursC, rgbOf(imageioRead(foreignColor))) <= 12,
      s"subsampled decode diverges by ${maxAbsDiff(oursC, rgbOf(imageioRead(foreignColor)))}")
  }

  test("progressive JPEG (SOF2): flat-tile grayscale round-trips " +
    "BIT-EXACTLY, identical to the baseline encode of the same pixels") {
    val seed = Array[Byte](10, 200.toByte, 30, 255.toByte, 0, 127)
    val w = 19; val h = 13
    val tilesAcross = (w + 7) / 8
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = seed(((y / 8) * tilesAcross + (x / 8)) % seed.length)
    val prog = Jpeg.encodeProgressive(w, h, 1, px)
    // really progressive: SOF2 marker present, SOF0 absent
    def hasMarker(b: Array[Byte], m: Int): Boolean =
      b.indices.dropRight(1).exists(i => (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == m)
    assert(hasMarker(prog, 0xc2) && !hasMarker(prog, 0xc0))
    val (fmt, dw, dh, rgb) = Jpeg.decodePixels(prog).get
    assert(fmt == "image/jpeg" && dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = seed(((y / 8) * tilesAcross + (x / 8)) % seed.length) & 0xff
      val o = 3 * (y * w + x)
      assert((rgb(o) & 0xff) == v, s"pixel ($x,$y): got ${rgb(o) & 0xff}, want $v")
    }
    // decodes EXACTLY like the baseline encode (same coefficients, same
    // IDCT), while sharing no entropy payload layout
    val (_, _, _, base) = Jpeg.decodePixels(Jpeg.encodeGray(w, h, px)).get
    assert(maxAbsDiff(rgb, base) == 0, "progressive vs baseline decode differ")
    // the JDK's decoder agrees bit-for-bit on the flat-tile content
    val img = imageioRead(prog)
    assert(img.getWidth == w && img.getHeight == h)
    assert(maxAbsDiff(rgbOf(img), rgb) == 0,
      "ImageIO and our decoder disagree on progressive flat-tile content")
  }

  test("progressive JPEG (SOF2): arbitrary gray and RGB content decode " +
    "identically to the baseline encode and match ImageIO") {
    val w = 37; val h = 23
    val gray = seeded(w * h, seed = 7)
    val prog = Jpeg.encodeProgressive(w, h, 1, gray)
    val (_, dw, dh, ours) = Jpeg.decodePixels(prog).get
    assert(dw == w && dh == h)
    val (_, _, _, base) = Jpeg.decodePixels(Jpeg.encodeGray(w, h, gray)).get
    assert(maxAbsDiff(ours, base) == 0,
      "progressive and baseline encodes of the same pixels decode differently")
    assert(maxAbsDiff(ours, rgbOf(imageioRead(prog))) <= 2,
      "our progressive decode diverges from ImageIO")
    // color: 3-component frame — interleaved DC scans + 6 AC band scans
    val rgbPx = seeded(3 * w * h, seed = 11)
    val progC = Jpeg.encodeProgressive(w, h, 3, rgbPx)
    val (_, cw, ch, oursC) = Jpeg.decodePixels(progC).get
    assert(cw == w && ch == h)
    val (_, _, _, baseC) = Jpeg.decodePixels(Jpeg.encodeBaseline(w, h, 3, rgbPx)).get
    assert(maxAbsDiff(oursC, baseC) == 0)
    assert(maxAbsDiff(oursC, rgbOf(imageioRead(progC))) <= 4)
  }

  test("progressive JPEG (SOF2): decodes the JDK's OWN progressive writer " +
    "(foreign tables, successive approximation, subsampled color)") {
    val w = 40; val h = 32
    def writeProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = wr.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); wr.dispose()
      bos.toByteArray
    }
    def hasMarker(b: Array[Byte], m: Int): Boolean =
      b.indices.dropRight(1).exists(i => (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == m)
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, 32 + 3 * x + 2 * y)
    val foreign = writeProgressive(gray)
    assert(hasMarker(foreign, 0xc2), "JDK writer did not emit SOF2")
    val dec = Jpeg.decodePixels(foreign)
    assert(dec.isDefined, "our decoder rejected a JDK-written progressive JPEG")
    val (_, dw, dh, ours) = dec.get
    assert(dw == w && dh == h)
    assert(maxAbsDiff(ours, rgbOf(imageioRead(foreign))) <= 2,
      "progressive decode of JDK stream diverges from ImageIO")
    // color progressive: successive approximation over subsampled chroma
    val color = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + 2 * x; val g = 30 + 2 * y; val b = 60 + x + y
      color.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val foreignColor = writeProgressive(color)
    assert(hasMarker(foreignColor, 0xc2))
    val dec2 = Jpeg.decodePixels(foreignColor)
    assert(dec2.isDefined, "our decoder rejected a JDK color progressive JPEG")
    val (_, cw, ch, oursC) = dec2.get
    assert(cw == w && ch == h)
    assert(maxAbsDiff(oursC, rgbOf(imageioRead(foreignColor))) <= 12,
      s"subsampled progressive diverges by ${maxAbsDiff(oursC, rgbOf(imageioRead(foreignColor)))}")
  }

  test("JPEG entropy codec: malformed streams reject instead of misparsing") {
    val jpg = Multimodal.encodeJpegGrayTiled(16, 16, Array[Byte](1, 2, 3))
    assert(Jpeg.decodePixels(jpg.take(40)).isEmpty) // truncated in headers
    assert(Jpeg.decodePixels(jpg.dropRight(jpg.length / 3)).isEmpty) // truncated scan
    val progressive = jpg.clone()
    // flip SOF0 (FFC0) to SOF2 (FFC2): the body is still a BASELINE scan
    // (Ss=0, Se=63), which is an ILLEGAL progressive scan header — the
    // SOF2 decoder must reject the inconsistent stream, not misparse it
    val sof = progressive.indices.find(i =>
      (progressive(i) & 0xff) == 0xff && (progressive(i + 1) & 0xff) == 0xc0).get
    progressive(sof + 1) = 0xc2.toByte
    assert(Jpeg.decodePixels(progressive).isEmpty)
    // ...but the geometry-only marker walk still serves it
    assert(Multimodal.decodeJpeg(progressive).contains(("image/jpeg", 16, 16)))
    assert(Jpeg.decodePixels("not a jpeg at all".getBytes).isEmpty)
    // the old header-level payloads (raw scan bytes, no DHT) are not
    // valid entropy streams — pixel decode refuses, marker walk reads them
    val headerOnly = Multimodal.encodeJpegHeader(9, 7, Array[Byte](5))
    assert(Jpeg.decodePixels(headerOnly).isEmpty)
    assert(Multimodal.decodeJpeg(headerOnly).contains(("image/jpeg", 9, 7)))
  }

  test("JPEG payloads flow through decodeImageFeatures (sums + dhash)") {
    val df = Seq((1L, 17, 9, "abc"), (2L, 8, 8, "zq")).toDF("id", "w", "h", "t")
      .withColumn("seed", col("t").cast("binary"))
    val enc = Multimodal.encodeJpegBaselineCol(df, "w", "h", "seed", "payload")
    val feat = Multimodal.decodeImageFeatures(enc, "payload")
      .select("id", "media_format", "width", "height", "sum_r", "sum_g", "sum_b")
    val got = rows(feat.orderBy("id"))
    // replay the tile arithmetic: sum = sum over tiles of v * tileW * tileH
    def tileSum(w: Int, h: Int, seed: Array[Byte]): Long = {
      val ta = (w + 7) / 8
      var s = 0L
      for (ty <- 0 until (h + 7) / 8; tx <- 0 until ta) {
        val v = seed(((ty * ta) + tx) % seed.length) & 0xff
        s += v.toLong * math.min(8, w - 8 * tx) * math.min(8, h - 8 * ty)
      }
      s
    }
    val s1 = tileSum(17, 9, "abc".getBytes)
    val s2 = tileSum(8, 8, "zq".getBytes)
    assert(got == Seq(
      Seq(1L, "image/jpeg", 17, 9, s1, s1, s1),
      Seq(2L, "image/jpeg", 8, 8, s2, s2, s2)))
  }

  // ---- lossless (SOF3, T.81 Annex H) ----
  // No independent JVM oracle exists for this process (ImageIO's JPEG
  // plugin reads only DCT-based streams), but none is needed: LOSSLESS
  // means decode(encode(pixels)) must reproduce the input bytes EXACTLY
  // on ARBITRARY content — a stronger contract than the lossy paths'
  // flat-tile construction, and one that any predictor/entropy bug breaks
  // immediately (a single wrong difference corrupts every later sample
  // of the plane through the prediction chain).

  test("lossless JPEG (SOF3): exact round-trip on arbitrary content, " +
    "all seven predictors, gray and RGB, odd geometry") {
    for (pred <- 1 to 7) {
      val gray = seeded(37 * 23, seed = 100 + pred)
      val g = Jpeg.decodePixels(Jpeg.encodeLossless(37, 23, 1, gray, pred))
      assert(g.nonEmpty, s"predictor $pred gray decode failed")
      val (fmt, w, h, rgb) = g.get
      assert((fmt, w, h) == ("image/jpeg", 37, 23))
      for (i <- 0 until 37 * 23; c <- 0 until 3)
        assert(rgb(3 * i + c) == gray(i), s"pred $pred gray pixel $i")

      val color = seeded(3 * 19 * 11, seed = 200 + pred)
      val r = Jpeg.decodePixels(Jpeg.encodeLossless(19, 11, 3, color, pred))
      assert(r.nonEmpty, s"predictor $pred rgb decode failed")
      assert(r.get._4.toSeq == color.toSeq, s"pred $pred rgb exactness")
    }
  }

  test("lossless JPEG (SOF3): point transform, restart markers, and " +
    "per-component scans round-trip") {
    val px = seeded(29 * 13, seed = 7)
    // point transform Pt=2: decode output is (v >> 2) << 2 per H.1.2.3
    val pt = Jpeg.decodePixels(Jpeg.encodeLossless(29, 13, 1, px, 4, pt = 2))
    assert(pt.nonEmpty)
    for (i <- 0 until 29 * 13)
      assert((pt.get._4(3 * i) & 0xff) == (((px(i) & 0xff) >> 2) << 2))
    // restart interval that does NOT divide the row length (mid-row resets)
    val rst = Jpeg.encodeLossless(29, 13, 1, px, 5, restartInterval = 17)
    assert(rst.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) >= 0xd0 && (s(1) & 0xff) <= 0xd7),
      "expected RSTn markers in the stream")
    val rd = Jpeg.decodePixels(rst)
    assert(rd.nonEmpty && (0 until 29 * 13).forall(i => rd.get._4(3 * i) == px(i)))
    // three one-component scans instead of one interleaved scan
    val color = seeded(3 * 23 * 9, seed = 8)
    val sep = Jpeg.encodeLossless(23, 9, 3, color, 6, separateScans = true)
    assert(sep.sliding(2).count(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xda) == 3,
      "expected three SOS markers")
    val sd = Jpeg.decodePixels(sep)
    assert(sd.nonEmpty && sd.get._4.toSeq == color.toSeq)
  }

  test("lossless JPEG (SOF3): malformed streams reject; readers without " +
    "the process fail gracefully") {
    val px = seeded(16 * 16, seed = 9)
    val ok = Jpeg.encodeLossless(16, 16, 1, px, 1)
    assert(Jpeg.decodePixels(ok).nonEmpty)
    assert(Jpeg.decodePixels(ok.dropRight(ok.length / 3)).isEmpty) // truncated
    def at(marker: Int): Int = ok.indices.find(i =>
      (ok(i) & 0xff) == 0xff && i + 1 < ok.length &&
        (ok(i + 1) & 0xff) == marker).get
    // predictor selector 0 is illegal in a lossless scan header
    val badSs = ok.clone()
    badSs(at(0xda) + 4 + 1 + 2) = 0
    assert(Jpeg.decodePixels(badSs).isEmpty)
    // subsampled lossless (Hi=Vi=2) is out of contract — reject, not garble
    val sub = ok.clone()
    sub(at(0xc3) + 11) = 0x22.toByte
    assert(Jpeg.decodePixels(sub).isEmpty)
    // the JDK's DCT-only JPEG reader must refuse the stream cleanly (this
    // is WHY the exactness property, not ImageIO, is the oracle here)
    val io = try Option(imageioRead(ok)) catch { case _: Exception => None }
    assert(io.isEmpty)
    // geometry-only marker walk still serves SOF3 headers
    assert(Multimodal.decodeJpeg(ok).contains(("image/jpeg", 16, 16)))
  }

  test("lossless JPEG (SOF3): payloads flow through decodePixelsRgb " +
    "and decodeImageFeatures") {
    val px = seeded(12 * 5, seed = 10)
    val bytes = Jpeg.encodeLossless(12, 5, 1, px, 7)
    val viaDispatch = Multimodal.decodePixelsRgb(bytes)
    assert(viaDispatch.nonEmpty && (0 until 12 * 5).forall(i =>
      viaDispatch.get._4(3 * i) == px(i)))
    val df = Seq((1L, bytes)).toDF("id", "payload")
    val feat = Multimodal.decodeImageFeatures(df, "payload")
      .select("media_format", "width", "height", "sum_r").collect()
    val expected = px.map(_ & 0xff).map(_.toLong).sum
    assert(feat.head.getString(0) == "image/jpeg" && feat.head.getInt(1) == 12 &&
      feat.head.getInt(2) == 5 && feat.head.getLong(3) == expected)
  }
}
