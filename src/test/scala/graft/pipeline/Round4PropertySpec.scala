package graft.pipeline

import graft.SparkSpec
import graft.operators.Aggregates
import org.apache.spark.sql.functions._

/** Property-style randomized tests for the round-4 operators — seeded
  * random inputs pinning the operators' LAWS (codec round trips, greedy
  * budget bound, manifest permutation-invariance), the same role as the
  * reference's random-input operator tests
  * (testing/operation_testing.h). Seeded ⇒ deterministic. */
class Round4PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)

  test("property: BMP and PPM decode(encode(w, h)) == (w, h) for 150 random dims") {
    (1 to 150).foreach { _ =>
      val w = 1 + rng.nextInt(300)
      val h = 1 + rng.nextInt(300)
      val seed = Array.fill(1 + rng.nextInt(32))(rng.nextInt().toByte)
      val bmp = Multimodal.encodeBmp24(w, h, seed)
      assert(Multimodal.decodeBmp(bmp).contains(("image/bmp", w, h)), s"bmp $w x $h")
      // file size law: 54-byte header + 4-byte-padded 3-byte-pixel rows
      assert(bmp.length == 54 + (3 * w + (4 - (3 * w) % 4) % 4) * h)
      val ppm = Multimodal.encodePpm6(w, h, seed)
      assert(Multimodal.decodePpm(ppm).contains(("image/ppm", w, h)), s"ppm $w x $h")
      assert(ppm.length == 9 + w.toString.length + h.toString.length + 3 * w * h)
      // dispatch routes each format to its own decoder
      assert(Multimodal.decodeAny(bmp)._1 == "image/bmp")
      assert(Multimodal.decodeAny(ppm)._1 == "image/ppm")
    }
  }

  test("property: PNG decode(encode(w, h)) == (w, h) + ImageIO accepts, 60 random dims") {
    (1 to 60).foreach { _ =>
      val w = 1 + rng.nextInt(300)
      val h = 1 + rng.nextInt(300)
      val seed = Array.fill(1 + rng.nextInt(32))(rng.nextInt().toByte)
      val png = Multimodal.encodePng(w, h, seed)
      // size law: 63 + raw + 5*ceil(raw/65535), raw = h*(1+3w) — the
      // closed form the q_multimodal_png oracle replays in SQL
      val raw = h.toLong * (1L + 3L * w)
      assert(png.length == 63 + raw + 5 * ((raw + 65534) / 65535), s"png $w x $h size")
      assert(Multimodal.decodePng(png).contains(("image/png", w, h)), s"png $w x $h")
      assert(Multimodal.decodeAny(png)._1 == "image/png")
      // independent decoder: the JDK's ImageIO reads the same geometry
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == w && img.getHeight == h, s"ImageIO $w x $h")
    }
  }

  test("property: JPEG/WAV/MP4 decode(encode(params)) == params for 100 random cases") {
    (1 to 100).foreach { _ =>
      val seed = Array.fill(1 + rng.nextInt(32))(rng.nextInt().toByte)
      val w = 1 + rng.nextInt(4000)
      val h = 1 + rng.nextInt(40)
      assert(Multimodal.decodeJpeg(Multimodal.encodeJpegHeader(w, h, seed))
        .contains(("image/jpeg", w, h)), s"jpeg $w x $h")
      val ch = 1 + rng.nextInt(8)
      val rate = 1 + rng.nextInt(192000)
      val ns = rng.nextInt(2000)
      assert(Multimodal.decodeWav(Multimodal.encodeWavPcm16(ch, rate, ns, seed))
        .contains((ch, rate, 16, ns.toLong)), s"wav $ch/$rate/$ns")
      val tsc = 1 + rng.nextInt(1000000)
      val dur = math.abs(rng.nextLong()) % 0xffffffffL
      val len = rng.nextInt(500)
      assert(Multimodal.decodeMp4(Multimodal.encodeMp4Header(tsc, dur, len, seed))
        .contains((tsc, dur)), s"mp4 $tsc/$dur")
      assert(Multimodal.encodeMp4Header(tsc, dur, len, seed).length == 144 + len)
    }
  }

  test("property: no decoder ever throws on arbitrary/truncated bytes") {
    // fuzz: random garbage, truncated REAL payloads, and bit-flipped REAL
    // payloads must all return None/stub — never an exception (a decoder
    // that throws inside mapPartitions kills the whole task at scale)
    val real: Seq[Array[Byte]] = Seq(
      Multimodal.encodeBmp24(7, 5, Array[Byte](1)),
      Multimodal.encodePpm6(7, 5, Array[Byte](2)),
      Multimodal.encodePng(7, 5, Array[Byte](3)),
      Multimodal.encodeJpegHeader(7, 5, Array[Byte](4)),
      Multimodal.encodeWavPcm16(2, 8000, 9, Array[Byte](5)),
      Multimodal.encodeMp4Header(600, 1234L, 16, Array[Byte](6)),
      Multimodal.encodeGif(7, 5, Array[Byte](7)))
    def noThrow(b: Array[Byte]): Unit = {
      Multimodal.decodeAny(b)
      Multimodal.decodeWav(b)
      Multimodal.decodeMp4(b)
      // round 7: the pixel-level decoders (PNG inflate+defilter, GIF LZW,
      // BMP/PPM slicing) and the PCM sample reader share the same
      // never-throw contract — they run inside the same mapPartitions
      Multimodal.decodePixelsRgb(b)
      Multimodal.decodeWavSamples(b)
    }
    (1 to 300).foreach { _ =>
      noThrow(Array.fill(rng.nextInt(200))(rng.nextInt().toByte))
      val base = real(rng.nextInt(real.length))
      noThrow(base.take(rng.nextInt(base.length + 1)))
      val flipped = base.clone()
      val at = rng.nextInt(flipped.length)
      flipped(at) = (flipped(at) ^ (1 << rng.nextInt(8))).toByte
      noThrow(flipped)
    }
    // regression pin: a RIFF chunk size near Int.MaxValue overflowed the
    // Int bounds guard and crashed the walk (review finding, round 6) —
    // the Long-arithmetic walk must REJECT it
    val evil = Multimodal.encodeWavPcm16(1, 8000, 4, Array[Byte](1)).clone()
    java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, 0x7FFFFFF8) // fmt chunk length field
    assert(Multimodal.decodeWav(evil).isEmpty)
  }

  test("property: packGreedy never exceeds the budget except oversize singletons") {
    // random corpus, random budget/bucket combinations
    (1 to 5).foreach { _ =>
      val budget = 4 + rng.nextInt(40)
      val buckets = 1 + rng.nextInt(6)
      val docs = (0L until 300L)
        .map(i => (i, Seq.fill(1 + rng.nextInt(25))("t").mkString(" ")))
        .toDF("id", "text")
      val packed = Packing.packGreedy(docs, "id", "text", budget, buckets).toDF()
      val perSeq = rows(packed.groupBy("bucket", "seq")
        .agg(sum("n_tokens").as("s"), count(lit(1)).as("k")))
      assert(perSeq.forall(r =>
        r(2).asInstanceOf[Long] <= budget || r(3) == 1L),
        s"budget $budget buckets $buckets violated")
      // every doc appears exactly once
      assert(packed.count() == 300L && packed.select("id").distinct().count() == 300L)
    }
  }

  test("property: shardManifest is invariant under row permutation and union order") {
    val base = (0L until 300L).map(i => (i, s"v${rng.nextInt(1000)}")).toDF("id", "s")
    val manifest = rows(Shards.shardManifest(base, Seq("id"), Seq("id", "s"), 8)
      .orderBy("shard"))
    // shuffled row order (orderBy a random-ish expression then drop it)
    val shuffled = base.orderBy(md5(concat(col("s"), col("id").cast("string"))))
    assert(rows(Shards.shardManifest(shuffled, Seq("id"), Seq("id", "s"), 8)
      .orderBy("shard")) == manifest)
    // reversed union order
    val reunioned = base.where(col("id") >= 150).unionAll(base.where(col("id") < 150))
    assert(rows(Shards.shardManifest(reunioned, Seq("id"), Seq("id", "s"), 8)
      .orderBy("shard")) == manifest)
    // shards partition the data: counts sum to the corpus
    assert(manifest.map(_(1).asInstanceOf[Long]).sum == 300L)
  }

  test("property: saltedCollectSorted == sorted plain collect on random multisets") {
    val df = (0 until 400)
      .map(_ => (s"k${rng.nextInt(8)}", rng.nextInt(20))).toDF("k", "v")
    val salted = rows(Aggregates.saltedCollectSorted(Seq("k"), "v", "vals",
      saltBuckets = 4)(df).orderBy("k"))
    val plain = rows(df.groupBy("k")
      .agg(sort_array(collect_list(col("v"))).as("vals")).orderBy("k"))
    assert(salted == plain)
  }
}
