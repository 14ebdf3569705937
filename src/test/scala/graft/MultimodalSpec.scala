package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{AviCodec, BmpCodec, SynthMedia, WavCodec}

class MultimodalSpec extends SparkSpec {

  test("BMP encode → javax.imageio decode round-trips dims, channels, " +
      "and every pixel value") {
    val (w, h) = (37, 23) // non-multiple-of-4 row → padding exercised
    def pix(x: Int, y: Int) = (11 + 7 * x + 13 * y) % 256
    val bytes = BmpCodec.encode(w, h, pix)
    assert(bytes.length == BmpCodec.fileSize(w, h))
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    val (dw, dh, ch, px) = BmpCodec.decode(bytes)
    assert((dw, dh, ch) == ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) == pix(x, y), s"pixel ($x,$y)")
  }

  test("1×1 and max-size images decode exactly (degenerate dims)") {
    for ((w, h) <- Seq((1, 1), (64, 48), (1, 48), (64, 1))) {
      val (dw, dh, _, px) = BmpCodec.decode(
        BmpCodec.encode(w, h, (x, y) => (x * 3 + y * 5) % 256))
      assert((dw, dh) == ((w, h)))
      assert(px.length == w * h)
    }
  }

  test("WAV encode → javax.sound.sampled decode round-trips rate and " +
      "every PCM sample") {
    val samples = Array.tabulate(331)(i => (7 * 42 + 31 * i) % 256)
    val bytes = WavCodec.encode(samples, 8000)
    assert(bytes.length == WavCodec.fileSize(samples.length))
    val (rate, ch, got) = WavCodec.decode(bytes)
    assert(rate == 8000 && ch == 1)
    assert(got.toSeq == samples.toSeq)
  }

  test("header-only metadata parse agrees with the full decode and " +
      "never touches pixel/PCM data") {
    val bytes = BmpCodec.encode(37, 23, (x, y) => (x + y) % 256)
    assert(BmpCodec.decodeMeta(bytes) == ((37, 23, 3)))
    // the parse is real: truncating AFTER the header keeps metadata
    // readable (pixel rows were never needed)...
    assert(BmpCodec.decodeMeta(bytes.take(60)) == ((37, 23, 3)))
    // ...while a full decode of the same truncated payload fails
    intercept[Exception] { BmpCodec.decode(bytes.take(60)) }
    val wav = WavCodec.encode(Array.tabulate(123)(_ % 256), 8000)
    assert(WavCodec.decodeMeta(wav) == ((8000, 1, 123L)))
  }

  test("decode queries read ONLY the staged binary media column — " +
      "document text never enters the decode plan") {
    val s = spark
    val m = s.read.parquet(
      graft.multimodal.MultimodalQueries.stagedMediaPath(s, sf0001) + "/media")
    assert(m.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val probe = graft.multimodal.Multimodal.extractFeatures(s, m)
    val rels = probe.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(rels.nonEmpty)
    assert(rels.forall(_.relation.asInstanceOf[
      org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.forall(_.toString.contains("graft_media_"))))
  }

  test("aHash: constant images hash to zero (strict threshold), a " +
      "gradient splits high/low halves, and the hash is resize-stable") {
    import spark.implicits._
    def mediaOf(rows: Seq[(Long, Array[Byte])]) =
      rows.map { case (id, b) => (id, "image", b) }
        .toDF("doc_id", "media_type", "payload")
    // constant image: every cell == mean, strict > never fires
    val const = BmpCodec.encode(16, 16, (_, _) => 77)
    val h0 = graft.multimodal.Multimodal
      .perceptualHashes(spark, mediaOf(Seq((1L, const)))).collect().head
    assert(h0.phash_hi == 0L && h0.phash_lo == 0L)
    // vertical gradient: bottom rows above mean → hi half set, lo clear
    val grad = BmpCodec.encode(16, 16, (_, y) => y * 15)
    val h1 = graft.multimodal.Multimodal
      .perceptualHashes(spark, mediaOf(Seq((2L, grad)))).collect().head
    assert(h1.phash_lo == 0L && h1.phash_hi == 0xFFFFFFFFL)
    // the PERCEPTUAL property: the same picture at 2× resolution
    // (pixel-doubled) hashes identically — what byte-level mm_dedup
    // can never see
    val big = BmpCodec.encode(32, 32, (x, y) => (y / 2) * 15)
    val h2 = graft.multimodal.Multimodal
      .perceptualHashes(spark, mediaOf(Seq((3L, big)))).collect().head
    assert((h2.phash_hi, h2.phash_lo) == ((h1.phash_hi, h1.phash_lo)))
  }

  test("corrupt payloads fail loudly, not silently") {
    intercept[Exception] {
      BmpCodec.decode("definitely not a bitmap".getBytes)
    }
    intercept[Exception] {
      WavCodec.decode("definitely not a riff chunk".getBytes)
    }
  }

  test("property: BMP encode → ImageIO decode round-trips every pixel " +
      "for arbitrary dims and pixel functions (seeded fuzz)") {
    import org.scalacheck.{Gen, Prop, Test => PTest}
    val gen = for {
      w <- Gen.choose(1, 70)
      h <- Gen.choose(1, 50)
      a <- Gen.choose(0, 255)
      b <- Gen.choose(0, 255)
      c <- Gen.choose(0, 255)
    } yield (w, h, a, b, c)
    val prop = Prop.forAll(gen) { case (w, h, a, b, c) =>
      def pix(x: Int, y: Int) = (a + b * x + c * y) % 256
      val (dw, dh, ch, px) = BmpCodec.decode(BmpCodec.encode(w, h, pix))
      dw == w && dh == h && ch == 3 &&
        (0 until h).forall(y => (0 until w).forall(x =>
          px(y * w + x) == pix(x, y)))
    }
    assert(PTest.check(
      PTest.Parameters.default.withMinSuccessfulTests(100), prop).passed)
  }

  test("property: WAV encode → AudioSystem decode round-trips every " +
      "sample for arbitrary lengths (seeded fuzz)") {
    import org.scalacheck.{Gen, Prop, Test => PTest}
    val gen = for {
      n <- Gen.choose(1, 900)
      seed <- Gen.choose(0, 255)
    } yield (n, seed)
    val prop = Prop.forAll(gen) { case (n, seed) =>
      val samples = Array.tabulate(n)(i => (seed + 31 * i) % 256)
      val (rate, ch, got) = WavCodec.decode(WavCodec.encode(samples, 8000))
      rate == 8000 && ch == 1 && got.toSeq == samples.toSeq
    }
    assert(PTest.check(
      PTest.Parameters.default.withMinSuccessfulTests(100), prop).passed)
  }

  test("property: resolveWidth is monotone in corpus size, bounded by " +
      "minDim/2 and the 8..24 auto band, and clamps exactly when the " +
      "dimensionality cap binds (seeded fuzz)") {
    import org.scalacheck.{Gen, Prop, Test => PTest}
    val gen = for {
      n <- Gen.choose(1L, 1L << 40)
      m <- Gen.choose(1L, 1L << 40)
      d <- Gen.choose(1, 256)
      g <- Gen.choose(1, 1000)
    } yield (n, m, d, g)
    val prop = Prop.forAll(gen) { case (n, m, d, g) =>
      val (bits, clamped) = graft.sim.Similarity.resolveWidth(n, d, g)
      val (bits2, _) = graft.sim.Similarity.resolveWidth(math.max(n, m), d, g)
      val cap = math.max(1, d / 2)
      bits >= 1 && bits <= math.min(24, cap) &&
        bits2 >= bits && // more vectors never narrows the bands
        (clamped == (graft.sim.Similarity.autoBandBits(n,
          math.max(1, g / 4)) > cap))
    }
    assert(PTest.check(
      PTest.Parameters.default.withMinSuccessfulTests(300), prop).passed)
  }

  test("synthetic payload dispatch matches media type and the decoded " +
      "values match the generative formulas") {
    // image doc: doc_id % 3 = 0
    val (w, h) = SynthMedia.imageDims(9L, 100L)
    assert((w, h) == ((100 % 64 + 1, 9 % 48 + 1)))
    val (dw, dh, _, px) = BmpCodec.decode(SynthMedia.payload(9L, "x", 100L))
    assert((dw, dh) == ((w, h)))
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) == SynthMedia.pixel(9L, x, y))
    // audio doc: doc_id % 3 = 1
    val (_, _, got) = WavCodec.decode(SynthMedia.payload(10L, "x", 100L))
    assert(got.toSeq == SynthMedia.audioSamples(10L, 100L).toSeq)
    // video doc: doc_id % 3 = 2 — a real AVI container
    val (vw, vh, nf, fps, frames) =
      AviCodec.decode(SynthMedia.payload(11L, "abc", 3L))
    assert((vw, vh, nf, fps) ==
      ((3 % 24 + 1, 11 % 16 + 1, 11 % 12 + 2, SynthMedia.VideoFps)))
    for (f <- 0 until nf; y <- 0 until vh; x <- 0 until vw)
      assert(frames(f)(y * vw + x) == SynthMedia.videoPixel(11L, f, x, y))
  }

  test("AVI encode → chunk-walk decode round-trips dims, fps, frame " +
      "count and every pixel; frameAt seeks the same planes via idx1") {
    val (w, h, nf, fps) = (5, 3, 4, 10)
    def pix(f: Int, x: Int, y: Int) = (11 * f + 3 * x + 7 * y) % 256
    val bytes = AviCodec.encode(w, h, nf, fps, pix)
    assert(bytes.length == AviCodec.fileSize(w, h, nf))
    val (dw, dh, dnf, dfps, frames) = AviCodec.decode(bytes)
    assert((dw, dh, dnf, dfps) == ((w, h, nf, fps)))
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
      assert(frames(f)(y * w + x) == pix(f, x, y))
    // idx1-seeked single-frame extraction agrees with the full walk
    for (f <- 0 until nf)
      assert(AviCodec.frameAt(bytes, f).toSeq == frames(f).toSeq)
  }

  test("AVI header-only meta parses a container truncated inside movi " +
      "(the hdrl walk never touches frame data); full decode throws") {
    val bytes = AviCodec.encode(9, 4, 6, 10, (f, x, y) => f + x + y)
    val truncated = bytes.take(1300) // hdrl (1224) intact, movi cut
    assert(AviCodec.readMeta(truncated) == ((9, 4, 6, 10)))
    intercept[Exception](AviCodec.decode(truncated))
    intercept[Exception](AviCodec.frameAt(truncated, 5))
    // corrupt fourcc fails loudly at every tier
    val corrupt = bytes.clone(); corrupt(12) = 'X'.toByte // LIST fourcc
    intercept[Exception](AviCodec.readMeta(corrupt))
    intercept[Exception](AviCodec.decode(corrupt))
  }

  test("video keyframe aHash: re-muxed copies of the same footage " +
      "(different fps / trailing frames) share a fingerprint that " +
      "byte-level dedup cannot see") {
    import spark.implicits._
    def pix(f: Int, x: Int, y: Int) = (y * 15) % 256 // gradient keyframe
    val a = AviCodec.encode(16, 16, 4, 10, pix)
    val b = AviCodec.encode(16, 16, 9, 25, pix) // same frame 0, re-muxed
    assert(!java.util.Arrays.equals(a, b)) // byte dedup sees two blobs
    def mediaOf(rows: Seq[(Long, Array[Byte])]) =
      rows.map { case (id, bytes) => (id, "video", bytes) }
        .toDF("doc_id", "media_type", "payload")
    val hs = Multimodal.videoKeyframeHashes(spark,
        mediaOf(Seq((1L, a), (2L, b)))).collect()
      .map(h => h.doc_id -> ((h.phash_hi, h.phash_lo))).toMap
    assert(hs(1L) == hs(2L))
    // and the kernel is the image one: the same gradient as a BMP
    // hashes identically (one aHash spelling across modalities)
    val img = Multimodal.perceptualHashes(spark,
      Seq((3L, "image", BmpCodec.encode(16, 16, (x, y) => pix(0, x, y))))
        .toDF("doc_id", "media_type", "payload")).collect().head
    assert((img.phash_hi, img.phash_lo) == hs(1L))
  }

  test("audio envelope aHash: an exactly sample-doubled re-encode at " +
      "double the rate shares the fingerprint (⌊⌊2a⌋/2⌋ = ⌊a⌋ on the " +
      "64 picks) while byte-level dedup sees two blobs") {
    import spark.implicits._
    val s0 = Array.tabulate(300)(i => (37 * i + 11) % 256)
    val a = WavCodec.encode(s0, 8000)
    // the re-encode: every sample doubled, double the rate — the same
    // waveform as a function of time, a different container+PCM byte-wise
    val b = WavCodec.encode(Array.tabulate(600)(i => s0(i / 2)), 16000)
    assert(!java.util.Arrays.equals(a, b))
    val hs = Multimodal.audioEnvelopeHashes(spark,
        Seq((1L, "audio", a), (2L, "audio", b))
          .toDF("doc_id", "media_type", "payload")).collect()
      .map(h => h.doc_id -> ((h.phash_hi, h.phash_lo))).toMap
    assert(hs(1L) == hs(2L))
    // and the seeked 64-pick envelope agrees with the full-decode
    // spelling of the same kernel: pick j = sample j·n div 64
    val picks = Array.tabulate(64)(j => s0(j * 300 / 64).toLong)
    assert(hs(1L) == Multimodal.cellsToHash(picks))
    // a genuinely different waveform separates
    val c = WavCodec.encode(Array.tabulate(300)(i => (91 * i + 3) % 256), 8000)
    val hc = Multimodal.audioEnvelopeHashes(spark,
        Seq((3L, "audio", c)).toDF("doc_id", "media_type", "payload"))
      .collect().head
    assert((hc.phash_hi, hc.phash_lo) != hs(1L))
  }

  test("MJPG tier: encode → parse/decode round-trips container fields, " +
      "idx1 seek ≡ full decode, decode error bounded, corrupt throws") {
    import graft.multimodal.Multimodal.{AviCodec, SynthMedia}
    val (w, h, nf, fps) = (24, 16, 5, 10)
    def pix(f: Int, x: Int, y: Int): Int = SynthMedia.videoPixel(77L, f, x, y)
    val b = AviCodec.encodeMjpg(w, h, nf, fps, pix)
    assert(AviCodec.isMjpg(b))
    assert(!AviCodec.isMjpg(AviCodec.encode(w, h, nf, fps, pix)))
    // container fields are lossless
    assert(AviCodec.readMeta(b) == ((w, h, nf, fps)))
    val (dw, dh, dnf, dfps, frames) = AviCodec.decode(b)
    assert((dw, dh, dnf, dfps) == ((w, h, nf, fps)))
    assert(frames.length == nf)
    // idx1-seeked frames are bit-identical to the full movi walk
    val seeked = AviCodec.framesAt(b, Seq(0, 2, nf - 1))
    assert(seeked(0).sameElements(frames(0)))
    assert(seeked(1).sameElements(frames(2)))
    assert(seeked(2).sameElements(frames(nf - 1)))
    // JPEG decode error vs the generator formula is bounded — the
    // fidelity contract mm_video_mjpg's decode_ok gates (mean abs
    // error per frame; print-style diagnostic kept in the assert)
    frames.zipWithIndex.foreach { case (px, f) =>
      val errs = for (y <- 0 until h; x <- 0 until w)
        yield math.abs(px(y * w + x) - pix(f, x, y))
      assert(errs.sum <= 32L * w * h,
        s"frame $f mean abs err ${errs.sum.toDouble / (w * h)}")
    }
    // a flipped-raster decode would blow the bound (guards the gate's
    // sensitivity): compare against the vertically flipped formula
    val flippedErr = (for (y <- 0 until h; x <- 0 until w)
      yield math.abs(frames(0)(y * w + x) - pix(0, x, h - 1 - y))).sum
    assert(flippedErr > 32L * w * h)
    // truncation throws (never zero-fills)
    intercept[IllegalArgumentException] {
      AviCodec.decode(b.take(b.length - 40))
    }
    // degenerate 1×1 single-frame container round-trips
    val tiny = AviCodec.encodeMjpg(1, 1, 1, 10, (_, _, _) => 128)
    val (_, _, _, _, tf) = AviCodec.decode(tiny)
    assert(tf.length == 1 && math.abs(tf(0)(0) - 128) <= 8)
  }

  test("MJPG decode-error HEADROOM: this JDK's JPEG quantization stays " +
      "at ≤ half the decode_ok threshold, so an encoder drift surfaces " +
      "here, not as a corpus-wide mm_video_mjpg mismatch") {
    import graft.multimodal.Multimodal.{AviCodec, SynthMedia}
    // the fidelity gate's threshold (Multimodal.mjpgRoundTrip) and the
    // sizes the staged lake actually uses (videoDims ranges)
    val threshold = 32L
    val worst = (for (id <- Seq(2L, 5L, 8L, 77L, 1001L); nc <- Seq(7L, 23L)) yield {
      val (w, h) = SynthMedia.videoDims(id, nc)
      val nf = SynthMedia.videoFrames(id)
      def pix(f: Int, x: Int, y: Int) = SynthMedia.videoPixel(id, f, x, y)
      val b = AviCodec.encodeMjpg(w, h, nf, SynthMedia.VideoFps, pix)
      val (_, _, _, _, frames) = AviCodec.decode(b)
      frames.zipWithIndex.map { case (px, f) =>
        val errSum = (for (y <- 0 until h; x <- 0 until w)
          yield math.abs(px(y * w + x) - pix(f, x, y)).toLong).sum
        errSum.toDouble / (w * h)
      }.max
    }).max
    assert(worst <= threshold / 2.0,
      f"JPEG mean abs error headroom eroded: worst=$worst%.1f vs " +
        s"threshold $threshold — the host JDK's JPEG quantization " +
        "changed; re-measure and re-set the mjpgRoundTrip bound")
  }

  test("non-ASCII ingest payload: mm_dedup's byte length is UTF-8 " +
      "OCTETS, not chars (the latent the old length(text) oracle had)") {
    import spark.implicits._
    val docs = Seq((1L, "héllo wörld")) // 11 chars, 13 UTF-8 bytes
      .toDF("doc_id", "text")
    val row = Multimodal.withMediaColumns(docs)
      .select("n_bytes", "media_type").head()
    assert(row.getLong(0) == 13L) // octet_length, not length(text) = 11
    assert("héllo wörld".length == 11)
  }
}
