package graft.ops

import org.scalacheck.Gen

import graft.SparkSpec
import graft.ops.Multimodal.{Codec, MediaRow}

/** Property tests for the pure-JVM container codec: encode→decode
  * round-trips arbitrary dimensions and payload bytes (not just the
  * synthesized corpus shapes), container sizes are exact, and the sample
  * decoder inverts 16-bit LE encoding for the full signed range. Driver-
  * local (no Spark jobs) — the distributed path is covered by the oracle
  * queries and LlmOpsSpec. */
class CodecPropertySpec extends SparkSpec {

  private val dims: Gen[(Int, Int)] =
    for { w <- Gen.choose(1, 40); h <- Gen.choose(1, 30) } yield (w, h)

  private def bytes(n: Int): Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))

  test("PPM: decode recovers encoded dims and content checksum for random rasters") {
    val cases = Gen.listOfN(30, dims).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (w, h) =>
      val px = bytes(w * h * 3).sample.getOrElse(Array.fill[Byte](w * h * 3)(7))
      val d = Codec.decode(MediaRow(1L, "image", Codec.encodePpm(w, h, px), "t"))
      assert(d.width == w && d.height == h && d.n_frames == 1)
      assert(d.n_bytes == s"P6\n$w $h\n255\n".length + px.length)
      // checksum covers exactly the pixel region
      var acc = 0L
      px.foreach(b => acc = (acc * 31 + (b & 0xff)) % 1000000007L)
      assert(d.checksum == acc)
    }
  }

  test("spectral: a pure fs/4 tone lands all its energy in the fs/4 bin") {
    // x[j] = A·cos(2πj/4) = {A, 0, −A, 0}… over n = 12m samples: whole
    // periods of all three analysis bins, so the fs/6 and fs/3 energies
    // are EXACTLY zero (integer orthogonality) and the fs/4 bin reads the
    // closed form (A·n)² — 4·|n/2 · A|² for a real cosine.
    val amp = 100
    Seq(12, 120, 492).foreach { n =>
      val tone = Array.tabulate(n)(j => Seq(amp, 0, -amp, 0)(j % 4))
      val (e6, e4, e3) = Codec.spectralEnergies4(tone)
      assert(e6 == 0L && e3 == 0L,
        s"n=$n: leakage into orthogonal bins: f6=$e6 f3=$e3")
      assert(e4 == amp.toLong * n * amp * n,
        s"n=$n: fs/4 energy $e4 != closed form ${amp.toLong * n * amp * n}")
    }
    // and through the WAV container: encode the tone, decode, same result
    val n = 120
    val tone = Array.tabulate(n)(j => Seq(amp, 0, -amp, 0)(j % 4))
    val data = new Array[Byte](2 * n)
    tone.zipWithIndex.foreach { case (v, k) =>
      data(2 * k) = (v & 0xff).toByte; data(2 * k + 1) = ((v >> 8) & 0xff).toByte
    }
    val (we6, we4, we3) =
      Codec.spectralEnergies4(Codec.wavSamples(Codec.encodeWav(8000, data)))
    assert(we6 == 0L && we3 == 0L && we4 == amp.toLong * n * amp * n)
  }

  test("Y4M: frame count comes from markers for arbitrary frame counts") {
    val cases = Gen.listOfN(20,
      for { (w, h) <- dims; f <- Gen.choose(1, 12) } yield (w, h, f))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (w, h, f) =>
      val content = bytes(f * w * h * 3).sample
        .getOrElse(Array.fill[Byte](f * w * h * 3)(3))
      val d = Codec.decode(MediaRow(2L, "video", Codec.encodeY4m(w, h, f, content), "t"))
      assert(d.width == w && d.height == h && d.n_frames == f)
    }
  }

  test("Y4M: frame means decode the Y plane exactly (unsigned, plane offsets)") {
    val cases = Gen.listOfN(20,
      for { (w, h) <- dims; f <- Gen.choose(1, 12) } yield (w, h, f))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (w, h, f) =>
      val content = bytes(f * w * h * 3).sample
        .getOrElse(Array.fill[Byte](f * w * h * 3)(3))
      val means = Codec.y4mFrameMeans(Codec.encodeY4m(w, h, f, content))
      assert(means.length == f)
      // reference: mean over the first w*h bytes of each frame's planes,
      // decoded UNSIGNED (a negative random byte must land as 128..255)
      (0 until f).foreach { k =>
        val s = (0 until w * h).map(p => content(k * w * h * 3 + p) & 0xff).map(_.toLong).sum
        assert(means(k) == s.toDouble / (w * h), s"frame $k of ($w,$h,$f)")
      }
    }
  }

  test("WAV: sample decode inverts 16-bit LE for the full signed range") {
    val cases = Gen.listOfN(20,
      Gen.nonEmptyListOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt)))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { vals =>
      val data = vals.flatMap(v =>
        Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
      val wav = Codec.encodeWav(16000, data)
      assert(Codec.wavSamples(wav).toSeq == vals)
      val d = Codec.decode(MediaRow(3L, "audio", wav, "t"))
      assert(d.n_samples == vals.length && d.sample_rate == 16000)
      assert(d.n_bytes == 44 + data.length)
    }
  }

  test("PNG: encode→decode is byte-lossless for arbitrary rasters") {
    val cases = Gen.listOfN(20, dims).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (w, h) =>
      val px = bytes(w * h * 3).sample.getOrElse(Array.fill[Byte](w * h * 3)(7))
      val png = Codec.encodePng(w, h, px)
      // a real PNG container, not a renamed raster
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val (w2, h2, back) = Codec.decodeImage(png)
      assert(w2 == w && h2 == h)
      assert(java.util.Arrays.equals(back, px), s"PNG round-trip lost bytes at ($w,$h)")
    }
  }

  test("JPEG: dims survive; reconstruction error is bounded; quality monotone in size") {
    val cases = Gen.listOfN(10, dims.suchThat { case (w, h) => w >= 8 && h >= 8 })
      .sample.getOrElse(List((16, 12)))
    assert(cases.nonEmpty)
    cases.foreach { case (w, h) =>
      val px = bytes(w * h * 3).sample.getOrElse(Array.fill[Byte](w * h * 3)(7))
      val jpg = Codec.encodeJpeg(w, h, px)
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "JPEG SOI marker")
      val (w2, h2, back) = Codec.decodeImage(jpg)
      assert(w2 == w && h2 == h)
      // random rasters are JPEG's worst case (no spatial coherence to keep
      // after DCT quantization) — the mean abs error bound is accordingly
      // loose; it guards "decoded the right image", not codec quality
      val mae = (0 until w * h * 3)
        .map(i => math.abs((back(i) & 0xff) - (px(i) & 0xff))).sum.toDouble / (w * h * 3)
      assert(mae < 64.0, s"JPEG mean abs error $mae implausibly large at ($w,$h)")
      // higher quality must not produce a smaller file on the same raster
      val lo = Codec.encodeJpeg(w, h, px, 0.3f)
      val hi = Codec.encodeJpeg(w, h, px, 0.95f)
      assert(hi.length >= lo.length, s"quality 0.95 (${hi.length}B) < 0.3 (${lo.length}B)")
    }
  }

  test("FLAC: encode→decode round-trips the full signed 16-bit range, multi-frame") {
    val cases = Gen.listOfN(15,
      Gen.nonEmptyListOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt)))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    // multi-frame case: longer than one 4096-sample FLAC frame
    val long = (0 until 10000).map(i => ((i * 7919) % 65536) - 32768).toList
    (long :: cases).foreach { vals =>
      val flac = Codec.encodeFlac(8000, vals.toArray)
      assert(flac(0) == 'f' && flac(1) == 'L' && flac(2) == 'a' && flac(3) == 'C')
      // the closed-form size the mm_flac oracle depends on
      assert(flac.length.toLong == Codec.verbatimFlacBytes(vals.length),
        s"verbatim size formula diverged at n=${vals.length}")
      val (rate, back) = Codec.decodeFlac(flac)
      assert(rate == 8000)
      assert(back.toSeq == vals, s"FLAC round-trip lost samples (n=${vals.length})")
    }
  }

  test("FLAC compressed: fixed+Rice round-trips exactly and beats verbatim on structure") {
    // smooth signal: a ramp with small wiggle — order-1/2 predictors
    // should code it far below 16 bits/sample
    val smooth = (0 until 5000).map(i => (i / 3) % 20000 - 10000 + (i % 3)).toArray
    val comp = Codec.encodeFlacCompressed(8000, smooth)
    val verb = Codec.encodeFlac(8000, smooth)
    val (_, back) = Codec.decodeFlac(comp)
    assert(back.toSeq == smooth.toSeq, "compressed FLAC round-trip lost samples")
    assert(comp.length * 2 < verb.length,
      s"fixed+Rice should beat verbatim >2x on a ramp: ${comp.length} vs ${verb.length}")
    // uncorrelated noise: fixed predictors cannot win; fallback to verbatim
    // keeps the stream no larger than the verbatim form (equal layout)
    val noise = (0 until 3000).map(i => ((i * 2654435761L) % 65536).toInt - 32768).toArray
    val compN = Codec.encodeFlacCompressed(8000, noise)
    val (_, backN) = Codec.decodeFlac(compN)
    assert(backN.toSeq == noise.toSeq)
    assert(compN.length <= Codec.encodeFlac(8000, noise).length)
    // randomized round-trips through the compressed path
    val cases = Gen.listOfN(10,
      Gen.nonEmptyListOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt)))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { vals =>
      val (_, b2) = Codec.decodeFlac(Codec.encodeFlacCompressed(8000, vals.toArray))
      assert(b2.toSeq == vals, s"compressed round-trip lost samples (n=${vals.length})")
    }
  }

  test("FLAC LPC: order-1..8 subframes round-trip exactly and appear in the stream") {
    // a HIGH-FREQUENCY resonance: the k-th difference operator amplifies
    // it by (2·sin(ω/2))^k ≈ 1.78^k, so every FIXED predictor is WORSE
    // than coding raw samples — while the two-pole LPC model
    // s[i] ≈ 2cos(ω)·s[i-1] − s[i-2] predicts it to rounding noise
    val osc = Array.tabulate(6000)(i =>
      math.round(10000.0 * math.sin(2.2 * i) + (i % 3)).toInt)
    val lpc = Codec.encodeFlacLpc(8000, osc)
    val (rate, back) = Codec.decodeFlac(lpc)
    assert(rate == 8000 && back.toSeq == osc.toSeq,
      "LPC round-trip lost samples")
    // the first frame's subframe header sits right after the fixed frame
    // header (42 container bytes + 4 sync/cfg + 1 UTF-8 frame number +
    // 2 blocksize + 1 CRC-8): type bits 1xxxxx = LPC, order = xxxxx + 1
    val typ6 = (lpc(50) >> 1) & 0x3f
    assert(typ6 >= 0x20 && typ6 <= 0x27,
      s"first subframe should be LPC(1-8), got type ${typ6.toHexString}")
    // never larger than the FIXED/VERBATIM chooser (the fallback rule)
    assert(lpc.length <= Codec.encodeFlacCompressed(8000, osc).length)
    // degenerate inputs fall back and still round-trip: silence, constants,
    // tiny blocks, plus randomized full-range signals
    val cases = Gen.listOfN(10,
      Gen.nonEmptyListOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt)))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    (List(0, 0, 0) :: List(7) :: List.fill(300)(-123) :: cases).foreach { vals =>
      val (_, b2) = Codec.decodeFlac(Codec.encodeFlacLpc(8000, vals.toArray))
      assert(b2.toSeq == vals, s"LPC-path round-trip lost samples (n=${vals.length})")
    }
  }

  test("FLAC: Rice escape partitions (k=15, verbatim residuals) decode exactly") {
    // the size-optimal encoder never emits the escape (search stops at 14);
    // a conforming external stream may — decode it, full signed range
    val cases = Gen.listOfN(10,
      Gen.nonEmptyListOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt)))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    (List(0, 0, 0) :: List(Short.MinValue.toInt, Short.MaxValue.toInt) :: cases)
      .foreach { vals =>
        val flac = Codec.encodeFlacEscape(8000, vals.toArray)
        val (rate, back) = Codec.decodeFlac(flac)
        assert(rate == 8000)
        assert(back.toSeq == vals, s"escape round-trip lost samples (n=${vals.length})")
      }
  }

  test("FLAC: streams past 128 frames carry multi-byte UTF-8 frame numbers") {
    // 130 frames: frame numbers 128+ take the 2-byte UTF-8 form on both
    // the encode and size-formula paths
    val n = 130 * 4096 + 7
    val vals = Array.tabulate(n)(i => ((i.toLong * 7919) % 65536).toInt - 32768)
    val flac = Codec.encodeFlac(8000, vals)
    assert(flac.length.toLong == Codec.verbatimFlacBytes(n),
      "size formula diverged on the multi-byte frame-number band")
    val (_, back) = Codec.decodeFlac(flac)
    assert(back.length == n && back.toSeq == vals.toSeq,
      "multi-byte frame numbers broke the round-trip")
  }

  test("FLAC stereo: decorrelation round-trips exactly and engages on correlated input") {
    val n = 6000 // > one 4096-sample frame, so multi-frame stereo is covered
    val left = Array.tabulate(n)(i =>
      math.round(8000.0 * math.sin(0.01 * i)).toInt + (i % 5))
    val right = Array.tabulate(n)(i => left(i) - 3 + (i % 2)) // R ≈ L: tiny side
    val dec = Codec.encodeFlacStereo(8000, left, right)
    val ind = Codec.encodeFlacStereo(8000, left, right, allowDecorrelation = false)
    val inter = Array.tabulate(2 * n)(k => if (k % 2 == 0) left(k / 2) else right(k / 2))
    val (r1, ch1, s1) = Codec.decodeFlacAll(dec)
    val (r2, ch2, s2) = Codec.decodeFlacAll(ind)
    assert(r1 == 8000 && ch1 == 2 && s1.toSeq == inter.toSeq,
      "decorrelated stereo round-trip lost samples")
    assert(r2 == 8000 && ch2 == 2 && s2.toSeq == inter.toSeq,
      "independent stereo round-trip lost samples")
    // a correlated pair's side channel is nearly silent: a side-coded mode
    // must be chosen and must code strictly smaller than independent L/R
    assert(dec.length < ind.length,
      s"decorrelation never engaged: ${dec.length}B vs independent ${ind.length}B")
    // the mono decode API refuses multichannel input loudly
    val e = intercept[IllegalArgumentException](Codec.decodeFlac(dec))
    assert(e.getMessage.contains("decodeFlacAll"))
  }

  test("FLAC stereo: all four channel assignments round-trip, incl. the 17-bit side") {
    // full-range L/R: the side channel L−R spans ±65535 — every mode's
    // reconstruction (left/side, right/side, mid/side LSB recovery) must
    // be bit-exact at the 17-bit extremes
    val cases = Seq(
      (Array(Short.MaxValue.toInt, Short.MinValue.toInt, 0, 123),
        Array(Short.MinValue.toInt, Short.MaxValue.toInt, -1, -123)),
      (Array.tabulate(5000)(i => ((i * 7919) % 65536) - 32768),
        Array.tabulate(5000)(i => ((i * 104729) % 65536) - 32768)))
    for ((l, r) <- cases; mode <- Seq(0x1, 0x8, 0x9, 0xA)) {
      val b = Codec.encodeFlacStereoMode(8000, l, r, mode)
      val (rate, ch, s) = Codec.decodeFlacAll(b)
      val inter = Array.tabulate(2 * l.length)(k =>
        if (k % 2 == 0) l(k / 2) else r(k / 2))
      assert(rate == 8000 && ch == 2 && s.toSeq == inter.toSeq,
        s"stereo mode 0x${mode.toHexString} lost samples (n=${l.length})")
    }
  }

  test("FLAC: corrupt STREAMINFO total-samples fails loudly, not as a JVM error") {
    val flac = Codec.encodeFlac(8000, Array(1, 2, 3))
    // STREAMINFO total is bytes 13(low nibble)..17 of the block at offset 8
    val c = flac.clone()
    c(8 + 13) = ((c(8 + 13) & 0xf0) | 0x0f).toByte // total >= 2^32 > Int.MaxValue
    val e = intercept[IllegalArgumentException](Codec.decodeFlac(c))
    assert(e.getMessage.contains("stream too long"))
  }

  test("FLAC: corrupted frames and checksums fail loudly") {
    val vals = (0 until 600).map(i => (i * 31) % 1000 - 500).toArray
    val flac = Codec.encodeFlac(8000, vals)
    // flip a sample byte: frame CRC-16 must catch it
    val c1 = flac.clone(); c1(60) = (c1(60) ^ 0x40).toByte
    intercept[IllegalArgumentException](Codec.decodeFlac(c1))
    // corrupt the frame header: CRC-8 (or the sync check) must catch it
    val c2 = flac.clone(); c2(46) = (c2(46) ^ 0x01).toByte
    intercept[IllegalArgumentException](Codec.decodeFlac(c2))
    // truncate the magic
    intercept[IllegalArgumentException](Codec.decodeFlac(flac.drop(1)))
    // truncate mid-frame and mid-metadata: loud failure, not a raw AIOOBE
    intercept[IllegalArgumentException](Codec.decodeFlac(flac.dropRight(3)))
    intercept[IllegalArgumentException](
      Codec.decodeFlac(java.util.Arrays.copyOfRange(flac, 0, 20)))
    // compressed path truncation too (bit-level reads)
    val comp = Codec.encodeFlacCompressed(8000,
      (0 until 600).map(i => i % 100).toArray)
    intercept[IllegalArgumentException](Codec.decodeFlac(comp.dropRight(2)))
    // out-of-16-bit-range samples are refused at encode time: they would
    // alias mod 2^16 into a stream every checksum accepts
    intercept[IllegalArgumentException](Codec.encodeFlac(8000, Array(40000)))
    intercept[IllegalArgumentException](Codec.encodeFlacCompressed(8000, Array(-40000)))
  }

  test("AVI/MJPEG: mux→demux round-trips frames, index, and dims") {
    val cases = Gen.listOfN(8,
      for { (w, h) <- dims.suchThat { case (w, h) => w >= 8 && h >= 8 }
            f <- Gen.choose(1, 6) } yield (w, h, f))
      .sample.getOrElse(List((16, 12, 3)))
    assert(cases.nonEmpty)
    cases.foreach { case (w, h, f) =>
      val frames = (0 until f).map { k =>
        val y = Array.tabulate[Byte](w * h)(i => ((i * 7 + k * 31) % 256).toByte)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          rgb(3 * i) = y(i); rgb(3 * i + 1) = y(i); rgb(3 * i + 2) = y(i); i += 1
        }
        Codec.encodeJpeg(w, h, rgb)
      }
      val avi = Codec.encodeAvi(w, h, 25, frames)
      assert(avi(0) == 'R' && avi(1) == 'I' && avi(2) == 'F' && avi(3) == 'F')
      val (w2, h2, declared, back, idxOk) = Codec.decodeAvi(avi)
      assert(w2 == w && h2 == h && declared == f && back.length == f)
      assert(idxOk, s"idx1 inconsistent at ($w,$h,$f)")
      // the demuxed payloads are the EXACT jpeg bytes that went in
      back.zip(frames).zipWithIndex.foreach { case ((b, orig), k) =>
        assert(java.util.Arrays.equals(b, orig), s"frame $k bytes differ")
      }
      // grayscale smooth ramps survive the lossy hop within tolerance
      back.zipWithIndex.foreach { case (jb, k) =>
        val (jw, jh, rgb) = Codec.decodeImage(jb)
        assert(jw == w && jh == h)
        val mae = (0 until w * h).map { i =>
          val want = (i * 7 + k * 31) % 256
          math.abs((rgb(3 * i) & 0xff) - want)
        }.sum.toDouble / (w * h)
        assert(mae < 16.0, s"frame $k reconstruction error $mae too large")
      }
    }
  }

  test("AVI: corrupt containers fail loudly") {
    val rgb = Array.fill[Byte](16 * 12 * 3)(42)
    val avi = Codec.encodeAvi(16, 12, 25, Seq(Codec.encodeJpeg(16, 12, rgb)))
    // wrong magic
    val c1 = avi.clone(); c1(9) = 'X'
    intercept[IllegalArgumentException](Codec.decodeAvi(c1))
    // truncated movi chunk
    intercept[IllegalArgumentException](Codec.decodeAvi(avi.dropRight(40)))
    // a lying idx1 offset is REPORTED (idxOk=false), not trusted
    val idxPos = avi.length - 16 * 1 // single idx entry at the tail
    val c2 = avi.clone()
    c2(idxPos + 8) = (c2(idxPos + 8) + 4).toByte
    val (_, _, _, _, ok) = Codec.decodeAvi(c2)
    assert(!ok, "corrupted idx1 offset must flag idxOk=false")
    // a NEGATIVE chunk size (high bit set) must raise, not loop forever
    // on a zero-advance walk or alias past the bounds check
    val c3 = avi.clone()
    // first chunk after the RIFF header starts at offset 12; its size
    // field is at 16..19 — patch to 0xFFFFFFF8 (-8)
    c3(16) = 0xF8.toByte; c3(17) = 0xFF.toByte
    c3(18) = 0xFF.toByte; c3(19) = 0xFF.toByte
    intercept[IllegalArgumentException](Codec.decodeAvi(c3))
    // a near-Int.MaxValue size must hit the 64-bit bounds check, not
    // overflow o + 8 + sz to negative and "pass"
    val c4 = avi.clone()
    c4(16) = 0xFF.toByte; c4(17) = 0xFF.toByte
    c4(18) = 0xFF.toByte; c4(19) = 0x7F.toByte
    intercept[IllegalArgumentException](Codec.decodeAvi(c4))
  }

  test("corrupt containers fail loudly, never decode to plausible garbage") {
    // truncated PPM raster
    val ppm = Codec.encodePpm(4, 3, Array.fill[Byte](36)(1))
    intercept[IllegalArgumentException](
      Codec.decode(MediaRow(4L, "image", ppm.dropRight(1), "t")))
    // Y4M with a corrupted FRAME marker
    val y4m = Codec.encodeY4m(2, 2, 2, Array.fill[Byte](24)(1))
    val hdr = "YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C444\n".length
    y4m(hdr) = 'G'
    intercept[IllegalArgumentException](
      Codec.decode(MediaRow(5L, "video", y4m, "t")))
    // WAV with no data chunk
    val wav = Codec.encodeWav(8000, Array.fill[Byte](10)(1))
    val tagPos = 36 // "data"
    wav(tagPos) = 'x'
    intercept[IllegalArgumentException](
      Codec.decode(MediaRow(6L, "audio", wav, "t")))
  }

  test("gif: LZW round-trips arbitrary index streams") {
    import org.scalacheck.Prop.forAll
    val gen = for {
      (w, h) <- dims
      px <- bytes(w * h)
    } yield (w, h, px)
    forAll(gen) { case (w, h, px) =>
      val (w2, h2, back) = Codec.decodeGif(Codec.encodeGif(w, h, px))
      w2 == w && h2 == h && java.util.Arrays.equals(back, px)
    }.check(org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(60))
  }

  test("gif: KwKwK and dictionary-reset edge cases decode exactly") {
    // KwKwK: aaa bbb abab... patterns force code==next immediately
    val kwkwk = "aabbaabbaabbaaab".getBytes("US-ASCII")
    val (_, _, r1) = Codec.decodeGif(Codec.encodeGif(16, 1, kwkwk))
    assert(java.util.Arrays.equals(r1, kwkwk), "KwKwK stream corrupted")
    // single repeated byte: the degenerate KwKwK chain
    val runs = Array.fill[Byte](500)(7)
    val (_, _, r2) = Codec.decodeGif(Codec.encodeGif(100, 5, runs))
    assert(java.util.Arrays.equals(r2, runs), "run stream corrupted")
    // >4096 distinct phrases: force the clear-code dictionary reset.
    // A de Bruijn-ish pseudo-random stream of 60k bytes grows the
    // dictionary past 12-bit capacity several times over.
    val big = Array.tabulate[Byte](60000)(i =>
      (((i * 2654435761L) >>> 13) & 0xff).toByte)
    val (_, _, r3) = Codec.decodeGif(Codec.encodeGif(300, 200, big))
    assert(java.util.Arrays.equals(r3, big), "post-reset stream corrupted")
  }

  test("gif: the JDK's independent ImageIO reader agrees with our encoder") {
    val px = Array.tabulate[Byte](40 * 25)(i => ((i * 37 + 11) & 0xff).toByte)
    val gif = Codec.encodeGif(40, 25, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(img != null, "ImageIO rejected our GIF")
    assert(img.getWidth == 40 && img.getHeight == 25)
    var i = 0
    while (i < px.length) {
      val rgb = img.getRGB(i % 40, i / 40)
      val want = px(i) & 0xff
      assert((rgb & 0xff) == want && ((rgb >> 8) & 0xff) == want &&
        ((rgb >> 16) & 0xff) == want,
        s"pixel $i: ImageIO ${rgb.toHexString} != gray $want")
      i += 1
    }
    // and our decoder reads what the JDK writer produces (palette GIF)
    val bi = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 9).foreach(y => (0 until 17).foreach { x =>
      val g = (x * 13 + y * 31) & 0xff
      bi.setRGB(x, y, (g << 16) | (g << 8) | g)
    })
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "gif", bos)
    val (w2, h2, back) = Codec.decodeGif(bos.toByteArray)
    assert(w2 == 17 && h2 == 9)
    // ImageIO's palette may permute indices: compare through its table
    val img2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    (0 until 9).foreach(y => (0 until 17).foreach { x =>
      val viaUs = back(y * 17 + x) & 0xff
      val viaImageIO = img2.getRaster.getSample(x, y, 0)
      assert(viaUs == viaImageIO,
        s"($x,$y): our index $viaUs != ImageIO raster $viaImageIO")
    })
  }

  test("mulaw: G.711 anchors, bounded segment error, monotone decode") {
    // standard anchor codes: silence is all-ones; the top magnitude
    // decodes to 32124 (the G.711 table's extreme)
    assert(Codec.muLawEncode(0) == 0xFF)
    assert(Codec.muLawDecode(0xFF) == 0)
    assert(Codec.muLawEncode(32635) == 0x80)
    assert(Codec.muLawDecode(0x80) == 32124)
    // round-trip error bounded by half the segment step (2^(exp+2)) for
    // every representable magnitude; sign is preserved
    (-32635 to 32635 by 7).foreach { x =>
      val c = Codec.muLawEncode(x)
      val d = Codec.muLawDecode(c)
      val b = math.abs(x) + 132
      val exp = (31 - Integer.numberOfLeadingZeros(b)) - 7
      assert(math.abs(d - x) <= (1 << (exp + 2)),
        s"x=$x code=$c decode=$d exceeds segment bound")
      assert(x == 0 || d == 0 || (x > 0) == (d > 0), s"sign flipped at $x")
    }
    // decode is strictly monotone over positive codes (complemented wire
    // order: lower code = larger magnitude)
    val decodes = (0x80 to 0xFF).map(Codec.muLawDecode)
    assert(decodes.zip(decodes.tail).forall { case (a, b) => a > b },
      "positive-side decode must strictly decrease as the code increases")
  }
}
