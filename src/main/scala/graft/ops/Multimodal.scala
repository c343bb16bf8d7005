package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: media payloads ride as opaque `binary` columns
  * with a typed metadata struct, and decode/feature-extract runs as a
  * batched partition-local stage — the Scala analog of `mapInPandas`
  * (arrow-batch UDFs): one decoder context per partition, amortized over a
  * batch, no per-row setup cost.
  *
  * The codec is REAL: payloads are genuine uncompressed containers —
  * binary P6 PPM for images, canonical 44-byte PCM WAV for audio,
  * YUV4MPEG2 (C444) for video — synthesized deterministically from the
  * `documents` corpus, and the decoder recovers dimensions / sample counts /
  * frame counts by parsing container bytes (magic sniffing, ASCII header
  * scan, RIFF chunk walk, FRAME-marker iteration), never by trusting the
  * row's `kind` tag. The DuckDB oracle re-derives the same values
  * arithmetically (header lengths, content sizes, the rolling checksum over
  * content bytes), so a mis-parsed header or a wrong content offset is a
  * hash mismatch, not a silent pass.
  *
  * COMPRESSED formats ride the same seam via the JDK's own codecs: PNG
  * (DEFLATE) and JPEG (DCT, lossy) through `javax.imageio` — part of
  * `java.desktop`, zero external dependency, headless-safe — exercised by
  * the `mm_png` / `mm_jpeg` round-trip queries. PNG is lossless, so its
  * round-trip is hash-checked against the same arithmetic oracle as the
  * raw raster; JPEG's decoded pixels are encoder-dependent, so only its
  * decoder-independent outputs (container dims) are oracle-checked and the
  * error bound is spec-asserted. FLAC is a pure-JVM implementation of the
  * published format (magic, STREAMINFO + sample MD5, synced/CRC'd frames)
  * with real compression — fixed-predictor and LPC (order ≤ 8,
  * Levinson-Durbin) Rice-coded subframes beside the verbatim form, mono
  * and stereo with per-frame inter-channel decorrelation (independent,
  * left/side, right/side, mid/side; 17-bit side channels).
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,             // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Decoded features for one asset. Image: width/height, n_frames=1.
    * Audio: sample_rate/n_samples. Video: width/height/n_frames. Unused
    * fields are 0. */
  final case class DecodedRow(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int,
      n_samples: Long,
      checksum: Long)

  /** Pure-JVM codec for uncompressed containers: binary P6 PPM, PCM WAV,
    * YUV4MPEG2. Encoders build real container bytes; decoders parse them
    * back with byte arithmetic only. The checksum is the poly-31 fold
    * (same modulus as [[graft.functions.PolyHash]]) over the CONTENT
    * region — pixels / samples / frame planes — headers excluded, so the
    * oracle can re-derive it from the source text without modeling binary
    * header bytes. */
  object Codec {
    private val M = 1000000007L
    private val Ascii = StandardCharsets.US_ASCII

    private def fold(b: Array[Byte], from: Int, until: Int): Long = {
      var acc = 0L
      var i = from
      while (i < until) { acc = (acc * 31 + (b(i) & 0xff)) % M; i += 1 }
      acc
    }

    /** Content bytes: the source text repeated cyclically to length n. */
    private def cyclic(src: Array[Byte], n: Int): Array[Byte] = {
      val s = if (src.isEmpty) Array[Byte]('x') else src
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = s(i % s.length); i += 1 }
      out
    }

    // ---- encoders ----------------------------------------------------

    /** Binary P6 PPM: `P6\n{w} {h}\n255\n` + w*h*3 raw RGB bytes. */
    def encodePpm(w: Int, h: Int, content: Array[Byte]): Array[Byte] = {
      require(content.length == w * h * 3, "PPM content must be w*h*3 bytes")
      s"P6\n$w $h\n255\n".getBytes(Ascii) ++ content
    }

    /** Canonical 44-byte RIFF/WAVE header (PCM, 16-bit mono) + samples. */
    def encodeWav(sampleRate: Int, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](44 + data.length)
      def tag(o: Int, s: String): Unit = System.arraycopy(s.getBytes(Ascii), 0, out, o, 4)
      def le32(o: Int, v: Int): Unit = {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
        out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
      }
      def le16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      }
      tag(0, "RIFF"); le32(4, 36 + data.length); tag(8, "WAVE")
      tag(12, "fmt "); le32(16, 16); le16(20, 1 /* PCM */); le16(22, 1 /* mono */)
      le32(24, sampleRate); le32(28, sampleRate * 2 /* byte rate */)
      le16(32, 2 /* block align */); le16(34, 16 /* bits */)
      tag(36, "data"); le32(40, data.length)
      System.arraycopy(data, 0, out, 44, data.length)
      out
    }

    /** YUV4MPEG2, C444: stream header + per-frame `FRAME\n` + w*h*3 plane
      * bytes. */
    def encodeY4m(w: Int, h: Int, frames: Int, content: Array[Byte]): Array[Byte] = {
      require(content.length == frames * w * h * 3, "Y4M content must be frames*w*h*3")
      val head = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n".getBytes(Ascii)
      val marker = "FRAME\n".getBytes(Ascii)
      val fsz = w * h * 3
      val out = new Array[Byte](head.length + frames * (marker.length + fsz))
      System.arraycopy(head, 0, out, 0, head.length)
      var o = head.length
      var f = 0
      while (f < frames) {
        System.arraycopy(marker, 0, out, o, marker.length); o += marker.length
        System.arraycopy(content, f * fsz, out, o, fsz); o += fsz
        f += 1
      }
      out
    }

    /** Deterministic synthesis from a document: dims/rates derive from the
      * text length and doc id (the DuckDB oracle repeats this arithmetic),
      * content is the text bytes cycled to the container's content size. */
    def encode(kind: String, id: Long, text: String): Array[Byte] = {
      val bytes = text.getBytes(Ascii)
      val len = bytes.length
      kind match {
        case "image" =>
          val w = (len % 16) + 4
          val h = (id % 12).toInt + 3
          encodePpm(w, h, cyclic(bytes, w * h * 3))
        case "audio" =>
          val nSamples = (len % 500) + 50
          encodeWav(8000, cyclic(bytes, 2 * nSamples))
        case _ =>
          val w = (len % 8) + 4
          val h = (id % 6).toInt + 3
          val frames = (id % 8).toInt + 2
          encodeY4m(w, h, frames, cyclic(bytes, frames * w * h * 3))
      }
    }

    // ---- decoders ----------------------------------------------------

    /** Parse a P6 header: (width, height, pixel-data offset). */
    def ppmHeader(b: Array[Byte]): (Int, Int, Int) = {
      require(b.length >= 2 && b(0) == 'P' && b(1) == '6', "not a P6 PPM")
      var i = 2
      def skipWs(): Unit =
        while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
      def int(): Int = {
        skipWs()
        var v = 0
        while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
        v
      }
      val w = int(); val h = int(); val maxv = int()
      require(maxv == 255, s"unsupported PPM maxval $maxv")
      i += 1 // exactly one whitespace byte separates the header from pixels
      require(b.length - i == w * h * 3, "truncated PPM pixel data")
      (w, h, i)
    }

    private def decodePpm(b: Array[Byte], id: Long): DecodedRow = {
      val (w, h, off) = ppmHeader(b)
      DecodedRow(id, "image", b.length.toLong, w, h, 1, 0, 0L, fold(b, off, b.length))
    }

    private def decodeWav(b: Array[Byte], id: Long): DecodedRow = {
      def le32(o: Int): Int =
        (b(o) & 0xff) | (b(o + 1) & 0xff) << 8 | (b(o + 2) & 0xff) << 16 | (b(o + 3) & 0xff) << 24
      def le16(o: Int): Int = (b(o) & 0xff) | (b(o + 1) & 0xff) << 8
      def tag(o: Int): String = new String(b, o, 4, Ascii)
      require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE file")
      var o = 12
      var rate = 0; var channels = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (o + 8 <= b.length) { // RIFF chunk walk (word-aligned)
        val id4 = tag(o); val sz = le32(o + 4)
        id4 match {
          case "fmt " =>
            require(le16(o + 8) == 1, "not PCM")
            channels = le16(o + 10); rate = le32(o + 12); bits = le16(o + 22)
          case "data" => dataOff = o + 8; dataLen = sz
          case _      => ()
        }
        o += 8 + sz + (sz & 1)
      }
      require(dataOff >= 0 && channels > 0 && bits > 0, "missing fmt/data chunk")
      val nSamples = dataLen / (channels * (bits / 8))
      DecodedRow(id, "audio", b.length.toLong, 0, 0, 0, rate, nSamples.toLong,
        fold(b, dataOff, dataOff + dataLen))
    }

    private def decodeY4m(b: Array[Byte], id: Long): DecodedRow = {
      var eol = 0
      while (b(eol) != '\n') eol += 1
      val params = new String(b, 0, eol, Ascii).split(' ')
      require(params(0) == "YUV4MPEG2", "not a YUV4MPEG2 stream")
      var w = 0; var h = 0; var c444 = false
      params.tail.foreach { p =>
        p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case 'C' => c444 = p == "C444"
          case _   => ()
        }
      }
      require(w > 0 && h > 0 && c444, "unsupported Y4M parameters")
      val fsz = w * h * 3
      val marker = "FRAME\n".getBytes(Ascii)
      var o = eol + 1
      var frames = 0
      var acc = 0L
      while (o < b.length) {
        require(o + marker.length <= b.length &&
          (0 until marker.length).forall(k => b(o + k) == marker(k)),
          "bad FRAME marker")
        o += marker.length
        require(o + fsz <= b.length, "truncated Y4M frame body")
        var i = o
        while (i < o + fsz) { acc = (acc * 31 + (b(i) & 0xff)) % M; i += 1 }
        o += fsz
        frames += 1
      }
      DecodedRow(id, "video", b.length.toLong, w, h, frames, 0, 0L, acc)
    }

    /** Container-sniffing decode: the format comes from the magic bytes,
      * not from the row's kind tag. */
    def decode(r: MediaRow): DecodedRow = {
      val b = r.payload
      if (b.length >= 2 && b(0) == 'P' && b(1) == '6') decodePpm(b, r.media_id)
      else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
        decodeWav(b, r.media_id)
      else decodeY4m(b, r.media_id)
    }

    /** Per-frame Y-plane means from a Y4M container — the content decode
      * behind scene-cut detection. Parses the stream header + FRAME
      * markers like [[decodeY4m]], then integer-sums the first w*h bytes
      * of each frame (the Y plane of C444) with ONE double division per
      * frame, so the oracle's arithmetic re-derivation lands on identical
      * bits. */
    def y4mFrameMeans(b: Array[Byte]): Array[Double] = {
      var eol = 0
      while (b(eol) != '\n') eol += 1
      val params = new String(b, 0, eol, Ascii).split(' ')
      require(params(0) == "YUV4MPEG2", "not a YUV4MPEG2 stream")
      var w = 0; var h = 0
      params.tail.foreach { p =>
        p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case _   => ()
        }
      }
      require(w > 0 && h > 0, "missing Y4M dimensions")
      val np = w * h
      val fsz = np * 3
      val marker = "FRAME\n".getBytes(Ascii)
      val out = scala.collection.mutable.ArrayBuffer.empty[Double]
      var o = eol + 1
      while (o < b.length) {
        // Same marker + body validation as decodeY4m: a truncated or
        // corrupt payload must fail loudly, not sum bytes of the wrong
        // frame (or walk off the array).
        require(o + marker.length <= b.length &&
          (0 until marker.length).forall(k => b(o + k) == marker(k)),
          "bad FRAME marker")
        o += marker.length
        require(o + fsz <= b.length, "truncated Y4M frame body")
        var s = 0L
        var i = o
        while (i < o + np) { s += (b(i) & 0xff); i += 1 }
        out += s.toDouble / np
        o += fsz
      }
      out.toArray
    }

    /** Decode the PCM sample VALUES of a 16-bit WAV — signed little-endian
      * shorts out of the data chunk (content decode, not just the header
      * walk). */
    def wavSamples(b: Array[Byte]): Array[Int] = {
      def le32(o: Int): Int =
        (b(o) & 0xff) | (b(o + 1) & 0xff) << 8 | (b(o + 2) & 0xff) << 16 | (b(o + 3) & 0xff) << 24
      def tag(o: Int): String = new String(b, o, 4, Ascii)
      require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE file")
      var o = 12
      var dataOff = -1; var dataLen = 0
      while (o + 8 <= b.length) {
        val id4 = tag(o); val sz = le32(o + 4)
        if (id4 == "data") { dataOff = o + 8; dataLen = sz }
        o += 8 + sz + (sz & 1)
      }
      require(dataOff >= 0, "missing data chunk")
      val n = dataLen / 2
      val out = new Array[Int](n)
      var k = 0
      while (k < n) {
        val lo = b(dataOff + 2 * k) & 0xff
        val hi = b(dataOff + 2 * k + 1)
        out(k) = (hi << 8) | lo // sign-extends through hi
        k += 1
      }
      out
    }

    /** 4× the DFT power at the three bins whose weights stay INTEGER —
      * fs/6, fs/4, fs/3 (2cos(2πj/d) ∈ {±2, ±1, 0} and 2sin/√3 ∈ {0, ±1}
      * for d ∈ {6, 3}; 2sin ∈ {0, ±2} for d = 4), so
      * 4·|Σ x·e^(−iωj)|² = A² + 3B² (or A² + B² at fs/4) computes in
      * exact Long arithmetic with zero transcendentals — the property
      * that lets the DuckDB oracle replay it bit-for-bit (the dq_drift
      * argument applied to the frequency domain). Bounds: |x| < 2^15,
      * n ≤ 549 ⇒ |A| < 2^26 and every energy < 2^53 — exact as BIGINT
      * AND as the IEEE double a downstream ML feature column carries. */
    /** G.711 µ-law ENCODE of one 16-bit PCM sample — the standard's exact
      * integer pipeline: clamp to 32635, bias +132, 8 log segments (the
      * biased magnitude's MSB position), 4-bit mantissa, code complemented
      * on the wire. Pure integer arithmetic end to end. */
    def muLawEncode(x0: Int): Int = {
      val sign = if (x0 < 0) 0x80 else 0
      val x = math.min(math.abs(x0), 32635) + 132
      val exp = (31 - Integer.numberOfLeadingZeros(x)) - 7
      val man = (x >> (exp + 3)) & 0xF
      ~(sign | (exp << 4) | man) & 0xFF
    }

    /** G.711 µ-law DECODE — segment-midpoint reconstruction
      * `(((man<<3)+132)<<exp)-132`, the standard's inverse table as
      * arithmetic. decode(encode(x)) is within 2^(exp+2) of x (plus the
      * 32635 clamp at the very top of the range). */
    def muLawDecode(code: Int): Int = {
      val c = ~code & 0xFF
      val exp = (c >> 4) & 7
      val man = c & 0xF
      val mag = (((man << 3) + 132) << exp) - 132
      if ((c & 0x80) != 0) -mag else mag
    }

    def spectralEnergies4(s: Array[Int]): (Long, Long, Long) = {
      val c6 = Array(2, 1, -1, -2, -1, 1); val s6 = Array(0, 1, 1, 0, -1, -1)
      val c4 = Array(2, 0, -2, 0);         val s4 = Array(0, 2, 0, -2)
      val c3 = Array(2, -1, -1);           val s3 = Array(0, 1, -1)
      var a6 = 0L; var b6 = 0L; var a4 = 0L; var b4 = 0L
      var a3 = 0L; var b3 = 0L
      var j = 0
      while (j < s.length) {
        val x = s(j).toLong
        a6 += x * c6(j % 6); b6 += x * s6(j % 6)
        a4 += x * c4(j % 4); b4 += x * s4(j % 4)
        a3 += x * c3(j % 3); b3 += x * s3(j % 3)
        j += 1
      }
      (a6 * a6 + 3 * b6 * b6, a4 * a4 + b4 * b4, a3 * a3 + 3 * b3 * b3)
    }

    // ---- FLAC (pure-JVM subset: 16-bit mono) --------------------------
    //
    // A real FLAC codec, bit-exact to the published format: fLaC magic,
    // STREAMINFO metadata block (incl. the MD5 of the unencoded samples),
    // frames with the 14-bit sync code, UTF-8-coded frame numbers, CRC-8
    // header and CRC-16 frame checksums. Two encoder modes: VERBATIM-only
    // ([[encodeFlac]] — byte-aligned, deterministic container size, the
    // oracle's arithmetic) and ACTUAL COMPRESSION
    // ([[encodeFlacCompressed]] — per-frame best of verbatim and
    // FIXED-predictor orders 0-4 with Rice-coded residuals, MSB-first bit
    // packing), plus LPC prediction up to order 8 ([[encodeFlacLpc]] —
    // Levinson-Durbin coefficients quantized to 15 bits, the form
    // libFLAC's default levels emit) and STEREO with per-frame
    // inter-channel decorrelation ([[encodeFlacStereo]] — bit-cheapest
    // of independent/left-side/right-side/mid-side, 17-bit side
    // subframes bit-packed unaligned). The decoder handles CONSTANT,
    // VERBATIM, FIXED, and LPC(1-32) subframes at any equal-size
    // partition order, all four channel assignments, and verifies every
    // CRC plus the stream MD5.

    private def crc8(b: Array[Byte], until: Int): Int = {
      var crc = 0; var i = 0
      while (i < until) {
        crc ^= (b(i) & 0xff)
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
                else (crc << 1) & 0xff
          k += 1
        }
        i += 1
      }
      crc
    }

    private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
      var crc = 0; var i = from
      while (i < until) {
        crc ^= (b(i) & 0xff) << 8
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
                else (crc << 1) & 0xffff
          k += 1
        }
        i += 1
      }
      crc
    }

    private val flacBlockSize = 4096

    /** Byte length of FLAC's UTF-8-style number coding (standard UTF-8
      * boundaries, extended to 7 bytes / 36 bits by the FLAC format). */
    private def utf8NumBytes(v: Long): Int =
      if (v < 0x80L) 1 else if (v < 0x800L) 2 else if (v < 0x10000L) 3
      else if (v < 0x200000L) 4 else if (v < 0x4000000L) 5
      else if (v < 0x80000000L) 6 else 7

    /** Write a FLAC UTF-8-coded number: nb-byte form = a lead byte with
      * nb one-bits then a zero, then (nb-1) 10xxxxxx continuation bytes —
      * the decoder's multi-byte walk and the CRC paths already handle it. */
    private def writeUtf8Num(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
      val nb = utf8NumBytes(v)
      if (nb == 1) { out.write(v.toInt); return }
      out.write(((0xff << (8 - nb)) & 0xff) |
        ((v >> (6 * (nb - 1))) & ((1 << (7 - nb)) - 1)).toInt)
      var i = nb - 2
      while (i >= 0) { out.write(0x80 | ((v >> (6 * i)) & 0x3f).toInt); i -= 1 }
    }

    /** MSB-first bit reader over a byte array (FLAC's bit order). */
    private[ops] final class BitReader(b: Array[Byte], var pos: Long) {
      def readBits(n: Int): Long = {
        var v = 0L; var left = n
        while (left > 0) {
          val byteIdx = (pos >> 3).toInt
          val bitInByte = (pos & 7).toInt
          val take = math.min(8 - bitInByte, left)
          val bits = ((b(byteIdx) & 0xff) >> (8 - bitInByte - take)) & ((1 << take) - 1)
          v = (v << take) | bits
          pos += take; left -= take
        }
        v
      }
      def readUnary(): Int = {
        var q = 0
        while (readBits(1) == 0L) q += 1
        q
      }
      /** Advance to the next byte boundary; return the byte offset. */
      def byteAligned: Int = {
        if ((pos & 7) != 0) pos = (pos | 7) + 1
        (pos >> 3).toInt
      }
    }

    /** MSB-first bit writer (FLAC's bit order). */
    private[ops] final class BitWriter {
      private val out = new java.io.ByteArrayOutputStream()
      private var cur = 0; private var nbits = 0
      def writeBits(v: Long, n: Int): Unit = {
        var left = n
        while (left > 0) {
          val take = math.min(8 - nbits, left)
          val bits = ((v >>> (left - take)) & ((1L << take) - 1)).toInt
          cur = (cur << take) | bits
          nbits += take; left -= take
          if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        }
      }
      def writeUnary(q: Int): Unit = {
        var i = 0
        while (i < q) { writeBits(0, 1); i += 1 }
        writeBits(1, 1)
      }
      def alignByte(): Unit = if (nbits != 0) writeBits(0, 8 - nbits)
      def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
      /** Exact bit count written so far (before any alignment pad). */
      def bitLength: Long = out.size.toLong * 8 + nbits
      /** Append this buffer's bits into `dst` WITHOUT aligning — the
        * FLAC stereo frame layout (subframes bit-pack back to back; only
        * the frame pads to a byte boundary). */
      def writeTo(dst: BitWriter): Unit = {
        out.toByteArray.foreach(b => dst.writeBits(b & 0xffL, 8))
        if (nbits > 0) dst.writeBits(cur & ((1 << nbits) - 1), nbits)
      }
    }

    /** VERBATIM subframe: header byte + `bps`-bit big-endian samples —
      * a bit buffer, because a stereo frame's second subframe starts at
      * an arbitrary bit offset (subframes pack back to back; 17-bit side
      * channels are never byte-aligned). */
    private def verbatimSubframe(samples: Array[Int], off: Int, n: Int,
        bps: Int = 16): BitWriter = {
      val bw = new BitWriter
      bw.writeBits(0x02, 8) // 0 | 000001 VERBATIM | wasted 0
      val mask = (1L << bps) - 1
      var i = 0
      while (i < n) { bw.writeBits(samples(off + i) & mask, bps); i += 1 }
      bw
    }

    /** Smallest of VERBATIM and FIXED(0-4)+Rice for this frame — the real
      * compression path. Order is chosen by minimum residual magnitude,
      * the Rice parameter by exact coded-bit count; if no fixed form beats
      * verbatim (random data), verbatim wins — FLAC's own fallback rule. */
    private def bestSubframe(samples: Array[Int], off: Int, n: Int,
        bps: Int = 16): BitWriter = {
      var best = verbatimSubframe(samples, off, n, bps)
      val maxOrder = math.min(4, n - 1)
      var order = 0
      while (order <= maxOrder) {
        // residuals of the order-k fixed predictor (k-th difference)
        val res = new Array[Long](n - order)
        var i = order
        while (i < n) {
          def s(j: Int) = samples(off + j).toLong
          res(i - order) = order match {
            case 0 => s(i)
            case 1 => s(i) - s(i - 1)
            case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
            case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
            case _ => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
          }
          i += 1
        }
        val u = res.map(r => (r << 1) ^ (r >> 63)) // zigzag, all >= 0
        // exact Rice cost per candidate parameter; 14 caps the search
        var bestK = 0; var bestBits = Long.MaxValue
        var k = 0
        while (k <= 14) {
          var bits = 0L
          var j = 0
          while (j < u.length) { bits += (u(j) >>> k) + 1 + k; j += 1 }
          if (bits < bestBits) { bestBits = bits; bestK = k }
          k += 1
        }
        val subframeBits = 8L + bps.toLong * order + 2 + 4 + 4 + bestBits
        if (subframeBits < best.bitLength) {
          val bw = new BitWriter
          bw.writeBits((8 + order) << 1, 8) // 0 | 001<order> FIXED | wasted 0
          val mask = (1L << bps) - 1
          var w = 0
          while (w < order) { bw.writeBits(samples(off + w) & mask, bps); w += 1 }
          bw.writeBits(0, 2) // residual method: 4-bit Rice
          bw.writeBits(0, 4) // partition order 0 = one partition
          bw.writeBits(bestK, 4)
          var j = 0
          while (j < u.length) {
            bw.writeUnary((u(j) >>> bestK).toInt)
            bw.writeBits(u(j) & ((1L << bestK) - 1), bestK)
            j += 1
          }
          best = bw
        }
        order += 1
      }
      best
    }

    /** Shared stream assembly over 1 or 2 CHANNELS: magic + STREAMINFO
      * (+ interleaved sample MD5) + synced, CRC'd frames. Per frame,
      * `build(off, n)` returns the channel-assignment nibble and the
      * per-channel subframe bit buffers — packed back to back at BIT
      * granularity (a 17-bit side channel leaves the second subframe
      * unaligned; only the frame pads to the byte boundary, per spec). */
    private def flacFrames(sampleRate: Int, chans: Array[Array[Int]],
        build: (Int, Int) => (Int, Seq[BitWriter])): Array[Byte] = {
      val nch = chans.length
      require(nch >= 1 && nch <= 2, "1 or 2 channels")
      require(chans.forall(_.length == chans(0).length), "channel length mismatch")
      val nSamp = chans(0).length
      require(nSamp > 0, "empty FLAC stream")
      require(sampleRate > 0 && sampleRate < (1 << 20), "sample rate range")
      // out-of-range samples would encode mod 2^16 into a stream whose
      // CRCs and MD5 all pass (both sides hash the low 16 bits) — the one
      // corruption the container checks cannot catch, so refuse it here
      chans.foreach(c => require(
        c.forall(v => v >= Short.MinValue && v <= Short.MaxValue),
        "sample out of 16-bit range"))
      val out = new java.io.ByteArrayOutputStream(64 + nSamp * 2 * nch)
      out.write('f'); out.write('L'); out.write('a'); out.write('C')
      // metadata block header: last-block flag | type 0 (STREAMINFO), len 34
      out.write(0x80); out.write(0); out.write(0); out.write(34)
      val si = new Array[Byte](34)
      def put16(o: Int, v: Int): Unit = {
        si(o) = ((v >> 8) & 0xff).toByte; si(o + 1) = (v & 0xff).toByte
      }
      put16(0, flacBlockSize); put16(2, flacBlockSize) // min/max block size
      // bytes 4..9: min/max frame size = 0 (unknown, allowed)
      val total = nSamp.toLong // inter-channel sample frames, NOT values
      // 20 bits rate | 3 bits channels-1 | 5 bits bps-1 (=15) | 36 bits total
      si(10) = ((sampleRate >> 12) & 0xff).toByte
      si(11) = ((sampleRate >> 4) & 0xff).toByte
      si(12) = (((sampleRate & 0xf) << 4) | ((nch - 1) << 1) | (15 >> 4)).toByte
      si(13) = (((15 & 0xf) << 4) | ((total >> 32) & 0xf).toInt).toByte
      si(14) = ((total >> 24) & 0xff).toByte
      si(15) = ((total >> 16) & 0xff).toByte
      si(16) = ((total >> 8) & 0xff).toByte
      si(17) = (total & 0xff).toByte
      val md = java.security.MessageDigest.getInstance("MD5")
      var mi = 0
      while (mi < nSamp) { // spec: MD5 over the INTERLEAVED LE stream
        var c = 0
        while (c < nch) {
          val v = chans(c)(mi)
          md.update((v & 0xff).toByte); md.update(((v >> 8) & 0xff).toByte)
          c += 1
        }
        mi += 1
      }
      System.arraycopy(md.digest(), 0, si, 18, 16)
      out.write(si)
      var off = 0; var frameNo = 0
      while (off < nSamp) {
        val n = math.min(flacBlockSize, nSamp - off)
        val (chanCode, subs) = build(off, n)
        val fr = new java.io.ByteArrayOutputStream(8 + n * 2 * nch)
        fr.write(0xff); fr.write(0xf8) // sync 11111111_111110, rsvd 0, fixed-bs 0
        fr.write(0x70)                 // bs code 0111 (16-bit at end) | rate code 0000
        fr.write((chanCode << 4) | 0x08) // channel nibble | bps 100 (16-bit) | rsvd 0
        writeUtf8Num(fr, frameNo)      // UTF-8 frame number (multi-byte past 127)
        fr.write(((n - 1) >> 8) & 0xff); fr.write((n - 1) & 0xff)
        val hb = fr.toByteArray
        fr.write(crc8(hb, hb.length))
        val bw = new BitWriter
        fr.toByteArray.foreach(b => bw.writeBits(b & 0xffL, 8))
        subs.foreach(_.writeTo(bw))
        val fb = bw.toBytes // pads the frame to the byte boundary
        val c16 = crc16(fb, 0, fb.length)
        out.write(fb); out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
        off += n; frameNo += 1
      }
      out.toByteArray
    }

    /** Mono stream assembly — channel code 0000, one subframe per frame. */
    private def flacStream(sampleRate: Int, samples: Array[Int],
        subframe: (Array[Int], Int, Int) => BitWriter): Array[Byte] =
      flacFrames(sampleRate, Array(samples),
        (off, n) => (0x0, Seq(subframe(samples, off, n))))

    /** Per-frame mid/side companions of a stereo block. */
    private def midSide(left: Array[Int], right: Array[Int], off: Int,
        n: Int): (Array[Int], Array[Int]) = {
      val mid = new Array[Int](n); val side = new Array[Int](n)
      var i = 0
      while (i < n) {
        val l = left(off + i); val r = right(off + i)
        mid(i) = (l + r) >> 1 // floor; the dropped bit rides in side's LSB
        side(i) = l - r       // 17-bit channel
        i += 1
      }
      (mid, side)
    }

    /** Encode 16-bit STEREO with inter-channel decorrelation — the form
      * every real-world stereo stream uses: per frame the bit-cheapest of
      * independent L/R (0001), left/side (1000), right/side (1001) and
      * mid/side (1010), each channel coded by the LPC/FIXED/VERBATIM
      * chooser; the side channel is L−R at 17 bits per spec. Ties prefer
      * the earlier candidate (independent), so the choice is
      * deterministic. `allowDecorrelation = false` pins independent
      * coding — the spec uses it to prove decorrelation actually engages
      * (correlated input must code strictly smaller with it on). */
    def encodeFlacStereo(sampleRate: Int, left: Array[Int],
        right: Array[Int], maxOrder: Int = 8,
        allowDecorrelation: Boolean = true): Array[Byte] =
      flacFrames(sampleRate, Array(left, right), (off, n) => {
        val ls = lpcSubframe(left, off, n, maxOrder)
        val rs = lpcSubframe(right, off, n, maxOrder)
        if (!allowDecorrelation) (0x1, Seq(ls, rs))
        else {
          val (mid, side) = midSide(left, right, off, n)
          val ms = lpcSubframe(mid, 0, n, maxOrder)
          val ss = lpcSubframe(side, 0, n, maxOrder, bps = 17)
          Seq((0x1, Seq(ls, rs)), (0x8, Seq(ls, ss)),
            (0x9, Seq(ss, rs)), (0xA, Seq(ms, ss)))
            .minBy(_._2.map(_.bitLength).sum)
        }
      })

    /** TEST-ONLY: stereo with a FORCED channel assignment, so the spec
      * can round-trip every decoder reconstruction branch (left/side,
      * right/side, mid/side) regardless of which one the size chooser
      * would pick on a given signal. */
    private[ops] def encodeFlacStereoMode(sampleRate: Int, left: Array[Int],
        right: Array[Int], mode: Int): Array[Byte] =
      flacFrames(sampleRate, Array(left, right), (off, n) => {
        lazy val (mid, side) = midSide(left, right, off, n)
        mode match {
          case 0x1 => (0x1, Seq(bestSubframe(left, off, n),
            bestSubframe(right, off, n)))
          case 0x8 => (0x8, Seq(bestSubframe(left, off, n),
            bestSubframe(side, 0, n, bps = 17)))
          case 0x9 => (0x9, Seq(bestSubframe(side, 0, n, bps = 17),
            bestSubframe(right, off, n)))
          case 0xA => (0xA, Seq(bestSubframe(mid, 0, n),
            bestSubframe(side, 0, n, bps = 17)))
          case m => throw new IllegalArgumentException(s"bad stereo mode $m")
        }
      })

    /** Encode 16-bit mono samples as a FLAC stream (VERBATIM subframes —
      * deterministic container size, the [[mmFlacRoundtrip]] oracle's
      * 53 + 2n formula). */
    def encodeFlac(sampleRate: Int, samples: Array[Int]): Array[Byte] =
      flacStream(sampleRate, samples, verbatimSubframe(_, _, _))

    /** Closed-form [[encodeFlac]] output size: 42 stream/STREAMINFO bytes
      * + 10 fixed overhead bytes per frame + the frame's UTF-8-coded
      * number + 2 bytes per sample. Spec-locked against the actual
      * encoder (CodecPropertySpec, incl. a >128-frame stream), used by
      * [[mmFlacRoundtrip]] so the hot path never runs a second encode
      * just to learn its length. */
    def verbatimFlacBytes(nSamples: Int): Long = {
      val frames = (nSamples + flacBlockSize - 1) / flacBlockSize
      // sum of utf8NumBytes(0 .. frames-1), by byte-width band
      val bands = Seq(0x80L, 0x800L, 0x10000L, 0x200000L, 0x4000000L, 0x80000000L)
      var numBytes = 0L; var lo = 0L
      bands.zipWithIndex.foreach { case (hi, i) =>
        if (frames > lo) numBytes += (math.min(frames.toLong, hi) - lo) * (i + 1)
        lo = hi
      }
      42L + 10L * frames + numBytes + 2L * nSamples
    }

    /** Encode with REAL compression: per frame, the smaller of VERBATIM
      * and FIXED-predictor(0-4) + Rice-coded residuals. Correlated
      * signals (anything with local structure) code well below 16 bits
      * per sample; uncorrelated noise falls back to verbatim. */
    def encodeFlacCompressed(sampleRate: Int, samples: Array[Int]): Array[Byte] =
      flacStream(sampleRate, samples, bestSubframe(_, _, _))

    /** LPC subframe (order 1-8): block autocorrelation → Levinson-Durbin
      * reflection recursion → coefficients quantized to 15 bits at shift
      * 12, integer residuals Rice-coded exactly like the FIXED path. The
      * residual arithmetic mirrors the decoder bit-for-bit (64-bit
      * accumulator, arithmetic shift), so the round-trip is lossless for
      * ANY coefficient set — the model only decides how SMALL the
      * residuals get. Falls back to the FIXED/VERBATIM chooser when the
      * block is shorter than the order, energyless (silence — the fixed
      * predictors already code that in a handful of bits), or when the
      * LPC form simply isn't smaller: the encoder never emits a larger
      * stream than [[encodeFlacCompressed]] would. */
    private def lpcSubframe(samples: Array[Int], off: Int, n: Int,
        maxOrder: Int, bps: Int = 16): BitWriter = {
      val fallback = bestSubframe(samples, off, n, bps)
      val order0 = math.min(math.min(maxOrder, 8), n - 1)
      if (order0 < 1) return fallback
      // autocorrelation over the block
      val r = new Array[Double](order0 + 1)
      var lag = 0
      while (lag <= order0) {
        var s = 0.0; var i = lag
        while (i < n) {
          s += samples(off + i).toDouble * samples(off + i - lag); i += 1
        }
        r(lag) = s; lag += 1
      }
      if (r(0) == 0.0) return fallback
      // Levinson-Durbin: a(j) predict x[i] ≈ Σ a(j)·x[i-j]; stop early if
      // the prediction error collapses (perfectly predictable signal)
      val a = new Array[Double](order0 + 1)
      var err = r(0)
      var order = 0
      var m = 1
      var go = true
      while (m <= order0 && go) {
        var acc = r(m)
        var j = 1
        while (j < m) { acc -= a(j) * r(m - j); j += 1 }
        val k = acc / err
        val na = new Array[Double](m + 1)
        na(m) = k
        j = 1
        while (j < m) { na(j) = a(j) - k * a(m - j); j += 1 }
        System.arraycopy(na, 1, a, 1, m)
        err *= (1 - k * k)
        order = m
        if (err <= 0) go = false
        m += 1
      }
      // quantize: precision 15 (precM1 = 14), shift 12 — libFLAC's
      // default headroom for 16-bit input
      val shift = 12
      val qc = new Array[Long](order)
      var j = 0
      while (j < order) {
        qc(j) = math.max(-16384L, math.min(16383L,
          math.round(a(j + 1) * (1L << shift)).toLong))
        j += 1
      }
      // residuals with the DECODER'S integer arithmetic
      val res = new Array[Long](n - order)
      var i = order
      while (i < n) {
        var acc = 0L
        j = 0
        while (j < order) { acc += qc(j) * samples(off + i - 1 - j); j += 1 }
        res(i - order) = samples(off + i).toLong - (acc >> shift)
        i += 1
      }
      val u = res.map(v => (v << 1) ^ (v >> 63)) // zigzag
      var bestK = 0; var bestBits = Long.MaxValue
      var k = 0
      while (k <= 14) {
        var bits = 0L
        j = 0
        while (j < u.length) { bits += (u(j) >>> k) + 1 + k; j += 1 }
        if (bits < bestBits) { bestBits = bits; bestK = k }
        k += 1
      }
      val subframeBits =
        8L + bps.toLong * order + 4 + 5 + 15L * order + 2 + 4 + 4 + bestBits
      if (subframeBits >= fallback.bitLength) return fallback
      val bw = new BitWriter
      bw.writeBits((0x20 | (order - 1)) << 1, 8) // 0 | 1<order-1> LPC | wasted 0
      val mask = (1L << bps) - 1
      var w = 0
      while (w < order) { bw.writeBits(samples(off + w) & mask, bps); w += 1 }
      bw.writeBits(14, 4)    // qlp precision - 1 = 14 → 15-bit coefficients
      bw.writeBits(shift, 5) // qlp shift (non-negative)
      j = 0
      while (j < order) { bw.writeBits(qc(j) & 0x7fff, 15); j += 1 }
      bw.writeBits(0, 2)     // residual method: 4-bit Rice
      bw.writeBits(0, 4)     // partition order 0 = one partition
      bw.writeBits(bestK, 4)
      j = 0
      while (j < u.length) {
        bw.writeUnary((u(j) >>> bestK).toInt)
        bw.writeBits(u(j) & ((1L << bestK) - 1), bestK)
        j += 1
      }
      bw
    }

    /** Encode with LPC prediction (order ≤ 8) — the arbitrary-order half
      * real-world FLAC ingest hits immediately (libFLAC's default levels
      * emit LPC, not just the FIXED fast-mode subset): per frame the
      * smallest of the LPC form and the FIXED/VERBATIM chooser, so output
      * never regresses below [[encodeFlacCompressed]]. Decoded by
      * [[decodeFlac]]'s LPC branch (CRC'd, MD5'd); CodecPropertySpec
      * round-trips it and asserts LPC subframes actually appear. */
    def encodeFlacLpc(sampleRate: Int, samples: Array[Int],
        maxOrder: Int = 8): Array[Byte] =
      flacStream(sampleRate, samples,
        (s, off, n) => lpcSubframe(s, off, n, maxOrder))

    /** TEST-ONLY encoder exercising the Rice ESCAPE path (k=15): FIXED
      * order-0 subframes whose single partition stores residuals verbatim
      * at a fixed 16-bit width. The size-optimal encoder never emits the
      * escape (its parameter search stops at 14), but a stream from a real
      * external encoder may — this keeps the decoder branch covered by a
      * genuine CRC'd, MD5'd stream rather than left untested. */
    private[ops] def encodeFlacEscape(sampleRate: Int, samples: Array[Int]): Array[Byte] =
      flacStream(sampleRate, samples, (s, off, n) => {
        val bw = new BitWriter
        bw.writeBits(8 << 1, 8) // 0 | 001000 FIXED order 0 | wasted 0
        bw.writeBits(0, 2)      // residual method: 4-bit Rice
        bw.writeBits(0, 4)      // partition order 0 = one partition
        bw.writeBits(15, 4)     // ESCAPE
        bw.writeBits(16, 5)     // raw residual width: 16-bit two's complement
        var i = 0
        while (i < n) { bw.writeBits(s(off + i).toLong & 0xffff, 16); i += 1 }
        bw
      })

    /** Decode a 16-bit mono FLAC stream; rejects multichannel input
      * (use [[decodeFlacAll]]). Returns (sampleRate, samples). */
    def decodeFlac(b: Array[Byte]): (Int, Array[Int]) = {
      val (rate, channels, samples) = decodeFlacAll(b)
      require(channels == 1, s"$channels-channel stream: use decodeFlacAll")
      (rate, samples)
    }

    /** Decode a 16-bit mono or stereo FLAC stream — CONSTANT, VERBATIM,
      * FIXED(0-4)+Rice and LPC subframes at any equal-size partition
      * order, all four stereo channel assignments (independent,
      * left/side, right/side, mid/side — side decoded at 17 bits and
      * the mid/side lost LSB recovered per spec), from both our encoders
      * and fast-mode streams of any conforming encoder: walks metadata
      * blocks, validates every frame's sync, CRC-8 and CRC-16, and
      * finally the STREAMINFO MD5 against the decoded samples —
      * losslessness is CHECKED, not assumed. Returns
      * (sampleRate, channels, interleaved samples). */
    def decodeFlacAll(b: Array[Byte]): (Int, Int, Array[Int]) = {
      require(b.length >= 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C',
        "not a FLAC stream")
      var o = 4
      var sampleRate = 0; var total = 0L; var channels = 1
      var md5 = new Array[Byte](16)
      var last = false
      while (!last) {
        require(o + 4 <= b.length, "truncated metadata block header")
        val hdr = b(o) & 0xff
        last = (hdr & 0x80) != 0
        val typ = hdr & 0x7f
        val len = ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
        require(o + 4 + len <= b.length, "truncated metadata block body")
        if (typ == 0) {
          val s = o + 4
          require(len == 34, "bad STREAMINFO length")
          sampleRate = ((b(s + 10) & 0xff) << 12) | ((b(s + 11) & 0xff) << 4) |
            ((b(s + 12) & 0xff) >> 4)
          channels = ((b(s + 12) >> 1) & 0x7) + 1
          require(channels <= 2, s"$channels-channel streams unsupported")
          require((((b(s + 12) & 1) << 4) | ((b(s + 13) & 0xff) >> 4)) == 15, "16-bit only")
          total = ((b(s + 13) & 0xfL) << 32) | ((b(s + 14) & 0xffL) << 24) |
            ((b(s + 15) & 0xffL) << 16) | ((b(s + 16) & 0xffL) << 8) | (b(s + 17) & 0xffL)
          System.arraycopy(b, s + 18, md5, 0, 16)
        }
        o += 4 + len
      }
      // STREAMINFO total is a 36-bit field: a corrupt header can carry a
      // count a JVM array cannot hold — refuse loudly instead of letting
      // .toInt alias it into a NegativeArraySizeException (or worse, a
      // small positive size the sample-count check only catches later)
      require(total * channels <= Int.MaxValue, s"stream too long: $total samples")
      val outSamples = new Array[Int]((total * channels).toInt)
      var got = 0
      // Partitioned-Rice residual walk + prediction, shared by the FIXED
      // and LPC subframe decoders (identical residual coding, different
      // predictor): reads `n - order` residuals into the CHANNEL buffer,
      // reconstructing buf(idx) = pred(idx) + residual as it goes.
      def walkResiduals(br: BitReader, n: Int, order: Int, buf: Array[Int])(
          pred: Int => Long): Unit = {
        require(br.readBits(2) == 0, "only 4-bit Rice partitions supported")
        val po = br.readBits(4).toInt
        val parts = 1 << po
        require(n % parts == 0, "partition size must divide blocksize")
        require(order <= (n >> po),
          "warm-up exceeds the first partition") // else cnt goes negative
        var p = 0
        var idx = order
        while (p < parts) {
          val k = br.readBits(4).toInt
          // k == 15 is the ESCAPE code: a 5-bit raw width follows and
          // the partition's residuals are stored VERBATIM in two's
          // complement (no zigzag) — a conforming encoder emits it
          // when Rice coding would expand (pathological noise). Our
          // encoder's parameter search stops at 14, so only external
          // streams exercise this branch (CodecPropertySpec covers it
          // via the test-only escape encoder).
          val esc = k == 15
          val escBits = if (esc) br.readBits(5).toInt else 0
          val cnt = (n / parts) - (if (p == 0) order else 0)
          var j = 0
          while (j < cnt) {
            val r = if (esc) {
              if (escBits == 0) 0
              else ((br.readBits(escBits) << (64 - escBits)) >> (64 - escBits)).toInt
            } else {
              val q = br.readUnary()
              val u = (q.toLong << k) | br.readBits(k)
              // unzigzag: even → u/2, odd → -(u+1)/2
              ((u >>> 1) ^ -(u & 1L)).toInt
            }
            buf(idx) = (pred(idx) + r).toInt
            idx += 1; j += 1
          }
          p += 1
        }
      }
      // One subframe off the shared BitReader into a fresh channel buffer
      // (subframes bit-pack back to back; `bps` is 17 for side channels).
      def decodeSubframe(br: BitReader, n: Int, bps: Int): Array[Int] = {
        val buf = new Array[Int](n)
        def sext(v: Long): Int = ((v << (64 - bps)) >> (64 - bps)).toInt
        val sub = br.readBits(8).toInt
        require((sub & 1) == 0, "wasted bits unsupported")
        val typ6 = (sub >> 1) & 0x3f
        typ6 match {
          case 0x00 => // CONSTANT: one value replicated
            val v = sext(br.readBits(bps))
            var i = 0; while (i < n) { buf(i) = v; i += 1 }
          case 0x01 => // VERBATIM
            var i = 0
            while (i < n) { buf(i) = sext(br.readBits(bps)); i += 1 }
          case t if t >= 0x08 && t <= 0x0c => // FIXED, order = t - 8
            val order = t - 8
            require(order <= n, s"FIXED order $order exceeds blocksize $n")
            var i = 0
            while (i < order) { buf(i) = sext(br.readBits(bps)); i += 1 }
            walkResiduals(br, n, order, buf) { s0 =>
              order match { // fixed-predictor reconstruction
                case 0 => 0L
                case 1 => buf(s0 - 1).toLong
                case 2 => 2L * buf(s0 - 1) - buf(s0 - 2)
                case 3 => 3L * buf(s0 - 1) - 3L * buf(s0 - 2) + buf(s0 - 3)
                case _ => 4L * buf(s0 - 1) - 6L * buf(s0 - 2) +
                  4L * buf(s0 - 3) - buf(s0 - 4)
              }
            }
          case t if t >= 0x20 && t <= 0x3f => // LPC, order = (t & 0x1f) + 1
            val order = (t & 0x1f) + 1
            require(order <= n, s"LPC order $order exceeds blocksize $n")
            var i = 0
            while (i < order) { buf(i) = sext(br.readBits(bps)); i += 1 }
            val precM1 = br.readBits(4).toInt
            require(precM1 != 15, "invalid qlp coefficient precision")
            val prec = precM1 + 1
            val shift = ((br.readBits(5).toInt << 27) >> 27) // signed 5-bit
            require(shift >= 0, "negative qlp shift unsupported")
            val coefs = new Array[Long](order)
            i = 0
            while (i < order) { // signed `prec`-bit coefficients
              coefs(i) = (br.readBits(prec) << (64 - prec)) >> (64 - prec)
              i += 1
            }
            walkResiduals(br, n, order, buf) { s0 =>
              // qlp prediction: Σ coef(j)·s[i-1-j], arithmetic-shifted —
              // the 64-bit accumulator is the spec's required headroom
              var acc = 0L; var j = 0
              while (j < order) { acc += coefs(j) * buf(s0 - 1 - j); j += 1 }
              acc >> shift
            }
          case t => throw new IllegalArgumentException(s"unsupported subframe type $t")
        }
        buf
      }
      // a truncated frame surfaces as an out-of-bounds read somewhere in
      // the bit walk — the catch below rethrows it as the decoder's
      // loud-failure contract (sibling decoders use explicit truncation
      // requires; per-read bounds checks would lard the bit-level loop)
      try while (o < b.length) {
        val start = o
        require((b(o) & 0xff) == 0xff && (b(o + 1) & 0xfe) == 0xf8, "bad frame sync")
        val bsCode = (b(o + 2) & 0xf0) >> 4
        require((b(o + 2) & 0x0f) == 0, "rate must come from STREAMINFO")
        val chanCode = (b(o + 3) & 0xf0) >> 4
        require((b(o + 3) & 0x0f) == 0x08, "16-bit frames only")
        o += 4
        // UTF-8-coded frame number (general multi-byte walk)
        val lead = b(o) & 0xff; o += 1
        if (lead >= 0x80) {
          var cont = { var c = 0; var m = lead; while ((m & 0x40) != 0) { c += 1; m <<= 1 }; c }
          while (cont > 0) { require((b(o) & 0xc0) == 0x80, "bad UTF-8 number"); o += 1; cont -= 1 }
        }
        val n = bsCode match {
          case 0x6 => val v = (b(o) & 0xff) + 1; o += 1; v
          case 0x7 => val v = (((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)) + 1; o += 2; v
          case c => throw new IllegalArgumentException(s"unsupported blocksize code $c")
        }
        require(crc8(java.util.Arrays.copyOfRange(b, start, o), o - start) == (b(o) & 0xff),
          "frame header CRC-8 mismatch")
        o += 1
        // channel assignment: 0000 mono, 0001 independent stereo,
        // 1000 left/side, 1001 right/side (ch0 IS the side), 1010
        // mid/side; the side channel carries one extra bit (L−R spans
        // 17 bits for 16-bit input)
        val nch = chanCode match {
          case 0x0           => 1
          case 0x1           => 2
          case 0x8 | 0x9 | 0xA => 2
          case c => throw new IllegalArgumentException(s"unsupported channel assignment $c")
        }
        require(nch == channels,
          s"frame channel count $nch != STREAMINFO $channels")
        val br = new BitReader(b, o.toLong * 8)
        val bufs = new Array[Array[Int]](nch)
        var ch = 0
        while (ch < nch) {
          val bps = chanCode match {
            case 0x8 if ch == 1 => 17 // left/side: ch1 is the side
            case 0x9 if ch == 0 => 17 // right/side: ch0 is the side
            case 0xA if ch == 1 => 17 // mid/side: ch1 is the side
            case _              => 16
          }
          bufs(ch) = decodeSubframe(br, n, bps)
          ch += 1
        }
        o = br.byteAligned // frame pads to the byte boundary
        // inter-channel reconstruction + interleave into the output
        var i = 0
        while (i < n) {
          val base = (got + i) * channels
          chanCode match {
            case 0x0 => outSamples(base) = bufs(0)(i)
            case 0x1 =>
              outSamples(base) = bufs(0)(i); outSamples(base + 1) = bufs(1)(i)
            case 0x8 => // left/side: R = L − side
              outSamples(base) = bufs(0)(i)
              outSamples(base + 1) = bufs(0)(i) - bufs(1)(i)
            case 0x9 => // right/side: L = R + side
              outSamples(base) = bufs(1)(i) + bufs(0)(i)
              outSamples(base + 1) = bufs(1)(i)
            case _ => // mid/side: the floored mid bit rides in side's LSB
              val m2 = (bufs(0)(i) << 1) | (bufs(1)(i) & 1)
              outSamples(base) = (m2 + bufs(1)(i)) >> 1
              outSamples(base + 1) = (m2 - bufs(1)(i)) >> 1
          }
          i += 1
        }
        got += n
        val c16 = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
        require(crc16(b, start, o) == c16, "frame CRC-16 mismatch")
        o += 2
      } catch {
        case e: ArrayIndexOutOfBoundsException =>
          throw new IllegalArgumentException("truncated FLAC stream", e)
      }
      require(got == total, s"sample count mismatch: $got vs $total")
      val md = java.security.MessageDigest.getInstance("MD5")
      outSamples.foreach { v =>
        md.update((v & 0xff).toByte); md.update(((v >> 8) & 0xff).toByte)
      }
      require(java.util.Arrays.equals(md.digest(), md5), "STREAMINFO MD5 mismatch")
      (sampleRate, channels, outSamples)
    }

    // ---- compressed image codecs (JDK ImageIO: PNG, JPEG) -------------

    // Executor-safe ImageIO setup, once per JVM at first Codec use:
    // headless (no display on an executor — but only when the embedding
    // app hasn't already chosen, so a co-resident toolkit keeps its
    // setting), and NO disk-backed stream cache — the default writes
    // every encode through a temp file, which at 100 TB turns a
    // CPU-bound codec stage into small-file IO. setUseCache is
    // deliberately process-global: every ImageIO user in this JVM gets
    // the in-memory path (strictly faster; the disk cache exists for
    // memory-constrained desktop apps, not executors).
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)

    /** Split a P6 PPM into (width, height, packed RGB triples). */
    def rgbFromPpm(b: Array[Byte]): (Int, Int, Array[Byte]) = {
      val (w, h, off) = ppmHeader(b)
      (w, h, java.util.Arrays.copyOfRange(b, off, off + w * h * 3))
    }

    /** Packed RGB triples → BufferedImage, writing the raster's backing
      * byte array directly (TYPE_3BYTE_BGR stores B,G,R per pixel). */
    private def toImage(w: Int, h: Int, rgb: Array[Byte]): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      var p = 0
      while (p < w * h) {
        data(3 * p) = rgb(3 * p + 2)
        data(3 * p + 1) = rgb(3 * p + 1)
        data(3 * p + 2) = rgb(3 * p)
        p += 1
      }
      img
    }

    /** Encode packed RGB as PNG (DEFLATE; lossless). */
    def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(w * h + 64)
      javax.imageio.ImageIO.write(toImage(w, h, rgb), "png", out)
      out.toByteArray
    }

    /** Encode packed RGB as JPEG at the given quality (DCT; lossy). */
    def encodeJpeg(w: Int, h: Int, rgb: Array[Byte], quality: Float = 0.85f): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      val out = new java.io.ByteArrayOutputStream(w * h + 64)
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(toImage(w, h, rgb), null, null), param)
      } finally { ios.close(); writer.dispose() }
      out.toByteArray
    }

    /** Decode any ImageIO-supported container (PNG/JPEG here) back to
      * (width, height, packed RGB). Per-pixel getRGB keeps this
      * colormodel-agnostic; a production hot path would bulk-copy the
      * raster per format — same seam, different inner loop. */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image container")
      val w = img.getWidth; val h = img.getHeight
      val rgb = new Array[Byte](w * h * 3)
      var y = 0; var p = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = img.getRGB(x, y)
          rgb(p) = ((px >> 16) & 0xff).toByte
          rgb(p + 1) = ((px >> 8) & 0xff).toByte
          rgb(p + 2) = (px & 0xff).toByte
          p += 3; x += 1
        }
        y += 1
      }
      (w, h, rgb)
    }

    /** Per-frame Y planes out of a C444 Y4M container — same header and
      * FRAME-marker walk as [[y4mFrameMeans]], returning the raw bytes so
      * a downstream codec (MJPEG) can re-encode each frame. */
    def y4mFrames(b: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
      var eol = 0
      while (b(eol) != '\n') eol += 1
      val params = new String(b, 0, eol, Ascii).split(' ')
      require(params(0) == "YUV4MPEG2", "not a YUV4MPEG2 stream")
      var w = 0; var h = 0
      params.tail.foreach { p =>
        p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case _   => ()
        }
      }
      require(w > 0 && h > 0, "missing Y4M dimensions")
      val np = w * h
      val fsz = np * 3
      val marker = "FRAME\n".getBytes(Ascii)
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var o = eol + 1
      while (o < b.length) {
        require(o + marker.length <= b.length &&
          (0 until marker.length).forall(k => b(o + k) == marker(k)),
          "bad FRAME marker")
        o += marker.length
        require(o + fsz <= b.length, "truncated Y4M frame body")
        out += java.util.Arrays.copyOfRange(b, o, o + np)
        o += fsz
      }
      (w, h, out.toArray)
    }

    // ---- AVI / MJPEG (compressed video container) --------------------

    /** Minimal RIFF/AVI muxer carrying Motion-JPEG: the honest compressed
      * -video path this environment can support — every frame is a real
      * DCT-compressed JPEG ([[encodeJpeg]]), and the container is the
      * standard AVI layout (hdrl with avih/strh/strf, a movi LIST of
      * `00dc` chunks, and an idx1 index) that any MJPEG-aware player
      * accepts. Inter-frame (H.264-class) codecs need a native decoder
      * this sandbox doesn't have; MJPEG is the classic intra-only
      * trade-off — larger files, but every frame independently seekable,
      * which is also why curation pipelines like it for frame sampling.
      * All sizes little-endian; odd chunks padded per RIFF. */
    def encodeAvi(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(fps > 0 && frames.nonEmpty, "AVI needs fps > 0 and >= 1 frame")
      val out = new java.io.ByteArrayOutputStream(frames.map(_.length + 24).sum + 512)
      def fourcc(s: String): Unit = out.write(s.getBytes(Ascii), 0, 4)
      def le32(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
      }
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      val n = frames.length
      def pad(len: Int): Int = len + (len & 1)
      val moviBody = 4 + frames.map(f => 8 + pad(f.length)).sum // "movi" + chunks
      val idxBytes = 16 * n
      val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody) + (8 + idxBytes)
      fourcc("RIFF"); le32(riffBody); fourcc("AVI ")
      fourcc("LIST"); le32(hdrlBody); fourcc("hdrl")
      fourcc("avih"); le32(56)
      le32(1000000 / fps); le32(0); le32(0); le32(0x10 /* AVIF_HASINDEX */)
      le32(n); le32(0); le32(1); le32(0); le32(w); le32(h)
      le32(0); le32(0); le32(0); le32(0)
      fourcc("LIST"); le32(4 + (8 + 56) + (8 + 40)); fourcc("strl")
      fourcc("strh"); le32(56)
      fourcc("vids"); fourcc("MJPG"); le32(0); le16(0); le16(0); le32(0)
      le32(1); le32(fps); le32(0); le32(n); le32(0); le32(0); le32(0)
      le16(0); le16(0); le16(w); le16(h) // rcFrame
      fourcc("strf"); le32(40)
      le32(40); le32(w); le32(h); le16(1); le16(24); fourcc("MJPG")
      le32(w * h * 3); le32(0); le32(0); le32(0); le32(0)
      fourcc("LIST"); le32(moviBody); fourcc("movi")
      val offsets = new Array[Int](n)
      var rel = 4 // idx1 offsets are relative to the 'movi' fourcc
      var i = 0
      while (i < n) {
        offsets(i) = rel
        fourcc("00dc"); le32(frames(i).length)
        out.write(frames(i), 0, frames(i).length)
        if ((frames(i).length & 1) == 1) out.write(0)
        rel += 8 + pad(frames(i).length)
        i += 1
      }
      fourcc("idx1"); le32(idxBytes)
      i = 0
      while (i < n) {
        fourcc("00dc"); le32(0x10 /* AVIIF_KEYFRAME */)
        le32(offsets(i)); le32(frames(i).length)
        i += 1
      }
      out.toByteArray
    }

    /** Demux an MJPEG AVI: verify the RIFF/AVI magic, read dims + declared
      * frame count from avih, collect the movi `00dc` payloads, and check
      * the idx1 entries point at the chunks they claim. Structural
      * corruption fails loudly (require), matching every other decoder in
      * this Codec. Returns (width, height, declaredFrames, frames, idxOk). */
    def decodeAvi(b: Array[Byte]): (Int, Int, Int, Array[Array[Byte]], Boolean) = {
      def le32(o: Int): Int =
        (b(o) & 0xff) | (b(o + 1) & 0xff) << 8 | (b(o + 2) & 0xff) << 16 | (b(o + 3) & 0xff) << 24
      def tag(o: Int): String = new String(b, o, 4, Ascii)
      require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ", "not an AVI")
      require(le32(4) >= 4 && 8L + le32(4) <= b.length, "truncated RIFF body")
      var w = 0; var h = 0; var declared = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var idx: Array[(Int, Int)] = null
      var moviStart = -1
      var o = 12
      val end = 8 + le32(4)
      while (o + 8 <= end) {
        val id = tag(o); val sz = le32(o + 4)
        // sz is attacker-controlled: reject negative (high-bit) sizes and
        // use 64-bit bounds math so a near-2^31 size can't overflow past
        // the check — the FLAC loud-failure contract applied to RIFF
        require(sz >= 0 && o + 8L + sz <= b.length, s"truncated chunk $id")
        id match {
          case "LIST" =>
            tag(o + 8) match {
              case "hdrl" => // descend: avih is its first child
                require(sz >= 52, "hdrl too short for avih")
                require(tag(o + 12) == "avih" && le32(o + 16) >= 40, "missing avih")
                val a = o + 20
                declared = le32(a + 16); w = le32(a + 32); h = le32(a + 36)
              case "movi" =>
                moviStart = o + 8
                var c = o + 12
                while (c + 8 <= o + 8 + sz) {
                  val cid = tag(c); val csz = le32(c + 4)
                  require(csz >= 0 && c + 8L + csz <= b.length,
                    s"truncated movi chunk $cid")
                  if (cid == "00dc")
                    frames += java.util.Arrays.copyOfRange(b, c + 8, c + 8 + csz)
                  c += 8 + csz + (csz & 1)
                }
              case _ => ()
            }
          case "idx1" =>
            idx = (0 until sz / 16).map { k =>
              val e = o + 8 + 16 * k
              require(tag(e) == "00dc", "unexpected idx1 stream id")
              (le32(e + 8), le32(e + 12))
            }.toArray
          case _ => ()
        }
        o += 8 + sz + (sz & 1)
      }
      require(w > 0 && h > 0 && declared >= 0, "missing avih header")
      require(moviStart >= 0 && frames.nonEmpty, "missing movi data")
      // index audit: every entry must name a chunk where it says it is
      val idxOk = idx != null && idx.length == frames.length &&
        idx.zipWithIndex.forall { case ((off, csz), k) =>
          val c = moviStart + off
          tag(c) == "00dc" && le32(c + 4) == csz && csz == frames(k).length
        }
      (w, h, declared, frames.toArray, idxOk)
    }

    // ── GIF89a: 256-gray global palette + REAL variable-width LZW ──
    // The palette-indexed sibling of the PNG/JPEG truecolor pair: one
    // index byte per pixel, compressed with the spec's LZW (9→12-bit
    // codes, late width change, clear/EOI, 255-byte sub-blocks, KwKwK).
    // Reference seed for the modality surface: liq-stream stores no
    // media, so the codec scope is driver-mandated (SURVEY §2.6).

    /** Encode a grayscale GIF89a: `idx` holds one palette index (= gray
      * level) per pixel, row-major. */
    def encodeGif(w: Int, h: Int, idx: Array[Byte]): Array[Byte] = {
      require(idx.length == w * h, "pixel count mismatch")
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("GIF89a".getBytes(Ascii))
      le16(w); le16(h)
      out.write(0xF7); out.write(0); out.write(0) // global table, 256 entries
      var i = 0
      while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
      out.write(0x2C); le16(0); le16(0); le16(w); le16(h); out.write(0)
      out.write(8) // LZW min code size
      // LZW, LSB-first bit packing
      val lzw = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nbits = 0
      def put(code: Int, width: Int): Unit = {
        acc |= code.toLong << nbits; nbits += width
        while (nbits >= 8) { lzw.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
      }
      val Clear = 256; val Eoi = 257
      var width = 9; var next = 258
      val dict = new java.util.HashMap[Integer, Integer]()
      put(Clear, width)
      var cur = idx(0) & 0xff
      i = 1
      while (i < idx.length) {
        val b = idx(i) & 0xff
        val key = (cur << 8) | b
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          put(cur, width)
          if (next < 4096) {
            dict.put(key, next); next += 1
            // late change, one step after the decoder's (its table lags
            // this one by exactly one code — see the KwKwK asymmetry)
            if (next == (1 << width) + 1 && width < 12) width += 1
          } else {
            put(Clear, width)
            dict.clear(); next = 258; width = 9
          }
          cur = b
        }
        i += 1
      }
      put(cur, width); put(Eoi, width)
      if (nbits > 0) lzw.write((acc & 0xff).toInt)
      // 255-byte data sub-blocks
      val bytes = lzw.toByteArray
      var o = 0
      while (o < bytes.length) {
        val n = math.min(255, bytes.length - o)
        out.write(n); out.write(bytes, o, n); o += n
      }
      out.write(0); out.write(0x3B)
      out.toByteArray
    }

    /** Decode a GIF into (width, height, palette-index bytes). Handles the
      * full single-frame spec surface: global color table, extension
      * blocks (skipped), variable-width LZW with clear/EOI, dictionary
      * reset, and the code==next KwKwK case. Interlace and local color
      * tables are rejected loudly (the FLAC contract: wrong is worse than
      * absent). */
    def decodeGif(b: Array[Byte]): (Int, Int, Array[Byte]) = {
      def u16(o: Int): Int = (b(o) & 0xff) | (b(o + 1) & 0xff) << 8
      require(b.length > 13 && new String(b, 0, 3, Ascii) == "GIF", "not a GIF")
      var o = 6
      val sw = u16(o); val sh = u16(o + 2)
      val packed = b(o + 4) & 0xff
      o += 7
      if ((packed & 0x80) != 0) o += 3 * (1 << ((packed & 7) + 1)) // global table
      // skip extensions until the image descriptor
      while ((b(o) & 0xff) == 0x21) {
        o += 2 // introducer + label
        while ((b(o) & 0xff) != 0) o += 1 + (b(o) & 0xff)
        o += 1
      }
      require((b(o) & 0xff) == 0x2C, "missing image descriptor")
      val w = u16(o + 5); val h = u16(o + 7)
      val ipacked = b(o + 9) & 0xff
      require((ipacked & 0x80) == 0, "local color tables unsupported")
      val interlaced = (ipacked & 0x40) != 0
      o += 10
      val minCode = b(o) & 0xff; o += 1
      // concatenate sub-blocks
      val data = new java.io.ByteArrayOutputStream()
      while ((b(o) & 0xff) != 0) {
        val n = b(o) & 0xff
        data.write(b, o + 1, n); o += 1 + n
      }
      val d = data.toByteArray
      // LZW decode, LSB-first
      val Clear = 1 << minCode; val Eoi = Clear + 1
      var width = minCode + 1; var next = Eoi + 1
      val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
      var bitPos = 0
      def read(): Int = {
        var v = 0; var got = 0
        while (got < width) {
          require(bitPos / 8 < d.length, "truncated LZW stream")
          val avail = 8 - (bitPos % 8)
          val take = math.min(width - got, avail)
          val bits = (d(bitPos / 8) >> (bitPos % 8)) & ((1 << take) - 1)
          v |= bits << got; got += take; bitPos += take
        }
        v
      }
      val outPix = new java.io.ByteArrayOutputStream(w * h)
      def emit(code: Int): Byte = { // writes the code's string, returns its first byte
        var stack = List.empty[Byte]
        var c = code
        while (c >= Clear) { stack = suffix(c) :: stack; c = prefix(c) }
        val first = c.toByte
        outPix.write(c)
        stack.foreach(x => outPix.write(x & 0xff))
        first
      }
      var prev = -1
      var done = false
      while (!done) {
        val code = read()
        if (code == Eoi) done = true
        else if (code == Clear) { next = Eoi + 1; width = minCode + 1; prev = -1 }
        else if (prev < 0) { emit(code); prev = code }
        else {
          require(code <= next, s"corrupt LZW code $code (next=$next)")
          val first =
            if (code == next) { // KwKwK: encoder used the entry it just made
              var c = prev
              while (c >= Clear) c = prefix(c)
              val f = c.toByte
              if (next < 4096) { prefix(next) = prev; suffix(next) = f; next += 1
                if (next == (1 << width) && width < 12) width += 1 }
              emit(code); f
            } else {
              val f = emit(code)
              if (next < 4096) { prefix(next) = prev; suffix(next) = f; next += 1
                if (next == (1 << width) && width < 12) width += 1 }
              f
            }
          val _ = first
          prev = code
        }
      }
      require(outPix.size == w * h,
        s"decoded ${outPix.size} pixels, expected ${w * h}")
      require(w == sw && h == sh, "frame/screen dimension mismatch")
      val raw = outPix.toByteArray
      // GIF interlace: rows arrive in 4 passes (0,8,16… / 4,12… / 2,6,10…
      // / 1,3,5…) — reorder back to top-to-bottom
      val pix =
        if (!interlaced) raw
        else {
          val outArr = new Array[Byte](raw.length)
          val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
          var src = 0
          passes.foreach { case (start, step) =>
            var y = start
            while (y < h) {
              System.arraycopy(raw, src * w, outArr, y * w, w)
              src += 1; y += step
            }
          }
          outArr
        }
      (w, h, pix)
    }
  }

  /** Per-asset image channel stats. */
  final case class PixelStatsRow(
      media_id: Long,
      width: Int,
      height: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** Per-asset audio amplitude stats. */
  final case class AudioStatsRow(
      media_id: Long,
      n_samples: Long,
      peak: Long,
      mean_amp: Double,
      rms: Double)

  /** Decimate-by-2 resample output: in/out sizes + stats over the decoded
    * HALF-RATE round-trip. */
  final case class AudioResampleRow(
      media_id: Long,
      n_in: Long,
      n_out: Long,
      rate_out: Int,
      mean_out: Double,
      peak_out: Long)

  /** Partition-local batched decode: the mapInPandas-shaped stage. Batching
    * (here 64 rows) is where a heavier codec amortizes context setup. */
  def decodeAll(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one decoder context per batch in a heavier codec
        batch.iterator.map(Codec.decode)
      }
    }
  }

  /** The documents table as a media corpus: each doc becomes a real
    * container payload (PPM / WAV / Y4M by doc_id mod 3) with typed
    * metadata. Synthesis is a partition-local typed map — binary-column
    * plumbing end-to-end. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRow(id, kind, Codec.encode(kind, id, text), source)
      }
  }

  /** Driver-checked query: binary metadata extraction — payload size and
    * content digest straight off the binary column (pure Catalyst, pushdown-
    * friendly). The decode stage itself is covered by LlmOpsSpec. */
  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        octet_length(encode(col("text"), "utf-8")).cast(LongType).as("n_bytes"),
        sha2(col("text"), 256).as("sha"))
      .orderBy("doc_id")

  /** Driver-checked decode: documents → real container payloads → batched
    * partition-local decode. The oracle re-derives every output column
    * arithmetically from the source text (header lengths included), so the
    * decoder's header parse and content offsets are what is being
    * hash-checked. */
  def mmDecode(spark: SparkSession, dir: String): DataFrame =
    decodeAll(mediaFromDocuments(spark, dir)).toDF().orderBy("media_id")

  /** Image feature extraction — per-channel means over the DECODED raster
    * (the feature-extract verb for the image modality): the PPM header is
    * parsed for real and the RGB triples summed channel-wise. Integer sums
    * with one final double division keep the DuckDB twin — which re-derives
    * the cyclic text-byte raster arithmetically — bit-for-bit. */
  def mmPixelStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val images = mediaFromDocuments(spark, dir).filter(_.kind == "image")
    images.mapPartitions { it =>
      it.map { r =>
        val b = r.payload
        val (w, h, off) = Codec.ppmHeader(b)
        val np = w * h
        val sums = new Array[Long](3)
        var p = 0
        while (p < np * 3) {
          sums(p % 3) += b(off + p) & 0xff
          p += 1
        }
        def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
        PixelStatsRow(r.media_id, w, h,
          r4(sums(0).toDouble / np), r4(sums(1).toDouble / np),
          r4(sums(2).toDouble / np))
      }
    }.toDF().orderBy("media_id")
  }

  final case class LumaHistRow(media_id: Long, bin: Int, cnt: Long)

  /** LUMINANCE HISTOGRAM — per image, the 8-bin brightness profile over
    * the decoded raster (luma = (r+g+b) div 3, bin = luma div 32): the
    * exposure/contrast screen an image-curation pass runs to drop
    * all-black thumbnails and blown-out scans before any model sees
    * them. Division-free integer binning (the mm_imgdup grayscale
    * convention) so the DuckDB twin replays the exact counts off the
    * synthesized pixel stream; only occupied bins emit (long-thin,
    * explode-free — one row per (asset, bin) from a partition-local
    * decode, aggregate-free like every codec stage). */
  def mmLumaHist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val images = mediaFromDocuments(spark, dir).filter(_.kind == "image")
    images.mapPartitions { it =>
      it.flatMap { r =>
        val b = r.payload
        val (w, h, off) = Codec.ppmHeader(b)
        val np = w * h
        val bins = new Array[Long](8)
        var p = 0
        while (p < np) {
          val luma = ((b(off + 3 * p) & 0xff) + (b(off + 3 * p + 1) & 0xff) +
            (b(off + 3 * p + 2) & 0xff)) / 3
          bins(luma / 32) += 1L
          p += 1
        }
        bins.zipWithIndex.collect {
          case (c, i) if c > 0L => LumaHistRow(r.media_id, i, c)
        }
      }
    }.toDF().orderBy("media_id", "bin")
  }

  /** Audio feature extraction — amplitude stats over the DECODED sample
    * values (the feature-extract verb for the audio modality): peak,
    * mean amplitude, RMS from the 16-bit PCM data chunk. Partition-local
    * typed map like the decode stage; all arithmetic stays in exact-integer
    * double range (sum of squares ≤ 549·2^30 < 2^53) and sqrt is IEEE
    * correctly-rounded, so the DuckDB twin — which re-derives the cyclic
    * text-byte samples arithmetically — matches bit-for-bit. */
  def mmAudioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val audio = mediaFromDocuments(spark, dir).filter(_.kind == "audio")
    audio.mapPartitions { it =>
      it.map { r =>
        val s = Codec.wavSamples(r.payload)
        val n = s.length
        var sum = 0L; var sumSq = 0L; var peak = 0L
        var k = 0
        while (k < n) {
          val v = s(k)
          sum += v
          sumSq += v.toLong * v
          if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
          k += 1
        }
        def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
        AudioStatsRow(r.media_id, n.toLong, peak,
          r4(sum.toDouble / n), r4(math.sqrt(sumSq.toDouble / n)))
      }
    }.toDF().orderBy("media_id")
  }

  /** SAMPLE-RATE CONVERSION — decimate each audio asset by 2 with a
    * pairwise-mean anti-alias box (floor((s₂ₖ+s₂ₖ₊₁)/2), exact integer
    * arithmetic both engines replay), RE-ENCODE the half-rate stream as a
    * real WAV, decode again, and report stats over the round-tripped
    * samples — so the op proves the full resample→container→decode chain,
    * not just the arithmetic. The training-pipeline move this models:
    * normalizing a mixed-rate audio corpus to one rate before feature
    * extraction. Partition-local like every codec stage; output rows are
    * O(assets). */
  def mmAudioResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val audio = mediaFromDocuments(spark, dir).filter(_.kind == "audio")
    audio.mapPartitions { it =>
      it.map { r =>
        val s = Codec.wavSamples(r.payload)
        val half = Array.tabulate(s.length / 2) { k =>
          // floorDiv: exact for negative sums too (synthesized samples
          // are positive, but the op contract is any 16-bit PCM)
          Math.floorDiv(s(2 * k) + s(2 * k + 1), 2)
        }
        val wav = Codec.encodeWav(4000, {
          val bytes = new Array[Byte](2 * half.length)
          var k = 0
          while (k < half.length) {
            bytes(2 * k) = (half(k) & 0xff).toByte
            bytes(2 * k + 1) = ((half(k) >> 8) & 0xff).toByte
            k += 1
          }
          bytes
        })
        val back = Codec.wavSamples(wav)
        var sum = 0L; var peak = 0L
        var k = 0
        while (k < back.length) {
          sum += back(k)
          if (math.abs(back(k).toLong) > peak) peak = math.abs(back(k).toLong)
          k += 1
        }
        def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
        AudioResampleRow(r.media_id, s.length.toLong, back.length.toLong,
          4000, r4(sum.toDouble / back.length), peak)
      }
    }.toDF().orderBy("media_id")
  }

  /** Per-asset fixed-bin spectral feature row (energies are 4·|DFT|²). */
  final case class SpectralRow(media_id: Long, n_samples: Long,
      e4_f6: Long, e4_f4: Long, e4_f3: Long, dom_div: Long)

  /** FREQUENCY-DOMAIN audio feature — the spectral axis [[mmAudioStats]]'s
    * time-domain stats can't see (two signals with identical RMS but
    * different tonal content): DFT energy at three fixed analysis bins
    * (fs/6, fs/4, fs/3 — 1333/2000/2667 Hz at the 8 kHz synth rate) plus
    * the dominant bin label, the cheap tonality feature an audio-quality
    * curation pass keys on. The bins are chosen so the whole computation
    * is INTEGER-exact ([[Codec.spectralEnergies4]]) — no FFT library, no
    * cos() drift between engines, and the DuckDB twin replays the exact
    * weights relationally. Same partition-local decode shape as the other
    * feature extractors: cost O(n_samples) per asset, no shuffle before
    * the final order. A production band-energy sweep generalizes this to
    * Goertzel at arbitrary bins (O(n) per bin, still FFT-free); the
    * integer-bin subset is what keeps the cross-engine oracle exact.
    * CodecPropertySpec drives a synthesized pure fs/4 tone into the op and
    * asserts all its energy lands in the fs/4 bin (the orthogonal bins
    * read exactly zero over whole periods). */
  def mmSpectral(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val audio = mediaFromDocuments(spark, dir).filter(_.kind == "audio")
    audio.mapPartitions { it =>
      it.map { r =>
        val s = Codec.wavSamples(r.payload)
        val (e6, e4, e3) = Codec.spectralEnergies4(s)
        val dom = if (e6 >= e4 && e6 >= e3) 6L else if (e4 >= e3) 4L else 3L
        SpectralRow(r.media_id, s.length.toLong, e6, e4, e3, dom)
      }
    }.toDF().orderBy("media_id")
  }

  final case class MuLawRow(media_id: Long, n_samples: Long, code_sum: Long,
      sum_abs_err: Long, max_abs_err: Long)

  /** G.711 µ-LAW TRANSCODE audit — 16-bit PCM → 8-bit µ-law → back, per
    * audio asset: the telephony/archival companding codec as an exact
    * integer pipeline ([[Codec.muLawEncode]]/[[Codec.muLawDecode]] — no
    * float anywhere, so the DuckDB twin replays code and reconstruction
    * bit-for-bit inside list lambdas). Emits the wire-code checksum (the
    * ENCODER is oracle-pinned, not just the round trip) and the absolute
    * reconstruction-error mass/peak — the "is 2× compression worth the
    * noise floor" readout an audio-curation pass keys on. Same
    * partition-local decode shape as every codec stage: O(n_samples) per
    * asset, no shuffle before the final order. */
  def mmMuLaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val audio = mediaFromDocuments(spark, dir).filter(_.kind == "audio")
    audio.mapPartitions { it =>
      it.map { r =>
        val s = Codec.wavSamples(r.payload)
        var cs = 0L; var se = 0L; var me = 0L
        var k = 0
        while (k < s.length) {
          val c = Codec.muLawEncode(s(k))
          val e = math.abs(Codec.muLawDecode(c) - s(k)).toLong
          cs += c; se += e; if (e > me) me = e
          k += 1
        }
        MuLawRow(r.media_id, s.length.toLong, cs, se, me)
      }
    }.toDF().orderBy("media_id")
  }

  final case class VadRow(media_id: Long, n_frames: Long, n_active: Long,
      n_segments: Long, e_total: Long)

  /** VOICE-ACTIVITY DETECTION (energy-gated) — the segmentation pass an
    * audio-curation pipeline runs before transcription/feature work:
    * slice each asset into 50-sample frames, mark a frame ACTIVE when its
    * energy exceeds ¼ of the asset's mean frame energy, and report frame/
    * activity/segment counts (a segment = a maximal run of active
    * frames). The threshold test is cross-multiplied into exact BIGINTs
    * (4·E_f·n_frames > E_total — no division, no float), so the DuckDB
    * twin replays frame energies, gating, and run starts inside list
    * lambdas bit-for-bit. Same partition-local decode shape as the other
    * codec stages; output rows are O(assets). */
  def mmVad(spark: SparkSession, dir: String, frame: Int = 50): DataFrame = {
    import spark.implicits._
    val audio = mediaFromDocuments(spark, dir).filter(_.kind == "audio")
    audio.mapPartitions { it =>
      it.map { r =>
        val s = Codec.wavSamples(r.payload)
        val nf = s.length / frame
        val e = Array.tabulate(nf) { f =>
          var acc = 0L; var j = 0
          while (j < frame) {
            val v = s(f * frame + j).toLong; acc += v * v; j += 1
          }
          acc
        }
        val etot = e.sum
        var act = 0L; var seg = 0L; var prev = false
        var f = 0
        while (f < nf) {
          val a = 4L * e(f) * nf > etot
          if (a) { act += 1; if (!prev) seg += 1 }
          prev = a
          f += 1
        }
        VadRow(r.media_id, nf.toLong, act, seg, etot)
      }
    }.toDF().orderBy("media_id")
  }

  /** Frame sampling — every k-th frame index of each video asset (the
    * mapInPandas-shaped stage a video pipeline runs before per-frame
    * featurization). Pure Catalyst on top of the decode output: an explode
    * of `sequence(0, n_frames-1, k)` — the generate stays map-side, no
    * shuffle until a downstream agg. */
  def mmFrameSample(spark: SparkSession, dir: String, every: Int = 2): DataFrame =
    decodeAll(mediaFromDocuments(spark, dir)).toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast(LongType).as("frame_idx"))
      .orderBy("media_id", "frame_idx")

  /** Resize planning — fit each visual asset (image or video frame) into a
    * 224×224 box preserving aspect ratio (the preprocessing step in front
    * of any vision encoder). Double arithmetic only, so DuckDB reproduces
    * it bit-for-bit. Audio has no spatial dims and is excluded. */
  def mmResize(spark: SparkSession, dir: String, box: Int = 224): DataFrame =
    decodeAll(mediaFromDocuments(spark, dir)).toDF()
      .filter(col("kind") =!= "audio")
      .select(col("media_id"), col("width"), col("height"),
        least(lit(box.toDouble) / col("width"),
          lit(box.toDouble) / col("height")).as("scale"))
      .select(col("media_id"), col("width"), col("height"),
        greatest(floor(col("width") * col("scale")), lit(1.0))
          .cast(LongType).as("out_w"),
        greatest(floor(col("height") * col("scale")), lit(1.0))
          .cast(LongType).as("out_h"))
      .orderBy("media_id")

  /** PNG round-trip output: dims + channel means over the DECODED raster,
    * plus the measured (not assumed) losslessness of the round-trip. */
  final case class PngRow(
      media_id: Long,
      width: Int,
      height: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double,
      lossless: Boolean)

  /** Per-(asset, crop) augmentation stats. */
  final case class CropRow(
      media_id: Long, crop: Int, cw: Int, ch: Int, mean_r: Double)

  /** GIF round-trip output: palette-index stats + losslessness. */
  final case class GifRow(
      media_id: Long,
      width: Int,
      height: Int,
      mean_idx: Double,
      lossless: Boolean)

  /** JPEG round-trip output: decoder-independent fields only (dims survive
    * lossy coding; pixel values are encoder-dependent → spec, not oracle). */
  final case class JpegRow(
      media_id: Long,
      width: Int,
      height: Int)

  /** Compressed-image round-trip, PNG: each image asset's RGB raster is
    * encoded to a real PNG (DEFLATE, via the JDK's ImageIO — no external
    * dependency) and decoded back, and the channel means are computed over
    * the DECODED raster. PNG is lossless, so the oracle is the same
    * arithmetic twin as `mm_pixel_stats`: a hash match proves the
    * compressed encode→decode chain reproduced every raster byte. The
    * `lossless` column is measured by comparing the decoded bytes to the
    * source raster, never assumed. Partition-local like every decode
    * stage; the codec context costs nothing per row beyond the DEFLATE
    * work itself (stream cache disabled at Codec init). */
  /** FIVE-CROP AUGMENTATION PLAN — the deterministic spatial-augmentation
    * pass a vision training pipeline runs (four corners + center at half
    * resolution), with per-crop channel means as the audit output: crops
    * are computed from the decoded raster partition-locally (no pixel
    * ever shuffles; output is O(assets × 5) rows) and the oracle replays
    * the crop-window arithmetic relationally from the source text, so a
    * wrong offset or stride breaks the hash. Deterministic crops (not
    * random) are the reproducibility contract the rest of the corpus ops
    * keep: re-runs yield identical augmented sets. */
  def mmCrops(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    mediaFromDocuments(spark, dir)
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.flatMap { r =>
          val (w, h, rgb) = Codec.rgbFromPpm(r.payload)
          val cw = math.max(w / 2, 1); val ch = math.max(h / 2, 1)
          val pos = Array(
            (0, 0), (w - cw, 0), (0, h - ch), (w - cw, h - ch),
            ((w - cw) / 2, (h - ch) / 2))
          pos.iterator.zipWithIndex.map { case ((x0, y0), ci) =>
            var sum = 0L
            var k = 0
            while (k < cw * ch) {
              val px = (y0 + k / cw) * w + (x0 + k % cw)
              sum += rgb(3 * px) & 0xff // R channel
              k += 1
            }
            CropRow(r.media_id, ci, cw, ch, r4(sum.toDouble / (cw * ch)))
          }
        }
      }.toDF().orderBy("media_id", "crop")
  }

  /** GIF round-trip over the documents-as-media corpus: synthesize each
    * image doc's pixels as palette indices straight from its text (the
    * PNG channel-cycling convention, single channel), encode with the
    * REAL LZW ([[Codec.encodeGif]]), decode back, and report dims + mean
    * index + byte-exact losslessness. Same partition-local batched-decode
    * shape as every codec op — the corpus never leaves its partition; the
    * oracle replays the index arithmetic relationally from the text.
    * CodecPropertySpec stresses the LZW edge cases the corpus may not hit
    * (KwKwK, dictionary reset past 4096 codes) and cross-validates the
    * encoder against the JDK's independent ImageIO GIF reader. */
  def mmGifRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .filter(_._1 % 3 == 0)
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val len = text.length
          val w = (len % 14) + 5
          val h = (id % 10).toInt + 4
          val np = w * h
          val idx = Array.tabulate[Byte](np)(p => text.charAt(p % len).toByte)
          val gif = Codec.encodeGif(w, h, idx)
          val (w2, h2, back) = Codec.decodeGif(gif)
          var sm = 0L
          var p = 0
          while (p < back.length) { sm += back(p) & 0xff; p += 1 }
          GifRow(id, w2, h2, r4(sm.toDouble / np),
            lossless = w2 == w && h2 == h &&
              java.util.Arrays.equals(back, idx))
        }
      }.toDF().orderBy("media_id")
  }

  def mmPngRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    mediaFromDocuments(spark, dir)
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, rgb) = Codec.rgbFromPpm(r.payload)
          val png = Codec.encodePng(w, h, rgb)
          val (w2, h2, back) = Codec.decodeImage(png)
          val np = w2 * h2
          val sums = new Array[Long](3)
          var p = 0
          while (p < np * 3) { sums(p % 3) += back(p) & 0xff; p += 1 }
          PngRow(r.media_id, w2, h2,
            r4(sums(0).toDouble / np), r4(sums(1).toDouble / np),
            r4(sums(2).toDouble / np),
            lossless = w2 == w && h2 == h && java.util.Arrays.equals(back, rgb))
        }
      }.toDF().orderBy("media_id")
  }

  /** One image's perceptual fingerprint, split into two non-negative
    * 32-bit halves so the 64th bit can never overflow a signed BIGINT in
    * either engine. */
  final case class AHashRow(media_id: Long, hash_hi: Long, hash_lo: Long)

  /** PERCEPTUAL image fingerprint — average-hash (aHash, the integer
    * member of the pHash family): nearest-neighbor-sample the decoded
    * raster's integer grayscale onto an 8×8 grid, then one bit per cell —
    * "brighter than the grid mean" — packed into 64 bits. Visually
    * similar images (crops, small edits, re-encodes) agree on most bits,
    * so near-duplicate detection becomes Hamming distance on 8-byte
    * fingerprints instead of pixel comparison — the image-modality
    * completion of the dedup family (text MinHash/SimHash, vector LSH).
    * aHash over DCT-based pHash ON PURPOSE: every step is integer
    * arithmetic ((r+g+b) div 3, integer grid sampling, g·64 > Σg — the
    * division-free mean compare), so the DuckDB oracle replays the whole
    * pipeline bit-for-bit where a float DCT would drift in the last ulp.
    * Decode is the usual batched partition-local seam; downstream,
    * candidate pairing reuses the SimHash banding shape (LlmOpsSpec locks
    * banded candidates == brute-force Hamming pairs — never all-pairs at
    * scale). */
  def mmImageHashes(spark: SparkSession, dir: String): Dataset[AHashRow] = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, rgb) = Codec.rgbFromPpm(r.payload)
          val g = new Array[Long](64)
          var tot = 0L
          var i = 0
          while (i < 8) {
            var j = 0
            while (j < 8) {
              // center-of-cell nearest sample: valid for any w,h >= 1
              val y = ((2 * i + 1) * h) / 16
              val x = ((2 * j + 1) * w) / 16
              val p = (y * w + x) * 3
              val gray = ((rgb(p) & 0xff) + (rgb(p + 1) & 0xff) +
                (rgb(p + 2) & 0xff)) / 3
              g(i * 8 + j) = gray
              tot += gray
              j += 1
            }
            i += 1
          }
          var hi = 0L
          var lo = 0L
          var k = 0
          while (k < 64) {
            if (g(k) * 64L > tot) {
              if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
            }
            k += 1
          }
          AHashRow(r.media_id, hi, lo)
        }
      }
  }

  def mmImageDedup(spark: SparkSession, dir: String): DataFrame =
    mmImageHashes(spark, dir).toDF().orderBy("media_id")

  /** Banded near-dup candidate pairs over [[mmImageHashes]] — the SimHash
    * move on the image fingerprint: four 16-bit bands; a pair is compared
    * only when at least one band matches exactly (any pair within Hamming
    * distance 3 differs in ≤3 bands, so it MUST share one — lossless for
    * the verify threshold), then the in-join Hamming predicate keeps real
    * near-dups. Never all-pairs: the only shuffle is the band-value
    * equality join. */
  private[graft] def imageNearDupPairs(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    val hs = materialize(mmImageHashes(spark, dir).toDF())
    val banded = hs.select(col("media_id"), col("hash_hi"), col("hash_lo"),
      posexplode(array(
        pmod(col("hash_lo"), lit(65536L)),
        pmod(shiftright(col("hash_lo"), 16), lit(65536L)),
        pmod(col("hash_hi"), lit(65536L)),
        pmod(shiftright(col("hash_hi"), 16), lit(65536L)))).as(Seq("band", "v")))
    val a = banded.select(col("media_id").as("a"), col("hash_hi").as("ah"),
      col("hash_lo").as("al"), col("band"), col("v"))
    val b = banded.select(col("media_id").as("b"), col("hash_hi").as("bh"),
      col("hash_lo").as("bl"), col("band"), col("v"))
    a.join(b, Seq("band", "v")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (bit_count(col("ah").bitwiseXOR(col("bh"))) +
          bit_count(col("al").bitwiseXOR(col("bl")))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  /** Compressed-image round-trip, JPEG: encode each raster at quality 0.85
    * and decode back. Only the decoder-independent outputs (container
    * dims) are oracle-checked — decoded pixel values vary by encoder
    * implementation, so the reconstruction-error bound lives in
    * CodecPropertySpec instead, where it can state a tolerance. */
  def mmJpegRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, rgb) = Codec.rgbFromPpm(r.payload)
          val (w2, h2, _) = Codec.decodeImage(Codec.encodeJpeg(w, h, rgb))
          JpegRow(r.media_id, w2, h2)
        }
      }.toDF().orderBy("media_id")
  }

  /** FLAC round-trip output: amplitude stats over the DECODED samples,
    * the exact container size, and the measured losslessness. */
  final case class FlacRow(
      media_id: Long,
      n_samples: Long,
      peak: Long,
      mean_amp: Double,
      rms: Double,
      flac_bytes: Long,
      compressed: Boolean,
      lossless: Boolean)

  /** Compressed-audio round-trip, FLAC: each audio asset's PCM samples
    * run through the COMPRESSING encoder ([[Codec.encodeFlacCompressed]]
    * — per-frame best of verbatim and fixed-predictor+Rice) and are
    * decoded back; amplitude stats run over the DECODED samples. The
    * oracle is the WAV-samples arithmetic twin plus the VERBATIM
    * container-size formula (53 + 2·n, deterministic — wrong layout
    * arithmetic anywhere shows as a hash mismatch); the compressed size
    * is encoder-choice-dependent, so it enters the oracle only as the
    * measured `compressed` constraint (≤ verbatim, guaranteed by the
    * per-frame fallback rule). `lossless` is measured: the decoder
    * verifies frame CRCs and the STREAMINFO MD5, and the row compares
    * decoded samples to the source. */
  def mmFlacRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    mediaFromDocuments(spark, dir)
      .filter(_.kind == "audio")
      .mapPartitions { it =>
        it.map { r =>
          val src = Codec.wavSamples(r.payload)
          val verbatimBytes = Codec.verbatimFlacBytes(src.length)
          val flac = Codec.encodeFlacCompressed(8000, src)
          val (rate, s) = Codec.decodeFlac(flac)
          val n = s.length
          var sum = 0L; var sumSq = 0L; var peak = 0L
          var k = 0
          while (k < n) {
            val v = s(k)
            sum += v; sumSq += v.toLong * v
            if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
            k += 1
          }
          FlacRow(r.media_id, n.toLong, peak,
            r4(sum.toDouble / n), r4(math.sqrt(sumSq.toDouble / n)),
            verbatimBytes,
            compressed = flac.length <= verbatimBytes,
            lossless = rate == 8000 && java.util.Arrays.equals(s, src))
        }
      }.toDF().orderBy("media_id")
  }

  /** MJPEG/AVI round-trip outputs — container-level facts only (decoded
    * pixel values are JPEG-encoder-dependent; the reconstruction bound
    * lives in CodecPropertySpec where it can state a tolerance). */
  final case class AviRow(
      media_id: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      idx_ok: Boolean,
      dims_ok: Boolean)

  /** Compressed-video round-trip, MJPEG-in-AVI: each Y4M asset's frames
    * re-encode as real DCT JPEGs (grayscale from the Y plane), mux into a
    * standard AVI container ([[Codec.encodeAvi]]), demux, and decode each
    * frame back. Oracle-checked columns are the decoder-independent
    * container facts — dims and frame count re-derived arithmetically
    * from the source document by the DuckDB twin, plus the measured idx1
    * consistency and per-frame dimension agreement. Batched partition-
    * local decode like every codec stage: embarrassingly parallel, no
    * shuffle before the presentation sort. */
  def mmAviRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter(_.kind == "video")
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, ys) = Codec.y4mFrames(r.payload)
          val jpegs = ys.map { y =>
            val rgb = new Array[Byte](y.length * 3)
            var i = 0
            while (i < y.length) {
              rgb(3 * i) = y(i); rgb(3 * i + 1) = y(i); rgb(3 * i + 2) = y(i)
              i += 1
            }
            Codec.encodeJpeg(w, h, rgb)
          }
          val (w2, h2, declared, back, idxOk) =
            Codec.decodeAvi(Codec.encodeAvi(w, h, 25, jpegs.toSeq))
          val dimsOk = back.forall { jb =>
            val (jw, jh, _) = Codec.decodeImage(jb)
            jw == w && jh == h
          }
          AviRow(r.media_id, w2.toLong, h2.toLong, back.length.toLong,
            idx_ok = idxOk && declared == back.length,
            dims_ok = dimsOk)
        }
      }.toDF().orderBy("media_id")
  }

  /** One frame-to-frame luminance delta. */
  final case class CutRow(
      media_id: Long,
      frame: Int,
      mean_y: Double,
      d: Double,
      is_cut: Boolean)

  /** Scene-cut detection — the video-native feature extractor: decode each
    * Y4M payload's frames, compare consecutive Y-plane means, and flag
    * jumps above the threshold (the shot-boundary heuristic every video
    * curation pipeline runs before sampling training frames). The decode
    * is the REAL container walk ([[Codec.y4mFrameMeans]]); deltas stay
    * per-asset and partition-local, so the stage is embarrassingly
    * parallel — no shuffle until the presentation sort. The cut predicate
    * compares integer-derived doubles built by the identical expression
    * tree in both engines (frame sums are exact int64), so the strict `>`
    * is deterministic even when a delta lands exactly on the threshold.
    * Reported mean/delta are rounded 4 dp like all derived doubles. */
  def mmSceneCuts(spark: SparkSession, dir: String, threshold: Double = 3.0): DataFrame = {
    import spark.implicits._
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    mediaFromDocuments(spark, dir)
      .filter(_.kind == "video")
      .mapPartitions { it =>
        it.flatMap { m =>
          val means = Codec.y4mFrameMeans(m.payload)
          (1 until means.length).iterator.map { f =>
            val d = means(f) - means(f - 1)
            CutRow(m.media_id, f, r4(means(f)), r4(d), math.abs(d) > threshold)
          }
        }
      }
      .toDF()
      .orderBy("media_id", "frame")
  }

  /** The oracle's arithmetic twin of Codec.encode + Codec.decode: dims and
    * sample counts from the same length/id formulas, container byte counts
    * from the header layouts (PPM `P6\n{w} {h}\n255\n` = 9 + digits; WAV
    * canonical header = 44; Y4M header = 33 + digits, frame marker = 6),
    * checksum = poly-31 fold over the text bytes cycled to the content
    * size. ASCII corpus (LlmOpsSpec) makes the char fold equal the byte
    * fold. */
  private val decodeCte: String =
    """m AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               text, length(text) AS len
        FROM documents),
      d AS (
        SELECT media_id, kind, text, len,
               CASE WHEN kind = 'image' THEN (len % 16) + 4
                    WHEN kind = 'video' THEN (len % 8) + 4
                    ELSE 0 END AS width,
               CASE WHEN kind = 'image' THEN (media_id % 12) + 3
                    WHEN kind = 'video' THEN (media_id % 6) + 3
                    ELSE 0 END AS height,
               CASE WHEN kind = 'image' THEN 1
                    WHEN kind = 'video' THEN (media_id % 8) + 2
                    ELSE 0 END AS n_frames,
               CASE WHEN kind = 'audio' THEN 8000 ELSE 0 END AS sample_rate,
               CASE WHEN kind = 'audio' THEN (len % 500) + 50 ELSE 0 END AS n_samples
        FROM m),
      s AS (
        SELECT *, CASE WHEN kind = 'audio' THEN 2 * n_samples
                       ELSE n_frames * width * height * 3 END AS cs
        FROM d),
      dims AS (
        SELECT media_id, kind, width, height, n_frames, sample_rate, n_samples,
               CASE WHEN kind = 'image'
                      THEN 9 + length(width::VARCHAR) + length(height::VARCHAR) + cs
                    WHEN kind = 'audio' THEN 44 + cs
                    ELSE 33 + length(width::VARCHAR) + length(height::VARCHAR)
                         + n_frames * 6 + cs END AS n_bytes,
               list_reduce(list_concat([0::BIGINT],
                 list_transform(range(0, cs),
                   i -> ascii(text[((i % len) + 1):((i % len) + 1)]))),
                 (acc, ch) -> (acc * 31 + ch) % 1000000007) AS checksum
        FROM s)"""

  /** The aHash pipeline as reusable DuckDB CTEs (ends in `ahashes`
    * (media_id, hash_hi, hash_lo)) — shared by the `mm_imgdup` oracle and
    * [[DedupOps]]'s cross-modal fusion oracle. Byte-for-byte the Scala
    * pipeline: cyclic text-byte raster -> (r+g+b)//3 grayscale ->
    * center-of-cell 8x8 nearest sample -> division-free mean compare. */
  private[ops] val duckAHashCtes: String = {
    def byteAt(p: String, c: Int) =
      s"ascii(text[((3*($p) + $c) % len) + 1 : ((3*($p) + $c) % len) + 1])"
    val p = "((((2*(k//8)+1)*h)//16) * w + (((2*(k%8)+1)*w)//16))"
    val gray = s"((${byteAt(p, 0)} + ${byteAt(p, 1)} + ${byteAt(p, 2)}) // 3)"
    s"""m AS (
          SELECT doc_id AS media_id, text, length(text) AS len,
                 (length(text) % 16) + 4 AS w, (doc_id % 12) + 3 AS h
          FROM documents WHERE doc_id % 3 = 0),
        g AS (
          SELECT media_id,
                 list_transform(range(0, 64), k -> $gray) AS gl
          FROM m),
        t AS (SELECT media_id, gl,
                     CAST(list_sum(gl) AS BIGINT) AS tot FROM g),
        ahashes AS (
          SELECT media_id,
                 CAST(list_sum(list_transform(range(32, 64), k ->
                   CASE WHEN gl[k + 1] * 64 > tot
                        THEN (1::BIGINT << (k - 32)) ELSE 0 END)) AS BIGINT)
                   AS hash_hi,
                 CAST(list_sum(list_transform(range(0, 32), k ->
                   CASE WHEN gl[k + 1] * 64 > tot
                        THEN (1::BIGINT << k) ELSE 0 END)) AS BIGINT)
                   AS hash_lo
          FROM t)"""
  }

  val oracles: Map[String, String] = Map(
    // frame f's Y plane is the first w*h bytes of the cyclic text at offset
    // f*w*h*3 — the same synthesis arithmetic as mm_pixel_stats, plus a lag
    // diff per frame; the cut predicate runs on the UNROUNDED delta exactly
    // like the Spark side
    // container facts re-derived from the synthesis arithmetic; the two
    // booleans are the measured structural audits (index + frame dims)
    "mm_avi" ->
      """SELECT doc_id AS media_id,
                (length(text) % 8) + 4 AS width,
                (doc_id % 6) + 3 AS height,
                (doc_id % 8) + 2 AS n_frames,
                TRUE AS idx_ok, TRUE AS dims_ok
         FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""",
    "mm_cuts" ->
      """WITH m AS (
           SELECT doc_id AS media_id, text, length(text) AS len,
                  (length(text) % 8) + 4 AS w, (doc_id % 6) + 3 AS h,
                  (doc_id % 8) + 2 AS frames
           FROM documents WHERE doc_id % 3 = 2),
         fr AS (SELECT media_id, w, h, len, text,
                       unnest(range(0, frames)) AS f FROM m),
         mn AS (
           SELECT media_id, f,
                  list_sum(list_transform(range(0, w*h), p ->
                    ascii(text[(((f*w*h*3 + p) % len) + 1):(((f*w*h*3 + p) % len) + 1)])))::DOUBLE
                    / (w*h) AS my
           FROM fr),
         d AS (
           SELECT media_id, f, my,
                  my - lag(my) OVER (PARTITION BY media_id ORDER BY f) AS dd
           FROM mn)
         SELECT media_id, CAST(f AS INT) AS frame,
                floor(my * 1e4 + 0.5) / 1e4 AS mean_y,
                floor(dd * 1e4 + 0.5) / 1e4 AS d,
                abs(dd) > 3.0 AS is_cut
         FROM d WHERE f >= 1 ORDER BY media_id, frame""",
    "mm_frame_sample" -> s"""
      WITH $decodeCte
      SELECT media_id, unnest(range(0, n_frames, 2)) AS frame_idx
      FROM dims WHERE kind = 'video'
      ORDER BY media_id, frame_idx""",
    "mm_resize" -> s"""
      WITH $decodeCte
      SELECT media_id, width::INT AS width, height::INT AS height,
             greatest(floor(width * least(224.0 / width, 224.0 / height)), 1)::BIGINT AS out_w,
             greatest(floor(height * least(224.0 / width, 224.0 / height)), 1)::BIGINT AS out_h
      FROM dims WHERE kind <> 'audio' ORDER BY media_id""",
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
                sha256(text) AS sha
         FROM documents ORDER BY doc_id""",
    // pixel p's channel c byte is text byte (3p+c) mod len (the raster is
    // the text cycled to w*h*3 bytes)
    // the same synthesized pixel stream, binned by the division-free
    // integer luma; only occupied bins emit
    "mm_luma_hist" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               ((length(text) % 16) + 4) * ((doc_id % 12) + 3) AS np
        FROM documents WHERE doc_id % 3 = 0),
      px AS (
        SELECT media_id,
               unnest(list_transform(range(0, np), p ->
                 (ascii(text[(((3*p) % len) + 1):(((3*p) % len) + 1)]) +
                  ascii(text[(((3*p+1) % len) + 1):(((3*p+1) % len) + 1)]) +
                  ascii(text[(((3*p+2) % len) + 1):(((3*p+2) % len) + 1)]))
                 // 3 // 32)) AS bin
        FROM m)
      SELECT media_id, bin::INT AS bin, count(*) AS cnt
      FROM px GROUP BY 1, 2 ORDER BY media_id, bin""",
    "mm_pixel_stats" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               (length(text) % 16) + 4 AS width,
               (doc_id % 12) + 3 AS height
        FROM documents WHERE doc_id % 3 = 0),
      px AS (SELECT media_id, width, height, text, len,
                    width * height AS np FROM m),
      ch AS (
        SELECT media_id, width, height, np,
               list_sum(list_transform(range(0, np), p ->
                 ascii(text[(((3*p) % len) + 1):(((3*p) % len) + 1)])))::DOUBLE / np AS r0,
               list_sum(list_transform(range(0, np), p ->
                 ascii(text[(((3*p+1) % len) + 1):(((3*p+1) % len) + 1)])))::DOUBLE / np AS g0,
               list_sum(list_transform(range(0, np), p ->
                 ascii(text[(((3*p+2) % len) + 1):(((3*p+2) % len) + 1)])))::DOUBLE / np AS b0
        FROM px)
      SELECT media_id, width::INT AS width, height::INT AS height,
             floor(r0 * 1e4 + 0.5) / 1e4 AS mean_r,
             floor(g0 * 1e4 + 0.5) / 1e4 AS mean_g,
             floor(b0 * 1e4 + 0.5) / 1e4 AS mean_b
      FROM ch ORDER BY media_id""",
    // PNG is lossless: the decoded raster must equal the source raster, so
    // the oracle is the raw-raster arithmetic twin (same as mm_pixel_stats)
    // with lossless pinned TRUE — a decoder that perturbed any byte, or an
    // unmeasured "lossless" claim, hash-mismatches
    // the whole aHash pipeline replayed in integer arithmetic: cyclic
    // text-byte raster → (r+g+b)//3 grayscale → center-of-cell 8x8
    // nearest sample → division-free mean compare → two 32-bit halves
    "mm_imgdup" ->
      s"""WITH $duckAHashCtes
          SELECT media_id, hash_hi, hash_lo
          FROM ahashes ORDER BY media_id""",
    "mm_crops" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               (length(text) % 16) + 4 AS w, (doc_id % 12) + 3 AS h
        FROM documents WHERE doc_id % 3 = 0),
      d AS (SELECT media_id, text, len, w, h,
                   greatest(w // 2, 1) AS cw, greatest(h // 2, 1) AS ch
            FROM m),
      c AS (SELECT d.*, ci,
                   CASE ci WHEN 0 THEN 0 WHEN 1 THEN w - cw WHEN 2 THEN 0
                           WHEN 3 THEN w - cw ELSE (w - cw) // 2 END AS x0,
                   CASE ci WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN h - ch
                           WHEN 3 THEN h - ch ELSE (h - ch) // 2 END AS y0
            FROM d, unnest([0, 1, 2, 3, 4]) AS t(ci))
      SELECT media_id, ci::INT AS crop, cw::INT AS cw, ch::INT AS ch,
             floor(list_sum(list_transform(range(0, cw * ch), k ->
               ascii(text[(((3 * ((y0 + k // cw) * w + x0 + k % cw)) % len) + 1)
                          :(((3 * ((y0 + k // cw) * w + x0 + k % cw)) % len) + 1)])
               ))::DOUBLE / (cw * ch) * 1e4 + 0.5) / 1e4 AS mean_r
      FROM c ORDER BY media_id, crop""",
    "mm_gif" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               (length(text) % 14) + 5 AS width,
               (doc_id % 10) + 4 AS height
        FROM documents WHERE doc_id % 3 = 0),
      px AS (SELECT media_id, width, height, width * height AS np,
                    text, len FROM m)
      SELECT media_id, width::INT AS width, height::INT AS height,
             floor((list_sum(list_transform(range(0, np), p ->
               ascii(text[((p % len) + 1):((p % len) + 1)])))::DOUBLE / np)
               * 1e4 + 0.5) / 1e4 AS mean_idx,
             TRUE AS lossless
      FROM px ORDER BY media_id""",
    "mm_png" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               (length(text) % 16) + 4 AS width,
               (doc_id % 12) + 3 AS height
        FROM documents WHERE doc_id % 3 = 0),
      px AS (SELECT media_id, width, height, text, len,
                    width * height AS np FROM m),
      ch AS (
        SELECT media_id, width, height, np,
               list_sum(list_transform(range(0, np), p ->
                 ascii(text[(((3*p) % len) + 1):(((3*p) % len) + 1)])))::DOUBLE / np AS r0,
               list_sum(list_transform(range(0, np), p ->
                 ascii(text[(((3*p+1) % len) + 1):(((3*p+1) % len) + 1)])))::DOUBLE / np AS g0,
               list_sum(list_transform(range(0, np), p ->
                 ascii(text[(((3*p+2) % len) + 1):(((3*p+2) % len) + 1)])))::DOUBLE / np AS b0
        FROM px)
      SELECT media_id, width::INT AS width, height::INT AS height,
             floor(r0 * 1e4 + 0.5) / 1e4 AS mean_r,
             floor(g0 * 1e4 + 0.5) / 1e4 AS mean_g,
             floor(b0 * 1e4 + 0.5) / 1e4 AS mean_b,
             TRUE AS lossless
      FROM ch ORDER BY media_id""",
    // the same WAV-sample synthesis arithmetic as mm_audio_stats, plus
    // the single-frame FLAC container-size formula (magic 4 + block
    // header 4 + STREAMINFO 34 + frame header 7 + CRC8 1 + subframe
    // header 1 + 2n sample bytes + CRC16 2 = 53 + 2n) and the measured
    // lossless flag pinned TRUE
    "mm_flac" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               (length(text) % 500) + 50 AS n
        FROM documents WHERE doc_id % 3 = 1),
      s AS (
        SELECT media_id, n,
               list_transform(range(0, n), k ->
                 ascii(text[(((2*k) % len) + 1):(((2*k) % len) + 1)]) +
                 ascii(text[(((2*k+1) % len) + 1):(((2*k+1) % len) + 1)]) * 256) AS vals
        FROM m),
      a AS (
        SELECT media_id, n::BIGINT AS n_samples,
               list_max(list_transform(vals, v -> abs(v)))::BIGINT AS peak,
               list_sum(vals)::DOUBLE / n AS mean0,
               sqrt(list_sum(list_transform(vals, v -> v::DOUBLE * v)) / n) AS rms0
        FROM s)
      SELECT media_id, n_samples, peak,
             floor(mean0 * 1e4 + 0.5) / 1e4 AS mean_amp,
             floor(rms0 * 1e4 + 0.5) / 1e4 AS rms,
             (53 + 2 * n_samples)::BIGINT AS flac_bytes,
             TRUE AS compressed,
             TRUE AS lossless
      FROM a ORDER BY media_id""",
    // JPEG: dims survive lossy coding and are decoder-independent
    "mm_jpeg" -> """
      SELECT doc_id AS media_id,
             ((length(text) % 16) + 4)::INT AS width,
             ((doc_id % 12) + 3)::INT AS height
      FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""",
    // the integer DFT weights replayed relationally: 2cos/2sin (over √3
    // where needed) per j mod 6/4/3, energies = A² + 3B² (A² + B² at fs/4)
    "mm_spectral" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               (length(text) % 500) + 50 AS n
        FROM documents WHERE doc_id % 3 = 1),
      s AS (
        SELECT media_id, n,
               list_transform(range(0, n), k ->
                 ascii(text[(((2*k) % len) + 1):(((2*k) % len) + 1)]) +
                 ascii(text[(((2*k+1) % len) + 1):(((2*k+1) % len) + 1)]) * 256) AS vals
        FROM m),
      w AS (
        SELECT media_id, n::BIGINT AS n_samples,
          list_sum(list_transform(range(0, n), k -> vals[k+1] * CASE k%6 WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN -1 WHEN 3 THEN -2 WHEN 4 THEN -1 ELSE 1 END))::BIGINT AS a6,
          list_sum(list_transform(range(0, n), k -> vals[k+1] * CASE k%6 WHEN 1 THEN 1 WHEN 2 THEN 1 WHEN 4 THEN -1 WHEN 5 THEN -1 ELSE 0 END))::BIGINT AS b6,
          list_sum(list_transform(range(0, n), k -> vals[k+1] * CASE k%4 WHEN 0 THEN 2 WHEN 2 THEN -2 ELSE 0 END))::BIGINT AS a4,
          list_sum(list_transform(range(0, n), k -> vals[k+1] * CASE k%4 WHEN 1 THEN 2 WHEN 3 THEN -2 ELSE 0 END))::BIGINT AS b4,
          list_sum(list_transform(range(0, n), k -> vals[k+1] * CASE k%3 WHEN 0 THEN 2 ELSE -1 END))::BIGINT AS a3,
          list_sum(list_transform(range(0, n), k -> vals[k+1] * CASE k%3 WHEN 1 THEN 1 WHEN 2 THEN -1 ELSE 0 END))::BIGINT AS b3
        FROM s),
      e AS (
        SELECT media_id, n_samples,
               (a6*a6 + 3*b6*b6)::BIGINT AS e4_f6,
               (a4*a4 + b4*b4)::BIGINT AS e4_f4,
               (a3*a3 + 3*b3*b3)::BIGINT AS e4_f3
        FROM w)
      SELECT media_id, n_samples, e4_f6, e4_f4, e4_f3,
             (CASE WHEN e4_f6 >= e4_f4 AND e4_f6 >= e4_f3 THEN 6
                   WHEN e4_f4 >= e4_f3 THEN 4 ELSE 3 END)::BIGINT AS dom_div
      FROM e ORDER BY media_id""",
    // sample k of the WAV data chunk is byte pair (2k, 2k+1) of the text
    // cycled to 2n bytes: val = lo + hi*256 (ASCII bytes < 128, so the
    // signed int16 decode is the same value)
    "mm_wav_resample" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               (length(text) % 500) + 50 AS n
        FROM documents WHERE doc_id % 3 = 1),
      s AS (
        SELECT media_id, n,
               list_transform(range(0, n), k ->
                 ascii(text[(((2*k) % len) + 1):(((2*k) % len) + 1)]) +
                 ascii(text[(((2*k+1) % len) + 1):(((2*k+1) % len) + 1)]) * 256) AS vals
        FROM m),
      d AS (
        SELECT media_id, n, n // 2 AS m,
               list_transform(range(0, n // 2), k ->
                 (vals[2*k + 1] + vals[2*k + 2]) // 2) AS dv
        FROM s)
      SELECT media_id, n::BIGINT AS n_in, m::BIGINT AS n_out,
             4000::INT AS rate_out,
             floor(list_sum(dv)::DOUBLE / m * 1e4 + 0.5) / 1e4 AS mean_out,
             list_max(list_transform(dv, v -> abs(v)))::BIGINT AS peak_out
      FROM d ORDER BY media_id""",
    // the µ-law segment/mantissa/complement pipeline replayed inside list
    // lambdas — every step integer, the synthesized samples are positive
    // so the sign branch is never taken (the Scala side stays generic)
    "mm_mulaw" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               (length(text) % 500) + 50 AS n
        FROM documents WHERE doc_id % 3 = 1),
      s AS (
        SELECT media_id, n,
               list_transform(range(0, n), k ->
                 ascii(text[(((2*k) % len) + 1):(((2*k) % len) + 1)]) +
                 ascii(text[(((2*k+1) % len) + 1):(((2*k+1) % len) + 1)]) * 256) AS vals
        FROM m),
      q AS (
        SELECT media_id, n,
               list_transform(vals, v -> struct_pack(
                 v := v,
                 b := least(v, 32635) + 132,
                 e := CASE WHEN least(v, 32635) + 132 < 256 THEN 0
                           WHEN least(v, 32635) + 132 < 512 THEN 1
                           WHEN least(v, 32635) + 132 < 1024 THEN 2
                           WHEN least(v, 32635) + 132 < 2048 THEN 3
                           WHEN least(v, 32635) + 132 < 4096 THEN 4
                           WHEN least(v, 32635) + 132 < 8192 THEN 5
                           WHEN least(v, 32635) + 132 < 16384 THEN 6
                           ELSE 7 END)) AS z
        FROM s),
      r AS (
        SELECT media_id, n,
               list_transform(z, t -> struct_pack(
                 code := 255 - (t.e * 16 + ((t.b >> (t.e + 3)) & 15)),
                 err  := abs((((((t.b >> (t.e + 3)) & 15) * 8) + 132)
                              * (1 << t.e)) - 132 - t.v))) AS w
        FROM q)
      SELECT media_id, n::BIGINT AS n_samples,
             CAST(list_sum(list_transform(w, t -> t.code)) AS BIGINT) AS code_sum,
             CAST(list_sum(list_transform(w, t -> t.err)) AS BIGINT) AS sum_abs_err,
             CAST(list_max(list_transform(w, t -> t.err)) AS BIGINT) AS max_abs_err
      FROM r ORDER BY media_id""",
    // frame energies, the cross-multiplied gate, and run starts replayed
    // in nested list lambdas — all integer
    "mm_vad" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               (length(text) % 500) + 50 AS n
        FROM documents WHERE doc_id % 3 = 1),
      s AS (
        SELECT media_id, n,
               list_transform(range(0, n), k ->
                 ascii(text[(((2*k) % len) + 1):(((2*k) % len) + 1)]) +
                 ascii(text[(((2*k+1) % len) + 1):(((2*k+1) % len) + 1)]) * 256) AS vals
        FROM m),
      e AS (
        SELECT media_id, n // 50 AS nf,
               list_transform(range(0, n // 50), f ->
                 list_sum(list_transform(range(1, 51), j ->
                   CAST(vals[f*50 + j] AS BIGINT) * vals[f*50 + j]))) AS fe
        FROM s),
      a AS (SELECT media_id, nf, fe,
                   CAST(list_sum(fe) AS BIGINT) AS etot FROM e),
      fl AS (
        SELECT media_id, nf, etot,
               list_transform(range(0, nf), f ->
                 CASE WHEN 4 * fe[f+1] * nf > etot THEN 1 ELSE 0 END) AS act
        FROM a)
      SELECT media_id, nf::BIGINT AS n_frames,
             CAST(list_sum(act) AS BIGINT) AS n_active,
             CAST(list_sum(list_transform(range(0, nf), f ->
               CASE WHEN act[f+1] = 1 AND (f = 0 OR act[f] = 0)
                    THEN 1 ELSE 0 END)) AS BIGINT) AS n_segments,
             etot AS e_total
      FROM fl ORDER BY media_id""",
    "mm_audio_stats" -> """
      WITH m AS (
        SELECT doc_id AS media_id, text, length(text) AS len,
               (length(text) % 500) + 50 AS n
        FROM documents WHERE doc_id % 3 = 1),
      s AS (
        SELECT media_id, n,
               list_transform(range(0, n), k ->
                 ascii(text[(((2*k) % len) + 1):(((2*k) % len) + 1)]) +
                 ascii(text[(((2*k+1) % len) + 1):(((2*k+1) % len) + 1)]) * 256) AS vals
        FROM m),
      a AS (
        SELECT media_id, n::BIGINT AS n_samples,
               list_max(list_transform(vals, v -> abs(v)))::BIGINT AS peak,
               list_sum(vals)::DOUBLE / n AS mean0,
               sqrt(list_sum(list_transform(vals, v -> v::DOUBLE * v)) / n) AS rms0
        FROM s)
      SELECT media_id, n_samples, peak,
             floor(mean0 * 1e4 + 0.5) / 1e4 AS mean_amp,
             floor(rms0 * 1e4 + 0.5) / 1e4 AS rms
      FROM a ORDER BY media_id""",
    "mm_decode" -> s"""
      WITH $decodeCte
      SELECT media_id, kind, n_bytes::BIGINT AS n_bytes,
             width::INT AS width, height::INT AS height,
             n_frames::INT AS n_frames, sample_rate::INT AS sample_rate,
             n_samples::BIGINT AS n_samples, checksum
      FROM dims ORDER BY media_id""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> mmBinaryMeta _,
    "mm_decode" -> mmDecode _,
    "mm_audio_stats" -> mmAudioStats _,
    "mm_mulaw" -> mmMuLaw _,
    "mm_vad" -> ((s, d) => mmVad(s, d)),
    "mm_luma_hist" -> mmLumaHist _,
    "mm_wav_resample" -> mmAudioResample _,
    "mm_spectral" -> mmSpectral _,
    "mm_pixel_stats" -> mmPixelStats _,
    "mm_frame_sample" -> ((s, d) => mmFrameSample(s, d)),
    "mm_resize" -> ((s, d) => mmResize(s, d)),
    "mm_cuts" -> ((s, d) => mmSceneCuts(s, d)),
    "mm_avi" -> mmAviRoundtrip _,
    "mm_png" -> mmPngRoundtrip _,
    "mm_gif" -> mmGifRoundtrip _,
    "mm_crops" -> mmCrops _,
    "mm_imgdup" -> mmImageDedup _,
    "mm_jpeg" -> mmJpegRoundtrip _,
    "mm_flac" -> mmFlacRoundtrip _,
  )
}
