package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `binary` payloads with typed metadata, and decode/feature-extract
  * runs as a batched per-partition pass (the Scala analogue of a Pandas UDF
  * over `mapInPandas`: executors pull fixed-size batches, run the codec, and
  * emit a typed row per asset).
  *
  * Two trivial formats are decoded FOR REAL in pure JVM code — RIFF/WAVE
  * PCM16 audio (full header-chunk walk + sample scan) and binary PPM (P6)
  * images — so the family is end-to-end genuine for those mimes: q54
  * synthesizes a PCM waveform from each document, runs it through the
  * actual byte-level decoder, and oracle-checks the extracted features.
  * Payloads with no in-container codec (arbitrary mimes) fall back to a
  * deterministic per-chunk digest so the batching/schema/distribution
  * contract stays exercised for them too.
  */
object Multimodal {

  /** An opaque media asset: payload plus the typed metadata a binary-asset
    * table carries at scale (content-addressed id, mime, declared length). */
  final case class MediaBlob(doc_id: Long, mime: String, payload: Array[Byte])

  /** Features extracted per asset. `frames` carries decoded content at
    * fixed per-asset width: per-block peak amplitudes for audio, header
    * fields + per-row maxima for images, chunk digests for opaque mimes. */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int, checksum: String,
      frames: Array[Int])

  /** Typed features of a decoded PCM waveform — every field is exact
    * integer arithmetic over the decoded header + samples, which is what
    * makes q54 oracle-checkable. */
  final case class WavFeatures(
      doc_id: Long, sample_rate: Long, n_samples: Long, duration_ms: Long,
      peak_amplitude: Long)

  /** Batch size mirrors a Pandas-UDF arrow batch: bounded memory per task
    * regardless of partition size. */
  val DefaultBatchSize = 64

  // ---------------------------------------------------------------- WAV --

  /** Encode mono PCM16 samples as a RIFF/WAVE byte stream (44-byte header +
    * little-endian samples) — the fixture side of the audio path. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** REAL WAV decode: walk the RIFF chunk list (not a fixed 44-byte
    * assumption — encoders may interleave LIST/fact chunks), validate
    * PCM16 mono, and return (sampleRate, samples). Throws on anything that
    * is not a well-formed PCM16 mono WAVE — a codec's contract. */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 12, s"WAV too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII") }
    require(tag() == "RIFF", "missing RIFF magic")
    buf.getInt // declared riff size; trust the actual buffer instead
    require(tag() == "WAVE", "missing WAVE form type")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = tag()
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(),
        s"bad chunk length $len in '$id' (remaining ${buf.remaining()})")
      val next = buf.position() + len + (len & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          // The generic length guard above only checks len against the
          // buffer; the 16 bytes of PCM fields read below must also be
          // DECLARED by the chunk, or a short fmt chunk would silently
          // read the next chunk's bytes (len >= 16 but truncated buffers
          // are already rejected by the guard above).
          require(len >= 16, s"fmt chunk too short: $len")
          val audioFormat = buf.getShort
          val channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          val bits = buf.getShort
          require(audioFormat == 1, s"not PCM: format $audioFormat")
          require(channels == 1, s"not mono: $channels channels")
          require(bits == 16, s"not 16-bit: $bits")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt")
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ => // skip LIST/fact/other chunks
      }
      buf.position(math.min(next, buf.limit()))
    }
    require(sampleRate > 0 && samples != null, "missing fmt or data chunk")
    (sampleRate, samples)
  }

  // ---------------------------------------------------------------- PPM --

  /** Encode an RGB image as binary PPM (P6): ASCII header, raw RGB bytes. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length != w*h*3")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  /** REAL PPM (P6) decode: parse the ASCII header (magic, whitespace,
    * `#` comments, width/height/maxval), then the raw RGB plane. Returns
    * (width, height, maxval, rgb). */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "missing P6 magic")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and '#'-to-EOL comments between header fields
      var done = false
      while (!done) {
        while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else done = true
      }
      var v = 0
      require(pos < bytes.length && bytes(pos).toChar.isDigit, "bad header int")
      while (pos < bytes.length && bytes(pos).toChar.isDigit) {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val (w, h, maxval) = (nextInt(), nextInt(), nextInt())
    require(maxval > 0 && maxval < 256, s"unsupported maxval $maxval")
    pos += 1 // single whitespace after maxval
    require(bytes.length - pos >= w * h * 3, "truncated pixel data")
    (w, h, maxval, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3))
  }

  // -------------------------------------------------- perceptual hashing --

  /** Deterministic "re-export" of a P6 image — the pixel-level edit class
    * perceptual dedup exists to catch (a re-encoded copy with a mild
    * global adjustment plus a tiny local overlay): uniform brightness
    * lift (+8 on the R channel, clamped at 255) and a 1-pixel white
    * stamp at the origin (the watermark / logo-overlay corner). Decode →
    * perturb → RE-ENCODE through the real codec, so the output is itself
    * a valid P6 payload, exactly as a thumbnailer's re-export would
    * store it. */
  def reexportPpm(bytes: Array[Byte]): Array[Byte] = {
    val (w, h, _, rgb) = decodePpm(bytes)
    val out = rgb.clone()
    var i = 0
    while (i < out.length) {
      out(i) = math.min(255, (out(i) & 0xff) + 8).toByte // R channel lift
      i += 3
    }
    if (out.length >= 3) { out(0) = -1; out(1) = -1; out(2) = -1 } // stamp
    encodePpm(w, h, out)
  }

  /** 60-bit DIFFERENCE HASH (dHash) of a P6 image: BT.601 integer luma
    * (299·R + 587·G + 114·B — the ×1000-scaled standard weights, no
    * division, no floats), the row-major pixel sequence cut into
    * ≤ 61 flat spans with integer boundaries s·n/ns (the same
    * integer-mapping idiom as [[wavFramePeaks]]/[[resizePpm]]), and bit
    * s set iff span s's mean luma strictly exceeds span s+1's — decided
    * exactly by cross-multiplication (sum_s·len_{s+1} > sum_{s+1}·len_s),
    * so the hash is a pure integer function of the pixels and a DuckDB
    * oracle restates it bit-for-bit.
    *
    * dHash's LOCAL span-vs-next-span comparison (vs aHash's
    * span-vs-global-mean) is what buys the invariance class perceptual
    * dedup wants: a uniform illumination shift adds the same Δ·len_s·
    * len_{s+1} to both sides of every comparison (bits unchanged,
    * exactly), and a single-pixel edit can only disturb the ≤ 2
    * comparisons whose spans touch it. 60 bits keeps the packed hash
    * clear of the sign bit, the same convention as the 60-bit SimHash
    * (`graft_simhash`), so both engines band it with plain integer
    * shifts. Exact up to ~4.7e7 pixels (sum·len stays under 2^63). */
  def ppmDHash60(bytes: Array[Byte]): Long = {
    val (w, h, _, rgb) = decodePpm(bytes)
    val n = w * h
    // Degenerate images (0 or 1 pixel) carry no adjacent-span signal;
    // define their hash as the fixed 0L instead of failing the job, so
    // a corpus with thumbnail junk degrades (they all collide into one
    // Hamming-0 family the verify step still has to confirm) rather
    // than aborting. The q110 oracle's range arithmetic only ever sees
    // fixture images (≥ 2 px), so the choice is mirrored by the span
    // loop below yielding no iterations — hash stays 0.
    if (n < 2) return 0L
    // luma prefix sums: pre(i) = sum of luma over pixels [0, i)
    val pre = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff
      val g = rgb(3 * i + 1) & 0xff
      val b = rgb(3 * i + 2) & 0xff
      pre(i + 1) = pre(i) + (299L * r + 587L * g + 114L * b)
      i += 1
    }
    val ns = math.min(61, n)
    def lo(s: Int): Int = ((s.toLong * n) / ns).toInt
    var hash = 0L
    var s = 0
    while (s < ns - 1) {
      val (a0, a1, a2) = (lo(s), lo(s + 1), lo(s + 2))
      val (ssA, slA) = (pre(a1) - pre(a0), (a1 - a0).toLong)
      val (ssB, slB) = (pre(a2) - pre(a1), (a2 - a1).toLong)
      if (ssA * slB > ssB * slA) hash |= 1L << s
      s += 1
    }
    hash
  }

  /** One 60-bit dHash row per asset — same bounded-batch object-codec
    * shape as [[ppmFeatures]] (no Catalyst expression decodes P6; the
    * hash itself is integer arithmetic a downstream relational plan
    * bands and joins on). */
  final case class PpmHash(doc_id: Long, dhash: Long)

  def ppmDHashes(blobs: Dataset[MediaBlob],
                 batchSize: Int = DefaultBatchSize): Dataset[PpmHash] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map(b => PpmHash(b.doc_id, ppmDHash60(b.payload)))
      }
    }
  }

  /** Deterministic "re-export" of a WAV payload — the audio analogue of
    * [[reexportPpm]]: the edit class perceptual audio dedup exists to
    * catch is a re-encoded copy at a different GAIN plus a tiny local
    * artifact (a click). Decode → scale every sample to 7/8 gain on its
    * magnitude (|s| is always a multiple of 256 here — text-byte
    * synthesis — so ·7/8 is EXACT integer arithmetic, no rounding) →
    * overwrite sample 0 with a fixed 32000 click → re-encode through
    * the real RIFF codec, so the output is itself a valid WAV. */
  def reexportWav(bytes: Array[Byte]): Array[Byte] = {
    val (rate, samples) = decodeWavPcm16(bytes)
    val out = new Array[Short](samples.length)
    var i = 0
    while (i < samples.length) {
      val m = math.abs(samples(i).toInt) * 7 / 8
      out(i) = (if (samples(i) < 0) -m else m).toShort
      i += 1
    }
    if (out.length >= 1) out(0) = 32000 // the click
    encodeWavPcm16(out, rate)
  }

  /** 63-bit ENERGY-DELTA fingerprint of a WAV payload — the dHash
    * argument transposed to audio: the sample stream cut into ≤ 64
    * flat spans with the same integer boundaries as [[wavFramePeaks]],
    * per-span energy E_f = Σ |s_i| (exact longs), and bit f set iff
    * E_{f+1} strictly exceeds E_f.
    *
    * The LOCAL span-vs-next-span comparison buys gain invariance: a
    * uniform gain g > 0 scales every span energy by the same factor
    * (exactly, when the scaled samples stay integral — the [[reexportWav]]
    * construction guarantees it), so every strict inequality and every
    * tie is preserved bit-for-bit, and a single-sample edit (the click)
    * can only disturb the one span containing it — here span 0, hence
    * bit 0 — putting every re-export at Hamming ≤ 1 from its canonical.
    * 63 bits = 64 spans − 1 comparisons, clear of the sign bit; a
    * 32-span prototype measured ~2⁻³¹ random-collision mass chaining
    * amplified corpora into hairball clusters (×1 max family 302 →
    * ×3 max 5 302), so the width matches the image path's 60-bit
    * margin class instead. Degenerate streams (< 2 samples) hash to
    * the fixed 0L like [[ppmDHash60]]'s n < 2 rule. Exact up to
    * 2⁶³/32767 ≈ 2.8e14 samples per span. */
  def wavEnergyFingerprint63(bytes: Array[Byte]): Long = {
    val (_, samples) = decodeWavPcm16(bytes)
    val n = samples.length
    if (n < 2) return 0L
    val nf = math.min(64, n)
    def lo(f: Int): Int = ((f.toLong * n) / nf).toInt
    var hash = 0L
    var prev = -1L
    var f = 0
    while (f < nf) {
      var e = 0L; var i = lo(f); val hi = lo(f + 1)
      while (i < hi) { e += math.abs(samples(i).toInt); i += 1 }
      if (f > 0 && e > prev) hash |= 1L << (f - 1)
      prev = e
      f += 1
    }
    hash
  }

  /** One 63-bit fingerprint row per asset — the [[ppmDHashes]] shape for
    * audio (bounded-batch object codec; the hash is banded and joined by
    * a downstream relational plan). */
  final case class WavFp(doc_id: Long, afp: Long)

  def wavFingerprints(blobs: Dataset[MediaBlob],
                      batchSize: Int = DefaultBatchSize): Dataset[WavFp] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map(b => WavFp(b.doc_id, wavEnergyFingerprint63(b.payload)))
      }
    }
  }

  // ----------------------------------------------------------- motion PPM --

  /** "Motion PPM" container: concatenated P6 frames, the MJPEG idea with
    * the codec this container carries (MJPEG is literally concatenated
    * JPEGs) — each frame is a complete, self-delimiting P6 payload. */
  def encodeMotionPpm(frames: Seq[Array[Byte]]): Array[Byte] =
    frames.toArray.flatten

  /** Walk a motion-PPM stream into its frames: parse each P6 header
    * (magic, whitespace, `#` comments, w/h/maxval — the [[decodePpm]]
    * grammar), slice header + w·h·3 plane, advance. Throws on any
    * malformed frame rather than resyncing — a torn stream is a bug,
    * not a recoverable state. */
  def splitMotionPpm(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      require(bytes.length - pos >= 2 && bytes(pos) == 'P' && bytes(pos + 1) == '6',
        s"missing P6 magic at offset $pos")
      pos += 2
      def nextInt(): Int = {
        var done = false
        while (!done) {
          while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
          if (pos < bytes.length && bytes(pos) == '#') {
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          } else done = true
        }
        var v = 0
        require(pos < bytes.length && bytes(pos).toChar.isDigit, "bad header int")
        while (pos < bytes.length && bytes(pos).toChar.isDigit) {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      require(maxval > 0 && maxval < 256, s"unsupported maxval $maxval")
      pos += 1 // single whitespace after maxval
      require(bytes.length - pos >= w * h * 3, "truncated frame plane")
      pos += w * h * 3
      out += java.util.Arrays.copyOfRange(bytes, start, pos)
    }
    out.toSeq
  }

  /** Deterministic "transcode" of a motion-PPM video — the edit class
    * video perceptual dedup exists to catch: every frame re-exported
    * through [[reexportPpm]] (brightness lift + origin stamp, each a
    * ≤ 2-bit dHash disturbance) and the TRAILING frame dropped (the
    * classic trim a re-encoder applies), kept when the video has only
    * one frame. Output is a valid motion-PPM stream. */
  def reexportMotionPpm(bytes: Array[Byte]): Array[Byte] = {
    val frames = splitMotionPpm(bytes)
    val kept = if (frames.length > 1) frames.init else frames
    encodeMotionPpm(kept.map(reexportPpm))
  }

  /** Render each document as a REAL ≤ 8-frame motion-PPM video: the
    * UTF-8 text bytes cut into nf = max(1, min(8, n/61)) integer spans
    * (the [[wavFramePeaks]] boundary rule), span f rendered as a 1×len
    * P6 frame under the [[documentsAsPpmBlobs]] pixel map.
    * Deterministic, so the DuckDB oracle rebuilds every frame from the
    * text. The 61-pixel frame FLOOR keeps every frame's dHash at the
    * full 60 bits — a ≤ 8-way unconditional split minted 12-pixel
    * frames whose 11-bit hashes matched randomly at ~11% per pair and
    * chained a 174-member cluster at sf0.01 (the audio 32-span lesson
    * transposed: signature width must match the margin class, per
    * frame). */
  def documentsAsVideoBlobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    graft.sources.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val n = bytes.length
        val nf = math.max(1, math.min(8, n / 61))
        val frames = (0 until nf).map { f =>
          val lo = (f.toLong * n / nf).toInt
          val hi = ((f + 1).toLong * n / nf).toInt
          val rgb = new Array[Byte]((hi - lo) * 3)
          var i = lo
          while (i < hi) {
            val b = bytes(i) & 0xff
            rgb((i - lo) * 3) = b.toByte
            rgb((i - lo) * 3 + 1) = (255 - b).toByte
            rgb((i - lo) * 3 + 2) = ((7 * b) % 256).toByte
            i += 1
          }
          encodePpm(hi - lo, 1, rgb)
        }
        MediaBlob(id, "video/x-motion-ppm", encodeMotionPpm(frames))
      }
  }

  /** The q129 video-dedup corpus: every document's canonical video plus
    * its deterministic transcode twin ([[reexportMotionPpm]],
    * id + [[ReexportIdOffset]]) — every video has exactly one
    * trimmed-and-relit near-duplicate, the recovery ground truth. */
  def documentsAsVideoBlobsWithReexports(spark: SparkSession,
                                         dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    documentsAsVideoBlobs(spark, dir).flatMap { b =>
      Seq(b, MediaBlob(b.doc_id + ReexportIdOffset, b.mime,
        reexportMotionPpm(b.payload)))
    }
  }

  /** One row per (video, frame): the frame index and its 60-bit dHash
    * ([[ppmDHash60]]) — keyframe perceptual hashing, the unit a video
    * dedup pass bands and joins on. Bounded-batch object codec like
    * [[ppmDHashes]]. */
  final case class VideoFrameHash(doc_id: Long, fidx: Long, fhash: Long)

  def videoFrameHashes(blobs: Dataset[MediaBlob],
                       batchSize: Int = DefaultBatchSize): Dataset[VideoFrameHash] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { b =>
          splitMotionPpm(b.payload).iterator.zipWithIndex.map {
            case (frame, i) => VideoFrameHash(b.doc_id, i.toLong, ppmDHash60(frame))
          }
        }
      }
    }
  }

  // ----------------------------------------------------- frame extraction --

  /** Decode a payload to its frame vector by mime. WAV frames are per-1024-
    * sample peak amplitudes (a real decode of header + every sample); PPM
    * frames are [width, height, maxval] followed by per-row max pixel; any
    * other mime has no codec in this container and falls back to a
    * deterministic per-256-byte digest so the plumbing stays exercised. */
  private def decodeFrames(mime: String, payload: Array[Byte]): Array[Int] =
    mime match {
      case "audio/wav" =>
        val (_, samples) = decodeWavPcm16(payload)
        samples.grouped(1024)
          .map(block => block.foldLeft(0)((m, s) => math.max(m, math.abs(s.toInt))))
          .toArray
      case "image/x-portable-pixmap" =>
        val (w, h, maxval, rgb) = decodePpm(payload)
        Array(w, h, maxval) ++ (0 until h).map { r =>
          var m = 0; var i = r * w * 3
          while (i < (r + 1) * w * 3) { m = math.max(m, rgb(i) & 0xff); i += 1 }
          m
        }
      case _ =>
        payload.grouped(256)
          .map(chunk => chunk.foldLeft(0)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffff))
          .toArray
    }

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  /** Per-partition, batched feature extraction. Narrow (no shuffle): each
    * executor decodes only its partitions; batches bound peak memory the
    * way arrow batches do for `mapInPandas`. */
  def extractFeatures(blobs: Dataset[MediaBlob],
                      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // A vectorized codec would decode `batch` in one call here.
        batch.iterator.map { b =>
          MediaFeatures(b.doc_id, b.mime, b.payload.length,
            md5Hex(b.payload), decodeFrames(b.mime, b.payload))
        }
      }
    }
  }

  /** Typed audio features via the REAL decoder: every byte of the payload
    * passes through the RIFF chunk walk and the PCM sample scan. Same
    * bounded-batch shape as [[extractFeatures]]. */
  def wavFeatures(blobs: Dataset[MediaBlob],
                  batchSize: Int = DefaultBatchSize): Dataset[WavFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { b =>
          val (rate, samples) = decodeWavPcm16(b.payload)
          val peak = samples.foldLeft(0)((m, s) => math.max(m, math.abs(s.toInt)))
          WavFeatures(b.doc_id, rate.toLong, samples.length.toLong,
            samples.length.toLong * 1000L / rate, peak.toLong)
        }
      }
    }
  }

  /** Typed features of a decoded P6 image — header fields plus per-channel
    * maxima, every one exact integer arithmetic over the decoded plane
    * (the q55 oracle surface). */
  final case class PpmFeatures(
      doc_id: Long, width: Long, height: Long, maxval: Long,
      max_r: Long, max_g: Long, max_b: Long)

  /** Typed image features via the REAL P6 parser: header walk (magic,
    * comments, dims, maxval) then a full scan of the RGB plane. Same
    * bounded-batch shape as [[extractFeatures]]. */
  def ppmFeatures(blobs: Dataset[MediaBlob],
                  batchSize: Int = DefaultBatchSize): Dataset[PpmFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { b =>
          val (w, h, maxval, rgb) = decodePpm(b.payload)
          var (mr, mg, mb) = (0, 0, 0); var i = 0
          while (i < rgb.length) {
            mr = math.max(mr, rgb(i) & 0xff)
            mg = math.max(mg, rgb(i + 1) & 0xff)
            mb = math.max(mb, rgb(i + 2) & 0xff)
            i += 3
          }
          PpmFeatures(b.doc_id, w.toLong, h.toLong, maxval.toLong,
            mr.toLong, mg.toLong, mb.toLong)
        }
      }
    }
  }

  /** Nearest-neighbor resize of a P6 image to (≤targetW, ≤targetH): output
    * pixel (i, j) samples source pixel (i·w/ow, j·h/oh) — the classic
    * integer mapping, decode → sample → RE-ENCODE through the real codec
    * (the output is itself a valid P6 payload, as a thumbnail pipeline
    * would store). Never upsamples: target dims are clamped to the
    * source's. */
  def resizePpm(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW >= 1 && targetH >= 1, "target dims must be >= 1")
    val (w, h, maxval, rgb) = decodePpm(bytes)
    require(maxval == 255, s"only 8-bit P6 supported, maxval $maxval")
    val ow = math.min(targetW, w)
    val oh = math.min(targetH, h)
    val out = new Array[Byte](ow * oh * 3)
    var j = 0
    while (j < oh) {
      val sy = (j.toLong * h / oh).toInt
      var i = 0
      while (i < ow) {
        val sx = (i.toLong * w / ow).toInt
        val s = (sy * w + sx) * 3
        val d = (j * ow + i) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        i += 1
      }
      j += 1
    }
    encodePpm(ow, oh, out)
  }

  /** Resized-image features (q62 surface): resize through [[resizePpm]],
    * re-decode the re-encoded payload (so the round trip itself is under
    * test), and report new dims + per-channel maxima of the RESIZED
    * plane. Same bounded-batch shape as [[extractFeatures]]. */
  final case class PpmResizedFeatures(
      doc_id: Long, src_width: Long, width: Long, height: Long,
      max_r: Long, max_g: Long, max_b: Long)

  def ppmResizeFeatures(blobs: Dataset[MediaBlob], targetW: Int, targetH: Int,
                        batchSize: Int = DefaultBatchSize): Dataset[PpmResizedFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { b =>
          val (srcW, _, _, _) = decodePpm(b.payload)
          val (w, h, _, rgb) = decodePpm(resizePpm(b.payload, targetW, targetH))
          var (mr, mg, mb) = (0, 0, 0); var i = 0
          while (i < rgb.length) {
            mr = math.max(mr, rgb(i) & 0xff)
            mg = math.max(mg, rgb(i + 1) & 0xff)
            mb = math.max(mb, rgb(i + 2) & 0xff)
            i += 3
          }
          PpmResizedFeatures(b.doc_id, srcW.toLong, w.toLong, h.toLong,
            mr.toLong, mg.toLong, mb.toLong)
        }
      }
    }
  }

  /** Frame-sampled audio (q63 surface): decode, split the sample stream
    * into ≤nFrames equal spans (frame f covers [f·n/nf, (f+1)·n/nf) — the
    * integer boundaries a fixed-budget featurizer uses), one row per
    * frame with its peak |amplitude|. The long-thin output shape (doc ×
    * frame) is what a downstream audio-embedding step consumes. */
  final case class WavFramePeak(doc_id: Long, frame: Long, peak: Long)

  def wavFramePeaks(blobs: Dataset[MediaBlob], nFrames: Int,
                    batchSize: Int = DefaultBatchSize): Dataset[WavFramePeak] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { b =>
          val (_, samples) = decodeWavPcm16(b.payload)
          val n = samples.length
          val nf = math.min(nFrames, n)
          (0 until nf).iterator.map { f =>
            val lo = (f.toLong * n / nf).toInt
            val hi = ((f + 1).toLong * n / nf).toInt
            var peak = 0; var i = lo
            while (i < hi) {
              peak = math.max(peak, math.abs(samples(i).toInt)); i += 1
            }
            WavFramePeak(b.doc_id, f.toLong, peak.toLong)
          }
        }
      }
    }
  }

  /** Render each document as a REAL 1×N P6 image — pixel i of the single
    * row maps byte b_i of the UTF-8 text to (R,G,B) = (b, 255−b,
    * (7·b) mod 256). Single-row layout avoids padding, so every decoded
    * feature is a pure function of the text bytes and the DuckDB oracle
    * can restate it independently (q55). */
  def documentsAsPpmBlobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    graft.sources.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val rgb = new Array[Byte](bytes.length * 3)
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          rgb(i * 3) = b.toByte
          rgb(i * 3 + 1) = (255 - b).toByte
          rgb(i * 3 + 2) = ((7 * b) % 256).toByte
          i += 1
        }
        MediaBlob(id, "image/x-portable-pixmap",
          encodePpm(bytes.length, 1, rgb))
      }
  }

  /** Re-export id offset for [[documentsAsPpmBlobsWithReexports]]: the
    * perturbed copy of doc i carries id i + this. Far above any fixture
    * doc_id, far below the 2^40 composite-key bound used elsewhere. */
  val ReexportIdOffset = 1000000L

  /** The q110 image-dedup corpus: every document's canonical render
    * ([[documentsAsPpmBlobs]]) PLUS its deterministic re-export
    * ([[reexportPpm]], id + [[ReexportIdOffset]]) — a corpus where every
    * image has exactly one pixel-level near-duplicate, the ground truth
    * the perceptual-hash pipeline must recover. Both variants are pure
    * functions of the text bytes, so the DuckDB oracle rebuilds the
    * whole corpus independently. */
  def documentsAsPpmBlobsWithReexports(spark: SparkSession,
                                       dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    documentsAsPpmBlobs(spark, dir).flatMap { b =>
      Seq(b, MediaBlob(b.doc_id + ReexportIdOffset, b.mime,
        reexportPpm(b.payload)))
    }
  }

  /** Lift the documents table into a MediaBlob dataset (text bytes standing
    * in for media payloads — same schema a real asset table has). */
  def documentsAsBlobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    graft.sources.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "'text/plain' AS mime", "encode(text, 'UTF-8') AS payload")
      .as[MediaBlob]
  }

  /** Raw-FILE multimodal ingest: lift a directory of media files into the
    * same MediaBlob surface every decode/feature query consumes, via
    * Spark's `binaryFile` source — the ingest shape of a real asset lake
    * (one object per asset) as opposed to the parquet-borne payload
    * column. Scale notes: the source never reads a file bigger than
    * `spark.sql.files.maxPartitionBytes` into one row blindly — each file
    * IS one row, so payload size bounds row size (set
    * `binaryFile.maxLength` guards upstream); `pathGlobFilter` prunes
    * non-matching objects at LISTING time, and filters on `length` /
    * `modificationTime` push into the file index (incremental ingest =
    * a modTime predicate, no data read). The doc id rides the object
    * name (`doc_<id>.<ext>`), the standard asset-lake key convention.
    * Spec-verified against the in-memory synthesis path: the same
    * payload bytes written to files and read back decode to identical
    * features (MultimodalSpec). */
  def blobsFromFiles(spark: SparkSession, dir: String, glob: String,
                     mime: String): Dataset[MediaBlob] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // try_cast: a glob-matching file NOT named doc_<id>.* extracts ""
        // — under ANSI that cast throws mid-scan; try_cast turns it into
        // a null the next line prunes, so a stray object degrades to
        // "skipped", never to a failed ingest.
        regexp_extract(col("path"), "doc_(\\d+)\\.", 1).try_cast("long")
          .as("doc_id"),
        lit(mime).as("mime"),
        col("content").as("payload"))
      .filter(col("doc_id").isNotNull)
      .as[MediaBlob]
  }

  /** Synthesize a REAL 8 kHz PCM16 waveform per document — sample i is the
    * centered-and-scaled i-th UTF-8 byte of the text, (b − 128) · 256 —
    * wrapped in a genuine RIFF/WAVE container. Deterministic (no RNG), so
    * the decoded features are exact arithmetic over the text bytes and the
    * DuckDB oracle can state them independently (q54). */
  /** The q126 audio-dedup corpus: every document's canonical waveform
    * ([[documentsAsWavBlobs]]) PLUS its deterministic re-export
    * ([[reexportWav]], id + [[ReexportIdOffset]]) — every track has
    * exactly one gain-shifted near-duplicate, the ground truth the
    * fingerprint pipeline must recover. Both variants are pure functions
    * of the text bytes, so the DuckDB oracle rebuilds the corpus
    * independently (the [[documentsAsPpmBlobsWithReexports]] pattern). */
  def documentsAsWavBlobsWithReexports(spark: SparkSession,
                                       dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    documentsAsWavBlobs(spark, dir).flatMap { b =>
      Seq(b, MediaBlob(b.doc_id + ReexportIdOffset, b.mime,
        reexportWav(b.payload)))
    }
  }

  def documentsAsWavBlobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    graft.sources.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val samples = text.getBytes("UTF-8")
          .map(b => (((b & 0xff) - 128) * 256).toShort)
        MediaBlob(id, "audio/wav", encodeWavPcm16(samples, 8000))
      }
  }
}
