package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media ride along as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as
  * typed `mapPartitions` batches (the Scala analog of arrow-batched
  * pandas UDFs — per-partition setup amortizes model/codec init, rows
  * stream through without driver involvement).
  *
  * Compressed-codec calls are STUBBED (no image/audio libraries in
  * this environment) with deterministic byte-level fakes —
  * `decodeBytes` is the single seam to swap in a real decoder — but
  * [[decodeNetpbm]] is a REAL parser for the uncompressed Netpbm
  * family (P5/P6), so header parsing, payload validation and
  * per-sample extraction run on actual bytes end-to-end. Everything
  * around the seams (schema, encoders, partitioning, batch iteration)
  * is real and oracle-tested.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, kind: String, n_bytes: Int, payload: Array[Byte])

  /** Extracted features; in a real pipeline `embedding` would come from
    * the decoded media.
    */
  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Int,
      avg_byte: Double,
      stub_width: Int,
      stub_height: Int
  )

  /** STUB decoder: a real implementation would parse the codec here
    * (JPEG/PNG/WAV...). The deterministic fake derives "dimensions" from
    * the payload so the full pipeline is testable end-to-end.
    */
  private def decodeBytes(payload: Array[Byte]): (Double, Int, Int) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val avg = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    (avg, payload.length % 640, (payload.length * 7) % 480)
  }

  /** Wrap a text table as a media table: payload = UTF-8 bytes. Stands in
    * for reading real image/audio blobs from parquet binary columns.
    * n_bytes is the PAYLOAD byte length (octet_length), so metadata and
    * payload stay consistent for non-ASCII text too. (The oracle-parity
    * queries additionally assume an ASCII corpus, where bytes == chars
    * == code points; that assumption lives in the oracle SQL, not here.)
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text/plain").as("kind"),
      octet_length(col(textCol)).cast("int").as("n_bytes"),
      encode(col(textCol), "UTF-8").as("payload")
    )

  /** Batched feature extraction over the binary column. Partition-level
    * iteration: codec/model setup would happen once per partition before
    * the row loop — the structure that matters at scale.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (avg, w, h) = decodeBytes(r.payload)
        MediaFeatures(r.doc_id, r.kind, r.n_bytes, avg, w, h)
      }
    }
  }

  /** Decoded image features from a REAL parser ([[decodeNetpbm]]). */
  final case class ImageFeatures(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      maxval: Int,
      n_pixels: Long,
      mean_pixel: Double
  )

  /** A REAL image decoder — binary Netpbm (P5 grayscale / P6 RGB), the
    * uncompressed format family that needs zero codec libraries: an
    * ASCII header (magic, width, height, maxval, `#` comments allowed)
    * followed by raw samples. This path exercises every part of a
    * production decode — header parsing, payload validation (truncated
    * data rejects, not garbage), per-sample numeric extraction — on
    * actual bytes rather than a fake. The COMPRESSED family (PNG /
    * JPEG / GIF / BMP) decodes through [[decodeCompressed]] — the
    * JDK's own `javax.imageio`, so no external codec library is
    * needed even offline.
    *
    * Returns (format, width, height, maxval, n_pixels, mean_sample);
    * None for anything that is not a complete single-byte-depth
    * Netpbm payload.
    */
  /** Parsed Netpbm header: (format, channels, width, height, maxval,
    * raster offset). None unless the payload is a complete
    * single-byte-depth P5/P6 image (truncated rasters reject).
    */
  private def parseNetpbm(p: Array[Byte]): Option[(String, Int, Int, Int, Int, Int)] = {
    if (p.length < 2 || p(0) != 'P'.toByte) return None
    val fmt = p(1).toChar match {
      case '5' => "P5"
      case '6' => "P6"
      case _ => return None
    }
    val channels = if (fmt == "P6") 3 else 1
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < p.length) {
        val c = p(i).toChar
        if (c == '#') { while (i < p.length && p(i) != '\n'.toByte) i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = -1
      while (i < p.length && p(i) >= '0'.toByte && p(i) <= '9'.toByte) {
        v = (if (v < 0) 0 else v) * 10 + (p(i) - '0'.toByte); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    i += 1 // exactly one whitespace byte separates the header from the raster
    if (i + w.toLong * h * channels > p.length) return None
    Some((fmt, channels, w, h, maxv, i))
  }

  private[graft] def decodeNetpbm(p: Array[Byte]): Option[(String, Int, Int, Int, Long, Double)] =
    parseNetpbm(p).map { case (fmt, channels, w, h, maxv, off) =>
      val n = w.toLong * h * channels
      var sum = 0L
      var j = 0
      while (j < n) { sum += p(off + j) & 0xff; j += 1 }
      (fmt, w, h, maxv, w.toLong * h, sum.toDouble / n)
    }

  /** Fixed-grid mean-pooled feature vector from the decoded raster: the
    * raster is split into `gridW`×`gridH` cells (pixel (x, y) lands in
    * cell ((y·gridH) div h, (x·gridW) div w) — every cell is non-empty
    * whenever w ≥ gridW and h ≥ gridH) and each feature is the mean of
    * its cell's samples (P6 pools the three channels of a pixel into
    * the pixel's cell). Integer-exact and engine-replayable: one
    * long-sum per cell, one IEEE division — the deterministic stand-in
    * for a learned image embedding that lets the downstream similarity
    * operators (SemDeDup, IVF) run on decoded media with a DuckDB
    * oracle.
    */
  private[graft] def decodeNetpbmPooled(
      p: Array[Byte],
      gridW: Int,
      gridH: Int
  ): Option[(Int, Int, Array[Double])] =
    parseNetpbm(p).flatMap { case (_, channels, w, h, _, off) =>
      if (w < gridW || h < gridH) None
      else {
        val sums = new Array[Long](gridW * gridH)
        val cnts = new Array[Long](gridW * gridH)
        val n = w.toLong * h * channels
        var j = 0L
        while (j < n) {
          val pix = j / channels
          val x = (pix % w).toInt
          val y = (pix / w).toInt
          val cell = (y * gridH / h) * gridW + x * gridW / w
          sums(cell) += p(off + j.toInt) & 0xff
          cnts(cell) += 1
          j += 1
        }
        Some((w, h, Array.tabulate(gridW * gridH)(c => sums(c).toDouble / cnts(c))))
      }
    }

  /** Container magic sniff for the compressed image family — garbage
    * never reaches the codec (the parseNetpbm validation discipline).
    */
  private[graft] def sniffFormat(p: Array[Byte]): Option[String] = {
    def u(i: Int) = p(i) & 0xff
    if (p.length >= 8 && u(0) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      Some("PNG")
    else if (p.length >= 3 && u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff)
      Some("JPEG")
    else if (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8')
      Some("GIF")
    else if (p.length >= 2 && p(0) == 'B' && p(1) == 'M')
      Some("BMP")
    else None
  }

  /** COMPRESSED-codec image decode — PNG / JPEG / GIF / BMP through the
    * JDK's own `javax.imageio` (ships with every JVM: the "codec
    * library" the offline container was assumed to lack is in the
    * standard runtime). Same feature tuple as [[decodeNetpbm]] with
    * maxval = 255 and the mean over the three sRGB channels (a
    * grayscale raster surfaces tripled — identical mean). PNG and BMP
    * decode bit-exactly, so feature parity with the same raster's
    * Netpbm encoding holds EXACTLY (spec-pinned); JPEG is lossy by
    * design and GIF's fidelity depends on the ENCODER's palette
    * choice (Java's writer quantizes even under 256 colors) —
    * dimensions and sniff are exact for both. Truncated or corrupt
    * payloads return None (quarantine), never throw into the task.
    */
  private[graft] def decodeCompressed(
      p: Array[Byte]
  ): Option[(String, Int, Int, Int, Long, Double)] =
    sniffFormat(p).flatMap { fmt =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h * 3
          Some((fmt, w, h, 255, w.toLong * h, sum.toDouble / n))
        }
      } catch { case _: Exception => None }
    }

  /** The unified image decode: exact Netpbm parse first, else the
    * ImageIO compressed family. */
  private[graft] def decodeImage(p: Array[Byte]): Option[(String, Int, Int, Int, Long, Double)] =
    decodeNetpbm(p).orElse(decodeCompressed(p))

  /** [[decodeNetpbmPooled]]'s compressed twin: the fixed-grid pooled
    * vector off the ImageIO raster, each pixel contributing its three
    * sRGB samples to its cell (P6 semantics, so a raster pooled
    * through PNG equals the same raster pooled through Netpbm).
    */
  private[graft] def decodeCompressedPooled(
      p: Array[Byte],
      gridW: Int,
      gridH: Int
  ): Option[(Int, Int, Array[Double])] =
    sniffFormat(p).flatMap { _ =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
        if (img == null || img.getWidth < gridW || img.getHeight < gridH) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val sums = new Array[Long](gridW * gridH)
          val cnts = new Array[Long](gridW * gridH)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val cell = (y * gridH / h) * gridW + x * gridW / w
              sums(cell) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              cnts(cell) += 3
              x += 1
            }
            y += 1
          }
          Some((w, h, Array.tabulate(gridW * gridH)(c => sums(c).toDouble / cnts(c))))
        }
      } catch { case _: Exception => None }
    }

  private[graft] def decodeImagePooled(
      p: Array[Byte],
      gridW: Int,
      gridH: Int
  ): Option[(Int, Int, Array[Double])] =
    decodeNetpbmPooled(p, gridW, gridH).orElse(decodeCompressedPooled(p, gridW, gridH))

  /** Decode a media table's image payloads — same typed-batch seam as
    * [[extractFeatures]], through the real parsers (Netpbm exact, then
    * the ImageIO compressed family); rows that do not decode are
    * dropped (the quarantine a real pipeline applies).
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        decodeImage(r.payload).map { case (f, w, h, mv, np, mean) =>
          ImageFeatures(r.doc_id, f, w, h, mv, np, mean)
        }
      }
    }
  }

  /** A decoded image's pooled feature vector. */
  final case class ImageVector(doc_id: Long, width: Int, height: Int, vec: Array[Double])

  /** Decode a media table's Netpbm payloads into fixed-grid mean-pooled
    * feature vectors ([[decodeNetpbmPooled]]) — the bridge from the
    * multimodal seam into the embedding operators: the output is a
    * (doc_id, vec) embedding table every [[Similarity]] operator
    * (semanticDedup, ivfTopK, bruteTopK, nearDupPairs) consumes as-is.
    * Same typed-batch shape as [[decodeImages]]; rows that do not
    * decode (or are smaller than the grid) are dropped.
    */
  def imageVectors(
      spark: SparkSession,
      media: DataFrame,
      gridW: Int = 4,
      gridH: Int = 4
  ): Dataset[ImageVector] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        decodeImagePooled(r.payload, gridW, gridH).map { case (w, h, v) =>
          ImageVector(r.doc_id, w, h, v)
        }
      }
    }
  }

  /** Image-level semantic dedup — decoded media as a first-class
    * pipeline citizen: real Netpbm decode → pooled feature vectors →
    * [[Similarity.semanticDedup]] (IVF cell assignment + within-cell
    * near-dup drop). Returns the surviving (vid, cell) rows. The whole
    * chain is deterministic, so the DuckDB oracle replays decode,
    * pooling, cell assignment and the drop set exactly.
    */
  def imageSemanticDedup(
      spark: SparkSession,
      media: DataFrame,
      minCosine: Double,
      numCentroids: Int,
      gridW: Int = 4,
      gridH: Int = 4
  ): DataFrame =
    Similarity.semanticDedup(
      imageVectors(spark, media, gridW, gridH).toDF(), "doc_id", "vec", minCosine, numCentroids)

  // ------------------------------------------------------------- audio

  /** Decoded audio features from a REAL parser ([[decodeWav]]). */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      n_samples: Long,
      duration_ms: Long,
      peak: Int,
      zero_crossings: Long,
      rms: Double
  )

  /** Serialize PCM16 samples as a real RIFF/WAVE file — canonical
    * 44-byte header (mono, 16-bit, little-endian) + data chunk. The
    * writer half of the audio codec pair: the queries build media
    * payloads with it, [[decodeWav]] must round-trip them, and the
    * spec corrupts them to prove the parser validates rather than
    * trusts.
    */
  private[graft] def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1) // PCM, mono
    b.putInt(sampleRate).putInt(sampleRate * 2)
    b.putShort(2).putShort(16) // block align, bits
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  /** A REAL audio decoder — uncompressed RIFF/WAVE PCM, the audio
    * format family that needs zero codec libraries (the compressed
    * codecs remain behind the documented [[decodeBytes]] stub seam).
    * Walks the chunk list (not hardcoded offsets — real WAVs carry
    * LIST/INFO chunks), validates the fmt chunk (PCM, mono, 16-bit)
    * and the data length, then extracts little-endian samples.
    * Returns (sampleRate, samples); None for anything malformed —
    * truncated data rejects, never garbage.
    */
  private[graft] def decodeWav(p: Array[Byte]): Option[(Int, Array[Short])] = {
    if (p.length < 12) return None
    val b = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); b.get(t); new String(t, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    val riffLen = b.getInt
    if (riffLen < 4 || riffLen.toLong + 8 > p.length) return None
    if (tag() != "WAVE") return None
    var rate = -1
    var ok = false
    var data: Array[Short] = null
    while (data == null && b.remaining() >= 8) {
      val id = tag()
      val len = b.getInt
      if (len < 0 || len > b.remaining()) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmtEnd = b.position() + len
          val audioFormat = b.getShort
          val channels = b.getShort
          rate = b.getInt
          b.getInt // byte rate
          b.getShort // block align
          val bits = b.getShort
          ok = audioFormat == 1 && channels == 1 && bits == 16 && rate > 0
          if (!ok) return None
          b.position(fmtEnd)
        case "data" =>
          if (!ok || len % 2 != 0) return None
          val out = new Array[Short](len / 2)
          var j = 0
          while (j < out.length) { out(j) = b.getShort; j += 1 }
          data = out
        case _ =>
          // skip unknown chunks (word-aligned, per RIFF)
          b.position(b.position() + len + (len & 1))
      }
    }
    if (data == null) None else Some((rate, data))
  }

  /** G.711 μ-law companding pair — the standard 8-bit logarithmic
    * compression for telephony audio (ITU-T G.711): sign, +132 bias,
    * segment exponent, 4-bit mantissa, ones-complement. [[ulawDecode]]
    * is the exact expansion `((m·8 + 132) << exp) − 132` — the JDK's
    * own ULAW codec decodes to EXACTLY these values (spec-pinned), so
    * the DuckDB oracle can replay a lossy compressed-audio round trip
    * bit-for-bit.
    */
  private[graft] def ulawEncode(s0: Short): Byte = {
    var s = s0.toInt
    val sign = if (s < 0) 0x80 else 0
    if (s < 0) s = -s
    if (s > 32635) s = 32635
    s += 132
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mantissa = (s >> (exp + 3)) & 0x0F
    (~(sign | (exp << 4) | mantissa) & 0xFF).toByte
  }

  private[graft] def ulawDecode(b: Byte): Short = {
    val u = ~b & 0xFF
    val exp = (u >> 4) & 0x07
    val mag = ((((u & 0x0F) << 3) + 132) << exp) - 132
    (if ((u & 0x80) != 0) -mag else mag).toShort
  }

  /** Serialize PCM16 samples as a μ-law-COMPRESSED RIFF/WAVE file —
    * format code 7, 8 bits/sample: half the bytes of [[encodeWav]]
    * with logarithmic quantization error. The compressed writer half;
    * [[decodeWavCompressed]] routes it through the JDK's real codec.
    */
  private[graft] def encodeWavUlaw(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(7).putShort(1) // mu-law, mono
    b.putInt(sampleRate).putInt(sampleRate)
    b.putShort(1).putShort(8) // block align, bits
    b.put("data".getBytes("US-ASCII")).putInt(samples.length)
    samples.foreach(s => b.put(ulawEncode(s)))
    b.array()
  }

  /** COMPRESSED/containered audio decode through the JDK's own
    * `javax.sound.sampled` (the audio sibling of [[decodeCompressed]]
    * — the codec library ships with the JVM): μ-law / a-law WAV,
    * AIFF, AU — MONO streams only. A mono stream converts to PCM16
    * little-endian and surfaces as (rate, samples); multi-channel
    * clips are quarantined (None) rather than downmixed — a downmix
    * would invent sample values no oracle can replay bit-for-bit.
    * Anything the JDK cannot parse — or that [[decodeWav]] already
    * handles exactly (plain PCM16) — also returns None. μ-law output
    * is bit-identical to [[ulawDecode]] of the stored bytes (G.711),
    * so the lossy round trip stays oracle-replayable.
    */
  private[graft] def decodeWavCompressed(p: Array[Byte]): Option[(Int, Array[Short])] = {
    // sniff the containers the JDK owns here: RIFF with a non-PCM
    // format code, AIFF (FORM/AIFF), AU (.snd)
    val riff = p.length > 20 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F'
    val aiff = p.length > 12 && p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M'
    val au = p.length > 4 && p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'
    val riffPcm = riff && p(20) == 1 && p(21) == 0 // handled exactly by decodeWav
    if ((!riff && !aiff && !au) || riffPcm) return None
    var ais: javax.sound.sampled.AudioInputStream = null
    var pcm: javax.sound.sampled.AudioInputStream = null
    try {
      ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p))
      val src = ais.getFormat
      if (src.getChannels != 1) return None
      val target = new javax.sound.sampled.AudioFormat(
        src.getSampleRate, 16, 1, true, false)
      pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
      val bytes = pcm.readAllBytes()
      val out = new Array[Short](bytes.length / 2)
      var j = 0
      while (j < out.length) {
        out(j) = ((bytes(2 * j) & 0xff) | (bytes(2 * j + 1) << 8)).toShort
        j += 1
      }
      Some((src.getSampleRate.toInt, out))
    } catch { case _: Exception => None }
    finally {
      // byte-array-backed, but AudioInputStream wrappers may hold codec
      // state — release deterministically instead of leaking to GC
      if (pcm != null) try pcm.close() catch { case _: Exception => () }
      if (ais != null) try ais.close() catch { case _: Exception => () }
    }
  }

  /** The unified audio decode: exact PCM16 parse first, else the JDK
    * compressed/containered family. */
  private[graft] def decodeAudioBytes(p: Array[Byte]): Option[(Int, Array[Short])] =
    decodeWav(p).orElse(decodeWavCompressed(p))

  /** Decode a media table's audio payloads into audio features — the
    * typed-batch seam over the real parsers (exact PCM16, then the
    * JDK μ-law/a-law/AIFF/AU family): per clip, sample count,
    * duration (integer ms, floor), peak magnitude, zero-crossing count
    * (strict sign flips — the classic voiced/unvoiced heuristic) and
    * RMS energy (exact long sum of squares, one division, one sqrt).
    * Rows that do not decode are dropped (the quarantine).
    */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudioBytes(r.payload).map { case (rate, s) =>
          var sumSq = 0L
          var peak = 0
          var zc = 0L
          var j = 0
          while (j < s.length) {
            val v = s(j).toInt
            sumSq += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (j > 0 && (v < 0) != (s(j - 1) < 0) && v != 0 && s(j - 1) != 0) zc += 1
            j += 1
          }
          val rms = if (s.isEmpty) 0.0 else math.sqrt(sumSq.toDouble / s.length)
          AudioFeatures(r.doc_id, rate, s.length.toLong,
            s.length.toLong * 1000L / rate, peak, zc, rms)
        }
      }
    }
  }

  /** A decoded clip's segment-pooled amplitude profile. */
  final case class AudioVector(doc_id: Long, n_samples: Long, vec: Array[Double])

  /** Decode WAV payloads into fixed-length amplitude-profile vectors —
    * the audio twin of [[imageVectors]]: the sample stream splits into
    * `segments` equal spans (sample i lands in span i·S div n) and
    * each feature is the span's mean |amplitude|. Integer-exact sums,
    * one IEEE division per span, so the DuckDB oracle replays the
    * vector bit-for-bit; clips shorter than the grid (or that fail to
    * decode) are dropped. Output feeds every [[Similarity]] operator.
    */
  def audioVectors(
      spark: SparkSession,
      media: DataFrame,
      segments: Int = 16
  ): Dataset[AudioVector] = {
    import spark.implicits._
    require(segments >= 1, s"segments must be >= 1, got $segments")
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.payload).flatMap { case (_, s) =>
          if (s.length < segments) None
          else {
            val sums = new Array[Long](segments)
            val cnts = new Array[Long](segments)
            var i = 0
            while (i < s.length) {
              val seg = (i.toLong * segments / s.length).toInt
              sums(seg) += math.abs(s(i).toInt)
              cnts(seg) += 1
              i += 1
            }
            Some(AudioVector(r.doc_id, s.length.toLong,
              Array.tabulate(segments)(c => sums(c).toDouble / cnts(c))))
          }
        }
      }
    }
  }

  /** Audio near-duplicate pruning: [[audioVectors]] →
    * [[Similarity.semanticDedup]] — clips whose amplitude profiles
    * cluster and exceed the cosine threshold drop within their cell,
    * mirroring [[imageSemanticDedup]].
    */
  def audioSemanticDedup(
      spark: SparkSession,
      media: DataFrame,
      minCosine: Double,
      numCentroids: Int,
      segments: Int = 16
  ): DataFrame =
    Similarity.semanticDedup(
      audioVectors(spark, media, segments).toDF(), "doc_id", "vec",
      minCosine, numCentroids)

  /** Frame sampling stub: every media row fans out to `frames` sampled
    * "frames" (deterministic offsets), the shape of video-frame
    * extraction — one input row, n output rows, batch-friendly.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, frames: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      (0 until frames).map { f =>
        val off = if (r.n_bytes == 0) 0 else (f * r.n_bytes) / frames
        val b = if (r.payload.isEmpty) 0 else r.payload(off.min(r.payload.length - 1)) & 0xff
        (r.doc_id, f, off, b)
      }
    }.toDF("doc_id", "frame", "offset", "first_byte")
  }
}
