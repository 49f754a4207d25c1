package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): treat media as an
  * opaque `binary` payload + typed metadata, with decode / feature-extract
  * as batch-friendly per-partition transforms.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * DETERMINISTIC FAKE decode (documented as such): it derives a fixed-size
  * "feature vector" from the payload bytes. The Spark-side plumbing —
  * binary schema, partition-batched processing, feature schema — is real
  * and is what the operator contributes; swap `decodeStub` for a JNI/
  * Pandas-UDF codec in production.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  /** Build a media table from `documents`: payload = UTF-8 bytes of text
    * (the opaque stand-in for image/audio bytes).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 2 === 0, lit("image/png")).otherwise(lit("audio/wav")).as("media_type"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decode: a real implementation would decode image/audio here
    * (e.g. via a vectorized native codec per partition). The fake derives
    * `dim` deterministic f32 features from payload bytes so downstream
    * vector operators (ANN, near-dup) are exercised end-to-end.
    * Runs via mapPartitions: one decoder init per partition (the real
    * codec-handle pattern), streaming rows through it.
    */
  def decodeStub(spark: SparkSession, media: DataFrame, dim: Int): DataFrame = {
    val outSchema = StructType(media.schema.fields.toSeq :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      // per-partition "codec" init happens here (stubbed)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats = new Array[Float](dim)
        if (payload != null) {
          var i = 0
          while (i < payload.length) {
            feats(i % dim) += (payload(i) & 0xff) / 255.0f
            i += 1
          }
        }
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling plumbing: split the opaque payload into fixed-size
    * chunks ("frames") — one row per frame, deterministic. The real
    * decoder would emit decoded frames; the chunking, explode shape, and
    * per-frame metadata are the Spark-side contract either way.
    * Output: (media_id, frame_idx: long, frame: binary, frame_len: long).
    */
  def frameSample(media: DataFrame, frameBytes: Int): DataFrame = {
    val n = col("n_bytes")
    val nFrames = ceil(n.cast("double") / frameBytes).cast("long")
    media
      .select(col("media_id"), col("payload"), n, nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("payload"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(
        col("media_id"),
        col("frame_idx"),
        expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)").as("frame"),
        least(lit(frameBytes.toLong), col("n_bytes") - col("frame_idx") * frameBytes).as("frame_len"))
  }

  /** Metadata + cheap payload stats, pure column ops (oracle-able):
    * byte length, payload md5, first/last byte.
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("media_type"),
      col("n_bytes"),
      md5(col("payload")).as("payload_md5"))

  // ---- real container parsing (the non-stubbed multimodal tier) --------

  /** Deterministic PCM16 mono WAV payload built from text codepoints:
    * sample i = (cpᵢ mod 4096 − 2048)·16 (exactly spans the i16 range).
    * Construction scaffolding for the parse-vs-construct cross-check
    * (q64): the corpus has no real audio, so the payloads are synthesized
    * — but from a formula the DuckDB oracle can evaluate INDEPENDENTLY
    * over the same text, so any byte-layout or parsing bug breaks the
    * hash match. The parser below is the deliverable.
    */
  def wavBytes(text: String, sampleRate: Int): Array[Byte] = {
    val cps = text.codePoints().toArray
    val dataSize = cps.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataSize)
    cps.foreach(cp => bb.putShort((((cp % 4096) - 2048) * 16).toShort))
    bb.array()
  }

  /** REAL RIFF/WAVE container parse + PCM16 decode — pure JVM, no codec
    * library needed, which is why THIS part of the multimodal tier is not
    * stubbed (compressed codecs remain `decodeStub`). Validates magics,
    * walks chunks (odd sizes are pad-aligned per the RIFF spec, unknown
    * chunks skipped), reads the fmt header, and folds the PCM16 samples
    * into peak amplitude and a portable mod-P checksum.
    */
  def parseWav(bytes: Array[Byte],
               onSample: Long => Unit = _ => ()): (Long, Long, Long, Long, Long, Long) = {
    val P = 1000000007L
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def str4(): String = { val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII") }
    require(bytes.length >= 12 && str4() == "RIFF", "not a RIFF container")
    bb.getInt() // declared riff size; trust actual bounds instead
    require(str4() == "WAVE", "not a WAVE file")
    var rate = -1L; var ch = -1L; var bits = -1L
    var nSamples = 0L; var peak = 0L; var sum = 0L
    while (bb.remaining() >= 8) {
      val id = str4(); val size = bb.getInt()
      // bound check in Long: position + a near-Int.MaxValue size wraps
      // negative in Int and would slip past the guard
      require(size >= 0 && bb.position().toLong + size <= bytes.length,
        s"chunk '$id' size $size overruns payload")
      val next = bb.position() + size + (size & 1) // odd chunks pad 1 byte
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          val fmt = bb.getShort(); ch = bb.getShort().toLong
          rate = bb.getInt().toLong; bb.getInt(); bb.getShort()
          bits = bb.getShort().toLong
          require(fmt == 1 && bits == 16, s"unsupported encoding fmt=$fmt bits=$bits")
          // n_samples/peak/checksum fold interleaved samples, which only
          // equals per-frame semantics for mono — reject anything else
          require(ch == 1, s"only mono supported, got $ch channels")
        case "data" =>
          require(rate > 0, "data chunk before fmt")
          var i = 0
          while (i + 1 < size) {
            val s = bb.getShort().toLong
            nSamples += 1
            val a = math.abs(s); if (a > peak) peak = a
            sum += s
            onSample(s)
            i += 2
          }
        case _ => () // LIST/INFO/etc — skip
      }
      bb.position(math.min(next, bytes.length))
    }
    require(rate > 0, "missing fmt chunk")
    (rate, ch, bits, nSamples, peak, ((sum % P) + P) % P)
  }

  /** Deterministic 24-bit BMP payload from text codepoints: a 1-row
    * bitmap, pixel i = (B,G,R) = (cpᵢ mod 256, 7·cpᵢ mod 256,
    * 13·cpᵢ mod 256), rows padded to 4 bytes per the BMP spec.
    * Construction scaffolding for q65's parse-vs-construct cross-check —
    * `parseBmp` is the deliverable.
    */
  def bmpBytes(text: String): Array[Byte] = {
    val cps = text.codePoints().toArray
    val w = cps.length; val h = if (w == 0) 0 else 1
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte)
    bb.putInt(54 + dataSize); bb.putShort(0); bb.putShort(0); bb.putInt(54)
    bb.putInt(40); bb.putInt(w); bb.putInt(h) // BITMAPINFOHEADER
    bb.putShort(1); bb.putShort(24) // planes, bpp
    bb.putInt(0); bb.putInt(dataSize) // BI_RGB, image size
    bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
    cps.foreach { cp =>
      bb.put((cp % 256).toByte); bb.put((cp * 7 % 256).toByte); bb.put((cp * 13 % 256).toByte)
    }
    var pad = w * 3
    while (pad < rowBytes) { bb.put(0.toByte); pad += 1 }
    bb.array()
  }

  /** REAL BMP container parse — the image-side counterpart of `parseWav`
    * (BI_RGB 24-bit needs no codec). Validates the 'BM' magic and
    * BITMAPINFOHEADER, walks rows from the declared pixel offset
    * honoring 4-byte row padding, and folds pixels into the peak
    * channel-sum and a portable mod-P checksum.
    */
  def parseBmp(bytes: Array[Byte]): (Long, Long, Long, Long, Long, Long) = {
    val P = 1000000007L
    var peak = 0L; var sum = 0L
    val (w, h, bpp) = walkBmp(bytes) { (b, g, r) =>
      val s = b.toLong + g + r
      if (s > peak) peak = s
      sum += s
    }
    (w.toLong, h.toLong, bpp.toLong, w.toLong * h, peak, sum % P)
  }

  /** Validated BMP pixel walk shared by `parseBmp` and `bmpFeatures`:
    * header checks + padded-row traversal, calling `visit(b, g, r)` per
    * pixel (storage order — BMP rows are bottom-up, irrelevant to the
    * per-pixel folds here). Returns (width, height, bpp).
    */
  private def walkBmp(bytes: Array[Byte])(visit: (Int, Int, Int) => Unit): (Int, Int, Int) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP file")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = bb.getInt(10)
    val infoSize = bb.getInt(14)
    require(infoSize >= 40, s"unsupported info header size $infoSize")
    val w = bb.getInt(18); val h = bb.getInt(22)
    val bpp = bb.getShort(28).toInt
    val compression = bb.getInt(30)
    require(w >= 0 && h >= 0, s"top-down/negative dimensions unsupported: ${w}x$h")
    require(bpp == 24 && compression == 0, s"unsupported encoding bpp=$bpp compression=$compression")
    // row stride in Long: a hostile width near Int.MaxValue/3 would wrap
    // w*3+3 negative in Int and slip past the overrun guard below
    val rowBytesL = (w.toLong * 3 + 3) / 4 * 4
    require(pixelOffset >= 54, s"pixel offset $pixelOffset inside headers")
    // overrun guard by DIVISION, not multiplication: with hostile w AND h
    // both near Int.MaxValue, rowBytesL * h (~1.4e19) wraps negative even
    // in Long and a product-form require would pass spuriously
    require(h == 0 || rowBytesL <= (bytes.length.toLong - pixelOffset) / h,
      s"pixel data ${w}x$h overruns payload")
    val rowBytes = rowBytesL.toInt
    var row = 0
    while (row < h) {
      var x = 0
      var p = pixelOffset + row * rowBytes
      while (x < w) {
        visit(bytes(p) & 0xff, bytes(p + 1) & 0xff, bytes(p + 2) & 0xff)
        p += 3; x += 1
      }
      row += 1
    }
    (w, h, bpp)
  }

  /** Image feature extraction over REAL decoded pixels — the BMP
    * counterpart of `wavFeatures`, so both real decoders feed a feature
    * query: walk the validated pixel rows and histogram each channel
    * (0 = blue, 1 = green, 2 = red — BMP storage order) into `bins`
    * equal-width buckets over [0, 256). Integer-only output lets a SQL
    * oracle replay the expected histogram from the source text
    * independently of the byte layout. Output: (media_id, channel, bin, n).
    */
  def bmpFeatures(media: DataFrame, bins: Int): DataFrame = {
    require(bins > 0 && 256 % bins == 0, s"bins must divide the channel range: $bins")
    val width = 256 / bins
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("channel", LongType, nullable = false),
      StructField("bin", LongType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      // a null payload is an absent medium, not a malformed one: emit no
      // histogram rows (mirrors decodeStub's null contract) instead of NPE
      rows.filter(!_.isNullAt(1)).flatMap { r =>
        val hist = new Array[Long](3 * bins)
        walkBmp(r.getAs[Array[Byte]]("payload")) { (b, g, r2) =>
          hist(b / width) += 1
          hist(bins + g / width) += 1
          hist(2 * bins + r2 / width) += 1
        }
        val mid = r.getLong(0)
        (0 until 3 * bins).iterator.filter(hist(_) > 0)
          .map(i => Row(mid, (i / bins).toLong, (i % bins).toLong, hist(i)))
      }
    }(enc)
  }

  /** Media frame with synthesized BMP payloads (construction scaffolding;
    * see `bmpBytes`).
    */
  def bmpMediaFromDocuments(docs: DataFrame): DataFrame = {
    val mk = udf((text: String) => bmpBytes(if (text == null) "" else text))
    docs.select(col("doc_id").as("media_id"), mk(col("text")).as("payload"))
  }

  /** Decode a BMP media frame (per-partition imperative parse, like
    * `decodeWav`). Output: (media_id, width, height, bpp, n_pixels,
    * peak, checksum) — all integers.
    */
  def decodeBmp(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("bpp", LongType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("peak", LongType, nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, bpp, n, peak, sum) = parseBmp(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), w, h, bpp, n, peak, sum)
      }
    }(enc)
  }

  /** Nearest-neighbor BMP resize — the RESIZE stage of a media pipeline
    * as a payload→payload transform: decode via the validated pixel walk,
    * sample source pixel (x·f, y·f) for each output pixel, and RE-ENCODE
    * a well-formed BI_RGB 24-bit BMP (output dims ⌈w/f⌉×⌈h/f⌉, 4-byte row
    * padding). Chainable with `decodeBmp`/`bmpFeatures`, which is how q70
    * verifies it: the resized payload must itself parse as a valid BMP
    * whose pixels the oracle replays from the source text. Null payloads
    * are skipped (absent medium, the codec-path contract); factor 1 is
    * the identity on pixels. Per-partition imperative transcode — the
    * codec-handle pattern, no driver involvement.
    */
  def resizeBmp(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1: $factor")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.filter(!_.isNullAt(1)).map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val flat = new scala.collection.mutable.ArrayBuffer[Int]()
        val (w, h, _) = walkBmp(bytes) { (b, g, r2) => flat += b; flat += g; flat += r2 }
        val ow = if (w == 0) 0 else (w + factor - 1) / factor
        val oh = if (h == 0) 0 else (h + factor - 1) / factor
        val rowBytes = (ow * 3 + 3) / 4 * 4
        val dataSize = rowBytes * oh
        val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put('B'.toByte); bb.put('M'.toByte)
        bb.putInt(54 + dataSize); bb.putShort(0); bb.putShort(0); bb.putInt(54)
        bb.putInt(40); bb.putInt(ow); bb.putInt(oh)
        bb.putShort(1); bb.putShort(24)
        bb.putInt(0); bb.putInt(dataSize)
        bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val si = (y * factor * w + x * factor) * 3
            bb.put(flat(si).toByte); bb.put(flat(si + 1).toByte); bb.put(flat(si + 2).toByte)
            x += 1
          }
          var pad = ow * 3
          while (pad < rowBytes) { bb.put(0.toByte); pad += 1 }
          y += 1
        }
        // schema-ful row: Spark elides ser/deser between adjacent object
        // nodes, so a chained decodeBmp/bmpFeatures receives THIS object
        // and its name-based field access needs the schema attached
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array(r.getLong(0), bb.array()), outSchema): Row
      }
    }(enc)
  }

  /** PCM decimation — the audio FRAME-SAMPLE stage as a payload→payload
    * transform (the WAV analog of `resizeBmp`): parse with the genuine
    * RIFF walker, keep every `factor`-th sample, and re-encode a
    * well-formed mono PCM16 WAV at sampleRate/factor. Chainable with
    * `decodeWav`/`wavFeatures` — q71 verifies by re-decoding the
    * resampled bytes and hash-matching a text-replay oracle through both
    * codec passes. Null payloads are skipped; factor 1 is the identity
    * on samples. Per-partition imperative transcode, no driver.
    */
  def resampleWav(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resample factor must be >= 1: $factor")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.filter(!_.isNullAt(1)).map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val kept = new scala.collection.mutable.ArrayBuffer[Short]()
        var i = 0L
        val (rate, _, _, _, _, _) =
          parseWav(bytes, s => { if (i % factor == 0) kept += s.toShort; i += 1 })
        val newRate = math.max(1L, rate / factor).toInt
        val dataSize = kept.length * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataSize)
        bb.put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
        bb.putShort(1); bb.putShort(1)
        bb.putInt(newRate); bb.putInt(newRate * 2)
        bb.putShort(2); bb.putShort(16)
        bb.put("data".getBytes("US-ASCII")); bb.putInt(dataSize)
        kept.foreach(bb.putShort(_))
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array(r.getLong(0), bb.array()), outSchema): Row
      }
    }(enc)
  }

  /** Audio feature extraction over REAL decoded samples (the q27
    * successor — no stub anywhere on this path): parse the WAV container
    * with the genuine RIFF walker, bucket each PCM16 sample into `bins`
    * equal-width amplitude bins over [-32768, 32768), and emit one row
    * per non-empty bin. Integer-only output, so a SQL oracle can replay
    * the expected histogram from the source text independently of the
    * byte layout (the same parse-vs-construct cross-check as q64).
    * Per-partition imperative parse — the codec-handle pattern.
    * Output: (media_id, bin, n).
    */
  def wavFeatures(media: DataFrame, bins: Int): DataFrame = {
    require(bins > 0 && 65536 % bins == 0, s"bins must divide the i16 range: $bins")
    val width = 65536 / bins
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bin", LongType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val hist = new Array[Long](bins)
        parseWav(r.getAs[Array[Byte]]("payload"),
          s => hist(((s + 32768L) / width).toInt) += 1)
        val mid = r.getLong(0)
        (0 until bins).iterator.filter(hist(_) > 0).map(b => Row(mid, b.toLong, hist(b)))
      }
    }(enc)
  }

  /** Media frame with synthesized WAV payloads (payload construction is
    * scaffolding; see `wavBytes`).
    */
  def wavMediaFromDocuments(docs: DataFrame, sampleRate: Int): DataFrame = {
    val mk = udf((text: String) => wavBytes(if (text == null) "" else text, sampleRate))
    docs.select(col("doc_id").as("media_id"), mk(col("text")).as("payload"))
  }

  /** Decode a WAV media frame: per-partition imperative parse (the
    * codec-handle pattern — same execution shape a real codec needs).
    * Output: (media_id, sample_rate, n_channels, bits_per_sample,
    * n_samples, peak, checksum) — all integers, oracle-friendly.
    */
  def decodeWav(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("n_channels", LongType, nullable = false),
      StructField("bits_per_sample", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("peak", LongType, nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val (rate, ch, bits, n, peak, sum) = parseWav(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), rate, ch, bits, n, peak, sum)
      }
    }(enc)
  }
}
