package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed output row of the batched decode stage. */
case class DecodedMeta(doc_id: Long, format: String, width: Int,
                       height: Int, n_bytes: Int)

/** Typed output row of the batched resize stage: re-encoded PNG bytes,
  * or width = -1 + empty png for undecodable dead-letter rows. */
case class ResizedImage(doc_id: Long, width: Int, height: Int,
                        png: Array[Byte])

/** Typed output row of the batched feature-extract stage: per-channel
  * pixel means in [0, 255], or width = -1 for dead-letter rows. */
case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                         mean_r: Double, mean_g: Double, mean_b: Double)

/** Typed output row of the batched audio feature stage: stream
  * metadata + per-channel RMS in [0, 1] (samples normalized by 2^15).
  * Dead-letter rows (undecodable / non-PCM-16) get channels = -1 and
  * an empty rms. */
case class AudioFeatures(doc_id: Long, channels: Int, sample_rate: Int,
                         n_frames: Long, duration_s: Double,
                         rms: Seq[Double])

/** Typed output row of the batched channel-0 sample decode (feeds the
  * mm11 energy-fingerprint near-dup): raw PCM-16 samples as ints, or
  * channels = -1 + empty samples for undecodable / non-PCM-16
  * dead-letter rows. */
case class AudioSamples(doc_id: Long, channels: Int, sample_rate: Int,
                        samples: Seq[Int])

/** Typed output row of the batched gray-pixel decode stage (feeds the
  * mm9 perceptual-hash near-dup): row-major 8-bit gray samples, or
  * width = -1 + empty pixels for undecodable dead-letter rows. */
case class GrayPixels(doc_id: Long, width: Int, height: Int,
                      pixels: Seq[Int])

/** Typed output row of the batched document-extraction stage (the
  * third training-data modality after image and audio): markup format
  * sniffed from the payload, extracted plain text, and its counts.
  * Dead-letter rows (unrecognized / undecodable payloads) get format
  * "error", -1 counts, null text. */
case class ExtractedDoc(doc_id: Long, format: String, n_chars: Int,
                        n_words: Int, text: String)

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, the full decode / feature-extract / resize / frame-sample
  * quartet, and one shared batched-codec seam ([[mapBatched]]).
  *
  * The Spark-side plumbing — schema (binary + metadata struct),
  * partition-friendly per-row expressions, chunk explosion — is real
  * and tested. The codec step has two implementations behind one seam:
  * [[stubDecodeBatch]]/[[fakeDecodeMeta]] derive deterministic
  * pseudo-metadata from the bytes (SQL-mirrorable → the mm2/mm3 hash
  * oracles), and [[imageioDecodeBatch]] is a REAL decoder — JDK
  * javax.imageio header reads — proving the seam with an actual codec
  * (MultimodalSpec drives it over generated PNGs). A production
  * pipeline swaps in ffmpeg/ONNX the same way; every downstream
  * operator (chunking, metadata filters, sampling) is unchanged.
  *
  * Scale posture: payloads stay opaque binary all the way through the
  * plan — no driver collection, no string round-trip; metadata extract
  * and chunk explosion are map-side only.
  */
object Multimodal {

  /** Stand-in payload: the document's UTF-8 bytes as the binary blob
    * (real pipelines read image/audio bytes from object storage). */
  def payload(text: Column): Column = text.cast("binary")

  /** === STUB: deterministic fake decode ===
    * Derives (format, width, height, n_bytes) pseudo-metadata from the
    * payload byte LENGTH — the same rule as [[stubDecodeBatch]], so the
    * expression path and the batched path agree, and queries over
    * either are SQL-mirrorable (mm2/mm3 carry full hash oracles).
    * Replace with a real codec (e.g. javax.imageio / ffmpeg via
    * [[decodeBatched]]) in production — signature stays. */
  def fakeDecodeMeta(bin: Column): Column = {
    val n = length(bin)
    struct(
      when(n % 3 === 0, "png").when(n % 3 === 1, "jpeg").otherwise("webp").as("format"),
      (n % 1920 + 64).cast("int").as("width"),
      (n % 1080 + 64).cast("int").as("height"),
      n.as("n_bytes"))
  }

  /** Fixed-size byte chunks (frame sampling / patch extraction shape):
    * array of `chunkSize`-byte slices, last one ragged. */
  def chunks(bin: Column, chunkSize: Int): Column =
    transform(
      sequence(lit(0), ceil(length(bin).cast("double") / chunkSize).cast("int") - 1),
      i => bin.substr(i * chunkSize + 1, lit(chunkSize)))

  /** Every k-th chunk ("frame sample" stride). */
  def sampleEvery(chunksCol: Column, stride: Int): Column =
    filter(chunksCol, (_, i) => i % stride === 0)

  /** === STUB: deterministic batch codec ===
    * One call per batch of payloads (the shape a real codec wants —
    * model/codec init amortized per batch, not per row). Derives
    * (format, width, height) from the byte length only, so the result
    * is SQL-mirrorable and the batched path gets a full hash oracle.
    * Replace exactly this function with javax.imageio / ffmpeg /
    * an ONNX feature extractor in production — the signature (a batch
    * of byte arrays in, one meta tuple per payload out) stays. */
  def stubDecodeBatch(payloads: Seq[Array[Byte]]): Seq[(String, Int, Int)] =
    payloads.map { b =>
      val n = b.length
      val fmt = n % 3 match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" }
      (fmt, n % 1920 + 64, n % 1080 + 64)
    }

  /** Real JDK image codec for the decode seam: javax.imageio header
    * reads (PNG/JPEG/GIF/BMP — whatever the JVM's ImageIO registry
    * supports), at zero dependency cost. Only the header is parsed
    * (`ImageReader.getWidth/getHeight`, not a full pixel decode), the
    * shape a metadata-extraction pass wants. Payloads no reader
    * recognizes — AND payloads a reader claims but then fails to parse
    * (valid magic, truncated/corrupt header: `getWidth` throws) —
    * become ("unknown", -1, -1) dead-letter rows instead of failing
    * the batch, the same skip-don't-die contract as
    * [[decodeBatched]]'s null handling. This is the production proof
    * of the seam: [[MultimodalSpec]] drives it over generated PNGs
    * through the UNCHANGED [[decodeBatched]] plumbing; the mm3 query
    * keeps the stub codec so its full SQL hash oracle stays. */
  def imageioDecodeBatch(payloads: Seq[Array[Byte]]): Seq[(String, Int, Int)] =
    payloads.map { bytes =>
      try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        if (in == null) ("unknown", -1, -1)
        else try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) ("unknown", -1, -1)
          else {
            val r = readers.next()
            try {
              r.setInput(in)
              (r.getFormatName.toLowerCase(java.util.Locale.ROOT),
                r.getWidth(0), r.getHeight(0))
            } finally r.dispose()
          }
        } finally in.close()
      } catch {
        // recognized-but-corrupt payload (e.g. PNG magic, truncated
        // IHDR): dead-letter, don't fail the task
        case scala.util.control.NonFatal(_) => ("unknown", -1, -1)
      }
    }

  /** The mapInPandas analog in Scala: a partition-local BATCHED decode
    * stage over (id, binary payload) rows. Each task consumes its
    * partition in `batchSize`-row groups (the Arrow-batch shape),
    * invokes the codec once per group, and emits one typed
    * [[DecodedMeta]] row per payload. No shuffle, no driver
    * collection — the stage runs at scan parallelism, so at 100 TB it
    * scales with executors exactly like any map stage; `batchSize`
    * trades codec-call overhead against task memory (batch bytes held
    * at once). MultimodalSpec proves batch-boundary invariance and the
    * one-call-per-batch contract; the mm3 query hash-oracles the
    * stubbed output end-to-end. */
  def decodeBatched(df: DataFrame, idCol: String, payloadCol: String,
                    batchSize: Int = 64,
                    decodeBatch: Seq[Array[Byte]] => Seq[(String, Int, Int)] = stubDecodeBatch)
      : Dataset[DecodedMeta] = {
    val session = df.sparkSession
    import session.implicits._
    mapBatched(df, idCol, payloadCol, batchSize)(decodeBatch) {
      case (id, bytes, (fmt, w, h)) => DecodedMeta(id, fmt, w, h, bytes.length)
    }
  }

  /** The generic batched-codec seam all multimodal stages share: group
    * each partition into `batchSize`-row batches, one codec call per
    * batch (arity-guarded), one typed output row per payload. Same
    * null/dead-letter and scale posture as [[decodeBatched]] — which
    * is this, specialized to metadata tuples. */
  def mapBatched[M, O: org.apache.spark.sql.Encoder](
      df: DataFrame, idCol: String, payloadCol: String, batchSize: Int)(
      codec: Seq[Array[Byte]] => Seq[M])(
      emit: (Long, Array[Byte], M) => O): Dataset[O] = {
    val session = df.sparkSession
    import session.implicits._
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    // null contract: rows with a null id or null payload are SKIPPED
    // (they would otherwise NPE inside the codec / break the primitive
    // encoder) — a production pipeline routes them to a dead-letter
    // side output instead of dying mid-job
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .filter(col(idCol).isNotNull && col(payloadCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val outs = codec(batch.map(_._2))
          require(outs.length == batch.length,
            s"codec returned ${outs.length} results for ${batch.length} payloads")
          batch.lazyZip(outs).map { case ((id, bytes), m) => emit(id, bytes, m) }
        }
      }
  }

  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Real JDK resize codec: full pixel decode → bilinear scale to
    * `w`×`h` → PNG re-encode. Undecodable payloads → None (the caller
    * emits a dead-letter row). One batch = one call, like every codec
    * in this seam. */
  def imageioResizeBatch(w: Int, h: Int)(
      payloads: Seq[Array[Byte]]): Seq[Option[Array[Byte]]] =
    payloads.map { bytes =>
      readImage(bytes).flatMap { img =>
        try {
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          if (javax.imageio.ImageIO.write(out, "png", bos)) Some(bos.toByteArray)
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }

  /** === STUB: deterministic batch resize ===
    * Same contract as [[imageioResizeBatch]] but byte-deterministic:
    * payloads whose length is divisible by 17 dead-letter (None), the
    * rest "resize" to the UTF-8 bytes of
    * `RESIZED:{w}x{h}:{n_bytes}:{md5hex(payload)}` — every component
    * restatable in SQL, so the batched resize path gets a full hash
    * oracle (mm4) exactly like the stub decode got mm3. */
  def stubResizeBatch(w: Int, h: Int): Seq[Array[Byte]] => Seq[Option[Array[Byte]]] =
    payloads => payloads.map { b =>
      if (b.length % 17 == 0) None
      else Some(s"RESIZED:${w}x$h:${b.length}:${md5Hex(b)}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

  /** === STUB: deterministic batch feature-extract ===
    * Same contract as [[imageioFeatureBatch]], derived from the byte
    * length only (dead-letter on length % 17 == 0) → SQL-mirrorable,
    * full hash oracle (mm5). */
  def stubFeatureBatch(payloads: Seq[Array[Byte]])
      : Seq[Option[(Int, Int, Double, Double, Double)]] =
    payloads.map { b =>
      val n = b.length
      if (n % 17 == 0) None
      else Some((n % 640 + 32, n % 480 + 32,
        (n % 256).toDouble, (n * 7 % 256).toDouble, (n * 13 % 256).toDouble))
    }

  private def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  /** Batched resize stage (the "resize" op of the multimodal quartet):
    * opaque binary in, `w`×`h` PNG binary out, dead-letter rows get
    * width = -1 + empty bytes. Map-side only, scan parallelism. The
    * codec defaults to the real JDK scaler; mm4 passes
    * [[stubResizeBatch]] for its hash oracle. */
  def resizeBatched(df: DataFrame, idCol: String, payloadCol: String,
                    w: Int, h: Int, batchSize: Int = 16,
                    codec: Option[Seq[Array[Byte]] => Seq[Option[Array[Byte]]]] = None)
      : Dataset[ResizedImage] = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val session = df.sparkSession
    import session.implicits._
    mapBatched(df, idCol, payloadCol, batchSize)(
      codec.getOrElse(imageioResizeBatch(w, h) _)) {
      case (id, _, Some(png)) => ResizedImage(id, w, h, png)
      case (id, _, None) => ResizedImage(id, -1, -1, Array.emptyByteArray)
    }
  }

  /** Real JDK feature-extract codec: full pixel decode → per-channel
    * RGB means in [0, 255]. Undecodable → None. */
  def imageioFeatureBatch(payloads: Seq[Array[Byte]])
      : Seq[Option[(Int, Int, Double, Double, Double)]] =
    payloads.map { bytes =>
      readImage(bytes).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        var (r, g, b) = (0L, 0L, 0L)
        // bulk row reads: per-pixel getRGB(x, y) re-runs the color-model
        // conversion call per pixel, which is the stage's hot loop for
        // non-INT_RGB rasters; one row per call keeps the buffer O(w)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        (w, h, r.toDouble / n, g.toDouble / n, b.toDouble / n)
      }
    }

  /** Batched feature-extract stage (the "feature-extract" op of the
    * multimodal quartet): per-channel pixel means as a typed frame —
    * the shape an embedding/classifier feature pass takes. Dead-letter
    * rows get width = -1. */
  def featuresBatched(df: DataFrame, idCol: String, payloadCol: String,
                      batchSize: Int = 64,
                      codec: Seq[Array[Byte]] => Seq[Option[(Int, Int, Double, Double, Double)]] =
                        imageioFeatureBatch): Dataset[ImageFeatures] = {
    val session = df.sparkSession
    import session.implicits._
    mapBatched(df, idCol, payloadCol, batchSize)(codec) {
      case (id, _, Some((w, h, r, g, b))) => ImageFeatures(id, w, h, r, g, b)
      case (id, _, None) => ImageFeatures(id, -1, -1, -1.0, -1.0, -1.0)
    }
  }

  /** Deterministic grayscale-PNG fixture writer: an 8-bit gray image
    * whose pixel (x, y) is `f(x, y) & 0xff`, PNG-encoded. PNG gray8 is
    * lossless, so a decode of these bytes returns EXACTLY the formula
    * values — which is what lets the mm9 oracle regenerate the same
    * pixels in SQL without a codec (BASELINE: the codec leg is proven
    * by the roundtrip, the hash/join legs by the restatement). */
  def grayPng(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real gray-pixel decode codec: full javax.imageio decode, band-0
    * raster samples in row-major order (for the single-band gray
    * rasters the mm9 fixtures are, the samples ARE the encoded bytes —
    * no color-model conversion, which for gray ICC profiles would NOT
    * be the identity that getRGB luminance math pretends). Undecodable
    * payloads → None (dead-letter). */
  def imageioGrayPixelsBatch(payloads: Seq[Array[Byte]])
      : Seq[Option[(Int, Int, Seq[Int])]] =
    payloads.map { bytes =>
      readImage(bytes).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        (w, h, px.toSeq)
      }
    }

  /** Batched gray-pixel decode stage (mm9's codec leg): same seam,
    * schema discipline, and dead-letter contract as the image quartet.
    * Everything downstream of this frame — block sums, dHash packing,
    * band keys, the hamming join — is COLUMN work the engine executes,
    * so at 100 TB the codec is the only per-byte stage and the dedup
    * topology is the text family's banded-join shape. */
  def grayPixelsBatched(df: DataFrame, idCol: String, payloadCol: String,
                        batchSize: Int = 64): Dataset[GrayPixels] = {
    val session = df.sparkSession
    import session.implicits._
    mapBatched(df, idCol, payloadCol, batchSize)(imageioGrayPixelsBatch) {
      case (id, _, Some((w, h, px))) => GrayPixels(id, w, h, px)
      case (id, _, None) => GrayPixels(id, -1, -1, Seq.empty)
    }
  }

  /** dHash halves over a row-major gray pixel array (the classic
    * difference hash, Krawetz 2013, restated in exact integer Column
    * arithmetic): 2×2-block sums on an 18×16 image give a 9×8 grid;
    * bit (x, y) = blockSum(x, y) > blockSum(x+1, y) for x, y in 0..7 —
    * 64 bits packed as TWO 32-bit halves held in BIGINTs (lo = rows
    * 0-3, hi = rows 4-7) so neither engine touches the sign bit.
    * Comparing SUMS instead of means keeps every step integer-exact;
    * the SQL oracle restates this arithmetic verbatim.
    *
    * CONTRACT: `pixels` must be a row-major 18×16 (288-element) array —
    * the block indexing is hardwired to that grid. Callers must filter
    * on BOTH decoded dimensions first (mm9 does): a shorter array makes
    * element_at return null, null comparisons pack as 0-bits, and two
    * wrong-sized images would band-collide as a false duplicate pair
    * instead of dead-lettering. */
  def dhashHalves(pixels: Column): (Column, Column) = {
    // block j (0..71): bx = j % 9, by = j / 9; sum of the 2×2 pixel
    // block at (2bx, 2by) — element_at is 1-based
    val blocks = transform(sequence(lit(0), lit(71)), j => {
      // Column `/` is fractional division — floor+cast keeps the
      // element_at indices integer
      val by = floor(j / 9).cast("int")
      val base = by * 2 * 18 + (j % 9) * 2
      element_at(pixels, base + 1) + element_at(pixels, base + 2) +
        element_at(pixels, base + 18 + 1) + element_at(pixels, base + 18 + 2)
    })
    // shiftleft takes only literal shift amounts — a 32-entry power
    // table indexed by the lambda variable keeps the packing columnar
    val pow2 = lit((0 until 32).map(1L << _).toArray)
    def half(rowOffset: Int): Column =
      aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, i) => {
        val left = (floor(i / 8).cast("int") + rowOffset) * 9 + (i % 8)
        acc + when(
          element_at(blocks, left + 1) > element_at(blocks, left + 2),
          element_at(pow2, (i + 1).cast("int"))).otherwise(lit(0L))
      })
    (half(0), half(4))
  }

  // ======== audio (the second real modality through the same seam) ===

  /** Minimal PCM-16 WAV encoder over interleaved samples —
    * deterministic fixture synthesis for the audio path (the write
    * half of the codec seam; javax.sound renders the RIFF container).
    * Little-endian 16-bit signed, `interleaved.length / channels`
    * frames. */
  def pcm16Wav(rate: Int, channels: Int, interleaved: Array[Short]): Array[Byte] = {
    require(channels >= 1 && interleaved.length % channels == 0,
      s"${interleaved.length} samples don't tile $channels channels")
    val bytes = new Array[Byte](interleaved.length * 2)
    var i = 0
    while (i < interleaved.length) {
      bytes(2 * i) = (interleaved(i) & 0xff).toByte
      bytes(2 * i + 1) = ((interleaved(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt,
      (interleaved.length / channels).toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real JDK audio codec (javax.sound.sampled — public JDK, the audio
    * analog of [[imageioFeatureBatch]]): WAV/AIFF/AU header parse +
    * full PCM-16 sample read → (channels, rate, frames, duration,
    * per-channel RMS). RMS accumulates integer sample squares in a
    * long (exact) and normalizes by 2^15 at the end, so analytically
    * chosen fixtures land on exact doubles and the mm7 hash oracle is
    * meaningful. Undecodable bytes or non-PCM-16 encodings → None
    * (dead-letter, never a task failure). */
  def javaSoundAudioBatch(payloads: Seq[Array[Byte]])
      : Seq[Option[(Int, Int, Long, Double, Seq[Double])]] =
    payloads.map { bytes =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) None
          else {
            val ch = fmt.getChannels
            val rate = fmt.getSampleRate.toInt
            val data = in.readAllBytes()
            val frameSize = fmt.getFrameSize // = 2 * ch for PCM-16
            val frames = data.length / frameSize
            val sumSq = new Array[Long](ch)
            val le = !fmt.isBigEndian
            var f = 0
            while (f < frames) {
              var c = 0
              while (c < ch) {
                val o = f * frameSize + c * 2
                val s =
                  (if (le) ((data(o + 1) & 0xff) << 8) | (data(o) & 0xff)
                   else ((data(o) & 0xff) << 8) | (data(o + 1) & 0xff)).toShort
                sumSq(c) += s.toLong * s
                c += 1
              }
              f += 1
            }
            val rms = sumSq.toSeq.map(q =>
              if (frames == 0) 0.0 else math.sqrt(q.toDouble / frames) / 32768.0)
            Some((ch, rate, frames.toLong, frames.toDouble / rate, rms))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Channel-0 raw-sample decode: PCM-16 WAV → the first channel's
    * samples as exact ints (PCM-16 through javax.sound is lossless, so
    * decoded samples ARE the encoded shorts — the audio analog of the
    * gray-PNG roundtrip mm9 rests on). Undecodable / non-PCM-16
    * payloads → None (dead-letter). */
  def javaSoundMonoSamplesBatch(payloads: Seq[Array[Byte]])
      : Seq[Option[(Int, Int, Seq[Int])]] =
    payloads.map { bytes =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) None
          else {
            val ch = fmt.getChannels
            val data = in.readAllBytes()
            val frameSize = fmt.getFrameSize
            val frames = data.length / frameSize
            val le = !fmt.isBigEndian
            val out = new Array[Int](frames)
            var f = 0
            while (f < frames) {
              val o = f * frameSize // channel 0 leads each frame
              out(f) =
                (if (le) ((data(o + 1) & 0xff) << 8) | (data(o) & 0xff)
                 else ((data(o) & 0xff) << 8) | (data(o + 1) & 0xff)).toShort.toInt
              f += 1
            }
            Some((ch, fmt.getSampleRate.toInt, out.toSeq))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Batched channel-0 sample decode (mm11's codec leg): same seam,
    * schema discipline, and dead-letter contract as the image quartet.
    * Everything downstream — window energies, fingerprint packing, the
    * banded join — is COLUMN work. */
  def audioSamplesBatched(df: DataFrame, idCol: String, payloadCol: String,
                          batchSize: Int = 64): Dataset[AudioSamples] = {
    val session = df.sparkSession
    import session.implicits._
    mapBatched(df, idCol, payloadCol, batchSize)(javaSoundMonoSamplesBatch) {
      case (id, _, Some((ch, rate, smp))) => AudioSamples(id, ch, rate, smp)
      case (id, _, None) => AudioSamples(id, -1, -1, Seq.empty)
    }
  }

  /** Energy-delta audio fingerprint over raw samples (the
    * Haitsma–Kalker 2002 shape restated in exact integer Column
    * arithmetic, the dHash move on the time axis): consecutive
    * 32-sample windows, energy E(w) = Σ s² (exact longs — every term
    * ≪ 2^53), bit w = E(w+1) > E(w) for w in 0..63 — 64 bits packed
    * as TWO 32-bit halves held in BIGINTs so neither engine touches
    * the sign bit. Comparing integer energy SUMS (not normalized RMS)
    * keeps every step integer-exact; the SQL oracle restates the
    * arithmetic verbatim.
    *
    * CONTRACT: `samples` must hold exactly 65·32 = 2080 channel-0
    * samples — the window indexing is hardwired to that grid (the
    * dhashHalves contract). Callers must filter on BOTH channels == 1
    * and the sample count first: a short array makes element_at return
    * null, null comparisons pack as 0-bits, and two malformed clips
    * would band-collide as a false duplicate instead of
    * dead-lettering. */
  def energyFingerprintHalves(samples: Column): (Column, Column) = {
    val energies = transform(sequence(lit(0), lit(64)), w =>
      aggregate(sequence(lit(1), lit(32)), lit(0L), (acc, j) => {
        val s = element_at(samples, w * 32 + j).cast("long")
        acc + s * s
      }))
    // shiftleft takes only literal shift amounts — the dhashHalves
    // pow2-lookup move keeps the packing columnar
    val pow2 = lit((0 until 32).map(1L << _).toArray)
    def half(offset: Int): Column =
      aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, i) => {
        val w = i + offset // energies is 1-based: E(w) = element_at(w+1)
        acc + when(
          element_at(energies, w + 2) > element_at(energies, w + 1),
          element_at(pow2, (i + 1).cast("int"))).otherwise(lit(0L))
      })
    (half(0), half(32))
  }

  /** Batched audio feature stage through the SAME [[mapBatched]] seam
    * as the image quartet — schema, batching, dead-letter contract and
    * scale posture identical (map-side, scan parallelism, no shuffle).
    * A production pipeline swaps ffmpeg in behind the same codec
    * signature. */
  def audioFeaturesBatched(df: DataFrame, idCol: String, payloadCol: String,
                           batchSize: Int = 64,
                           codec: Seq[Array[Byte]] => Seq[Option[(Int, Int, Long, Double, Seq[Double])]] =
                             javaSoundAudioBatch): Dataset[AudioFeatures] = {
    val session = df.sparkSession
    import session.implicits._
    mapBatched(df, idCol, payloadCol, batchSize)(codec) {
      case (id, _, Some((ch, rate, fr, dur, rms))) =>
        AudioFeatures(id, ch, rate, fr, dur, rms)
      case (id, _, None) => AudioFeatures(id, -1, -1, -1L, -1.0, Seq.empty)
    }
  }

  // ---- document extraction (mm8): HTML / RTF → plain text -----------

  /** Deterministic HTML → text: script/style blocks dropped, every
    * tag becomes a space, the six common entities unescaped,
    * whitespace collapsed and trimmed. Pure JVM string work — a real
    * extractor, not a stub (the production swap here is a full parser
    * like jsoup behind the same codec signature, exactly the ffmpeg
    * note on the audio stage). */
  def htmlToText(html: String): String = {
    val noBlocks = html
      .replaceAll("(?is)<script\\b[^>]*>.*?</script>", " ")
      .replaceAll("(?is)<style\\b[^>]*>.*?</style>", " ")
      .replaceAll("(?is)<!--.*?-->", " ")
    val noTags = noBlocks.replaceAll("<[^>]*>", " ")
    val unescaped = noTags
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
    unescaped.replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").trim
  }

  /** REAL RTF extraction via the JDK's javax.swing.text.rtf (the
    * java.desktop module the image stages already lean on). Returns
    * None on parse failure — the dead-letter arm. */
  def rtfToText(bytes: Array[Byte]): Option[String] =
    try {
      val kit = new javax.swing.text.rtf.RTFEditorKit()
      val doc = kit.createDefaultDocument()
      kit.read(new java.io.ByteArrayInputStream(bytes), doc, 0)
      Some(doc.getText(0, doc.getLength)
        .replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").trim)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batched document-extraction codec: sniffs the payload — `{\rtf`
    * prefix → RTF (real JDK parse), a leading `<` → HTML tag-strip —
    * and returns (format, text); anything else dead-letters. */
  def docExtractBatch(payloads: Seq[Array[Byte]]): Seq[Option[(String, String)]] =
    payloads.map { bytes =>
      val head = new String(bytes.take(64), java.nio.charset.StandardCharsets.UTF_8)
      val trimmed = head.dropWhile(c =>
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\uFEFF')
      if (trimmed.startsWith("{\\rtf")) rtfToText(bytes).map(("rtf", _))
      else if (trimmed.startsWith("<"))
        Some(("html", htmlToText(
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8))))
      else None
    }

  /** Batched document-extraction stage through the SAME [[mapBatched]]
    * seam as the image quartet and the audio stage — schema, batching,
    * dead-letter contract and scale posture identical (map-side, scan
    * parallelism, no shuffle). */
  def extractTextBatched(df: DataFrame, idCol: String, payloadCol: String,
                         batchSize: Int = 64,
                         codec: Seq[Array[Byte]] => Seq[Option[(String, String)]] =
                           docExtractBatch): Dataset[ExtractedDoc] = {
    val session = df.sparkSession
    import session.implicits._
    mapBatched(df, idCol, payloadCol, batchSize)(codec) {
      case (id, _, Some((fmt, text))) =>
        ExtractedDoc(id, fmt, text.length,
          if (text.isEmpty) 0 else text.split(" ").length, text)
      case (id, _, None) => ExtractedDoc(id, "error", -1, -1, null)
    }
  }
}
