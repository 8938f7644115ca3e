package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal-column plumbing (builder mandate): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, decoded and
  * feature-extracted in executor-side batches.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * grouping, feature arrays. The decode seam ([[decode]]) dispatches on
  * `meta.kind`:
  *   - `image` decodes LIVE via JDK-only `javax.imageio` (PNG/JPEG/BMP/GIF
  *     readers ship with the JDK — no external codec): real pixel
  *     dimensions + an L1-normalized luminance histogram;
  *   - `audio` decodes LIVE via JDK-only `javax.sound.sampled` (WAV/AIFF/AU
  *     parsers ship with the JDK): sample rate + channels + an amplitude
  *     histogram;
  *   - video (and compressed-audio/unreadable payloads) fall back to the
  *     clearly-marked STUB (`decodeStub`) — this container has no
  *     video codecs, so the stub produces a deterministic fake
  *     (byte histogram + hash-derived dimensions). Swapping in a real
  *     decoder (JNI/ffmpeg/javacv) changes only that one function.
  *
  * Batching mirrors `mapInPandas`: `mapPartitions` pulls rows in groups of
  * [[BATCH_SIZE]] so a real decoder could amortize model/codec init per
  * batch instead of per row.
  */
object Multimodal {
  import Tables._

  val BATCH_SIZE = 64
  val FEATURE_DIM = 16

  /** Typed metadata carried next to every binary payload. */
  final case class MediaMeta(
      kind: String,          // image | audio | video | text
      formatHint: String,    // container/extension hint
      nBytes: Long)

  final case class MediaAsset(asset_id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,            // STUB-decoded "dimensions"
      height: Int,
      features: Array[Float])

  /** STUB decoder ===========================================================
    * Fallback for kinds without a codec in this environment (audio/video)
    * and for unreadable payloads. Deterministic fake — dimensions derived
    * from a content hash, features = L1-normalized 16-bin byte histogram.
    * Replace this single function to take audio/video live; images already
    * decode for real via [[decodeImage]].
    * ======================================================================= */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 16 + math.abs(h % 1024)
    val height = 16 + math.abs((h / 1024) % 1024)
    val hist = new Array[Float](FEATURE_DIM)
    payload.foreach(b => hist((b & 0xFF) / FEATURE_DIM) += 1f)
    val total = math.max(payload.length, 1).toFloat
    (width, height, hist.map(_ / total))
  }

  /** LIVE image decoder: JDK-only `javax.imageio` (PNG/JPEG/BMP/GIF readers
    * ship with every JDK). Returns real pixel dimensions and an
    * L1-normalized [[FEATURE_DIM]]-bin luminance histogram (ITU-R BT.601
    * integer weights). None when no installed reader recognizes the bytes —
    * the caller falls back to the stub so one corrupt payload can't fail a
    * 100 TB decode job. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Float](FEATURE_DIM)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          hist(lum * FEATURE_DIM / 256) += 1f
          x += 1
        }
        y += 1
      }
      val total = math.max(w.toLong * h, 1L).toFloat
      Some((w, h, hist.map(_ / total)))
    }
  }

  /** LIVE audio decoder: JDK-only `javax.sound.sampled` (WAV/AIFF/AU
    * parsers ship with every JDK — no external codec). Decodes to signed
    * 16-bit PCM and returns (sample_rate, channels) as the "dimensions"
    * plus an L1-normalized [[FEATURE_DIM]]-bin amplitude histogram — the
    * audio analog of the image luminance histogram. None when no installed
    * reader recognizes the bytes (MP3/OGG land here until a real codec is
    * wired in); the caller falls back to the stub so one bad payload can't
    * fail a 100 TB decode job. */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val f = raw.getFormat
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
        f.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(pcmFmt, raw)
      val bytes = pcm.readAllBytes()
      val hist = new Array[Float](FEATURE_DIM)
      var i = 0
      while (i + 1 < bytes.length) {
        val s = ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort
        hist((s + 32768) / (65536 / FEATURE_DIM)) += 1f
        i += 2
      }
      val n = math.max(bytes.length / 2, 1).toFloat
      Some((f.getSampleRate.toInt, f.getChannels, hist.map(_ / n)))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None // no PCM conversion path
    }
  }

  /** The decode seam q41 runs through: images and audio decode for real
    * (JDK codecs), video and any unreadable payload take the deterministic
    * stub. */
  def decode(kind: String, payload: Array[Byte]): (Int, Int, Array[Float]) =
    kind match {
      case "image" => decodeImage(payload).getOrElse(decodeStub(payload))
      case "audio" => decodeAudio(payload).getOrElse(decodeStub(payload))
      case _ => decodeStub(payload)
    }

  /** documents.text bytes as stand-in binary payloads — exercises the full
    * binary-column path with real distributed data. */
  def assets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        col("source"),
        // byte length of the encoded payload, not the character count —
        // they differ on any multi-byte content
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n"))
      .map(r => MediaAsset(
        r.getLong(0), r.getAs[Array[Byte]](1),
        MediaMeta("text", r.getString(2), r.getLong(3))))
  }

  /** Batched decode + feature extraction. Rows are pulled in BATCH_SIZE
    * groups per partition (the mapInPandas batch shape); output is a flat
    * typed Dataset. */
  def extractFeatures(in: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import in.sparkSession.implicits._
    in.mapPartitions { rows =>
      rows.grouped(BATCH_SIZE).flatMap { batch =>
        // per-batch init hook for a real decoder goes here
        batch.iterator.map { a =>
          val (w, h, feat) = decode(a.meta.kind, a.payload)
          MediaFeatures(a.asset_id, a.meta.kind, a.meta.nBytes, w, h, feat)
        }
      }
    }
  }

  /** Solid-color PNG, encoded with the JDK's own ImageIO writer. A
    * library building block (test-image synthesis) and the image side of
    * [[syntheticAssets]]. */
  def encodeSolidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Silent 16-bit PCM mono WAV at the given rate — the audio side of
    * [[syntheticAssets]]. */
  def encodeSilentWav(sampleRate: Int, nSamples: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](nSamples * 2)),
      fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic binary-asset fixture, synthesized EXECUTOR-SIDE (no
    * checked-in binaries): 16 solid-gray PNGs whose gray level encodes
    * the expected luminance bin (v = 16i + 8 -> bin i exactly, since the
    * BT.601 weights sum to 1000) and 8 silent WAVs at distinct sample
    * rates (silence -> the zero-crossing bin, 8). Every decoded fact —
    * dimensions, sample rate, channel count, histogram argmax — is
    * derivable from first principles, so q94 can hash-check the LIVE
    * JDK decoders against a closed-form oracle: a decoder regression
    * turns a driver CORRECTNESS row red instead of only a spec. */
  def syntheticAssets(s: SparkSession): Dataset[MediaAsset] = {
    import s.implicits._
    s.range(0, 24).map { i =>
      if (i < 16) {
        val v = i.toInt * 16 + 8
        val p = encodeSolidPng(8 + i.toInt, 4 + i.toInt, (v << 16) | (v << 8) | v)
        MediaAsset(i, p, MediaMeta("image", "png", p.length.toLong))
      } else {
        val p = encodeSilentWav(8000 + 1000 * (i.toInt - 16), 256)
        MediaAsset(i, p, MediaMeta("audio", "wav", p.length.toLong))
      }
    }
  }

  /** Deterministic frame sampling STUB for video payloads: byte offsets of
    * every `stride`-th fake frame. Real version seeks keyframes. */
  def sampleFrameOffsets(nBytes: Long, stride: Long = 4096L): Seq[Long] =
    (0L until nBytes by stride).toSeq

  /** LIVE image resize (JDK-only: `java.awt.Graphics2D` bilinear scale +
    * `ImageIO` PNG re-encode — the preprocessing step every vision-data
    * pipeline runs before feature extraction). Returns the resized PNG
    * bytes, or None when no reader recognizes the payload (callers keep
    * the original, same contract as [[decodeImage]]). Runs inside the
    * batched [[extractFeatures]]-style `mapPartitions` shape: pure
    * executor-side CPU, no shuffle, scales with input splits. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w > 0 && h > 0, s"resize target ${w}x$h")
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
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
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** Batched resize over a binary-column Dataset: images scale to
    * `w` x `h`, everything else passes through untouched — the
    * decode-seam dispatch pattern applied to a TRANSFORM (new payload +
    * corrected metadata) instead of an extraction. */
  def resizeAssets(in: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import in.sparkSession.implicits._
    in.mapPartitions { rows =>
      rows.grouped(BATCH_SIZE).flatMap { batch =>
        batch.iterator.map { a =>
          if (a.meta.kind != "image") a
          else resizeImage(a.payload, w, h) match {
            case Some(p) =>
              // the resize re-encodes as PNG regardless of the original
              // container, so the hint must follow the bytes
              MediaAsset(a.asset_id, p,
                a.meta.copy(formatHint = "png", nBytes = p.length.toLong))
            case None => a
          }
        }
      }
    }
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q41_multimodal_features",
      (s, d) => {
        import s.implicits._
        extractFeatures(assets(s, d)).toDF()
          .select(col("asset_id"), col("kind"), col("n_bytes"),
            col("width"), col("height"),
            round(aggregate(col("features"),
              lit(0.0), (acc, x) => acc + x.cast("double")), 6).as("feat_l1"))
          .orderBy(col("asset_id"))
      },
      None, // decode is a stub; plumbing asserted in MultimodalSpec
      "binary-column batched decode + feature extraction (stubbed codec)"),

    QueryDef(
      "q66_multimodal_meta",
      (s, d) => {
        import s.implicits._
        // the SQL-expressible face of the multimodal plumbing: typed
        // payload+metadata Dataset end-to-end, plus the frame-sampling stub
        // (codec-dependent features stay in q41's rows-only check). The
        // 4096-byte stride divides exactly in binary, so ceil() agrees
        // bit-for-bit across engines.
        assets(s, d)
          .map(a => (a.meta.formatHint, a.meta.nBytes,
            sampleFrameOffsets(a.meta.nBytes).size.toLong))
          .toDF("source", "n_bytes", "n_frames")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_bytes")).as("total_bytes"),
            max(col("n_bytes")).as("max_bytes"),
            sum(col("n_frames")).as("total_frames"))
          .orderBy(col("source"))
      },
      Some("""
        SELECT source,
               count(*) AS n,
               cast(sum(octet_length(encode(text))) AS bigint) AS total_bytes,
               max(octet_length(encode(text))) AS max_bytes,
               cast(sum(cast(ceil(octet_length(encode(text)) / 4096.0) AS bigint)) AS bigint) AS total_frames
        FROM documents
        GROUP BY source
        ORDER BY source"""),
      "typed multimodal metadata + frame-sampling stub as an oracle-checkable aggregate"),

    QueryDef(
      "q94_multimodal_decode",
      (s, _) => {
        // the LIVE decoders under the driver gate: [[syntheticAssets]]
        // payloads go through the identical batched mapPartitions path as
        // q41, but every output fact is closed-form — solid-gray PNG i
        // decodes to (8+i, 4+i) with all luminance mass in bin i; silent
        // WAV i decodes to (8000+1000i Hz, 1 channel) with all amplitude
        // mass in bin 8 — so the oracle is a pure range() expression and
        // any decodeImage/decodeAudio regression hash-mismatches.
        extractFeatures(syntheticAssets(s)).toDF()
          .select(col("asset_id"), col("kind"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            (expr("array_position(features, array_max(features))") - 1L)
              .as("top_bin"),
            round(expr("array_max(features)").cast("double"), 6).as("top_val"))
          .orderBy(col("asset_id"))
      },
      Some("""
        SELECT cast(i AS bigint) AS asset_id, 'image' AS kind,
               cast(8 + i AS bigint) AS width, cast(4 + i AS bigint) AS height,
               cast(i AS bigint) AS top_bin, cast(1.0 AS double) AS top_val
        FROM range(16) t(i)
        UNION ALL
        SELECT cast(16 + i AS bigint), 'audio',
               cast(8000 + 1000 * i AS bigint), cast(1 AS bigint),
               cast(8 AS bigint), cast(1.0 AS double)
        FROM range(8) t(i)
        ORDER BY asset_id"""),
      "live JDK image+audio decode over a deterministic synthesized fixture, closed-form oracle")
  )
}
