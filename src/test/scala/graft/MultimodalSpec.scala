package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload schema survives the asset path") {
    val a = Multimodal.assets(spark, SF)
    assert(a.schema("payload").dataType.typeName == "binary")
    val first = a.filter(_.asset_id == 0L).head()
    assert(first.meta.kind == "text" && first.meta.nBytes == first.payload.length)
  }

  test("feature extraction is deterministic, batched, and complete") {
    val f1 = Multimodal.extractFeatures(Multimodal.assets(spark, SF))
      .collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(Multimodal.assets(spark, SF).repartition(7))
      .collect().sortBy(_.asset_id)
    assert(f1.length == 500 && f2.length == 500) // no rows lost to batching
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.asset_id == b.asset_id && a.width == b.width &&
        a.features.sameElements(b.features)) // partitioning-independent
    }
    // histogram is L1-normalized
    assert(math.abs(f1.head.features.map(_.toDouble).sum - 1.0) < 1e-5)
    assert(f1.head.features.length == Multimodal.FEATURE_DIM)
  }

  test("stub decode derives dimensions from content only") {
    val (w1, h1, f1) = Multimodal.decodeStub("hello".getBytes)
    val (w2, h2, f2) = Multimodal.decodeStub("hello".getBytes)
    assert((w1, h1) == ((w2, h2)) && f1.sameElements(f2))
  }

  // in-memory PNG fixture: solid w x h image of one RGB color, written by
  // the JDK's own encoder (the decode side must not trust the encoder, so
  // dims/histogram below are asserted from first principles)
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image payloads decode with the real JDK codec") {
    val Some((bw, bh, bf)) = Multimodal.decodeImage(png(20, 10, 0x000000))
    assert(bw == 20 && bh == 10)
    assert(bf(0) == 1f && bf.drop(1).forall(_ == 0f)) // all-black: luminance bin 0
    val Some((ww, wh, wf)) = Multimodal.decodeImage(png(7, 5, 0xFFFFFF))
    assert(ww == 7 && wh == 5)
    assert(wf.last == 1f) // all-white: luminance 255 -> top bin
    assert(math.abs(wf.map(_.toDouble).sum - 1.0) < 1e-5)
    // bytes no reader recognizes -> None (callers fall back to the stub)
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
  }

  /** In-memory WAV: 16-bit PCM mono sine at the given rate. */
  private def wav(sampleRate: Int, nSamples: Int, amp: Short): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) {
      val s = (math.sin(2 * math.Pi * i / 32) * amp).toInt.toShort
      data(i * 2) = (s & 0xFF).toByte
      data(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio payloads decode with the real JDK codec") {
    val Some((rate, ch, hist)) = Multimodal.decodeAudio(wav(8000, 256, 16000))
    assert(rate == 8000 && ch == 1)
    assert(math.abs(hist.map(_.toDouble).sum - 1.0) < 1e-5)
    // a +/-16000-amplitude sine never reaches the outermost bins
    assert(hist(0) == 0f && hist.last == 0f)
    // silence concentrates in the zero-crossing bin (bin 8 = [0, 4096))
    val Some((_, _, flat)) = Multimodal.decodeAudio(wav(8000, 64, 0))
    assert(flat(8) == 1f, flat.toSeq.toString)
    // bytes no parser recognizes -> None (callers fall back to the stub)
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("image resize scales payloads for real and round-trips the decoder") {
    import Multimodal.{MediaAsset, MediaMeta}
    val big = png(64, 32, 0xFF0000)
    // direct: resized PNG decodes to the target dims, all-red preserved
    val Some(small) = Multimodal.resizeImage(big, 16, 8)
    val Some((w, h, hist)) = Multimodal.decodeImage(small)
    assert(w == 16 && h == 8)
    // pure red: luminance 76 -> bin 4 of 16; bilinear scaling of a solid
    // color must not invent other luminances
    assert(hist(76 * Multimodal.FEATURE_DIM / 256) == 1f, hist.toSeq.toString)
    // unreadable bytes: None, caller keeps the original
    assert(Multimodal.resizeImage(Array[Byte](3, 1, 4), 8, 8).isEmpty)
    // distributed transform: images shrink, non-images pass untouched
    val text = "keep me".getBytes("UTF-8")
    val ds = Seq(
      MediaAsset(1L, big, MediaMeta("image", "png", big.length.toLong)),
      MediaAsset(2L, text, MediaMeta("text", "txt", text.length.toLong))).toDS()
    val out = Multimodal.resizeAssets(ds, 16, 8).collect().sortBy(_.asset_id)
    val Some((rw, rh, _)) = Multimodal.decodeImage(out(0).payload)
    assert(rw == 16 && rh == 8)
    assert(out(0).meta.nBytes == out(0).payload.length.toLong)
    assert(out(1).payload.sameElements(text) && out(1).meta.nBytes == text.length)
  }

  test("the decode seam dispatches by kind through the distributed path") {
    import Multimodal.{MediaAsset, MediaMeta}
    val black = png(20, 10, 0x000000)
    val corrupt = Array[Byte](9, 9, 9)
    val text = "plain".getBytes("UTF-8")
    val ds = Seq(
      MediaAsset(1L, black, MediaMeta("image", "png", black.length.toLong)),
      MediaAsset(2L, corrupt, MediaMeta("image", "png", corrupt.length.toLong)),
      MediaAsset(3L, text, MediaMeta("text", "txt", text.length.toLong))).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.asset_id)
    assert(out(0).width == 20 && out(0).height == 10 && out(0).features(0) == 1f)
    // corrupt image bytes take the stub instead of failing the job
    val (sw, sh, sfeat) = Multimodal.decodeStub(corrupt)
    assert(out(1).width == sw && out(1).height == sh &&
      out(1).features.sameElements(sfeat))
    // non-image kinds keep the stub path
    val (tw, th, tfeat) = Multimodal.decodeStub(text)
    assert(out(2).width == tw && out(2).height == th &&
      out(2).features.sameElements(tfeat))
  }

  test("frame sampling strides the payload") {
    assert(Multimodal.sampleFrameOffsets(10000, 4096) == Seq(0L, 4096L, 8192L))
  }

  test("BMFF probe reads real width/height/duration from the header boxes") {
    val p = Multimodal.buildMp4Header(1920, 1080, 90500)
    assert(p.length == Multimodal.MP4_TOTAL)
    val Some(m) = Multimodal.probeMp4(p)
    assert(m.width == 1920 && m.height == 1080 && m.durationMs == 90500L)
    // the probe parses structure, not our builder: v1 (64-bit) mvhd from a
    // hand-built box must read identically
    val v1 = {
      val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 + 8 + 4 + 8)
      bb.putInt(8 + 32); bb.put("mvhd".getBytes("US-ASCII"))
      bb.putInt(0x01000000) // version 1
      bb.putLong(0L); bb.putLong(0L) // 64-bit times
      bb.putInt(600) // timescale
      bb.putLong(1200L) // duration -> 2000 ms
      bb.array()
    }
    val moov = java.nio.ByteBuffer.allocate(8 + v1.length)
      .putInt(8 + v1.length).put("moov".getBytes("US-ASCII")).put(v1).array()
    assert(Multimodal.probeMp4(moov).contains(Multimodal.VideoMeta(0, 0, 2000L)))
  }

  test("BMFF probe rejects non-BMFF and truncated payloads") {
    assert(Multimodal.probeMp4("not a movie at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.probeMp4(Array.empty[Byte]).isEmpty)
    // a WAV parses as RIFF, not BMFF
    assert(Multimodal.probeMp4(Multimodal.encodeSilentWav(8000, 64)).isEmpty)
    // truncating mid-moov must fall back, not throw
    val p = Multimodal.buildMp4Header(320, 180, 1500)
    assert(Multimodal.probeMp4(p.take(40)).isEmpty)
    // decode seam: unparseable video payloads take the stub
    val garbage = Array[Byte](1, 2, 3, 4)
    val (gw, gh, gfeat) = Multimodal.decode("video", garbage)
    val (sw, sh, sfeat) = Multimodal.decodeStub(garbage)
    assert(gw == sw && gh == sh && gfeat.sameElements(sfeat))
  }

  test("EBML probe reads width/height/duration from a Matroska header") {
    val p = Multimodal.buildMkvHeader(1280, 720, 42000)
    assert(Multimodal.probeMkv(p).contains(Multimodal.VideoMeta(1280, 720, 42000L)))
    // the decode seam reaches MKV after BMFF misses
    val (w, h, _) = Multimodal.decode("video", p)
    assert(w == 1280 && h == 720)
    // rejections: BMFF bytes, garbage, truncation
    assert(Multimodal.probeMkv(Multimodal.buildMp4Header(320, 180, 1500)).isEmpty)
    assert(Multimodal.probeMkv("EBML? not really".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.probeMkv(p.take(12)).isEmpty)
  }

  test("MJPEG-in-AVI decodes REAL frames: dimensions and luminance from pixels") {
    // two solid-gray frames at luminance 136 (mid-bin 8, so JPEG's ±2
    // lossiness cannot cross a bin boundary); the decoder must read the
    // dimensions and histogram from the DECODED pixels, not the header
    val gray = 136
    val frames = Seq.fill(2)(
      Multimodal.encodeSolidJpeg(24, 10, (gray << 16) | (gray << 8) | gray))
    // header lies about dimensions (64x64): the frame truth must win
    val avi = Multimodal.buildMjpegAvi(frames, 64, 64)
    val Some((w, h, feat)) = Multimodal.decodeAviMjpeg(avi)
    assert(w == 24 && h == 10, s"($w, $h) != (24, 10)")
    assert(feat(8) >= 0.99f, s"luminance mass ${feat(8)} not in bin 8")
    assert(math.abs(feat.map(_.toDouble).sum - 1.0) < 1e-5)
    // the decode seam prefers real frames over header probes and stub
    val (dw, dh, dfeat) = Multimodal.decode("video", avi)
    assert(dw == 24 && dh == 10 && dfeat.sameElements(feat))
    // long clips stay inside the bounded decode budget: 100 frames with
    // a divergent tail — the strided sample still reads the first frame's
    // dimensions and a valid mean histogram
    val many = Multimodal.buildMjpegAvi(
      Seq.fill(100)(frames.head), 64, 64)
    val Some((mw, mh, mfeat)) = Multimodal.decodeAviMjpeg(many)
    assert(mw == 24 && mh == 10 && mfeat(8) >= 0.99f)
    // rejections fall through to the existing ladder: BMFF header bytes,
    // garbage, truncated AVI
    assert(Multimodal.decodeAviMjpeg(
      Multimodal.buildMp4Header(320, 180, 1500)).isEmpty)
    assert(Multimodal.decodeAviMjpeg("RIFFnope".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAviMjpeg(avi.take(30)).isEmpty)
    // an AVI whose frames are corrupt (SOI but undecodable) yields None,
    // landing on the stub rather than throwing
    val corrupt = Multimodal.buildMjpegAvi(
      Seq(Array[Byte](0xFF.toByte, 0xD8.toByte, 1, 2, 3)), 8, 8)
    assert(Multimodal.decodeAviMjpeg(corrupt).isEmpty)
    val (_, _, sfeat) = Multimodal.decode("video", corrupt)
    assert(sfeat.sameElements(Multimodal.decodeStub(corrupt)._3))
  }

  test("video assets flow through the distributed decode path with live headers") {
    import Multimodal.{MediaAsset, MediaMeta}
    val p = Multimodal.buildMp4Header(640, 360, 3000)
    val ds = Seq(MediaAsset(7L, p, MediaMeta("video", "mp4", p.length.toLong))).toDS()
    val out = Multimodal.extractFeatures(ds).collect().head
    assert(out.width == 640 && out.height == 360) // header-derived, not stub
    // features are the byte histogram: pad mass exactly MP4_PAD/MP4_TOTAL
    assert(out.features(15) ==
      Multimodal.MP4_PAD.toFloat / Multimodal.MP4_TOTAL)
  }

  test("q41 runs and is row-complete") {
    val df = SparkEntry.queries("q41_multimodal_features")(spark, SF)
    assert(df.count() == 500)
    assert(df.columns.toSeq ==
      Seq("asset_id", "kind", "n_bytes", "width", "height", "feat_l1"))
  }

  test("VideoFrameBridge: a deployed bridge frame-decodes codecs the JVM lacks") {
    import Multimodal.{MediaAsset, MediaMeta}
    val p = Multimodal.buildMp4Header(640, 360, 3000)
    def asset(id: Long, payload: Array[Byte], hint: String) =
      MediaAsset(id, payload, MediaMeta("video", hint, payload.length.toLong))
    spark.conf.set(Multimodal.BRIDGE_CONF, classOf[FakeBmffFrameBridge].getName)
    try {
      // bridge frames beat the header probe: dims + features come from
      // the (fake) decoder's pixels, not from the moov/tkhd metadata
      val out = Multimodal.extractFeatures(Seq(asset(9L, p, "mp4")).toDS())
        .collect().head
      assert(out.width == 320 && out.height == 240,
        s"bridge dims lost: ${out.width}x${out.height}")
      val expected = new Array[Float](Multimodal.FEATURE_DIM)
      for (f <- 0 until 3)
        expected((p.length + f) % Multimodal.FEATURE_DIM) += 1f / 3
      assert(out.features.sameElements(expected),
        "features are not the mean of the bridge's per-frame histograms")
      // an MJPEG AVI still takes the LIVE in-process decode, bridge or not
      val gray = 136
      val avi = Multimodal.buildMjpegAvi(Seq(
        Multimodal.encodeSolidJpeg(24, 10, (gray << 16) | (gray << 8) | gray)), 64, 64)
      val out2 = Multimodal.extractFeatures(Seq(asset(10L, avi, "avi")).toDS())
        .collect().head
      assert(out2.width == 24 && out2.height == 10)
      // payloads the bridge declines (non-BMFF) fall through to the
      // header probes exactly as without a bridge
      val mkv = Multimodal.buildMkvHeader(1280, 720, 42000)
      val out3 = Multimodal.extractFeatures(Seq(asset(11L, mkv, "mkv")).toDS())
        .collect().head
      assert(out3.width == 1280 && out3.height == 720)
    } finally spark.conf.unset(Multimodal.BRIDGE_CONF)
    // a THROWING bridge degrades to the header probe, never fails the row
    val (w, h, _) = Multimodal.decode("video", p, Some(new ThrowingFrameBridge))
    assert(w == 640 && h == 360)
    // the per-JVM instance cache hands back the same bridge object
    val cn = classOf[FakeBmffFrameBridge].getName
    assert(graft.functions.VideoFrameBridge.forName(cn) eq
      graft.functions.VideoFrameBridge.forName(cn))
  }

  test("dHash: encode/decode roundtrip plants the exact pattern word") {
    for (g <- Seq(0L, 7L, 47L); v <- Seq(0L, 4L, 6L)) {
      val word = Multimodal.dhashPatternWord(g, v)
      assert(Multimodal.dhashImage(Multimodal.encodeDhashPng(word, 0))
        .contains(word), s"g=$g v=$v")
    }
  }

  test("dHash is invariant to brightness shift and lossless re-encode") {
    val word = Multimodal.dhashPatternWord(13L, 0L)
    val base = Multimodal.encodeDhashPng(word, 0)
    val bright = Multimodal.encodeDhashPng(word, 12)
    assert(!base.sameElements(bright)) // byte-DIFFERENT payloads...
    assert(Multimodal.dhashImage(bright).contains(word)) // ...same hash
    // decode the PNG, re-encode the same pixels as BMP: same hash
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    assert(Multimodal.dhashImage(bos.toByteArray).contains(word))
  }

  test("dHash resize path: a large horizontal gradient hashes to all-ones") {
    // 90x70, strictly increasing in x: bilinear downscale to 9x7 keeps
    // every adjacent-column comparison strictly increasing -> all 56 bits
    val img = new java.awt.image.BufferedImage(
      90, 70, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 70; x <- 0 until 90) {
      val p = 20 + 2 * x
      img.setRGB(x, y, (p << 16) | (p << 8) | p)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.dhashImage(bos.toByteArray)
      .contains((1L << Multimodal.DHASH_BITS) - 1))
  }

  test("banded hamming candidates are exact vs brute force at <=2") {
    val hashes = Multimodal.imageDhashes(
      Multimodal.syntheticImageCorpus(spark)).cache()
    val banded = Multimodal.imageNearDupPairs(hashes, maxHamming = 2)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    val hs = hashes.as[(Long, Long)].collect()
    val brute = (for {
      (ia, ha) <- hs.iterator; (ib, hb) <- hs.iterator
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d >= 1 && d <= 2
    } yield (ia, ib)).toSet
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    assert(brute.nonEmpty) // the fixture actually plants near dups
    hashes.unpersist()
  }

  test("incremental image onboarding = full match relation restricted to incoming pairs") {
    val hashes = Multimodal.imageDhashes(
      Multimodal.syntheticImageCorpus(spark)).cache()
    def isNew(id: Long) = id / 48 == 3 || id / 48 == 6
    val inc = Multimodal.imageNearDupPairsIncremental(hashes, maxHamming = 2,
        expr("asset_id div 48").isin(3, 6))
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    val hs = hashes.as[(Long, Long)].collect()
    val brute = (for {
      (ia, ha) <- hs.iterator; (ib, hb) <- hs.iterator
      if ia < ib && (isNew(ia) || isNew(ib))
      if java.lang.Long.bitCount(ha ^ hb) <= 2 // exact dups included
    } yield (ia, ib)).toSet
    assert(inc == brute, s"incremental ${inc.size} vs brute ${brute.size}")
    // exact dups (hamming 0) must be present: the incoming v=3
    // brightness re-encode matches its v=0..2 existing twins hash-equal
    assert(brute.exists { case (a, b) => hs.toMap.apply(a) == hs.toMap.apply(b) })
    // and MIXED pairs exist — the batch cuts within groups, not across
    assert(brute.exists { case (a, b) => isNew(a) != isNew(b) })

    // the stored-index probe (q142_probe_stored's operator) is
    // output-identical to the live incremental join on the same corpus:
    // banding is pigeonhole-exact whether the bands come from a stored
    // parquet or a live explode
    val probed = Multimodal.probeImageBandIndex(
        Multimodal.imageBandIndex(hashes),
        hashes.filter(expr("asset_id div 48").isin(3, 6)), maxHamming = 2)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(probed == brute, s"stored probe ${probed.size} vs brute ${brute.size}")

    // new-new coverage: two images ABSENT from the index that match each
    // other must still pair (the build side unions the batch's bands)
    val idxOld = Multimodal.imageBandIndex(
      hashes.filter(!expr("asset_id div 48").isin(3, 6)))
    val newNew = Multimodal.probeImageBandIndex(idxOld,
        hashes.filter(expr("asset_id div 48").isin(3, 6)), maxHamming = 2)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    val bruteNN = (for {
      (ia, ha) <- hs.iterator; (ib, hb) <- hs.iterator
      if ia < ib && (isNew(ia) || isNew(ib))
      if java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (ia, ib)).toSet
    assert(newNew == bruteNN, s"probe vs disjoint index: ${newNew.size} vs ${bruteNN.size}")
    assert(newNew.exists { case (a, b) => isNew(a) && isNew(b) },
      "expected at least one new-new pair (v=3 vs v=6 of the same group)")
    hashes.unpersist()
  }

  test("audio fingerprint: WAV roundtrip plants the word; gain leaves it alone") {
    for (g <- Seq(0L, 11L, 47L); v <- Seq(0L, 5L, 7L)) {
      val word = Multimodal.afpPatternWord(g, v)
      assert(Multimodal.audioFingerprint(Multimodal.encodeFpWav(word, 4))
        .contains(word), s"g=$g v=$v")
    }
    val word = Multimodal.afpPatternWord(23L, 0L)
    val unit = Multimodal.encodeFpWav(word, 4)
    for (gain <- Seq(5, 6, 7)) {
      val scaled = Multimodal.encodeFpWav(word, gain)
      assert(!unit.sameElements(scaled)) // the clip at another volume...
      assert(Multimodal.audioFingerprint(scaled).contains(word)) // ...same fp
    }
    assert(Multimodal.audioFingerprint("not audio".getBytes).isEmpty)
  }
}

/** Fake external decoder for the [[graft.functions.VideoFrameBridge]]
  * contract test: "handles" only BMFF payloads (the codec family the JVM
  * cannot frame-decode) and returns deterministic frames derived from the
  * payload bytes — the shape a real ffmpeg/JNI bridge would produce. */
class FakeBmffFrameBridge extends graft.functions.VideoFrameBridge {
  def decodeFrames(payload: Array[Byte], maxFrames: Int)
      : Option[graft.functions.VideoFrameBridge.Frames] =
    if (payload.length < 8 || new String(payload, 4, 4, "US-ASCII") != "ftyp") None
    else {
      val hists = (0 until math.min(maxFrames, 3)).map { f =>
        val h = new Array[Float](graft.functions.Multimodal.FEATURE_DIM)
        h((payload.length + f) % h.length) = 1f
        h
      }
      Some(graft.functions.VideoFrameBridge.Frames(320, 240, hists))
    }
}

/** A buggy bridge build: the decode chain must catch and fall through. */
class ThrowingFrameBridge extends graft.functions.VideoFrameBridge {
  def decodeFrames(payload: Array[Byte], maxFrames: Int)
      : Option[graft.functions.VideoFrameBridge.Frames] =
    throw new RuntimeException("native decoder exploded")
}
