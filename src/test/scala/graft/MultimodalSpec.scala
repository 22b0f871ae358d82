package graft

import graft.operators.Multimodal

/** Multimodal plumbing: typed mapPartitions decode over real codecs
  * (ImageIO images, hand-parsed WAV PCM, MJPEG-in-AVI frames),
  * metadata-driven frame sampling, size-balanced repartitioning.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.core.Tables.read(spark, "/root/testdata/sf0.001", "documents")
  private lazy val media = Multimodal.fromDocuments(docs)

  test("decodeFeatures over text bytes is all sentinels (no modality decodes)") {
    val feats = Multimodal.decodeFeatures(media)
    val row = feats.filter(_.media_id == 0L).head()
    val text = docs.filter($"doc_id" === 0).select("text").as[String].head()
    assert(row.n_bytes === text.getBytes("UTF-8").length.toLong)
    assert(!row.decoded && row.f0 === -1.0 && row.f3 === -1.0)
    assert(feats.filter(_.decoded).isEmpty,
      "text bytes must not decode under any modality")
    // narrow map: no exchange in the plan
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  private def pngBytes(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImages decodes a real 2x2 PNG with exact features") {
    // top row pure red, bottom row pure blue:
    // mean_r = (255+255)/(4*255) = 0.5, mean_g = 0, mean_b = 0.5
    val png = pngBytes(Array(
      Array(0xff0000, 0xff0000),
      Array(0x0000ff, 0x0000ff)))
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, 1),
      // image-kinded but NOT decodable (text bytes, no magic)
      Multimodal.MediaRow(2L, "image", "plain text".getBytes("UTF-8"), 1),
      // decodable bytes but audio-kinded: must NOT be decoded
      Multimodal.MediaRow(3L, "audio", png, 1)
    ).toDS()
    val got = Multimodal.decodeImages(rows).collect()
      .map(f => f.media_id -> f).toMap
    val ok = got(1L)
    assert(ok.decoded && ok.width === 2 && ok.height === 2)
    assert(ok.mean_r === 0.5 && ok.mean_g === 0.0 && ok.mean_b === 0.5)
    assert(ok.n_bytes === png.length.toLong)
    assert(!got(2L).decoded && got(2L).width === -1)
    assert(!got(3L).decoded, "non-image kinds must pass through")
  }

  test("decodeImages handles JPEG and stays shuffle-free") {
    val img = new java.awt.image.BufferedImage(
      3, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 3) img.setRGB(x, y, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val rows = Seq(Multimodal.MediaRow(7L, "image", out.toByteArray, 1)).toDS()
    val decoded = Multimodal.decodeImages(rows)
    val f = decoded.head()
    // JPEG is lossy: pin the geometry exactly, the channel means loosely
    assert(f.decoded && f.width === 3 && f.height === 5)
    assert(math.abs(f.mean_r - 0x80 / 255.0) < 0.05, f.toString)
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  /** Minimal PCM WAV builder (RIFF + fmt + data chunks). */
  private def wavBytes(rate: Int, channels: Int, bits: Int,
                       samples: Array[Int]): Array[Byte] = {
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    def le16(v: Int): Unit =
      (0 until 2).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(channels); le32(rate)
    le32(rate * channels * bytesPer); le16(channels * bytesPer); le16(bits)
    out.write("data".getBytes("US-ASCII")); le32(dataLen)
    samples.foreach { s =>
      if (bits == 8) out.write(s & 0xff) else le16(s & 0xffff)
    }
    out.toByteArray
  }

  test("decodeAudio parses real 16-bit PCM WAV with exact features") {
    // 8000 Hz mono, 4000 samples of a +/-16384 square wave:
    // duration 0.5 s exactly, RMS = 16384/32768 = 0.5 exactly
    val sq = Array.tabulate(4000)(i => if (i % 2 == 0) 16384 else -16384)
    val wav = wavBytes(8000, 1, 16, sq)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav, 1),
      Multimodal.MediaRow(2L, "audio", "not audio".getBytes("UTF-8"), 1),
      // decodable bytes but image-kinded: must pass through
      Multimodal.MediaRow(3L, "image", wav, 1)
    ).toDS()
    val got = Multimodal.decodeAudio(rows).collect()
      .map(f => f.media_id -> f).toMap
    val ok = got(1L)
    assert(ok.decoded && ok.sample_rate === 8000 && ok.channels === 1 &&
      ok.bits === 16)
    assert(ok.n_samples === 4000L && ok.duration_s === 0.5)
    assert(ok.rms === 0.5, ok.toString)
    assert(!got(2L).decoded && got(2L).sample_rate === -1)
    assert(!got(3L).decoded, "non-audio kinds must pass through")
  }

  test("decodeAudio handles 8-bit stereo and rejects non-PCM formats") {
    // 2 channels, 8-bit unsigned: constant 192 = +0.5 amplitude
    val st = Array.fill(1000)(192)
    val wav = wavBytes(4000, 2, 8, st)
    val f = Multimodal.decodeAudio(
      Seq(Multimodal.MediaRow(7L, "audio", wav, 1)).toDS()).head()
    assert(f.decoded && f.channels === 2 && f.bits === 8)
    assert(f.n_samples === 500L && f.duration_s === 0.125)
    assert(f.rms === 0.5, f.toString)
    // same container, float format tag (3): decoded=false, not garbage
    val nonPcm = wavBytes(4000, 1, 16, Array(0, 0))
    nonPcm(20) = 3 // audioFormat = 3 (IEEE float)
    val g = Multimodal.decodeAudio(
      Seq(Multimodal.MediaRow(8L, "audio", nonPcm, 1)).toDS()).head()
    assert(!g.decoded)
  }

  test("adversarial chunk lengths fall to sentinels, never task failures") {
    // a crafted fmt-chunk length near Int.MaxValue wraps an Int bound
    // check (off + 8 + len < 0) — the parse must reject it in Long
    // arithmetic and emit decoded=false, not throw
    val evil = wavBytes(8000, 1, 16, Array(0, 0))
    def patchLe32(b: Array[Byte], off: Int, v: Int): Unit =
      (0 until 4).foreach(i => b(off + i) = ((v >>> (8 * i)) & 0xff).toByte)
    patchLe32(evil, 16, Int.MaxValue - 4) // fmt chunk claims ~2 GiB body
    // and one with the data chunk length poisoned instead
    val evil2 = wavBytes(8000, 1, 16, Array(0, 0))
    patchLe32(evil2, 40, Int.MaxValue - 4)
    val got = Multimodal.decodeAudio(Seq(
      Multimodal.MediaRow(1L, "audio", evil, 1),
      Multimodal.MediaRow(2L, "audio", evil2, 1)).toDS()).collect()
    assert(got.forall(!_.decoded), got.mkString(", "))
    // corrupt image bytes with a valid PNG magic: ImageIO codecs may
    // throw RuntimeExceptions — must land on the sentinel row
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a) ++ Array.fill[Byte](64)(0x41)
    val img = Multimodal.decodeImages(Seq(
      Multimodal.MediaRow(3L, "image", fakePng, 1)).toDS()).head()
    assert(!img.decoded && img.width === -1)
  }

  /** Minimal ISO-BMFF builder: boxes as (type, body). */
  private def box(tpe: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val size = 8 + body.length
    (3 to 0 by -1).foreach(i => out.write((size >>> (8 * i)) & 0xff))
    out.write(tpe.getBytes("US-ASCII")); out.write(body)
    out.toByteArray
  }
  private def be32(v: Long): Array[Byte] =
    (3 to 0 by -1).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  test("probeVideo reads mvhd timescale/duration and counts tracks") {
    // mvhd v0: version+flags, created, modified, timescale 1000,
    // duration 7500 units = 7.5 s; two trak children
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(7500))
    val trak = box("trak", Array.emptyByteArray)
    val moov = box("moov", mvhd ++ trak ++ trak)
    val mp4 = box("ftyp", "isom0000".getBytes("US-ASCII")) ++ moov
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", mp4, 1),
      Multimodal.MediaRow(2L, "video", "not a video".getBytes("UTF-8"), 1),
      Multimodal.MediaRow(3L, "audio", mp4, 1) // wrong kind: passthrough
    ).toDS()
    val got = Multimodal.probeVideo(rows).collect()
      .map(v => v.media_id -> v).toMap
    val ok = got(1L)
    assert(ok.probed && ok.timescale === 1000 && ok.duration_units === 7500L)
    assert(ok.duration_s === 7.5 && ok.n_tracks === 2)
    assert(!got(2L).probed && got(2L).timescale === -1)
    assert(!got(3L).probed, "non-video kinds must pass through")
    // mvhd v1 (64-bit duration) parses too
    val mvhd1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(600) ++ be32(0) ++ be32(1200))
    val mp41 = box("moov", mvhd1 ++ trak)
    val g1 = Multimodal.probeVideo(
      Seq(Multimodal.MediaRow(9L, "video", mp41, 1)).toDS()).head()
    assert(g1.probed && g1.timescale === 600 && g1.duration_units === 1200L)
    assert(g1.duration_s === 2.0 && g1.n_tracks === 1)
    // truncated/lying box sizes fail loudly into the sentinel
    val bad = mp4.take(mp4.length - 3)
    val gb = Multimodal.probeVideo(
      Seq(Multimodal.MediaRow(10L, "video", bad, 1)).toDS()).head()
    assert(!gb.probed)
  }

  /** Minimal MJPEG-style AVI builder: RIFF(AVI ) with LIST(hdrl avih)
    * and LIST(movi) holding one 00dc chunk per frame payload.
    */
  private def aviBytes(microPerFrame: Int,
                       frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32b(v: Int): Array[Byte] =
      (0 until 4).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32b(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    val avih = chunk("avih", le32b(microPerFrame) ++ Array.fill[Byte](36)(0))
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih)
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.map(f => chunk("00dc", f)).foldLeft(Array.emptyByteArray)(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32b(body.length) ++ body
  }

  private def solidPng(rgb: Int): Array[Byte] =
    pngBytes(Array(Array(rgb, rgb), Array(rgb, rgb)))

  test("decodeVideoFrames decodes AVI frames with exact luma/motion") {
    // black, white, black @ 40000 us/frame = 25 fps; PNG payloads are
    // lossless so channel means are exact: luma(white) = .299+.587+.114
    val avi = aviBytes(40000,
      Seq(solidPng(0x000000), solidPng(0xffffff), solidPng(0x000000)))
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", avi, 3),
      Multimodal.MediaRow(2L, "video", "not a video".getBytes("UTF-8"), 1),
      Multimodal.MediaRow(3L, "image", avi, 3) // wrong kind: passthrough
    ).toDS()
    val got = Multimodal.decodeVideoFrames(rows).collect()
      .map(v => v.media_id -> v).toMap
    val ok = got(1L)
    val w = 0.299 * 1.0 + 0.587 * 1.0 + 0.114 * 1.0
    assert(ok.decoded && ok.n_frames === 3 && ok.n_decoded === 3)
    assert(ok.width === 2 && ok.height === 2 && ok.fps === 25.0)
    assert(math.abs(ok.mean_luma - w / 3) < 1e-12, ok.toString)
    assert(math.abs(ok.motion - w) < 1e-12, ok.toString)
    assert(!got(2L).decoded && got(2L).n_frames === -1)
    assert(!got(3L).decoded, "non-video kinds must pass through")
  }

  test("decodeVideoFrames samples every step-th frame and rejects junk") {
    val avi = aviBytes(40000,
      Seq(solidPng(0x000000), solidPng(0xffffff), solidPng(0x000000)))
    // step=2 decodes frames 0 and 2 (both black): luma 0, motion 0
    val s2 = Multimodal.decodeVideoFrames(
      Seq(Multimodal.MediaRow(1L, "video", avi, 3)).toDS(), step = 2).head()
    assert(s2.decoded && s2.n_frames === 3 && s2.n_decoded === 2)
    assert(s2.mean_luma === 0.0 && s2.motion === 0.0)
    // frames that are not ImageIO-decodable: container parses but
    // nothing decodes -> sentinel, not a crash
    val junkFrames = aviBytes(40000, Seq(
      "garbage-1".getBytes("UTF-8"), "garbage-2".getBytes("UTF-8")))
    val g = Multimodal.decodeVideoFrames(
      Seq(Multimodal.MediaRow(2L, "video", junkFrames, 2)).toDS()).head()
    assert(!g.decoded)
    // real MJPEG: JPEG frame payloads decode via the same ImageIO path
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val mjpeg = aviBytes(33333, Seq(out.toByteArray, out.toByteArray))
    val mj = Multimodal.decodeVideoFrames(
      Seq(Multimodal.MediaRow(3L, "video", mjpeg, 2)).toDS()).head()
    assert(mj.decoded && mj.n_decoded === 2 && mj.width === 4)
    assert(math.abs(mj.mean_luma - 0x80 / 255.0) < 0.05, mj.toString)
    assert(mj.motion === 0.0) // identical frames
    // poisoned chunk length near Int.MaxValue -> sentinel (Long bounds)
    val evil = aviBytes(40000, Seq(solidPng(0)))
    // first movi frame chunk length field: find "00dc" and poison it
    val idx = evil.toIndexedSeq.indexOfSlice(
      "00dc".getBytes("US-ASCII").toIndexedSeq)
    (0 until 4).foreach(i =>
      evil(idx + 4 + i) = (((Int.MaxValue - 4) >>> (8 * i)) & 0xff).toByte)
    val ev = Multimodal.decodeVideoFrames(
      Seq(Multimodal.MediaRow(4L, "video", evil, 1)).toDS()).head()
    assert(!ev.decoded)
  }

  test("decodeFeatures dispatches each modality to its real decoder") {
    val png = pngBytes(Array(
      Array(0xff0000, 0xff0000),
      Array(0x0000ff, 0x0000ff)))
    val sq = Array.tabulate(4000)(i => if (i % 2 == 0) 16384 else -16384)
    val wav = wavBytes(8000, 1, 16, sq)
    val avi = aviBytes(40000,
      Seq(solidPng(0x000000), solidPng(0xffffff), solidPng(0x000000)))
    val got = Multimodal.decodeFeatures(Seq(
      Multimodal.MediaRow(1L, "image", png, 1),
      Multimodal.MediaRow(2L, "audio", wav, 1),
      Multimodal.MediaRow(3L, "video", avi, 3),
      // each modality with undecodable bytes -> sentinel
      Multimodal.MediaRow(4L, "image", wav, 1),
      Multimodal.MediaRow(5L, "audio", avi.take(64).toArray, 1),
      Multimodal.MediaRow(6L, "video", png, 1)
    ).toDS()).collect().map(f => f.media_id -> f).toMap
    val img = got(1L) // mean_r .5, mean_g 0, mean_b .5, aspect 2/(2+2)
    assert(img.decoded && img.f0 === 0.5 && img.f1 === 0.0 &&
      img.f2 === 0.5 && img.f3 === 0.5)
    val aud = got(2L) // rms .5, zcr 1.0 (alternating), |amp| .5, 8k/48k
    assert(aud.decoded && aud.f0 === 0.5 && aud.f1 === 1.0 &&
      aud.f2 === 0.5 && aud.f3 === 8000.0 / 48000.0)
    val vid = got(3L) // luma w/3, motion w, 3/100 frames, aspect .5
    val w = 0.299 + 0.587 + 0.114
    assert(vid.decoded && math.abs(vid.f0 - w / 3) < 1e-12 &&
      math.abs(vid.f1 - w) < 1e-12 && vid.f2 === 0.03 && vid.f3 === 0.5)
    Seq(4L, 5L, 6L).foreach { id =>
      assert(!got(id).decoded && got(id).f0 === -1.0, s"media $id")
    }
  }

  test("frame sampling steps through n_frames by the given stride") {
    val frames = Multimodal.frameSample(media, 10)
    val one = media.filter(_.media_id == 1L).head()
    val got = frames.filter($"media_id" === 1)
      .select("frame_idx").as[Int].collect().sorted.toSeq
    assert(got === (0 until one.n_frames by 10).toSeq)
  }

  test("size-balanced repartition preserves rows") {
    val balanced = Multimodal.sizeBalanced(media, 4)
    assert(balanced.count() === media.count())
    assert(balanced.rdd.getNumPartitions === 4)
  }

  test("resizeMedia: non-image fallback truncates, undecodable images pass through") {
    val resized = Multimodal.resizeMedia(media, 16, 16, 4)
    val rows = resized.collect()
    assert(rows.length === media.count())
    rows.foreach { r =>
      if (r.kind == "image") {
        // document text bytes never decode as an image → sentinel
        // passthrough, visible as dst_bytes == src_bytes
        assert(r.dst_bytes === r.src_bytes, r.media_id.toString)
      } else {
        // audio/video keep the deterministic truncation fallback
        assert(r.dst_bytes === (r.src_bytes + 3) / 4, r.media_id.toString)
      }
      assert(r.content.length.toLong === r.dst_bytes)
    }
    // narrow map: no exchange in the plan
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("resizeMedia downscales a real PNG into the box with exact dims and color") {
    // 20x10 solid orange: fit into 8x8 → scale 0.4 → exactly 8x4
    val png = pngBytes(Array.fill(10)(Array.fill(20)(0xc86414)))
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, 1),
      // smaller than the box on both axes: never upscaled
      Multimodal.MediaRow(2L, "image",
        pngBytes(Array.fill(4)(Array.fill(3)(0x102030))), 1)
    ).toDS()
    val out = Multimodal.resizeMedia(rows, 8, 8, 4).collect()
      .map(r => r.media_id -> r).toMap
    // re-decode the resized payloads: dims follow fitDims, and a solid
    // color survives bilinear downscale + lossless PNG bit-exactly
    val re = Multimodal.decodeImages(
      out.values.toSeq.map(r =>
        Multimodal.MediaRow(r.media_id, "image", r.content, 1)).toDS())
      .collect().map(f => f.media_id -> f).toMap
    assert(re(1L).decoded && re(1L).width === 8 && re(1L).height === 4)
    assert(re(1L).mean_r === 0xc8 / 255.0)
    assert(re(1L).mean_g === 0x64 / 255.0)
    assert(re(1L).mean_b === 0x14 / 255.0)
    assert(re(2L).decoded && re(2L).width === 3 && re(2L).height === 4)
    assert(re(2L).mean_b === 0x30 / 255.0)
  }

  test("fitDims floors from one shared scale and never upscales") {
    assert(Multimodal.fitDims(20, 10, 8, 8) === ((8, 4)))
    assert(Multimodal.fitDims(10, 20, 8, 8) === ((4, 8)))
    assert(Multimodal.fitDims(3, 4, 8, 8) === ((3, 4)))
    assert(Multimodal.fitDims(1000, 1, 8, 8) === ((8, 1)))
    assert(Multimodal.fitDims(16, 16, 16, 16) === ((16, 16)))
  }

  test("syntheticPngs roundtrip: oracle-predicted dims and channel means") {
    val fixture = Multimodal.syntheticPngs(
      docs.filter($"doc_id".isin(0L, 7L, 123L)))
    val got = Multimodal.decodeImages(fixture).collect()
      .map(f => f.media_id -> f).toMap
    for (id <- Seq(0L, 7L, 123L)) {
      val f = got(id)
      assert(f.decoded, id.toString)
      assert(f.width === 8 + (id % 25).toInt, id.toString)
      assert(f.height === 8 + ((id * 7) % 25).toInt, id.toString)
      assert(f.mean_r === ((id * 37) % 256).toDouble / 255.0, id.toString)
      assert(f.mean_g === ((id * 59) % 256).toDouble / 255.0, id.toString)
      assert(f.mean_b === ((id * 83) % 256).toDouble / 255.0, id.toString)
    }
  }

  test("audioFrames: hand-recomputed RMS/zero-crossings, short tail frame") {
    // doc 1: n = 257 samples → 5 frames of 64,64,64,64,1; recompute
    // every feature independently from the synthetic-PCM formula
    val frames = Multimodal.audioFrames(
        Multimodal.syntheticWavs(docs.filter($"doc_id" === 1L)), 64)
      .collect().sortBy(_.frame_id)
    assert(frames.map(_.n_samples).toSeq === Seq(64L, 64L, 64L, 64L, 1L))
    val pcm = Array.tabulate(257)(i => ((31 + i.toLong * 17) % 256).toInt)
    for (f <- frames) {
      val lo = f.frame_id * 64
      val c = pcm.slice(lo, math.min(lo + 64, 257))
        .map(v => (v - 128) / 128.0)
      var acc = 0.0; c.foreach(x => acc += x * x)
      assert(f.rms === math.sqrt(acc / c.length), s"frame ${f.frame_id}")
      assert(f.zcross ===
        c.sliding(2).count(p => p.length == 2 && p(0) * p(1) < 0).toLong,
        s"frame ${f.frame_id}")
    }
    // tail frame of one sample can have no crossings
    assert(frames.last.zcross === 0L)
  }

  test("audioFrames emits no rows for non-audio or undecodable bytes") {
    val junk = Seq(
      Multimodal.MediaRow(1L, "image", Array[Byte](1, 2, 3), 1),
      Multimodal.MediaRow(2L, "audio", "not a wav at all".getBytes, 1),
      Multimodal.MediaRow(3L, "audio", Array.empty[Byte], 1)).toDS()
    assert(Multimodal.audioFrames(junk, 64).isEmpty)
    // and the plan stays a narrow map — no exchange
    val plan = Multimodal.audioFrames(junk, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("aHash: hand-built 8x8 image hashes to the predicted bits") {
    // top half gray 10, bottom half gray 200: total = 32*10 + 32*200
    // = 6720; bit set iff gray*64 > 6720 -> only the 200s (rows 4-7,
    // bits 32..63) -> hex ffffffff00000000
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val g = if (y < 4) 10 else 200
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Multimodal.aHash(
      Seq(Multimodal.MediaRow(7L, "image", bos.toByteArray, 1)).toDS())
      .collect()
    assert(rows.length === 1)
    assert(rows.head.decoded)
    assert(rows.head.ahash === "ffffffff00000000")
  }

  test("aHash sentinels undecodable or wrong-size blobs; dedup drops them") {
    val junk = Seq(
      Multimodal.MediaRow(1L, "image", Array[Byte](9, 9, 9), 1),
      Multimodal.MediaRow(2L, "image", Array.empty[Byte], 1)).toDS()
    val rows = Multimodal.aHash(junk).collect()
    assert(rows.forall(r => !r.decoded && r.ahash == ""))
    assert(Multimodal.aHashDedup(junk).count() === 0L)
  }

  test("dHash reads gradients and survives a global brightness shift") {
    def png(shift: Int): Array[Byte] = {
      // gray ramp 8*x + shift: every horizontal gradient positive
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val g = math.min(255, 8 * x + shift)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Multimodal.dHash(Seq(
      Multimodal.MediaRow(1L, "image", png(0), 1),
      Multimodal.MediaRow(2L, "image", png(40), 1), // brighter copy
      Multimodal.MediaRow(3L, "image", Array[Byte](1, 2), 1)).toDS())
      .collect().map(r => r.media_id -> r).toMap
    // all 56 gradient bits set: (1 << 56) - 1
    assert(rows(1L).dhash === (1L << 56) - 1L)
    // aHash of the two WOULD differ per-pixel; dHash is shift-invariant
    assert(rows(2L).dhash === rows(1L).dhash)
    assert(!rows(3L).decoded && rows(3L).dhash === -1L)
    // and the pair search finds the brightness-shifted copy at ham 0
    val pairs = Multimodal.dHashPairs(Seq(
      Multimodal.MediaRow(1L, "image", png(0), 1),
      Multimodal.MediaRow(2L, "image", png(40), 1)).toDS(), 3, 64)
      .collect()
    assert(pairs.length === 1)
    assert(pairs.head.getInt(2) === 0)
  }

  test("aHash groups re-encoded copies of the same pixels together") {
    val docs = (0L until 600L).map(i => (i, s"d$i"))
      .toDF("doc_id", "text")
    val dedup = Multimodal.aHashDedup(Multimodal.syntheticGrayPngs(docs))
      .collect()
    // ids congruent mod 256 share a pattern: 256 perceptual groups at
    // most (fewer when two residues collide on the same bit pattern)
    assert(dedup.length <= 256)
    assert(dedup.map(_.getLong(1)).sum === 600L)
    // keeper is the smallest id in its group; groups of >= 2 exist
    assert(dedup.exists(_.getLong(1) >= 2L))
    dedup.foreach(r => assert(r.getLong(2) < 256L))
  }
}
