package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-codec multimodal contract:
  *   - the kernel decodes ACTUAL bytes (a hand-built PNG whose dims follow
  *     no fixture formula comes back with its true dims);
  *   - animated-GIF frame sampling reads real rasters (per-frame solid
  *     colors survive palettization exactly);
  *   - WAV audio headers parse to rate/channels/frames;
  *   - malformed/truncated/empty/null payloads follow the ok=false
  *     zeroed-metadata null policy instead of failing the job.
  */
class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("decode reads the actual PNG header, not an id/length formula") {
    val img = new java.awt.image.BufferedImage(123, 45,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val m = JdkCodec.decode(bos.toByteArray, "image")
    assert(m.ok && m.width == 123 && m.height == 45 && m.nFrames == 1)
  }

  test("fixture PNG / GIF / WAV decode to their closed-form metadata") {
    for (id <- Seq(3L, 6L, 66L, 300L)) { // images
      val m = JdkCodec.decode(Fixtures.mediaFor(id).content, "image")
      assert(m.ok && m.width == 1 + id % 64 && m.height == 1 + (id * 7) % 48)
    }
    for (id <- Seq(2L, 5L, 65L, 299L)) { // gif videos
      val m = JdkCodec.decode(Fixtures.mediaFor(id).content, "video")
      assert(m.ok && m.width == 1 + id % 32 && m.height == 1 + (id * 7) % 24)
      assert(m.nFrames == 1 + id % 30)
    }
    for (id <- Seq(1L, 4L, 64L, 298L)) { // wav audio
      val m = JdkCodec.decode(Fixtures.mediaFor(id).content, "audio")
      assert(m.ok && m.sampleRate == 8000 && m.channels == 1 + id % 2)
      assert(m.nFrames == 100 + id % 400 && m.width == 0 && m.height == 0)
    }
  }

  test("GIF frame sampling decodes real per-frame pixels") {
    val id = 29L // video: 30 frames, sampled at stride 5 -> 6 frames
    val frames = JdkCodec.sampleFrames(Fixtures.mediaFor(id).content, stride = 5)
    assert(frames.map(_._1) == Vector(0, 5, 10, 15, 20, 25))
    frames.foreach { case (f, w, h, rgb) =>
      assert(w == (1 + id % 32) && h == (1 + (id * 7) % 24))
      assert(rgb == Fixtures.frameRgb(id, f.toLong))
    }
  }

  test("malformed bytes follow the ok=false zeroed null policy") {
    val junk = Fixtures.mediaFor(7L).content // id%23==7 -> corrupt row
    assert(junk.length == 8)
    for (tpe <- Seq("image", "audio", "video")) {
      assert(JdkCodec.decode(junk, tpe) == JdkCodec.failed)
      assert(JdkCodec.decode(Array.empty[Byte], tpe) == JdkCodec.failed)
      assert(JdkCodec.decode(null, tpe) == JdkCodec.failed)
    }
    // a TRUNCATED real container (valid magic, cut raster) must also land
    // ok=false, not throw: the reader claims it, then fails mid-decode
    val png = Fixtures.pngBytes(12L)
    assert(JdkCodec.decode(png.take(16), "image") == JdkCodec.failed)
    // a truncated GIF is a CONTAINER cut mid-stream: the JDK reader counts
    // the complete frames present and stops — best-effort partial decode
    // (never a throw), with strictly fewer frames than the full container
    val gif = Fixtures.gifBytes(14L)
    val part = JdkCodec.decode(gif.take(gif.length / 2), "video")
    val full = JdkCodec.decode(gif, "video")
    assert(part.nFrames < full.nFrames)
    val wav = Fixtures.wavBytes(13L)
    assert(JdkCodec.decode(wav.take(8), "audio") == JdkCodec.failed)
    // frame sampling over garbage yields zero rows, not an exception
    assert(JdkCodec.sampleFrames(junk, 5).isEmpty)
  }

  test("audioStats decodes real PCM samples (hand-built WAV, known values)") {
    import spark.implicits._
    // 3 mono samples: +1000, -2000, +300 -> peak 2000, mean -233.33...,
    // rms = sqrt((1000^2 + 2000^2 + 300^2)/3)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = java.nio.ByteBuffer.allocate(6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(1000.toShort).putShort((-2000).toShort).putShort(300.toShort)
      .array()
    val bos = new java.io.ByteArrayOutputStream()
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 3L)
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq(Multimodal.MediaRow(42L, "audio", bos.toByteArray)).toDS().toDF()
    val st = Multimodal.audioStats(spark, media).collect().head
    assert(st.n_samples == 3L && st.peak == 2000)
    assert(math.abs(st.mean - (1000 - 2000 + 300) / 3.0) < 1e-9)
    assert(math.abs(st.rms - math.sqrt((1000.0 * 1000 + 2000.0 * 2000 + 300.0 * 300) / 3)) < 1e-9)
    // corrupt/empty audio contributes no row, never an exception
    val bad = Seq(Multimodal.MediaRow(7L, "audio", Array[Byte](1, 2, 3))).toDS().toDF()
    assert(Multimodal.audioStats(spark, bad).count() == 0)
  }

  test("loudnessGain: exact power-domain algebra, silent clip null") {
    import spark.implicits._
    def wav(samples: Array[Int]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bb = java.nio.ByteBuffer.allocate(2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => bb.putShort(s.toShort))
      val bos = new java.io.ByteArrayOutputStream()
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bb.array()), fmt,
        samples.length.toLong)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav(Array(1000, -2000, 300))),
      Multimodal.MediaRow(2L, "audio", wav(Array(0, 0)))).toDS().toDF()
    val target = 100000000000L
    val got = Multimodal.loudnessGain(spark, media, target)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))
          .map(_.asInstanceOf[Long])))).toMap
    val sq = 1000L * 1000 + 2000L * 2000 + 300L * 300
    val ms = 1000L * sq / 3
    assert(got(1L) == ((3L, ms, Some(1000000L * target / ms))))
    // digitally-silent clip: null gain, never a divide-by-zero
    assert(got(2L) == ((2L, 0L, None)))
  }

  test("speechSegments: hand-built WAV, exact window energies, island merge") {
    import spark.implicits._
    // 200 mono samples in 4 windows of 50: silent, loud, loud, silent.
    // Loud amplitude 1000 -> window energy 50e6; clip mean square
    // (2*50e6)/200 = 500000 < 1e6 -> exactly the two loud windows pass
    // the strict cross-multiplied compare and merge into ONE segment.
    val samples = Array.fill(50)(0) ++ Array.fill(100)(1000) ++
      Array.fill(50)(0)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bb = java.nio.ByteBuffer.allocate(2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => bb.putShort(s.toShort))
    val bos = new java.io.ByteArrayOutputStream()
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bb.array()), fmt, samples.length.toLong)
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq(Multimodal.MediaRow(5L, "audio", bos.toByteArray))
      .toDS().toDF()
    val segs = Multimodal.speechSegments(spark, media, winSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(segs.toSeq == Seq((5L, 1L, 1L, 2L, 2L, 2L * 50L * 1000000L)))
    // corrupt audio contributes nothing, never an exception
    val bad = Seq(Multimodal.MediaRow(6L, "audio", Array[Byte](9)))
      .toDS().toDF()
    assert(Multimodal.speechSegments(spark, bad).count() == 0)
  }

  test("decodeBatched + sampleFrames over the staged corpus (end to end)") {
    import spark.implicits._
    val media = spark.read.parquet(Fixtures.dataset(spark))
    assert(media.count() == Fixtures.rows)
    val decoded = decodeBatched(spark, media).cache()
    // corrupt rows: exactly the id%23==7 set, all zeroed
    val bad = decoded.filter(!col("ok"))
    assert(bad.count() == (0 until Fixtures.rows).count(_ % 23 == 7))
    assert(bad.filter(col("width") =!= 0 || col("n_frames") =!= 0).count() == 0)
    // every healthy image/audio/video row carries its formula metadata
    val wrong = decoded.filter(col("ok")).filter(
      (col("media_type") === "image" &&
        (col("width") =!= (col("media_id") % 64 + 1).cast("int") ||
         col("height") =!= (col("media_id") * 7 % 48 + 1).cast("int"))) ||
      (col("media_type") === "video" &&
        col("n_frames") =!= (col("media_id") % 30 + 1).cast("int")) ||
      (col("media_type") === "audio" &&
        (col("sample_rate") =!= 8000 ||
         col("n_frames") =!= (col("media_id") % 400 + 100).cast("int"))))
    assert(wrong.count() == 0)
    // frame fan-out: per-video sampled-frame count and pixel equality
    val frames = sampleFrames(spark, media, stride = 5)
    val perVideo = frames.groupBy("media_id").count()
      .join(decoded.filter(col("media_type") === "video" && col("ok")),
        Seq("media_id"), "full")
    assert(perVideo.filter(col("count").isNull ||
      col("count") =!= ceil(col("n_frames") / 5.0)).count() == 0)
    val pxWrong = frames.filter(col("px_rgb") =!=
      ((col("media_id") * 31 + col("frame_idx") * 17) % 256) * 65536
        + ((col("media_id") * 7 + col("frame_idx") * 3) % 256) * 256
        + (col("media_id") * 13 + col("frame_idx") * 5) % 256)
    assert(pxWrong.count() == 0)
    decoded.unpersist()
  }

  test("aHash: brightness invariance across planted pairs, junk null policy") {
    val media = spark.read.parquet(Multimodal.Fixtures.gradientDataset(spark))
    val rows = Multimodal.imageHashes(spark, media).collect()
      .map(r => r.media_id -> r).toMap
    assert(rows.size == Multimodal.Fixtures.gradientRows)
    // junk rows fail soft with empty hash
    val junkIds = rows.keys.filter(_ % 17 == 5)
    assert(junkIds.nonEmpty &&
      junkIds.forall(id => !rows(id).ok && rows(id).ahash.isEmpty))
    // +1-brightness copies hash IDENTICALLY (pixels and mean shift
    // together) — the perceptual-hash invariance near-dup relies on
    val pairs = (0L until 32L)
      .filter(b => b % 17 != 5 && (b + 32) % 17 != 5)
    assert(pairs.nonEmpty)
    pairs.foreach { b =>
      assert(rows(b).ok && rows(b + 32).ok &&
        rows(b).ahash == rows(b + 32).ahash &&
        rows(b).ahash.length == 64, s"pair $b/${b + 32} diverged")
    }
    // hashes discriminate across DIFFERENT gradients: not all equal
    assert(pairs.map(b => rows(b).ahash).distinct.size > 1)
  }

  test("resizedPixels: exact box averages, codec round-trip, junk excluded") {
    import spark.implicits._
    // 4×2 hand raster → 2×1 thumbnail: each output pixel averages a
    // 2×2 box with floor division
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Array(
      Array((10, 0, 0), (20, 0, 255), (0, 7, 0), (0, 8, 0)),
      Array((30, 0, 4), (41, 0, 2), (0, 9, 0), (0, 13, 1)))
    for (y <- 0 until 2; x <- 0 until 4) {
      val (r, g, b) = px(y)(x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      MediaRow(0L, "image", bos.toByteArray),
      MediaRow(1L, "image", Array.empty[Byte])).toDF()
    val got = Multimodal.resizedPixels(spark, media, outW = 2, outH = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // left box: r = (10+20+30+41)/4 = 25 (floor), g = 0, b = (0+255+4+2)/4 = 65
    // right box: r = 0, g = (7+8+9+13)/4 = 9, b = (0+0+0+1)/4 = 0
    assert(got == Set((0L, 0L, 0L, 25L, 0L, 65L), (0L, 1L, 0L, 0L, 9L, 0L)))
  }

  test("pHash: contrast-shifted copy within hamming 2; junk null policy") {
    import spark.implicits._
    def ham(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    // photo-like 64×64 gray raster: a smooth parabolic base plus
    // deterministic integer pseudo-noise — a DENSE spectrum, so the
    // median threshold sits in a well-separated gap (the fixture class
    // real pHash is built for; a sparse sawtooth clusters half its AC
    // coefficients at the median and any jitter flips them)
    def texLuma(seedA: Long, seedB: Long)(x: Int, y: Int): Int = {
      val n = (((x * seedA + y * seedB) & 0xFFFFFFFFL) >>> 26).toInt
      70 + (x * (63 - x)) / 16 + (y * (63 - y)) / 24 + n
    }
    // the contrast op aHash's mean threshold drifts under: gain 5/4
    // about mid-gray, CLIPPED at 255 (the peak region saturates)
    def contrast(c: Int): Int = math.max(0, math.min(255, (c - 128) * 5 / 4 + 128))
    def grayPng(lum: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val c = lum(x, y)
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base = texLuma(2654435761L, 0x9E3779B9L) _
    val other = texLuma(0x85EBCA6BL, 0xC2B2AE35L) _
    val media = Seq(
      MediaRow(0L, "image", grayPng(base)),
      MediaRow(1L, "image", grayPng((x, y) => contrast(base(x, y)))),
      MediaRow(2L, "image", grayPng(other)),
      MediaRow(3L, "image", Array.empty[Byte])).toDF()
    val rows = Multimodal.imagePhashes(spark, media).collect()
      .map(r => r.media_id -> r).toMap
    assert(rows(0L).ok && rows(1L).ok && rows(0L).phash.length == 64)
    assert(ham(rows(0L).phash, rows(1L).phash) <= 2,
      s"contrast copy drifted: ${ham(rows(0L).phash, rows(1L).phash)} bits")
    // ...while a genuinely different texture is far away
    assert(ham(rows(0L).phash, rows(2L).phash) > 10)
    assert(!rows(3L).ok && rows(3L).phash.isEmpty)
    // planted +1-brightness pairs of the staged corpus stay within 2
    // bits too (a uniform shift moves only the DC term plus fixed-point
    // residue), and hashes still discriminate across gradients
    val staged = spark.read.parquet(Fixtures.gradientDataset(spark))
    val all = Multimodal.imagePhashes(spark, staged).collect()
      .map(r => r.media_id -> r).toMap
    val pairs = (0L until 32L)
      .filter(b => b % 17 != 5 && (b + 32) % 17 != 5)
    pairs.foreach { b =>
      assert(ham(all(b).phash, all(b + 32).phash) <= 2,
        s"pair $b/${b + 32} drifted")
    }
    assert(pairs.map(b => all(b).phash).distinct.size > 1)
  }

  test("dHash: exact invariance under strictly monotone luma maps") {
    import spark.implicits._
    def ham(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    def texLuma(seedA: Long, seedB: Long)(x: Int, y: Int): Int = {
      val n = (((x * seedA + y * seedB) & 0xFFFFFFFFL) >>> 26).toInt
      70 + (x * (63 - x)) / 16 + (y * (63 - y)) / 24 + n
    }
    def grayPng(lum: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val c = lum(x, y)
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base = texLuma(2654435761L, 0x9E3779B9L) _
    val media = Seq(
      MediaRow(0L, "image", grayPng(base)),
      // strictly monotone maps (base peaks at 236, so stay ≤ 255 —
      // an overflowing luma would bleed into the other channels):
      // shift +15, and the gamma-ish c + c/16
      MediaRow(1L, "image", grayPng((x, y) => base(x, y) + 15)),
      MediaRow(2L, "image", grayPng((x, y) => {
        val c = base(x, y); c + c / 16 })),
      // horizontal mirror: every gradient sign flips
      MediaRow(3L, "image", grayPng((x, y) => base(63 - x, y))),
      MediaRow(4L, "image", Array.empty[Byte])).toDF()
    val rows = Multimodal.imageDhashes(spark, media).collect()
      .map(r => r.media_id -> r).toMap
    assert(rows(0L).ok && rows(0L).dhash.length == 64)
    assert(rows(0L).dhash == rows(1L).dhash, "brightness shift must be exact")
    assert(rows(0L).dhash == rows(2L).dhash, "strict monotone map must be exact")
    assert(ham(rows(0L).dhash, rows(3L).dhash) > 10, "mirror must be far")
    assert(!rows(4L).ok && rows(4L).dhash.isEmpty)
    // staged corpus: +1-brightness pairs are bit-identical, hashes differ
    val staged = spark.read.parquet(Fixtures.gradientDataset(spark))
    val all = Multimodal.imageDhashes(spark, staged).collect()
      .map(r => r.media_id -> r).toMap
    val pairs = (0L until 32L)
      .filter(b => b % 17 != 5 && (b + 32) % 17 != 5)
    pairs.foreach(b => assert(all(b).dhash == all(b + 32).dhash))
    assert(pairs.map(b => all(b).dhash).distinct.size > 1)
  }

  test("imageNearDupPairs: planted brightness pairs found at hamming 0") {
    val media = spark.read.parquet(
      Multimodal.Fixtures.gradientDataset(spark))
    val got = Multimodal.imageNearDupPairs(spark, media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = got.map(p => (p._1, p._2)).toSet
    // every decodable base id pairs with its +1-brightness copy, ham 0
    (0L until 32L).filter(b => b % 17 != 5 && (b + 32) % 17 != 5)
      .foreach { b =>
        assert(pairs.contains((b, b + 32)), s"missing planted pair $b")
      }
    assert(got.filter(p => p._2 == p._1 + 32).forall(_._3 == 0L))
    // junk images (id % 17 == 5) never appear on either side
    assert(got.forall(p => p._1 % 17 != 5 && p._2 % 17 != 5))
    assert(got.forall(p => p._1 < p._2 && p._3 <= 3))
  }

  test("imageNearDupPairs: maxBucket drops degenerate bands whole") {
    val media = spark.read.parquet(
      Multimodal.Fixtures.gradientDataset(spark))
    val got = Multimodal.imageNearDupPairs(spark, media, maxBucket = 1)
    assert(got.count() == 0) // every band bucket with a pair is pruned
  }

  test("reEncodeImages emits REAL JPEG bytes that decode to the source dims") {
    val media = spark.read.parquet(
      Multimodal.Fixtures.checkerDataset(spark))
    val jpg = Multimodal.reEncodeImages(spark, media, "jpg", 0.9f).collect()
    // junk rows (id % 13 == 3) are dropped, everything else transcodes
    assert(jpg.map(_.media_id).sorted.toSeq ==
      (0L until Multimodal.Fixtures.checkerRows).filter(_ % 13 != 3))
    jpg.foreach { r =>
      // JPEG SOI marker — these are real encoded bytes, not a pass-through
      assert((r.content(0) & 0xFF) == 0xFF && (r.content(1) & 0xFF) == 0xD8,
        s"media ${r.media_id} missing JPEG SOI")
      val m = Multimodal.JdkCodec.decode(r.content, "image")
      assert(m.ok && m.width == 64 && m.height == 64)
    }
  }

  test("cross-format aHash invariance: PNG and its JPEG re-encode hash identically") {
    val png = spark.read.parquet(
      Multimodal.Fixtures.checkerDataset(spark))
    val jpg = Multimodal.reEncodeImages(spark, png, "jpg", 0.9f).toDF()
    val hp = Multimodal.imageHashes(spark, png).collect()
      .filter(_.ok).map(r => r.media_id -> r.ahash).toMap
    val hj = Multimodal.imageHashes(spark, jpg).collect()
      .filter(_.ok).map(r => r.media_id -> r.ahash).toMap
    assert(hp.keySet == hj.keySet)
    hp.foreach { case (id, h) =>
      assert(h == hj(id), s"media $id: PNG/JPEG aHash diverged")
      // and the hash matches the md5 cell-parity closed form
      val expect = (0 until 8).flatMap(v => (0 until 8).map(u =>
        if (Multimodal.Fixtures.checkerWhite(id, u, v)) '1' else '0')).mkString
      assert(h == expect, s"media $id: hash != closed form")
    }
    // distinct ids get distinct random cell patterns
    assert(hp.values.toSeq.distinct.size == hp.size)
  }

  test("frameChannelSums reduces real rasters; solid frames sum exactly") {
    val id = 29L
    val sums = JdkCodec.frameChannelSums(Fixtures.mediaFor(id).content)
    assert(sums.length == (1 + id % 30).toInt)
    val npx = (1 + id % 32) * (1 + (id * 7) % 24)
    sums.foreach { case (f, w, h, sr, sg, sb) =>
      assert(w.toLong * h == npx)
      val rgb = Fixtures.frameRgb(id, f.toLong)
      assert(sr == ((rgb >> 16) & 0xFF) * npx, s"frame $f red")
      assert(sg == ((rgb >> 8) & 0xFF) * npx && sb == (rgb & 0xFF) * npx)
    }
  }

  test("keyframes keeps frame 0 and exactly the above-threshold cuts") {
    import spark.implicits._
    val id = 29L // 30 frames; channel steps +17/+3/+5 mod 256 per frame
    val media = Seq(Fixtures.mediaFor(id)).toDF()
    val got = Multimodal.keyframes(spark, media, thresholdPerPx = 100)
      .orderBy("frame_idx").collect()
    // closed-form expectation: keep f=0 and every f whose L1 color step
    // from f-1 exceeds 100 (only the mod-256 wraps qualify)
    def ch(f: Long) = { val v = Fixtures.frameRgb(id, f)
      ((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF) }
    val want = 0L +: (1L until (1 + id % 30)).filter { f =>
      val (r1, g1, b1) = ch(f - 1); val (r2, g2, b2) = ch(f)
      math.abs(r2 - r1) + math.abs(g2 - g1) + math.abs(b2 - b1) > 100
    }
    assert(got.map(_.getLong(1)).toSeq == want.toSeq)
    assert(want.length > 1, "fixture must actually contain a cut")
    assert(got.head.getLong(4) == 0L, "first frame carries dist 0")
  }

  private def pngOf(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("letterboxDetect: planted bars measured exactly; junk quarantined") {
    import spark.implicits._
    // 10×8, 2-row bars top/bottom, 3-col bars left/right, white interior
    val bars = pngOf(10, 8) { (x, y) =>
      if (y < 2 || y >= 6 || x < 3 || x >= 7) 0x000000 else 0xFFFFFF }
    // no bars at all: content everywhere (mixed colors from pixel 0,0 on)
    val full = pngOf(4, 4) { (x, y) => if ((x + y) % 2 == 0) 0xFFFFFF else 0x808080 }
    val media = Seq((1L, bars), (2L, full),
      (3L, Array[Byte](1, 2, 3))).toDF("media_id", "content")
    val got = Multimodal.letterboxDetect(spark, media)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 10L, 8L, 2L, 2L, 3L, 3L,
      1000000L * 16 / 80)), s"${got(1L)}")
    assert(got(2L) == ((2L, 4L, 4L, 0L, 0L, 0L, 0L, 1000000L)))
    assert(!got.contains(3L), "undecodable bytes must quarantine")
  }

  test("letterboxDetect: an all-constant image is all margin") {
    import spark.implicits._
    val solid = pngOf(6, 4)((_, _) => 0x112233)
    val got = Multimodal.letterboxDetect(
      spark, Seq((1L, solid)).toDF("media_id", "content"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 6L, 4L, 4L, 0L, 6L, 0L, 0L)), s"$got")
  }

  test("colorHistNearDup: one-pixel recolor pairs, different color doesn't") {
    import spark.implicits._
    val a = pngOf(8, 8)((_, _) => 0xFF0000)                     // red octant 4
    val b = pngOf(8, 8)((x, y) => if (x == 0 && y == 0) 0xFF00FF else 0xFF0000)
    val c = pngOf(8, 8)((_, _) => 0x0000FF)                     // blue octant 1
    val media = Seq((1L, a), (2L, b), (3L, c)).toDF("media_id", "content")
    val got = Multimodal.colorHistNearDup(spark, media, l1ThresholdPpm = 100000L)
      .as[(Long, Long, Long)].collect().toSet
    // b: 63/64 red + 1/64 magenta → same dominant octant as a;
    // L1 = |1e6·63/64 − 1e6| + 1e6·1/64 = 15625 + 15625 = 31250
    assert(got == Set((1L, 2L, 31250L)), s"$got")
  }

  test("colorHistNearDup: gradient twins found, junk quarantined") {
    import spark.implicits._
    val media = spark.read.parquet(Fixtures.gradientDataset(spark))
    val got = Multimodal.colorHistNearDup(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // at least half of the 28 junk-free +1-brightness twins must pair
    val twins = (0L until 32L).map(i => (i, i + 32))
      .filter { case (x, y) => x % 17 != 5 && y % 17 != 5 }
    val found = twins.count(got.contains)
    assert(found * 2 >= twins.size, s"found $found of ${twins.size}")
  }
}
