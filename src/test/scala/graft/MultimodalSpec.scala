package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  private lazy val media =
    Multimodal.attachFakePayload(Tables.load(spark, sf(), "documents"), "doc_id", "text")

  test("payload schema contract: binary payload + typed metadata") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName === "binary")
    assert(Seq("kind", "width", "height", "duration_ms").forall(sch.fieldNames.contains))
  }

  test("media decode is deterministic and partition-batched") {
    val f1 = Multimodal.decodeMedia(spark, media).collect()
      .map(f => f.doc_id -> f.checksum).toMap
    val f2 = Multimodal.decodeMedia(spark, media.repartition(7)).collect()
      .map(f => f.doc_id -> f.checksum).toMap
    assert(f1 === f2, "features must not depend on partitioning")
    val feats = Multimodal.decodeMedia(spark, media).head()
    assert(feats.feature.length === 4)
    assert(feats.feature.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("image, audio and video rows with real payloads decode for real") {
    val docs = Tables.load(spark, sf(), "documents").limit(60)
    val mixed = Multimodal.attachMediaPayload(docs, "doc_id", "text")
    val feats = Multimodal.decodeMedia(spark, mixed.toDF).collect()
    val byId = feats.map(f => f.doc_id -> f).toMap
    val imageIds = byId.keys.filter(_ % 3 == 0)
    assert(imageIds.nonEmpty)
    imageIds.foreach { id =>
      // real decode: feature == channel means / 255 of the known pixel pattern
      val truth = Multimodal.bmpFeatures(id, Multimodal.bmpBytes(id, 8, 6), 1, 1)
      val f = byId(id)
      val tol = if (id % 9 == 3) 0.04 else 1e-9 // JPEG rows: quantization tolerance
      assert(math.abs(f.feature(0) - truth.mean_r / 255.0) < tol, s"doc $id mean_r")
      assert(math.abs(f.feature(1) - truth.mean_g / 255.0) < tol, s"doc $id mean_g")
      assert(math.abs(f.feature(2) - truth.mean_b / 255.0) < tol, s"doc $id mean_b")
    }
    // audio: REAL decode — feature(0) is the RMS of the known sample
    // pattern, independently recomputed here from the shared sample fn
    val audioIds = byId.keys.filter(_ % 3 == 1)
    assert(audioIds.nonEmpty)
    audioIds.foreach { id =>
      val nSamples = 400 + (id % 37).toInt * 8
      val channels = 1 + (id % 2).toInt
      val all = for (i <- 0 until nSamples; c <- 0 until channels)
        yield Multimodal.sampleVal(id, i, c).toDouble
      val rms = math.sqrt(all.map(s => s * s).sum / all.size) / 32768.0
      assert(math.abs(byId(id).feature(0) - rms) < 1e-9, s"doc $id audio rms")
      assert(byId(id).feature(3) === channels / 8.0, s"doc $id audio channels")
    }
    // video: REAL container parse + frame-sample + per-frame BMP
    // decode — mean luma of the sampled frames recomputed here from
    // the shared pixel fn (frame f of doc d seeds pixels with d*1009+f)
    val video = byId.keys.filter(_ % 3 == 2)
    assert(video.nonEmpty)
    video.foreach { id =>
      val nFrames = 6 + (id % 5).toInt * 2
      val sampledFrames = 0 until nFrames by 4
      val luma = if (id % 9 == 5) {
        // animated-GIF rows follow the partial-update rule: simulate
        // the composed canvas (frame 0 full, frame f repaints row f%6)
        val canvas = Array.ofDim[Int](6, 8, 3)
        var acc = 0.0
        for (f <- 0 until nFrames) {
          if (f == 0)
            for (y <- 0 until 6; x <- 0 until 8; c <- 0 until 3)
              canvas(y)(x)(c) = Multimodal.pixel(id * 1009, x, y, c)
          else
            for (x <- 0 until 8; c <- 0 until 3)
              canvas(f % 6)(x)(c) = Multimodal.pixel(id * 1009 + f, x, f % 6, c)
          if (f % 4 == 0)
            acc += (for (y <- 0 until 6; x <- 0 until 8; c <- 0 until 3)
              yield canvas(y)(x)(c)).sum / (3.0 * 48)
        }
        acc / sampledFrames.size
      } else if (id % 18 == 17) {
        // GMC1 rows follow the motion-compensated content rule:
        // toroidal translate + one repainted pixel per frame
        import java.lang.Math.floorMod
        var canvas = Array.tabulate(6, 8, 3)((y, x, c) => Multimodal.pixel(id * 1009, x, y, c))
        var acc = 0.0
        for (f <- 0 until nFrames) {
          if (f > 0) {
            val dx = floorMod(id + f, 3).toInt - 1
            val dy = floorMod(id * 5 + f, 3).toInt - 1
            val next = Array.tabulate(6, 8, 3)((y, x, c) =>
              canvas(floorMod(y - dy, 6))(floorMod(x - dx, 8))(c))
            val xr = floorMod(id + 7L * f, 8).toInt
            val yr = floorMod(id * 3 + f, 6).toInt
            for (c <- 0 until 3) next(yr)(xr)(c) = Multimodal.pixel(id * 1009 + f, xr, yr, c)
            canvas = next
          }
          if (f % 4 == 0)
            acc += (for (y <- 0 until 6; x <- 0 until 8; c <- 0 until 3)
              yield canvas(y)(x)(c)).sum / (3.0 * 48)
        }
        acc / sampledFrames.size
      } else sampledFrames.map { f =>
        val seed = id * 1009 + f
        (for (y <- 0 until 6; x <- 0 until 8; c <- 0 until 3)
          yield Multimodal.pixel(seed, x, y, c)).sum / (3.0 * 48)
      }.sum / sampledFrames.size
      // MJPEG-AVI rows (id%9=2) decode real JPEG frames: lossy tolerance
      val tol = if (id % 9 == 2) 0.04 else 1e-9
      assert(math.abs(byId(id).feature(0) - luma / 255.0) < tol, s"doc $id video luma")
      assert(byId(id).feature(1) === nFrames / 64.0, s"doc $id frame count")
      assert(byId(id).feature(2) === sampledFrames.size / 16.0, s"doc $id sampled count")
    }
  }

  test("GVID round-trip: container parse, stride sampling, doc-labelled truncation") {
    import spark.implicits._
    val recs = Seq(2L, 5L, 11L).map { id =>
      Multimodal.MediaRecord(id, "video",
        Multimodal.gvidBytes(id, 8, 6, nFrames = 9, fps = 25), 8, 6, 9 * 1000L / 25)
    }
    val feats = Multimodal.decodeVideo(spark, recs.toDS(), stride = 3)
      .collect().sortBy(_.doc_id)
    feats.foreach { v =>
      assert(v.n_frames === 9 && v.fps === 25 && v.duration_ms === 360L)
      assert(v.sampled === 3, "stride 3 over 9 frames samples frames 0, 3, 6")
      val luma = Seq(0, 3, 6).map { f =>
        (for (y <- 0 until 6; x <- 0 until 8; c <- 0 until 3)
          yield Multimodal.pixel(v.doc_id * 1009 + f, x, y, c)).sum / (3.0 * 48)
      }.sum / 3
      assert(math.abs(v.mean_luma - luma) < 1e-9, s"doc ${v.doc_id} sampled luma")
    }
    // the container is bounds-checked: chopping the last frame fails
    // with the doc id, not an index exception mid-partition
    val good = Multimodal.gvidBytes(3L, 8, 6, 4, 25)
    val e = intercept[IllegalArgumentException] {
      Multimodal.gvidFeatures(3L, good.take(good.length - 10))
    }
    assert(e.getMessage.contains("doc 3") && e.getMessage.contains("truncated"))
  }

  test("real WAV round-trip: generated files decode via javax.sound to exact features") {
    import spark.implicits._
    val recs = Seq(1L, 4L, 7L).map { id =>
      val (n, ch) = (320 + id.toInt * 16, 1 + (id % 2).toInt)
      Multimodal.MediaRecord(id, "audio",
        Multimodal.wavBytes(id, 8000, n, ch), 0, 0, n * 1000L / 8000)
    }
    val feats = Multimodal.decodeAudio(spark, recs.toDS()).collect().sortBy(_.doc_id)
    feats.foreach { a =>
      val n = 320 + a.doc_id.toInt * 16
      val ch = 1 + (a.doc_id % 2).toInt
      assert(a.channels === ch && a.sample_rate === 8000)
      assert(a.n_frames === n.toLong, s"doc ${a.doc_id} frame count")
      assert(a.duration_ms === n * 1000L / 8000)
      val all = for (i <- 0 until n; c <- 0 until ch)
        yield Multimodal.sampleVal(a.doc_id, i, c).toDouble
      val rms = math.sqrt(all.map(s => s * s).sum / all.size) / 32768.0
      assert(math.abs(a.rms - rms) < 1e-12, s"doc ${a.doc_id} rms")
      assert(a.peak === all.map(math.abs).max / 32768.0, s"doc ${a.doc_id} peak")
    }
    // the payload really is a WAV file: RIFF magic + declared size match
    val payload = recs.head.payload
    assert(payload.take(4).map(_.toChar).mkString === "RIFF")
    val declared = java.nio.ByteBuffer.wrap(payload, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(declared + 8 === payload.length)
  }

  test("PNG decodes via javax.imageio to the exact BMP ground truth") {
    import spark.implicits._
    val (w, h) = (8, 6)
    val ids = Seq(3L, 12L, 21L)
    val png = ids.map(id =>
      Multimodal.MediaRecord(id, "image", Multimodal.imageBytes(id, w, h, "png"), w, h, 0L))
    val feats = Multimodal.decodeImage(spark, png.toDS()).collect().sortBy(_.doc_id)
    feats.foreach { f =>
      val truth = Multimodal.bmpFeatures(f.doc_id, Multimodal.bmpBytes(f.doc_id, w, h), 2, 2)
      assert(f.width === w && f.height === h)
      assert(math.abs(f.mean_r - truth.mean_r) < 1e-9, s"doc ${f.doc_id} PNG mean_r")
      assert(math.abs(f.mean_g - truth.mean_g) < 1e-9, s"doc ${f.doc_id} PNG mean_g")
      assert(math.abs(f.mean_b - truth.mean_b) < 1e-9, s"doc ${f.doc_id} PNG mean_b")
      assert(f.thumb.zip(truth.thumb).forall { case (a, b) => math.abs(a - b) < 1e-9 },
        s"doc ${f.doc_id} PNG thumbnail")
    }
  }

  test("JPEG decodes via javax.imageio within quantization tolerance of ground truth") {
    import spark.implicits._
    val (w, h) = (8, 6)
    val ids = Seq(6L, 15L, 24L)
    val jpg = ids.map(id =>
      Multimodal.MediaRecord(id, "image", Multimodal.imageBytes(id, w, h, "jpg"), w, h, 0L))
    val feats = Multimodal.decodeImage(spark, jpg.toDS()).collect().sortBy(_.doc_id)
    feats.foreach { f =>
      val truth = Multimodal.bmpFeatures(f.doc_id, Multimodal.bmpBytes(f.doc_id, w, h), 2, 2)
      assert(f.width === w && f.height === h)
      assert(math.abs(f.mean_r - truth.mean_r) < 10.0, s"doc ${f.doc_id} JPEG mean_r " +
        s"${f.mean_r} vs ${truth.mean_r}")
      assert(math.abs(f.mean_g - truth.mean_g) < 10.0, s"doc ${f.doc_id} JPEG mean_g " +
        s"${f.mean_g} vs ${truth.mean_g}")
      assert(math.abs(f.mean_b - truth.mean_b) < 10.0, s"doc ${f.doc_id} JPEG mean_b " +
        s"${f.mean_b} vs ${truth.mean_b}")
      assert(f.thumb.zip(truth.thumb).forall { case (a, b) => math.abs(a - b) < 32.0 },
        s"doc ${f.doc_id} JPEG thumbnail drifted past quantization tolerance")
    }
  }

  test("garbage audio payloads fail with a doc-id-labelled error") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.wavFeatures(7L, Array[Byte](1, 2, 3, 4))
    }
    assert(e.getMessage.contains("doc 7"))
  }

  test("truncated or lying BMP headers fail with a doc-id-labelled error") {
    val good = Multimodal.bmpBytes(5L, 8, 6)
    val truncated = good.take(80) // header intact, pixel rows missing
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.bmpFeatures(5L, truncated, 2, 2)
    }
    assert(e1.getMessage.contains("doc 5") && e1.getMessage.contains("truncated"))
    val lyingOffset = good.clone() // offset < 54 would read header bytes as pixels
    java.nio.ByteBuffer.wrap(lyingOffset).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, 8)
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.bmpFeatures(5L, lyingOffset, 2, 2)
    }
    assert(e2.getMessage.contains("doc 5"))
  }

  test("real BMP round-trip: generated files decode to the exact expected pixels") {
    val docs = Tables.load(spark, sf(), "documents").limit(20)
    val (w, h) = (8, 6)
    val imgs = Multimodal.attachBmpPayload(docs, "doc_id", w, h)
    val feats = Multimodal.decodeBmp(spark, imgs).collect()
    assert(feats.length === 20)
    feats.foreach { f =>
      assert(f.width === w && f.height === h && f.bpp === 24)
      // independent expectation from the shared deterministic pixel fn
      def mean(c: Int) = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pixel(f.doc_id, x, y, c)).sum.toDouble / (w * h)
      assert(math.abs(f.mean_r - mean(0)) < 1e-9)
      assert(math.abs(f.mean_g - mean(1)) < 1e-9)
      assert(math.abs(f.mean_b - mean(2)) < 1e-9)
      assert(f.thumb.length === 4)
      assert(f.thumb.forall(v => v >= 0.0 && v <= 255.0))
    }
    // the payload really is a BMP file: signature + declared size match
    val payload = imgs.head().payload
    assert(payload(0) === 'B'.toByte && payload(1) === 'M'.toByte)
    val declared = java.nio.ByteBuffer.wrap(payload, 2, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(declared === payload.length)
  }

  test("top-down BMPs (negative height) decode identically to bottom-up") {
    import spark.implicits._
    val (w, h) = (8, 6)
    val bottomUp = Multimodal.bmpBytes(7L, w, h)
    // same image, top-down: negate height, reverse the pixel-row order
    val rowSize = ((3 * w + 3) / 4) * 4
    val topDown = bottomUp.clone()
    java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -h)
    for (y <- 0 until h)
      System.arraycopy(bottomUp, 54 + (h - 1 - y) * rowSize,
        topDown, 54 + y * rowSize, rowSize)
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", bottomUp, w, h, 0L),
      Multimodal.MediaRecord(2L, "image", topDown, w, h, 0L)).toDS()
    val fs = Multimodal.decodeBmp(spark, media).collect().sortBy(_.doc_id)
    assert(fs(0).mean_r === fs(1).mean_r && fs(0).mean_g === fs(1).mean_g)
    assert(fs(0).thumb.toSeq === fs(1).thumb.toSeq,
      "row order on disk must not change the decoded image")
  }

  test("frame sampling emits n frames of bounded size per doc") {
    val frames = Multimodal.frameSample(media.limit(10), n = 4, frameBytes = 16)
    assert(frames.count() === 40)
    val sizes = frames.select(length(col("frame"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ <= 16))
  }

  test("MJPEG-AVI round-trip: real RIFF container, real JPEG frames, stride sampling") {
    val (w, h, nFrames, fps) = (8, 6, 10, 25)
    val avi = Multimodal.aviMjpegBytes(7L, w, h, nFrames, fps)
    assert(Multimodal.isAviMagic(avi))
    val v = Multimodal.aviMjpegFeatures(7L, avi)
    assert(v.n_frames === nFrames && v.fps === fps)
    assert(v.sampled === 3, "stride 4 over 10 frames samples frames 0, 4, 8")
    assert(v.duration_ms === nFrames * 1000L / fps)
    // sampled-frame luma within JPEG tolerance of the closed-form
    // pixel expectation (frame f of doc d is seeded d * 1009 + f)
    val expLuma = Seq(0, 4, 8).map { f =>
      val sums = for (y <- 0 until h; x <- 0 until w; c <- 0 to 2)
        yield Multimodal.pixel(7L * 1009 + f, x, y, c)
      sums.sum.toDouble / (w * h) / 3.0
    }.sum / 3
    assert(math.abs(v.mean_luma - expLuma) <= 0.1 * 255,
      s"AVI luma ${v.mean_luma} vs expected $expLuma")
    // truncation fails with a doc-labelled error, not an index exception
    val e = intercept[IllegalArgumentException] {
      Multimodal.aviMjpegFeatures(7L, java.util.Arrays.copyOfRange(avi, 0, avi.length / 2))
    }
    assert(e.getMessage.contains("doc 7"))
    // GVID and AVI of the same doc agree on everything but JPEG loss
    val gvid = Multimodal.gvidFeatures(7L, Multimodal.gvidBytes(7L, w, h, nFrames, fps))
    assert(gvid.n_frames === v.n_frames && gvid.sampled === v.sampled &&
      gvid.duration_ms === v.duration_ms)
    assert(math.abs(gvid.mean_luma - v.mean_luma) <= 0.1 * 255)
  }

  test("animated GIF round-trip: inter-frame composition decodes losslessly") {
    val (w, h, nFrames, fps) = (8, 6, 10, 25)
    // doc 5 is a genuine %9==5 row (the id class that ships as GIF)
    val gif = Multimodal.gifAnimBytes(5L, w, h, nFrames, fps)
    assert(Multimodal.isGifMagic(gif))
    val v = Multimodal.gifAnimFeatures(5L, gif)
    assert(v.n_frames === nFrames && v.fps === fps)
    assert(v.sampled === 3, "stride 4 over 10 frames samples frames 0, 4, 8")
    assert(v.duration_ms === nFrames * 1000L / fps)
    // composed-canvas luma matches the seed-formula simulation EXACTLY:
    // exact palettes + LZW are lossless
    val canvas = Array.ofDim[Int](h, w, 3)
    var expLuma = 0.0; var sampled = 0
    for (f <- 0 until nFrames) {
      if (f == 0)
        for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
          canvas(y)(x)(c) = Multimodal.pixel(5L * 1009, x, y, c)
      else {
        val y = f % h
        for (x <- 0 until w; c <- 0 until 3)
          canvas(y)(x)(c) = Multimodal.pixel(5L * 1009 + f, x, y, c)
      }
      if (f % 4 == 0) {
        val sums = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
          yield canvas(y)(x)(c)
        expLuma += sums.sum.toDouble / (w * h) / 3.0
        sampled += 1
      }
    }
    expLuma /= sampled
    assert(math.abs(v.mean_luma - expLuma) < 1e-9,
      s"GIF luma ${v.mean_luma} vs composed expectation $expLuma")
    // the INTER-frame property: a naive decoder that treated every
    // frame as a standalone full image (the GVID/AVI expectation)
    // would land on a DIFFERENT luma — composition is load-bearing
    val naive = Seq(0, 4, 8).map { f =>
      val sums = for (y <- 0 until h; x <- 0 until w; c <- 0 to 2)
        yield Multimodal.pixel(5L * 1009 + f, x, y, c)
      sums.sum.toDouble / (w * h) / 3.0
    }.sum / 3
    // (the pixel formula's full-frame MEANS are nearly seed-invariant,
    // so the gap is small in absolute luma — but far above the 1e-9
    // lossless tolerance the composed expectation meets)
    assert(math.abs(v.mean_luma - naive) > 1e-3,
      "partial frames must not decode like standalone full frames")
    // structural proof of temporal prediction: every frame after the
    // first is a 1-pixel-tall partial rect, undecodable standalone
    val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    try {
      rdr.setInput(iis, false)
      assert(rdr.getHeight(0) === h)
      (1 until nFrames).foreach(f => assert(rdr.getHeight(f) === 1,
        s"frame $f should be a partial one-row rect"))
    } finally { rdr.dispose(); iis.close() }
    // frames after the first are genuinely partial: re-encoding every
    // frame full-canvas would make the payload materially bigger
    val fullFrames = (0 until nFrames).map(f =>
      Multimodal.gifAnimBytes(5L * 1009 + f, w, h, 1, fps).length).sum
    assert(gif.length < fullFrames,
      s"inter-frame GIF (${gif.length} B) should undercut $fullFrames B of full frames")
    // truncation fails with a doc-labelled error
    val e = intercept[IllegalArgumentException] {
      Multimodal.gifAnimFeatures(5L, java.util.Arrays.copyOfRange(gif, 0, 40))
    }
    assert(e.getMessage.contains("doc 5"))
  }

  test("decode audit: every row passes; JPEG deviation inside the declared bound") {
    val docs = Tables.load(spark, sf(), "documents").limit(200)
    val audit = Multimodal.decodeAudit(spark,
      Multimodal.attachMediaPayload(docs, "doc_id", "text")).collect()
    assert(audit.length === 200)
    val bad = audit.filterNot(_.decode_ok).map(_.doc_id)
    assert(bad.isEmpty, s"decode audit failed for docs: ${bad.mkString(", ")}")
    // codecs are derived from payload MAGIC, so all six families
    // actually flowed through the audit
    assert(audit.map(_.codec).toSet ===
      Set("png", "jpg", "bmp", "wav", "gvid", "avi", "gif", "gmc"))
    // the lossy rows: measure the real JPEG deviation against the
    // closed-form expectation and pin it at half the JpegTol the audit
    // uses (measured 0.028 on this JDK) — if a JDK change widens
    // encoder error, this fails before decode_ok ever goes red
    val media = Multimodal.attachMediaPayload(docs, "doc_id", "text").collect()
      .filter(r => r.doc_id % 9 == 3 && r.kind == "image")
    assert(media.nonEmpty)
    val maxDev = media.map { r =>
      val got = Multimodal.decodeOne(r).feature
      val exp = Multimodal.expectedFeature(r.doc_id)
      got.zip(exp).map { case (g, e) => math.abs(g - e) }.max
    }.max
    assert(maxDev <= 0.05, f"JPEG deviation $maxDev%.5f exceeds 0.05 — " +
      "JpegTol (0.1) margin eroded")
  }

  test("dHash: PNG and BMP of the same pixels hash identically, matching the closed form") {
    import spark.implicits._
    val (w, h) = (8, 6)
    // independent expectation straight from the pixel formula — no
    // shared code with the decoders or dhashFromPixels
    def expectedHash(d: Long): Long = {
      def gray(x: Int, y: Int): Int =
        (0 until 3).map(c => Multimodal.pixel(d, x, y, c)).sum / 3
      (for (y <- 0 until h; x <- 0 until w - 1) yield (x, y)).zipWithIndex
        .collect { case ((x, y), i) if gray(x + 1, y) > gray(x, y) => 1L << i }
        .foldLeft(0L)(_ | _)
    }
    val ids = Seq(0L, 9L, 18L, 2304L)
    val media = ids.flatMap(id => Seq(
      Multimodal.MediaRecord(id, "image", Multimodal.imageBytes(id, w, h, "png"), w, h, 0L),
      Multimodal.MediaRecord(id + 100000, "image", Multimodal.bmpBytes(id, w, h), w, h, 0L)))
    val got = Multimodal.imageDHash(spark, media.toDS()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) === expectedHash(id), s"doc $id PNG dHash vs closed form")
      assert(got(id + 100000) === got(id), s"doc $id BMP vs PNG dHash (format-shift)")
    }
    // ids 0 and 2304 share doc_id mod 2304 (lcm of the 256-cycle pixel
    // pattern and the codec classes) — identical images, hamming 0
    assert(got(0L) === got(2304L))
  }

  test("GMC1 motion compensation: exact round-trip, real vectors, smaller than keyframes") {
    import java.lang.Math.floorMod
    val w = 8; val h = 6; val nFrames = 9
    Seq(17L, 35L, 53L, 71L).foreach { id => // ids ≡ 17 (mod 18): the GMC slice
      val payload = Multimodal.gmcBytes(id, w, h, nFrames, fps = 25)
      val v = Multimodal.gmcFeatures(id, payload, stride = 4)
      assert(v.n_frames === nFrames && v.fps === 25 && v.sampled === 3)
      // independent simulation of the declared content rule (seed
      // formulas only — no codec structs)
      var canvas = Array.tabulate(h, w, 3)((y, x, c) => Multimodal.pixel(id * 1009, x, y, c))
      var lumaSum = 0.0; var sampled = 0
      for (f <- 0 until nFrames) {
        if (f > 0) {
          val dx = floorMod(id + f, 3).toInt - 1
          val dy = floorMod(id * 5 + f, 3).toInt - 1
          val next = Array.tabulate(h, w, 3)((y, x, c) =>
            canvas(floorMod(y - dy, h))(floorMod(x - dx, w))(c))
          val xr = floorMod(id + 7L * f, w).toInt
          val yr = floorMod(id * 3 + f, h).toInt
          for (c <- 0 until 3) next(yr)(xr)(c) = Multimodal.pixel(id * 1009 + f, xr, yr, c)
          canvas = next
        }
        if (f % 4 == 0) {
          lumaSum += (for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
            yield canvas(y)(x)(c).toLong).sum.toDouble / (w * h * 3)
          sampled += 1
        }
      }
      assert(math.abs(v.mean_luma - lumaSum / sampled) < 1e-9,
        s"doc $id motion-compensated reconstruction must be bit-exact")
      // the bitstream really encodes motion: at least one P-frame block
      // carries a non-zero vector (the content translates by design)
      val nBlocks = (w / 4) * (h / 3)
      var pos = 32 + w * h * 3
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var nonZero = 0
      for (_ <- 1 until nFrames) {
        for (b <- 0 until nBlocks)
          if (payload(pos + 2 * b) != 0 || payload(pos + 2 * b + 1) != 0) nonZero += 1
        pos += 2 * nBlocks
        val nRes = bb.getInt(pos); pos += 4 + 5 * nRes
      }
      assert(pos === payload.length, "container walk must consume every byte")
      assert(nonZero > 0, "block search must find the non-zero motion the content has")
      // motion compensation beats the keyframe-only container on size
      val gvid = Multimodal.gvidBytes(id, w, h, nFrames, fps = 25)
      assert(payload.length < gvid.length / 2,
        s"doc $id: P-frames (${payload.length}B) should be far smaller than full frames (${gvid.length}B)")
    }
    // truncation fails doc-labelled like the other parsers
    val good = Multimodal.gmcBytes(17L, w, h, 5, 25)
    val e = intercept[IllegalArgumentException] {
      Multimodal.gmcFeatures(17L, good.take(good.length - 3))
    }
    assert(e.getMessage.contains("doc 17") && e.getMessage.contains("truncated"))
  }
}
