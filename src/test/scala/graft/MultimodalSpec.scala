package graft

import graft.multimodal.Multimodal

/** §2.4 multimodal plumbing: binary payloads, typed metadata, frame
  * slicing, and the batched-decode codec seam. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def assets(texts: (Long, String)*) =
    Multimodal.asAssets(texts.toDF("doc_id", "text"))

  test("asAssets: modality cycle, BINARY payload, typed metadata") {
    val a = assets((0L, "img"), (1L, "aud"), (2L, "vid"))
      .select("asset_id", "modality", "meta.sample_rate")
      .as[(Long, String, Option[Int])].collect().sortBy(_._1).toSeq
    assert(a.map(_._2) == Seq("image", "audio", "video"))
    assert(a.map(_._3) == Seq(None, Some(16000), None))
    val payload = assets((0L, "img")).select("payload")
      .as[Array[Byte]].head()
    assert(new String(payload, "UTF-8") == "img")
  }

  test("frameSample: slices cover the payload exactly") {
    val text = "x" * 600 // 3 frames: 255 + 255 + 90
    val f = Multimodal.frameSample(assets((7L, text)))
      .select("frame_id", "frame_len")
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(f == Seq((0, 255L), (1, 255L), (2, 90L)))
  }

  test("decodeBatched: stub codec is deterministic and 1:1") {
    val a = assets((0L, "hello world"), (1L, ""))
    val d = Multimodal.decodeBatched(a, new Multimodal.StubCodec)
      .select("asset_id", "ok").as[(Long, Boolean)].collect().toMap
    assert(d == Map(0L -> true, 1L -> false))
    // the stub's first feature is the rolling hash (known value)
    val f0 = Multimodal.decodeBatched(a, new Multimodal.StubCodec)
      .filter("asset_id = 0").select("feature").as[Seq[Float]].head()
    assert(f0.head == 204910434f)
  }

  test("ImageIoCodec: real PNG decode through the batched seam") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // two REAL PNGs (pure-JDK encode): a 7×5 solid mid-gray and a 4×4
    // black/white checkerboard with known mean and variance
    def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val gray = png(7, 5)((_, _) => 0x808080)      // luma = 128 exactly
    val checker = png(4, 4)((x, y) =>
      if ((x + y) % 2 == 0) 0x000000 else 0xffffff) // mean 127.5, var 127.5²
    val rows = Seq(
      (0L, "image", gray), (1L, "image", checker),
      (2L, "image", "not a png".getBytes("UTF-8")), // undecodable
      (3L, "audio", gray))                          // wrong modality
      .toDF("asset_id", "modality", "payload")
    val d = Multimodal.decodeBatched(rows, new Multimodal.ImageIoCodec)
      .select("asset_id", "ok", "feature")
      .as[(Long, Boolean, Seq[Float])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(d(0L)._1 && d(1L)._1, "real PNGs must decode")
    assert(!d(2L)._1, "garbage bytes must fail closed")
    assert(!d(3L)._1, "non-image modality must fail closed")
    val (gw, gf) = (d(0L)._2, d(1L)._2)
    assert(gw(0) == 7f && gw(1) == 5f, s"gray dims: $gw")
    assert(math.abs(gw(2) - 128f) < 0.5f, s"gray mean luma: ${gw(2)}")
    assert(gw(3) < 1f, "solid color has ~zero variance")
    assert(gf(0) == 4f && gf(1) == 4f)
    assert(math.abs(gf(2) - 127.5f) < 0.5f, s"checker mean: ${gf(2)}")
    assert(math.abs(gf(3) - 127.5f * 127.5f) < 200f,
      s"checker variance: ${gf(3)}")
  }

  // a REAL mono 16-bit PCM WAV (pure-JDK encode): sine at `freq` Hz,
  // amplitude `amp` of full scale, 1 second at `sr` Hz
  private def sineWav(sr: Int, freq: Double, amp: Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](sr * 2)
    for (i <- 0 until sr) {
      val s = (math.sin(2 * math.Pi * freq * i / sr) * amp * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte          // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, sr.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("WavCodec: real WAV decode — rate, frames, RMS, zero crossings") {
    val wav = sineWav(sr = 8000, freq = 440.0, amp = 0.5)
    val rows = Seq(
      (0L, "audio", wav),
      (1L, "audio", "not a wav".getBytes("UTF-8")), // undecodable
      (2L, "image", wav))                           // wrong modality
      .toDF("asset_id", "modality", "payload")
    val d = Multimodal.decodeBatched(rows, new Multimodal.WavCodec)
      .select("asset_id", "ok", "feature")
      .as[(Long, Boolean, Seq[Float])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(d(0L)._1, "real WAV must decode")
    assert(!d(1L)._1, "garbage bytes must fail closed")
    assert(!d(2L)._1, "non-audio modality must fail closed")
    val f = d(0L)._2
    assert(f(0) == 8000f, s"sample rate: ${f(0)}")
    assert(f(1) == 8000f, s"frame count: ${f(1)}")
    // sine RMS = amp/sqrt(2) ≈ 0.3536; ZCR = 2·freq/sr = 0.11/frame
    assert(math.abs(f(2) - 0.3536f) < 0.01f, s"RMS: ${f(2)}")
    assert(math.abs(f(3) - 0.11f) < 0.005f, s"ZCR: ${f(3)}")
  }

  // REAL JPEG (pure-JDK encode): w×h solid-color frame
  private def jpegSolid(w: Int, h: Int, rgb: Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  // Minimal REAL MJPEG-in-AVI container: RIFF('AVI ' LIST('movi'
  // 00dc{jpeg}…)) with RIFF word alignment — exactly the chunk walk
  // AviMjpegCodec implements (hdrl omitted: frame data is
  // self-describing for MJPEG)
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    val movi = new java.io.ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    frames.foreach { f =>
      movi.write("00dc".getBytes("US-ASCII"))
      movi.write(le32(f.length))
      movi.write(f)
      if (f.length % 2 == 1) movi.write(0) // pad to word boundary
    }
    val m = movi.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(4 + 8 + m.length)) // 'AVI ' + LIST header + payload
    out.write("AVI ".getBytes("US-ASCII"))
    out.write("LIST".getBytes("US-ASCII"))
    out.write(le32(m.length))
    out.write(m)
    out.toByteArray
  }

  test("AviMjpegCodec: 2-frame MJPEG AVI decodes; malformed fails closed") {
    val avi = mjpegAvi(Seq(
      jpegSolid(6, 4, 0x808080),   // luma ≈ 128
      jpegSolid(6, 4, 0x404040)))  // luma ≈ 64
    // mid-container truncation with a CONSISTENT RIFF size: the outer
    // header claims exactly the bytes present, but the LIST chunk's
    // declared size now runs past the buffer
    val midTrunc = {
      val t = avi.dropRight(10)
      val sz = t.length - 8
      t(4) = (sz & 0xff).toByte; t(5) = ((sz >> 8) & 0xff).toByte
      t(6) = ((sz >> 16) & 0xff).toByte; t(7) = ((sz >> 24) & 0xff).toByte
      t
    }
    val rows = Seq(
      (0L, "video", avi),
      (1L, "video", avi.dropRight(10)),               // truncated container
      (2L, "video", midTrunc),                        // truncated chunk
      (3L, "video", "junk".getBytes("UTF-8")),        // not RIFF at all
      (4L, "video", mjpegAvi(Seq.empty)),             // movi with no frames
      (5L, "video", mjpegAvi(Seq("notjpeg".getBytes("UTF-8")))), // bad frame
      (6L, "image", avi))                             // wrong modality
      .toDF("asset_id", "modality", "payload")
    val d = Multimodal.decodeBatched(rows, new Multimodal.AviMjpegCodec)
      .select("asset_id", "ok", "feature")
      .as[(Long, Boolean, Seq[Float])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(d(0L)._1, "well-formed MJPEG AVI must decode")
    val f = d(0L)._2
    assert(f(0) == 2f, s"frame count: ${f(0)}")
    assert(f(1) == 6f && f(2) == 4f, s"first-frame dims: $f")
    assert(math.abs(f(3) - 96f) < 6f, s"mean luma across frames: ${f(3)}")
    (1L to 6L).foreach(i =>
      assert(!d(i)._1, s"asset $i must fail closed"))
  }

  test("JdkCodec: dispatches all three modalities to real codecs") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val img = new BufferedImage(3, 3, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 3) img.setRGB(x, y, 0x808080)
    val po = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", po)
    val rows = Seq(
      (0L, "image", po.toByteArray),
      (1L, "audio", sineWav(8000, 440.0, 0.5)),
      (2L, "video", mjpegAvi(Seq(jpegSolid(5, 3, 0x808080)))),
      (3L, "video", po.toByteArray)) // a PNG is not an AVI container
      .toDF("asset_id", "modality", "payload")
    val d = Multimodal.decodeBatched(rows, new Multimodal.JdkCodec)
      .select("asset_id", "ok", "feature")
      .as[(Long, Boolean, Seq[Float])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(d(0L)._1 && d(0L)._2.take(2) == Seq(3f, 3f))
    assert(d(1L)._1 && d(1L)._2.head == 8000f)
    assert(d(2L)._1 && d(2L)._2.take(3) == Seq(1f, 5f, 3f),
      "MJPEG AVI decodes through the video codec")
    assert(!d(3L)._1, "non-AVI video payload fails closed")
  }

  test("mimeSniff: signatures classify; mislabeled assets flagged") {
    val png = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 1, 2)
      .map(_.toByte)
    val jpg = Array(0xFF, 0xD8, 0xFF, 0xE0, 9).map(_.toByte)
    val wav = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0x24, 0, 0, 0) ++
      "WAVEfmt ".getBytes("US-ASCII")
    val rows = Seq(
      (0L, "image", png), (1L, "image", jpg), (2L, "audio", wav),
      (3L, "image", "GIF87a12".getBytes("US-ASCII")),
      (4L, "audio", ".snd1234".getBytes("US-ASCII")),
      (5L, "video", "plain text".getBytes("UTF-8")),
      (6L, "audio", png)) // mislabeled: PNG bytes claimed as audio
      .toDF("asset_id", "modality", "payload")
    val r = Multimodal.mimeSniff(rows).orderBy("asset_id")
      .as[(Long, String, String, String, Boolean)].collect().toList
    assert(r == List(
      (0L, "image", "png", "image", true),
      (1L, "image", "jpeg", "image", true),
      (2L, "audio", "wav", "audio", true),
      (3L, "image", "gif", "image", true),
      (4L, "audio", "au", "audio", true),
      (5L, "video", "unknown", "unknown", false),
      (6L, "audio", "png", "image", false)), s"got $r")
  }

  test("mimeSniff: agrees with what JdkCodec actually decodes on real payloads") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    val po = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", po)
    val rows = Seq(
      (0L, "image", po.toByteArray),
      (1L, "audio", sineWav(8000, 440.0, 0.25)))
      .toDF("asset_id", "modality", "payload")
    val sniff = Multimodal.mimeSniff(rows)
      .select("asset_id", "agree").as[(Long, Boolean)].collect().toMap
    val dec = Multimodal.decodeBatched(rows, new Multimodal.JdkCodec)
      .select("asset_id", "ok").as[(Long, Boolean)].collect().toMap
    assert(sniff == dec, "sniff verdicts must match real decode outcomes")
  }
}
