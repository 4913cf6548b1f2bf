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
}
