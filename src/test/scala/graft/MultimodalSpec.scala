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
}
