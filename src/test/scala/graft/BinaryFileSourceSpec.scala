package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.BinaryFileSource

/** binaryFile blob interchange: manifest exactness (names, byte
  * lengths, digests — including multi-byte UTF-8), rerun hygiene, and
  * the glob filter. */
class BinaryFileSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("manifest reproduces names, UTF-8 byte lengths, and digests; " +
    "empty docs are excluded by contract") {
    // the empty doc is excluded at export: binaryFile maps a
    // zero-length file to zero partitions, so it could never scan back
    val d = docs(1L -> "plain ascii", 2L -> "naïve déjà vu — ütf8",
      3L -> "")
    val dir = Files.createTempDirectory("blob_rt").toString + "/out"
    val m = BinaryFileSource.roundtrip(d, dir)
      .as[(String, Long, String)].collect().toSeq
    val expect = Seq(1L -> "plain ascii", 2L -> "naïve déjà vu — ütf8")
      .map { case (id, t) =>
        val bytes = t.getBytes(StandardCharsets.UTF_8)
        val md = java.security.MessageDigest.getInstance("MD5")
        (s"d$id.bin", bytes.length.toLong,
          md.digest(bytes).map("%02x".format(_)).mkString)
      }.sortBy(_._1)
    assert(m == expect)
  }

  test("rerun replaces the dir: stale blobs from a wider write vanish") {
    val dir = Files.createTempDirectory("blob_rr").toString + "/out"
    BinaryFileSource.writeBlobs(docs(1L -> "a", 2L -> "b", 9L -> "c"),
      dir)
    val m = BinaryFileSource.roundtrip(docs(1L -> "a"), dir)
      .as[(String, Long, String)].collect().toSeq
    assert(m.map(_._1) == Seq("d1.bin"))
  }

  test("limit bounds the export; non-.bin files are not scanned") {
    val dir = Files.createTempDirectory("blob_lim").toString + "/out"
    BinaryFileSource.writeBlobs(docs(1L -> "in", 99L -> "out"), dir,
      limit = 64)
    Files.write(java.nio.file.Paths.get(dir, "stray.txt"),
      "noise".getBytes(StandardCharsets.UTF_8))
    val names = BinaryFileSource.readBlobs(spark, dir)
      .select("path").as[String].collect().toSeq
    assert(names.forall(_.endsWith("d1.bin")))
    assert(names.size == 1)
  }
}
