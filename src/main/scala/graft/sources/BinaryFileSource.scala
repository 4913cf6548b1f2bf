package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blob-store interchange via Spark's `binaryFile` source — the
  * multimodal ingest path's file-per-object face: documents exported
  * as standalone binary blobs (one file per object, the layout a crawl
  * or media store actually lands in), then scanned back distributed
  * with Spark's built-in binaryFile DSv2 reader (path/length metadata
  * + full content per file, partition-parallel over files). The
  * manifest (name, byte length, content digest) is the integrity
  * contract: it must reproduce exactly from the original table, which
  * is what the oracle twin checks without ever touching the files.
  *
  * Scale notes: binaryFile lists and splits BY FILE (a file is never
  * split), so at 100 TB the object store's files ARE the partitions —
  * fine for blobs, wrong for one giant file; `pathGlobFilter`
  * restricts the listing without reading content. The writer is
  * executor-side per-partition IO against a SHARED path — the same
  * contract every file sink in Spark has (on local[n] any tmp dir
  * qualifies). */
object BinaryFileSource {

  /** Export each selected NON-EMPTY doc as `d<doc_id>.bin` (UTF-8 text
    * bytes), per-partition executor IO. Empty docs are excluded by
    * contract: Spark's binaryFile listing maps a zero-length file to
    * zero partitions, so an empty blob silently vanishes from the
    * scan — better to exclude it loudly at export than to let the
    * manifest disagree with the source table. The dir is re-created
    * empty so reruns never leave stale blobs behind. */
  def writeBlobs(docs: DataFrame, path: String, limit: Long = 64): Unit = {
    val dir = Paths.get(path)
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(dir)
    // capture only the path STRING: java.nio.file.Path is not
    // serializable and the closure ships to executors
    val dirStr = dir.toAbsolutePath.toString
    docs.filter(col("doc_id") < limit && col("text").isNotNull
        && length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          Files.write(Paths.get(dirStr, s"d${r.getLong(0)}.bin"),
            r.getString(1).getBytes(StandardCharsets.UTF_8))
        }
      }
  }

  /** Distributed scan of a blob dir: (path, modificationTime, length,
    * content) — one row per file, files never split. */
  def readBlobs(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(path)

  /** Write + scan-back + manifest: (file_name, length, content_md5).
    * Round-trip integrity is byte-exact iff this reproduces from the
    * source table alone — the oracle contract. */
  def roundtrip(docs: DataFrame, path: String,
                limit: Long = 64): DataFrame = {
    writeBlobs(docs, path, limit)
    readBlobs(docs.sparkSession, path)
      .select(element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length"), md5(col("content")).as("content_md5"))
      .orderBy("file_name")
  }
}
