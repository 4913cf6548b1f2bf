package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.InMemoryKinesis

/** DataSource V2 connector for the in-memory sharded stream — the full
  * Spark analog of the reference's source/consumer machinery:
  *
  * - S1 (registration, logspoutkinesis.go:56-59): registered under the
  *   short name `graft-kinesis` via META-INF/services, so
  *   `spark.read.format("graft-kinesis")` resolves like the reference's
  *   `AdapterFactories.Register("kinesis")`.
  * - S5 (shard discovery, readstream.py:19-27): `planInputPartitions`
  *   emits ONE InputPartition PER SHARD — Spark schedules a task per
  *   shard exactly as the reference builds one iterator per shard.
  * - S6 (offset positioning, readstream.py:26-27): option
  *   `startingSeq` = AT_SEQUENCE_NUMBER analog (default 0 =
  *   TRIM_HORIZON); streaming honors `startingOffsets` earliest/latest.
  * - S7 (poll + offset advance, readstream.py:30-33): the micro-batch
  *   stream's per-shard offsets are planned/committed by the engine —
  *   checkpointable, unlike the reference's in-memory iterator tokens.
  * - S8 (per-fetch limit, readstream.py:32): option `maxRecordsPerFetch`
  *   caps records per shard per micro-batch (maxOffsetsPerTrigger
  *   analog).
  *
  * Single-JVM caveat: the backing store is `InMemoryKinesis` (local[*]
  * executors share the JVM). A production implementation swaps the
  * store calls for a service client; the connector surface is the same.
  */
class KinesisLikeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kinesis"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisLikeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KinesisLikeTable(new CaseInsensitiveStringMap(properties))
}

object KinesisLikeSource {
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("shard", IntegerType, nullable = false),
    StructField("partition_key", StringType),
    StructField("data", StringType)))
}

final class KinesisLikeTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val streamName = options.get("stream")
  require(streamName != null, "option 'stream' is required")

  override def name(): String = s"graft-kinesis:$streamName"
  override def schema(): StructType = KinesisLikeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new KinesisLikeScan(streamName,
      opts.getLong("startingSeq", 0L),
      opts.getInt("maxRecordsPerFetch", Int.MaxValue),
      opts.getOrDefault("startingOffsets", "earliest"))
}

final class KinesisLikeScan(stream: String, startingSeq: Long,
                            maxPerFetch: Int, startingOffsets: String)
    extends Scan {
  override def readSchema(): StructType = KinesisLikeSource.schema
  override def description(): String = s"graft-kinesis scan of $stream"

  // ---- batch: one partition per shard (S5), from startingSeq (S6) ----
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val s = InMemoryKinesis.get(stream)
      (0 until s.numShards).map(i =>
        ShardRange(stream, i, startingSeq, Long.MaxValue)
          : InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new ShardReaderFactory
  }

  // ---- streaming: engine-managed per-shard offsets (S7) --------------
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream = new MicroBatchStream {
    private def currentSeq: Long = InMemoryKinesis.get(stream).seq.get()

    override def initialOffset(): Offset =
      SeqOffset(if (startingOffsets == "latest") currentSeq else startingSeq)
    override def latestOffset(): Offset = {
      val latest = currentSeq
      SeqOffset(latest) // maxPerFetch is applied per shard at plan time
    }
    override def planInputPartitions(start: Offset, end: Offset)
        : Array[InputPartition] = {
      val (s, e) = (start.asInstanceOf[SeqOffset].seq,
        end.asInstanceOf[SeqOffset].seq)
      val st = InMemoryKinesis.get(stream)
      (0 until st.numShards).map(i =>
        ShardRange(stream, i, s, e, maxPerFetch): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new ShardReaderFactory
    override def deserializeOffset(json: String): Offset =
      SeqOffset(json.trim.toLong)
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }
}

/** Engine-checkpointable offset: the global sequence high-water mark
  * (per-shard logs share one monotonic sequence). */
final case class SeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

/** One shard's [fromSeq, untilSeq) slice — the shard-iterator analog. */
final case class ShardRange(stream: String, shard: Int, fromSeq: Long,
                            untilSeq: Long, limit: Int = Int.MaxValue)
    extends InputPartition

final class ShardReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[ShardRange]
    new PartitionReader[InternalRow] {
      private val it = InMemoryKinesis.get(r.stream).shards(r.shard)
        .iterator()
      private var current: InMemoryKinesis.Record = _
      private var emitted = 0
      override def next(): Boolean = {
        while (it.hasNext && emitted < r.limit) {
          val rec = it.next()
          if (rec.seq >= r.fromSeq && rec.seq < r.untilSeq) {
            current = rec; emitted += 1; return true
          }
        }
        false
      }
      override def get(): InternalRow =
        InternalRow(current.seq, r.shard,
          UTF8String.fromString(current.partitionKey),
          UTF8String.fromString(current.data))
      override def close(): Unit = ()
    }
  }
}
