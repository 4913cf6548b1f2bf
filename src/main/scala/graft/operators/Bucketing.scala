package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed table layout — the co-located-join half of the 100 TB
  * story (the write-side complement of [[Layout]]'s z-order pass).
  * Hash-bucketing both join sides on the join key at WRITE time means
  * every subsequent equi-join on that key lines bucket i up with
  * bucket i: Spark plans a SortMergeJoin with NO Exchange on either
  * side — the single biggest recurring shuffle in a warehouse (fact ⋈
  * fact on a shared key) is paid once at ingest instead of per query.
  * Catalyst reads the bucket spec from the catalog; nothing at read
  * time is hand-scheduled.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed AND sorted on
    * `key`. The repartition on the bucket key first keeps the file
    * count at one file per (task-owning) bucket rather than
    * tasks × buckets tiny files — the same small-files discipline as
    * [[Layout.partitionedWrite]]. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    // True overwrite: the in-memory catalog is per-JVM but the
    // warehouse directory is not — a table dir left by a previous
    // session makes CTAS fail with LOCATION_ALREADY_EXISTS even after
    // DROP TABLE IF EXISTS. Clear both catalog entry and location.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Inner-join two same-bucketed tables on their shared bucket key.
    * The merge hint pins the sort-merge strategy so the plan PROVES
    * the bucketing (a broadcast join at test scale would hide it);
    * with both sides bucketed the executed plan has zero Exchange
    * operators — asserted in CI by PlansSpec. */
  def bucketedEquiJoin(spark: SparkSession, left: String, right: String,
                       key: String): DataFrame =
    spark.table(left).hint("merge")
      .join(spark.table(right).hint("merge"), Seq(key))
}
