package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Static-schema readers for the documents/embeddings fixtures (schema
  * declared, never inferred — same discipline as LogSource). */
object Tables {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.schema(documentsSchema).parquet(s"$sfDir/documents.parquet")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.schema(embeddingsSchema).parquet(s"$sfDir/embeddings.parquet")
}
