package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pass an LLM training-data pipeline
  * runs before tokenization (SURVEY §2.4 capstone): near-duplicate
  * removal ∩ quality gate ∩ language filter, composed from the
  * individually-oracle-checked operators. One row per surviving doc.
  *
  * 100 TB shape: three independent doc-keyed predicates joined on
  * doc_id — each input branch is the already-audited operator plan
  * (LSH banded anti-join / per-row quality projection / per-row
  * language argmax), and the final joins are hash equi-joins on the
  * same key, so AQE co-partitions them with at most one shuffle per
  * branch. Nothing here is a new physical shape — that is the point:
  * curation is composition, and a declarative plan lets Catalyst
  * fuse the per-row branches into the same scan. */
object Curation {

  def curate(docs: DataFrame, keepLang: String = "en",
             keepThreshold: Long = 3000L): DataFrame = {
    val survivors = Dedup.dedupKeepList(docs).select("doc_id")
    val quality = TextAnalysis.qualityScore(docs, keepThreshold)
      .filter(col("keep")).select(col("doc_id"), col("score"))
    val lang = TextAnalysis.langId(docs)
      .filter(col("pred_lang") === keepLang)
      .select(col("doc_id"), col("pred_lang"))
    survivors.join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .select(col("doc_id"), col("pred_lang"), col("score"))
  }
}
