package graft

/** DuckDB SQL twins of the §2.4 extension operators (events / documents /
  * embeddings tables). Kept separate from OracleFragments (the logstash
  * parity twins) so each file mirrors one operator family.
  */
object OracleExt {

  // ---- events ops (graft.operators.Events) --------------------------

  val exactDedup: String = """
    SELECT event_id, user_id, event_type, ts FROM (
      SELECT event_id, user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1 ORDER BY event_id"""

  val approxDistinct: String = """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, true AS hll_ok
    FROM events GROUP BY event_type ORDER BY event_type"""

  val propsParse: String = """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events ORDER BY event_id"""

  val malformedDrop: String = """
    SELECT event_id, k FROM (
      SELECT event_id,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
             END AS k
      FROM (SELECT event_id,
                   CASE WHEN event_id % 97 = 0 THEN 'X' || substr(props, 2)
                        ELSE props END AS props
            FROM events))
    WHERE k IS NOT NULL ORDER BY event_id"""

  val sessionize: String = """
    SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id FROM (
      SELECT event_id, user_id,
             SUM(CASE WHEN prev IS NULL
                        OR epoch_us(ts) - prev > 3600000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM (SELECT event_id, user_id, ts,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
            FROM events))
    ORDER BY event_id"""

  val hourlyWindows: String = """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, min(event_id) AS min_eid, max(event_id) AS max_eid
    FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  // ---- documents ops (graft.operators.TextAnalysis) ------------------

  /** Twin of TextAnalysis.tokens. */
  private val toks =
    "list_filter(string_split(lower(text), ' '), t -> t != '')"

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  private def hits(words: Seq[String]): String =
    s"len(list_filter(toks, t -> t IN ${inList(words)}))"

  val termFreq: String = s"""
    SELECT term, count(*) AS cnt
    FROM (SELECT unnest($toks) AS term FROM documents)
    GROUP BY term ORDER BY term"""

  val tokenCounts: String = s"""
    SELECT doc_id, len($toks) AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
             AS n_bpe_tokens,
           length(text) AS n_chars
    FROM documents ORDER BY doc_id"""

  def langId(stop: Map[String, Seq[String]]): String = s"""
    SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
           CASE WHEN greatest(hits_en, hits_es, hits_de, hits_fr) = 0 THEN 'und'
                WHEN hits_en >= hits_es AND hits_en >= hits_de
                     AND hits_en >= hits_fr THEN 'en'
                WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
                WHEN hits_de >= hits_fr THEN 'de'
                ELSE 'fr' END AS pred_lang
    FROM (SELECT doc_id,
                 ${hits(stop("en"))} AS hits_en, ${hits(stop("es"))} AS hits_es,
                 ${hits(stop("de"))} AS hits_de, ${hits(stop("fr"))} AS hits_fr
          FROM (SELECT doc_id, $toks AS toks FROM documents))
    ORDER BY doc_id"""

  def qualityScore(enStop: Seq[String], threshold: Long): String = s"""
    SELECT doc_id, len_component, stop_component, punct_penalty,
           len_component + stop_component - punct_penalty AS score,
           len_component + stop_component - punct_penalty >= $threshold AS keep
    FROM (SELECT doc_id,
                 least(len(toks), 200) * 100 AS len_component,
                 ${hits(enStop)} * 10 AS stop_component,
                 (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))) * 50
                   AS punct_penalty
          FROM (SELECT doc_id, text, $toks AS toks FROM documents))
    ORDER BY doc_id"""

  val fingerprints: String = s"""
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''), c -> ascii(c))),
             (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_roll,
           ${graft.functions.PortableHash.sqlHash32("text")} AS fp_md5
    FROM documents ORDER BY doc_id"""
}
