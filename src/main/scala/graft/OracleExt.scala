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
}
