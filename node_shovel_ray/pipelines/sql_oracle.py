"""ANSI-SQL (DuckDB) oracles for the driver's correctness gate.

Every stage of the flagship DAG is written twice: once as vectorized Arrow
(the engine) and once as SQL over the pre-registered ``events`` view (these
strings). The driver runs both at sf=0.01 and hash-compares values, so
every expression here is the *semantic contract* of the matching stage —
pure integer/string/timestamp ops with no RNG or wall-clock so the two
engines agree bit-for-bit.
"""

# events → transcripts (see stages/transcriptify.py for the Arrow twin)
TRANSCRIPTIFY_CTE = """
base AS (
  SELECT event_id, ts, user_id, event_type, props,
    'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INTEGER) AS turn_idx,
    CASE WHEN event_type = 'signup' THEN 'system'
         WHEN event_type = 'purchase' THEN 'assistant'
         WHEN event_type = 'error' THEN 'tool'
         ELSE 'user' END AS role,
    CASE WHEN event_type = 'purchase' THEN 'search'
         WHEN event_type = 'error' THEN 'bash'
         ELSE '' END AS tool
  FROM events
),
transcripts AS (
  SELECT conv_id, turn_idx, role,
    (CASE WHEN event_id % 10 < 3 THEN '[role=' || role || '] ' ELSE '' END)
    || 'event ' || event_type || ' ' || props
    || (CASE WHEN tool <> '' THEN ' <tool:' || tool || ' args="' || props || '">call</tool>' ELSE '' END)
    || (CASE WHEN event_type = 'error' THEN ' ERR-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') ELSE '' END)
      AS text,
    tool, ts
  FROM base
)
"""

# transcripts → parsed (twin: stages/parse.py)
PARSE_CTE = r"""
parsed AS (
  SELECT *,
    CASE WHEN parse_ok THEN NULLIF(regexp_extract(text, '<tool:([a-z_]+)', 1), '') END AS parsed_tool,
    CASE WHEN parse_ok THEN NULLIF(regexp_extract(text, '(ERR-[0-9]{4})', 1), '') END AS error_code,
    CASE WHEN parse_ok THEN NULLIF(regexp_extract(text, '^\[role=([a-z]+)\]', 1), '') END AS role_tag
  FROM (
    SELECT *,
      NOT (contains(text, chr(10))
           OR (contains(text, '<tool:')
               AND NOT regexp_matches(text, '<tool:[a-z_]+.*</tool>'))) AS parse_ok
    FROM transcripts
  )
)
"""

# conv-level lookup derived from events (twin: pipelines/flagship.build_conv_meta)
CONV_META_CTE = """
conv_meta AS (
  SELECT DISTINCT
    'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
    'tenant-' || CAST(user_id % 10 AS VARCHAR) AS tenant,
    CASE CAST(user_id % 3 AS INTEGER) WHEN 0 THEN 'api' WHEN 1 THEN 'web' ELSE 'cli' END AS channel,
    CAST(user_id % 4 AS INTEGER) AS priority
  FROM events
)
"""

# parsed + lookup + seq numbering + hour bucket + sink tag (twins:
# stages/enrich.py, stages/route.py)
ENRICH_CTE = """
enriched AS (
  SELECT p.*, m.tenant, m.channel, m.priority,
    CAST(row_number() OVER (PARTITION BY p.conv_id ORDER BY p.turn_idx) - 1 AS BIGINT) AS seq_in_conv,
    date_trunc('hour', p.ts) AS hour,
    CASE WHEN p.error_code IS NOT NULL THEN 'errors'
         WHEN p.parsed_tool IS NOT NULL THEN 'tools'
         ELSE 'chat' END AS sink_tag,
    (m.priority >= 2) AS audit
  FROM parsed p JOIN conv_meta m USING (conv_id)
)
"""

_PRELUDE = (
    "WITH "
    + TRANSCRIPTIFY_CTE.strip().rstrip(",")
    + ",\n"
    + PARSE_CTE.strip()
    + ",\n"
    + CONV_META_CTE.strip()
    + ",\n"
    + ENRICH_CTE.strip()
)

Q_TRANSCRIPTS = f"WITH {TRANSCRIPTIFY_CTE.strip()} SELECT * FROM transcripts"
Q_PARSE = (
    f"WITH {TRANSCRIPTIFY_CTE.strip()},\n{PARSE_CTE.strip()} "
    "SELECT conv_id, turn_idx, role, text, tool, ts, parsed_tool, error_code, "
    "role_tag, parse_ok FROM parsed"
)
Q_CONV_META = f"WITH {CONV_META_CTE.strip()} SELECT * FROM conv_meta"
Q_ENRICH = (
    _PRELUDE
    + " SELECT conv_id, turn_idx, tenant, channel, priority, seq_in_conv, hour,"
    " sink_tag, audit FROM enriched"
)
def sink_sql(tag: str) -> str:
    """Routed-row-set oracle for one primary sink."""
    return (
        _PRELUDE
        + " SELECT conv_id, turn_idx, role, text, sink_tag FROM enriched"
        f" WHERE sink_tag = '{tag}'"
    )
Q_AUDIT = (
    _PRELUDE
    + " SELECT conv_id, turn_idx, role, text, priority FROM enriched WHERE audit"
)
Q_SINK_COUNTS = (
    _PRELUDE
    + """
  SELECT sink_tag, role, coalesce(parsed_tool, '') AS tool, hour, count(*) AS n
  FROM enriched GROUP BY 1, 2, 3, 4
  UNION ALL
  SELECT 'audit' AS sink_tag, role, coalesce(parsed_tool, '') AS tool, hour, count(*) AS n
  FROM enriched WHERE audit GROUP BY 1, 2, 3, 4
"""
)
