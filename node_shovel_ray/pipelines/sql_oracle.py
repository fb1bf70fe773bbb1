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


# ------------------------------------------------------- corpus text oracles
# Generated from the SAME stopword profiles the engine uses
# (functions/textstats._STOPWORDS) so the stopword side cannot drift.
# Regex semantics CAN drift between engines: Python re's \w is unicode,
# DuckDB/Arrow RE2's \w is ASCII. Both sides therefore use the explicit
# ASCII class [^A-Za-z0-9_\s] (textstats._PUNCT_RE) — identical in RE2 on
# both engines, including for non-ASCII documents.

def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _quality_docs_sql() -> str:
    from ..functions.textstats import _STOPWORDS

    en = _sql_list(sorted(_STOPWORDS["en"]))
    return rf"""
WITH w AS (
  SELECT doc_id,
    length(text) AS n_chars,
    regexp_extract_all(text, '[a-zA-Z]+') AS words,
    length(text) - length(regexp_replace(text, '[^A-Za-z0-9_\s]', '', 'g')) AS n_punct
  FROM documents
), c AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
    CAST(len(list_filter(words, x -> list_contains({en}, lower(x)))) AS DOUBLE)
      / greatest(1, len(words)) AS stop_ratio,
    coalesce(list_avg(list_transform(words, x -> length(x))), 0.0) AS mean_word_len
  FROM w
)
SELECT doc_id, n_words,
  round(punct_ratio, 4) AS punct_ratio,
  round(stop_ratio, 4) AS stop_ratio,
  round(
    0.4 * (least(greatest(stop_ratio, 0), 0.6) / 0.6)
    + 0.3 * (1 - least(greatest(punct_ratio, 0), 0.5) / 0.5)
    + 0.3 * ((least(greatest(mean_word_len, 2), 8) - 2) / 6), 4) AS quality
FROM c
"""


def _langid_docs_sql() -> str:
    from ..functions.textstats import _STOPWORDS

    L = {k: _sql_list(sorted(v)) for k, v in _STOPWORDS.items()}
    return rf"""
WITH w AS (
  SELECT doc_id,
    list_transform(regexp_extract_all(text, '[a-zA-Zäöüéèêàáíóúñç]+'),
                   x -> lower(x)) AS ws
  FROM documents
), s AS (
  SELECT doc_id, len(ws) AS nw,
    len(list_filter(ws, x -> list_contains({L['en']}, x))) AS s_en,
    len(list_filter(ws, x -> list_contains({L['de']}, x))) AS s_de,
    len(list_filter(ws, x -> list_contains({L['fr']}, x))) AS s_fr,
    len(list_filter(ws, x -> list_contains({L['es']}, x))) AS s_es
  FROM w
)
SELECT doc_id,
  CASE WHEN nw = 0 THEN 'unknown'
       WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unknown'
       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       WHEN s_fr >= s_es THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM s
"""


Q_QUALITY_DOCS = _quality_docs_sql()
Q_LANGID_DOCS = _langid_docs_sql()


# DuckDB-reproducible md5 min-hash fingerprint (engine twin:
# functions/textstats.fingerprint_md5 — same tokenizer class, same
# window=8 shingles, same md5_number_lower semantics; zero-token docs are
# NULL on both sides).
Q_FINGERPRINT_DOCS = r"""
WITH w AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
  list_min(list_transform(
    range(1, greatest(len(toks) - 7, 1) + 1),
    i -> md5_number_lower(array_to_string(toks[i:i+7], ' '))
  )) AS fingerprint
FROM w
"""


def _approx_distinct_sql(p: int = 12) -> str:
    """Full HyperLogLog in ANSI SQL — same md5 hash, registers (sequential
    bit-smear + popcount leading-zero rank), merge, estimator and rounding
    as functions/sketches with hash_fn='md5' (register-level parity
    verified at 60k distinct). This makes the SKETCH itself oracle-checked,
    not just its error bound."""
    m = 1 << p
    rem = 64 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    return f"""
WITH h AS (
  SELECT DISTINCT event_type, md5_number_lower(CAST(user_id AS VARCHAR)) AS hv
  FROM events
), r AS (
  SELECT event_type, CAST(hv >> {rem} AS INT) AS idx,
         hv & ((1::UBIGINT << {rem}) - 1) AS w
  FROM h
), s1 AS (SELECT event_type, idx, w, w | (w>>1) AS x FROM r),
s2 AS (SELECT event_type, idx, w, x | (x>>2) AS x FROM s1),
s3 AS (SELECT event_type, idx, w, x | (x>>4) AS x FROM s2),
s4 AS (SELECT event_type, idx, w, x | (x>>8) AS x FROM s3),
s5 AS (SELECT event_type, idx, w, x | (x>>16) AS x FROM s4),
s6 AS (SELECT event_type, idx, w, x | (x>>32) AS x FROM s5),
ranks AS (
  SELECT event_type, idx,
    CASE WHEN w = 0 THEN {rem + 1} ELSE {rem} - bit_count(x) + 1 END AS rank
  FROM s6
), regs AS (
  SELECT event_type, idx, MAX(rank) AS M FROM ranks GROUP BY 1, 2
), agg AS (
  SELECT event_type, COUNT(*) AS n_present, SUM(pow(2.0, -M)) AS sum_present
  FROM regs GROUP BY 1
), est AS (
  SELECT event_type,
    CAST({alpha} AS DOUBLE) * {m} * {m}
      / (({m} - n_present) * 1.0 + sum_present) AS E,
    {m} - n_present AS zeros
  FROM agg
)
SELECT event_type,
  CAST(floor(CASE WHEN E <= 2.5 * {m} AND zeros > 0
       THEN {m} * ln({m} / CAST(zeros AS DOUBLE)) ELSE E END + 0.5) AS BIGINT)
    AS approx_n_distinct
FROM est
"""


Q_APPROX_DISTINCT_USERS = _approx_distinct_sql()


# Deterministic sampling twins (functions/sampling.py): rank by the same
# md5 hash, so membership is identical on both sides.
Q_SAMPLE_DOCS_PER_LANG = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
    ) AS rn
  FROM documents
) WHERE rn <= 25
"""


def _sample_fraction_sql(p: float = 0.2) -> str:
    from ..functions.sampling import fraction_threshold

    # the cutoff is computed ONCE in Python and inlined as a literal —
    # engine and oracle cannot disagree on float→int rounding
    return f"""
SELECT doc_id, lang FROM documents
WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) < {fraction_threshold(p)}
"""


Q_SAMPLE_DOCS_FRACTION = _sample_fraction_sql()

# exact-size global sample (functions/sampling.sample_topn): the engine
# sorts on md5 >> 1 (int64-safe Dataset sort key), so the twin orders by
# the same halved hash — `// 2` on DuckDB's unsigned md5_number_lower
Q_SAMPLE_DOCS_TOPN = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
    row_number() OVER (
      ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)) // 2, doc_id
    ) AS rn
  FROM documents
) WHERE rn <= 200
"""


# Histogram quantile sketch twin (functions/sketches.grouped_hist_quantile):
# same float64 binning, integer cumsum threshold, lower-edge estimate.
Q_APPROX_MEDIAN_HIST = """
WITH b AS (
  SELECT event_type, CAST(floor(value / 0.1) AS BIGINT) AS bin, count(*) AS n
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, bin, n,
    sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
    sum(n) OVER (PARTITION BY event_type) AS total
  FROM b
)
SELECT event_type,
  round(min(bin) * 0.1, 2) AS approx_median
FROM c WHERE cum >= ceil(0.5 * total)
GROUP BY event_type
"""


def _curated_docs_sql(min_quality: float = 0.4, k: int = 10) -> str:
    """End-to-end twin of pipelines/corpus.curated_docs: normalize →
    rounded-quality filter → min-doc_id dedup on text_norm → md5-rank
    sample per language."""
    qual = _quality_docs_sql()
    return rf"""
WITH qual AS ({qual}),
norm AS (
  SELECT doc_id, lang,
    trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS text_norm
  FROM documents
),
keep AS (
  SELECT n.doc_id, n.lang, n.text_norm
  FROM norm n JOIN qual q ON n.doc_id = q.doc_id
  WHERE q.quality >= {min_quality}
),
dedup AS (
  SELECT text_norm, min(doc_id) AS doc_id FROM keep GROUP BY text_norm
),
surv AS (
  SELECT k2.doc_id, k2.lang FROM keep k2 JOIN dedup d ON k2.doc_id = d.doc_id
)
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
    ) AS rn
  FROM surv
) WHERE rn <= {k}
"""


Q_CURATED_DOCS = _curated_docs_sql()


def _split_docs_sql() -> str:
    """Twin of corpus.split_docs: the SAME integer cutoffs (computed once
    in functions/sampling.split_cutoffs, inlined as literals)."""
    from ..functions.sampling import split_cutoffs
    from .corpus import SPLIT_FRACTIONS

    cuts = split_cutoffs(SPLIT_FRACTIONS)
    cases = "\n".join(
        f"    WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) < {cut} THEN '{name}'"
        for name, cut in cuts[:-1]
    )
    return f"""
SELECT doc_id,
  CASE
{cases}
    ELSE '{cuts[-1][0]}' END AS split
FROM documents
"""


Q_SPLIT_DOCS = _split_docs_sql()


def _mixture_docs_sql() -> str:
    """Twin of corpus.mixture_docs — the same integer cutoffs per source."""
    from ..functions.sampling import fraction_threshold
    from .corpus import MIXTURE_DEFAULT, MIXTURE_RATES

    def cond(cut: int) -> str:
        if cut >= 1 << 64:
            return "TRUE"
        return f"md5_number_lower(CAST(doc_id AS VARCHAR)) < {cut}"

    cases = "\n".join(
        f"    WHEN source = '{g}' THEN {cond(fraction_threshold(r))}"
        for g, r in MIXTURE_RATES.items()
    )
    return f"""
SELECT doc_id, source FROM documents
WHERE CASE
{cases}
    ELSE {cond(fraction_threshold(MIXTURE_DEFAULT))} END
"""


Q_MIXTURE_DOCS = _mixture_docs_sql()


def _minhash_pairs_sql(
    num_perm: int = 16, num_bands: int = 8, threshold: float = 0.5,
    k: int = 3, seed: int = 42,
) -> str:
    """Exact SQL twin of functions/dedup.minhash_pairs_md5: same md5 base
    hash mod 2³¹-1, same (A·h+B) mod 2³¹-1 permutations (constants inlined
    as literals from the SAME generator), banding on the exact value tuple,
    exact distinct-shingle-set Jaccard verify. 31-bit modulus keeps every
    product < 2⁶² — exact BIGINT here, exact int64 on the Ray side."""
    from ..functions.dedup import _M31, md5_perm_constants

    a, b = md5_perm_constants(num_perm, seed)
    rpb = num_perm // num_bands
    perm_vals = ", ".join(
        f"({j}, {int(a[j])}, {int(b[j])})" for j in range(num_perm)
    )
    vdefs = ",\n         ".join(
        f"min(CASE WHEN j % {rpb} = {r} THEN v END) AS v{r}" for r in range(rpb)
    )
    vjoin = " AND ".join(f"x.v{r} = y.v{r}" for r in range(rpb))
    return f"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'), x -> x <> '') AS toks
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(toks) - {k - 1}, 1) + 1),
    i -> array_to_string(toks[i:i+{k - 1}], ' '))) AS shingles
  FROM tok WHERE len(toks) > 0
), hb AS (
  SELECT doc_id, CAST(md5_number_lower(s) % {_M31} AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
), perms(j, pa, pb) AS (VALUES {perm_vals}),
sig AS (
  SELECT doc_id, j, min((pa * h + pb) % {_M31}) AS v
  FROM hb CROSS JOIN perms GROUP BY doc_id, j
), band AS (
  SELECT doc_id, j // {rpb} AS band_id,
         {vdefs}
  FROM sig GROUP BY doc_id, j // {rpb}
), cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM band x JOIN band y
    ON x.band_id = y.band_id AND {vjoin} AND x.doc_id < y.doc_id
), jj AS (
  SELECT c.doc_a, c.doc_b,
     CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
     (len(sa.shingles) + len(sb.shingles)
      - len(list_intersect(sa.shingles, sb.shingles))) AS jac
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM jj WHERE jac >= {threshold}
"""


Q_MINHASH_PAIRS = _minhash_pairs_sql()


def _neardup_dedup_sql(threshold: float = 0.5, **mh_kwargs) -> str:
    """End-to-end near-dup REMOVAL oracle: the md5 minhash pair CTEs above
    + a recursive-CTE transitive closure (min reachable id per vertex =
    the component root the Ray side's star contraction / union-find
    computes), then survivors = docs minus non-root members. Component
    sizes at eval scale keep the closure tiny."""
    body = _minhash_pairs_sql(threshold=threshold, **mh_kwargs).strip()
    assert body.startswith("WITH ")
    cut = body.rindex("\nSELECT doc_a")  # strip the final SELECT, keep CTEs
    ctes = body[len("WITH "):cut].rstrip()
    return f"""
WITH RECURSIVE {ctes},
mp AS (
  SELECT doc_a, doc_b FROM jj WHERE jac >= {threshold}
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM mp
  UNION
  SELECT doc_b, doc_a FROM mp
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), roots AS (
  SELECT u AS vtx, least(u, min(v)) AS root FROM reach GROUP BY u
), drops AS (
  SELECT vtx FROM roots WHERE root < vtx
)
SELECT doc_id, text FROM documents
WHERE doc_id NOT IN (SELECT vtx FROM drops)
"""


Q_NEARDUP_DEDUP = _neardup_dedup_sql()


# SimHash pair oracle: the Ray side banding has recall EXACTLY 1 at
# hamming <= 3 (4 disjoint 16-bit bands, pigeonhole), so the brute-force
# cross join below computes the identical pair set from the identical
# md5-token-hash signatures (functions/dedup.SimHasher hash_fn="md5";
# majority tie -> bit set on both sides).
Q_SIMHASH_PAIRS = r"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'), x -> x <> '') AS toks
  FROM documents
), th AS (
  SELECT doc_id, len(toks) AS n, md5_number_lower(unnest(toks)) AS h
  FROM tok WHERE len(toks) > 0
), bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
         max(n) AS n
  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
  GROUP BY doc_id, j
), sig AS (
  SELECT doc_id,
         sum(CASE WHEN 2 * ones >= n THEN CAST(1 AS UBIGINT) << j
                  ELSE CAST(0 AS UBIGINT) END) AS s
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(CAST(a.s AS UBIGINT), CAST(b.s AS UBIGINT))) AS BIGINT)
         AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(CAST(a.s AS UBIGINT), CAST(b.s AS UBIGINT))) <= 3
"""

# Embedding-LSH pair oracle: the hyperplanes are the md5 family
# (functions/similarity.md5_planes — (md5_number_lower % 2^53)/2^52 - 1,
# bit-exact float64 in both engines), so the 4×12-bit sign signatures,
# buckets, candidate pairs and verified cosines are all reproducible.
# sign(v·p) is computed from the RAW vector on both sides. The Ray side's
# max_bucket cap (1000) is omitted here — valid while the table has ≤1000
# rows (gate scales: 500); the in-query guard covers the rest.
Q_EMBED_NEARDUP_LSH = r"""
WITH dims AS (SELECT len(embedding) AS d FROM embeddings LIMIT 1),
planes AS (
  SELECT t.range AS tbl, p.range AS p,
         list_transform(range(0, (SELECT d FROM dims)), j ->
           CAST(md5_number_lower('lshp_' || t.range || '_' || p.range || '_' || j)
                % 9007199254740992 AS DOUBLE) / 4503599627370496.0 - 1.0) AS plane
  FROM range(0, 4) t, range(0, 12) p
),
sigs AS (
  SELECT e.vec_id, pl.tbl,
         SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), pl.plane) > 0
                  THEN 1 << pl.p ELSE 0 END) AS bucket
  FROM embeddings e, planes pl
  GROUP BY e.vec_id, pl.tbl
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.bucket = b.bucket
                          AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                    CAST(eb.embedding AS DOUBLE[])), 4) AS sim
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.vec_a
JOIN embeddings eb ON eb.vec_id = c.vec_b
WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                             CAST(eb.embedding AS DOUBLE[])) >= 0.35
"""


def _kmeans_chain_sql(n_clusters: int, iters: int) -> str:
    """The unrolled deterministic-k-means CTE chain (xn … centn) shared by
    the knn-IVF twin and the clustering twin — iterations UNROLLED as
    asg{{i}}/cm{{i}}/cent{{i}} since the count is a compile-time constant
    (same move as _minhash_pairs_sql's permutation unroll).

    Exactness contract (functions/similarity.knn_ivf_det docstring):
    every float decision point is quantized via round(x, 9) == numpy
    _round_away(x, 9) on identical inputs, so argmin/argmax choices and
    tie-breaks (smallest cluster id) agree between engines. Valid while
    the table fits the Ray side's training sample (count <= sample_n)."""
    parts = [f"""
WITH xn AS MATERIALIZED (
  SELECT vec_id, list_transform(de, v -> round(v / nrm, 9)) AS e
  FROM (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
  )
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, e AS cent
  FROM xn ORDER BY vec_id LIMIT {n_clusters}
)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
asg{i} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT x.vec_id, t.c,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY round(list_distance(x.e, t.cent), 9) ASC, t.c ASC) AS rn
    FROM xn x CROSS JOIN cent{i - 1} t
  ) WHERE rn = 1
),
cm{i} AS MATERIALIZED (
  SELECT c, list(m ORDER BY pos) AS cent FROM (
    SELECT c, pos, round(avg(val), 9) AS m FROM (
      SELECT a.c, generate_subscripts(x.e, 1) AS pos, unnest(x.e) AS val
      FROM asg{i} a JOIN xn x USING (vec_id)
    ) GROUP BY c, pos
  ) GROUP BY c
)""")
        parts.append(f""",
cent{i} AS MATERIALIZED (
  SELECT t.c, COALESCE(n.cent, t.cent) AS cent
  FROM cent{i - 1} t LEFT JOIN cm{i} n USING (c)
)""")
    parts.append(f""",
centn AS MATERIALIZED (
  SELECT c, list_transform(cent, v -> round(v / sqrt(list_dot_product(cent, cent)), 9)) AS cent
  FROM cent{iters}
)""")
    return "".join(parts)


def _knn_ivf_sql(n_clusters: int = 16, nprobe: int = 6, k: int = 10,
                 iters: int = 10) -> str:
    """SQL twin of functions/similarity.knn_ivf_det: the shared k-means
    chain + probe-and-top-k tail."""
    return _kmeans_chain_sql(n_clusters, iters) + f""",
qv AS (SELECT e FROM xn WHERE vec_id = 0),
probes AS (
  SELECT c FROM (
    SELECT t.c, row_number() OVER (
      ORDER BY round(list_dot_product(t.cent, (SELECT e FROM qv)), 9) DESC,
               t.c ASC) AS rn
    FROM centn t
  ) WHERE rn <= {nprobe}
),
assign_all AS (
  SELECT vec_id, c FROM (
    SELECT x.vec_id, t.c,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY round(list_dot_product(x.e, t.cent), 9) DESC, t.c ASC) AS rn
    FROM xn x CROSS JOIN centn t
  ) WHERE rn = 1
)
SELECT vec_id, round(s, 4) AS sim FROM (
  SELECT x.vec_id, round(list_dot_product(x.e, (SELECT e FROM qv)), 9) AS s
  FROM xn x JOIN assign_all a USING (vec_id)
  WHERE a.c IN (SELECT c FROM probes)
)
ORDER BY s DESC, vec_id ASC LIMIT {k}"""


Q_KNN_IVF = _knn_ivf_sql()


def _cluster_embeddings_sql(n_clusters: int = 16, iters: int = 10) -> str:
    """SQL twin of functions/similarity.kmeans_assign_det: the shared
    k-means chain + per-vector cosine-argmax assignment tail (sim = the
    dot against the OWN centroid, rounded like the engine's output)."""
    return _kmeans_chain_sql(n_clusters, iters) + """
SELECT vec_id, c AS cluster, round(s, 4) AS sim FROM (
  SELECT x.vec_id, t.c,
         round(list_dot_product(x.e, t.cent), 9) AS s,
         row_number() OVER (PARTITION BY x.vec_id
           ORDER BY round(list_dot_product(x.e, t.cent), 9) DESC, t.c ASC) AS rn
  FROM xn x CROSS JOIN centn t
) WHERE rn = 1"""


Q_CLUSTER_EMBEDDINGS = _cluster_embeddings_sql()


def _semdedup_sql(n_clusters: int = 16, tau: float = 0.35,
                  iters: int = 10) -> str:
    """SQL twin of functions/similarity.semdedup: shared k-means chain +
    argmax assignment + the one-pass drop rule as NOT EXISTS (v is
    dropped iff ANY smaller-id vector in the SAME cluster has
    round(dot, 9) >= tau, survivor or not)."""
    return _kmeans_chain_sql(n_clusters, iters) + f""",
asgn AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT x.vec_id, t.c,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY round(list_dot_product(x.e, t.cent), 9) DESC, t.c ASC) AS rn
    FROM xn x CROSS JOIN centn t
  ) WHERE rn = 1
)
SELECT a.vec_id, a.c AS cluster
FROM asgn a JOIN xn x ON a.vec_id = x.vec_id
WHERE NOT EXISTS (
  SELECT 1 FROM asgn b JOIN xn y ON b.vec_id = y.vec_id
  WHERE b.c = a.c AND b.vec_id < a.vec_id
    AND round(list_dot_product(x.e, y.e), 9) >= CAST({tau} AS DOUBLE)
)"""


Q_SEMDEDUP_EMBEDDINGS = _semdedup_sql()
