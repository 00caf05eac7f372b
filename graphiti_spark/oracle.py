"""DuckDB oracle SQL for the driver's correctness gate.

Each fragment mirrors one pipeline stage *independently* in ANSI-ish SQL
over the pre-registered views (documents, embeddings, …) — a second
implementation of the frozen semantics, NOT a translation of the Spark
plan. The driver runs Spark `queries()[name]` and `oracle_sql()[name]`
side-by-side at sf0.01 and compares row-count + schema + value-hash.

Note the oracle reads `documents.text` directly while the Spark side goes
documents → wrap_html → extract_text (pandas UDF): a value match therefore
also proves the byte-identity extraction invariant end-to-end.
"""

from __future__ import annotations

from graphiti_spark.config import (
    ADJECTIVES_SORTED,
    CUSTOM_EDGE_TYPES,
    EDGE_TYPE_MAP,
    ENTITY_NOUNS_SORTED,
    NOUN_ENTITY_TYPES,
    RELATION_VERBS_SORTED,
    sql_in_list,
)
from graphiti_spark.functions.typing import sql_entity_type
from graphiti_spark.sources.pages import SQL_URL, SQL_WARC_TS

NOUNS = sql_in_list(ENTITY_NOUNS_SORTED)
VERBS = sql_in_list(RELATION_VERBS_SORTED)
ADJS = sql_in_list(ADJECTIVES_SORTED)

# Fixed transaction time literal (config.DEFAULT_RUN_TS).
RUN_TS_SQL = "TIMESTAMP '2026-01-01 00:00:00'"

PAGES_CTE = f"""
pages AS (
  SELECT {SQL_URL} AS url,
         {SQL_WARC_TS} AS warc_ts,
         text, lang, source AS group_id, doc_id
  FROM documents
)"""

EPISODES_CTE = f"""{PAGES_CTE},
episodes AS (
  SELECT sha256(url) AS uuid, url AS name, group_id, text AS content,
         warc_ts AS valid_at
  FROM pages
)"""

# Token stream with 0-based positions and the previous raw token.
TOKENS_CTE = f"""{EPISODES_CTE},
toks AS (
  SELECT uuid AS episode_uuid, group_id, valid_at,
         unnest(string_split(content, ' ')) AS tok,
         generate_subscripts(string_split(content, ' '), 1) - 1 AS pos
  FROM episodes
),
tagged AS (
  SELECT *, lag(tok) OVER (PARTITION BY episode_uuid ORDER BY pos) AS prev_tok
  FROM toks WHERE tok <> ''
)"""

MENTIONS_CTE = f"""{TOKENS_CTE},
mention_pos AS (
  SELECT episode_uuid, group_id, valid_at, pos,
         CASE WHEN prev_tok IN {ADJS} THEN prev_tok || ' ' || tok
              ELSE tok END AS name
  FROM tagged WHERE tok IN {NOUNS}
),
mentions AS (
  SELECT DISTINCT episode_uuid, group_id, name FROM mention_pos
)"""

TRIPLES_CTE = f"""{MENTIONS_CTE},
stream AS (
  SELECT episode_uuid, group_id, valid_at, pos, name,
         CAST(NULL AS VARCHAR) AS verb
  FROM mention_pos
  UNION ALL
  SELECT episode_uuid, group_id, valid_at, pos, NULL, tok
  FROM tagged WHERE tok IN {VERBS}
),
win AS (
  SELECT *,
    last_value(name IGNORE NULLS) OVER (
      PARTITION BY episode_uuid ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS subj_name,
    first_value(name IGNORE NULLS) OVER (
      PARTITION BY episode_uuid ORDER BY pos
      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS obj_name
  FROM stream
),
triples AS (
  SELECT DISTINCT episode_uuid, group_id, valid_at, subj_name,
         upper(verb) AS pred, obj_name,
         subj_name || ' ' || verb || ' ' || obj_name AS fact
  FROM win
  WHERE verb IS NOT NULL AND subj_name IS NOT NULL
    AND obj_name IS NOT NULL AND subj_name <> obj_name
)"""

# The prior/batch split for the G4 incremental-communities oracle and
# its Spark twin (__spark_entry__). WITHIN groups by construction:
# group_id = source = src(doc_id % 20), so any doc_id-parity split would
# put prior and batch in disjoint graph partitions (entity uuid embeds
# group_id) and the placement arms would be vacuously empty.
COMM_INCR_PRIOR_PRED = "doc_id % 40 < 20"
COMM_INCR_BATCH_PRED = "doc_id % 40 >= 20"

# Canonical edges: merged on (group, src, dst, pred, fact), provenance
# episodes aggregated; deterministic sha256 identities throughout.
EDGES_CTE = f"""{TRIPLES_CTE},
edges AS (
  SELECT
    sha256(group_id || '|' ||
           sha256(group_id || '|' || subj_name) || '|' ||
           sha256(group_id || '|' || obj_name) || '|' ||
           pred || '|' || fact) AS uuid,
    group_id,
    sha256(group_id || '|' || subj_name) AS source_node_uuid,
    sha256(group_id || '|' || obj_name) AS target_node_uuid,
    pred AS name,
    fact,
    min(valid_at) AS valid_at,
    count(DISTINCT episode_uuid) AS episode_count,
    min(struct_pack(o := valid_at, u := episode_uuid))['u'] AS first_episode_uuid,
    max(struct_pack(o := valid_at, u := episode_uuid))['u'] AS last_episode_uuid
  FROM triples
  GROUP BY group_id, subj_name, obj_name, pred, fact
)"""

# Temporal invalidation, DEFAULT (cross-predicate T4→T1, r3): each edge
# closes at the earliest later valid_at among edges sharing EITHER
# endpoint, any predicate — mirrored from temporal.invalidate_cross_
# predicate's per-endpoint distinct-valid_at skyline. expired_at = run_ts
# where closed (T3). Subsumes the narrower same-(group, subject,
# predicate) window (same proof as the Spark operator's docstring).
EDGES_TEMPORAL_CTE = f"""{EDGES_CTE},
edge_sides AS MATERIALIZED (
  SELECT uuid, unnest([source_node_uuid, target_node_uuid]) AS endpoint,
         valid_at
  FROM edges
),
endpoint_successor AS (
  SELECT endpoint, valid_at,
         lead(valid_at) OVER (PARTITION BY endpoint ORDER BY valid_at)
           AS next_at
  FROM (SELECT DISTINCT endpoint, valid_at FROM edge_sides)
),
closing AS (
  SELECT s.uuid, min(x.next_at) AS closing_at
  FROM edge_sides s
  JOIN endpoint_successor x USING (endpoint, valid_at)
  GROUP BY s.uuid
),
edges_temporal AS (
  SELECT e.*, c.closing_at AS invalid_at,
         CASE WHEN c.closing_at IS NOT NULL THEN {RUN_TS_SQL}
              ELSE NULL END AS expired_at
  FROM edges e LEFT JOIN closing c USING (uuid)
)"""

ENTITIES_CTE = f"""{MENTIONS_CTE},
entities AS (
  SELECT group_id, name,
         sha256(group_id || '|' || name) AS uuid,
         count(*) AS mention_count
  FROM (SELECT episode_uuid, group_id, name FROM mentions) m
  GROUP BY group_id, name
)"""

# Canonical nodes with deterministic E8 summaries: top-5 lexicographic
# distinct subject-facts '. '-joined + '.', else the node's own name.
# (Sentence-truncation at 500 chars never triggers on this corpus — facts
# are short; asserted in tests/test_entry_oracle.py.)
NODES_CTE = f"""{TRIPLES_CTE},
entities AS (
  SELECT group_id, name,
         sha256(group_id || '|' || name) AS uuid,
         count(*) AS mention_count
  FROM (SELECT episode_uuid, group_id, name FROM mentions) m
  GROUP BY group_id, name
),
edges2 AS (
  SELECT sha256(group_id || '|' || subj_name) AS source_node_uuid, fact
  FROM triples
),
node_facts AS (
  SELECT source_node_uuid, fact,
         row_number() OVER (PARTITION BY source_node_uuid ORDER BY fact) AS rn
  FROM (SELECT DISTINCT source_node_uuid, fact FROM edges2)
),
node_summary AS (
  SELECT source_node_uuid,
         string_agg(fact, '. ' ORDER BY fact) || '.' AS summary
  FROM node_facts WHERE rn <= 5
  GROUP BY source_node_uuid
),
nodes AS (
  SELECT e.uuid, e.name, e.group_id, e.mention_count,
         coalesce(ns.summary, e.name) AS summary,
         {sql_entity_type("e.name")} AS label
  FROM entities e
  LEFT JOIN node_summary ns ON ns.source_node_uuid = e.uuid
)"""

# MENTIONS provenance edges (distinct episode → canonical entity).
MENTION_EDGES_CTE = f"""{MENTIONS_CTE},
mention_edges AS (
  SELECT DISTINCT
    sha256(episode_uuid || '|' || sha256(group_id || '|' || name)) AS uuid,
    group_id, episode_uuid,
    sha256(group_id || '|' || name) AS entity_uuid
  FROM mentions
)"""


# ------------------------------------------------------------------ query SQL

def oracle_queries() -> dict[str, str]:
    """Complete SQL for every oracle-checkable queries() entry
    (column names aliased to match the Spark side exactly)."""
    q: dict[str, str] = {}

    q["pages_text"] = f"""WITH {PAGES_CTE}
SELECT url, text, lang, group_id FROM pages ORDER BY url"""

    q["episodes"] = f"""WITH {EPISODES_CTE}
SELECT uuid, name, group_id, content,
       strftime(valid_at, '%Y-%m-%d %H:%M:%S') AS valid_at
FROM episodes ORDER BY uuid"""

    q["mentions"] = f"""WITH {MENTIONS_CTE}
SELECT episode_uuid, group_id, name FROM mentions ORDER BY episode_uuid, name"""

    q["triples"] = f"""WITH {TRIPLES_CTE}
SELECT episode_uuid, group_id, subj_name, pred, obj_name, fact
FROM triples ORDER BY episode_uuid, subj_name, pred, obj_name"""

    # E1 pronoun disambiguation (standalone — the frozen default
    # grammar skips pronouns by contract): nearest preceding surviving
    # mention per pronoun token, trailing punctuation stripped, same
    # token/mention chain as the mentions oracle. pn_ prefix.
    from graphiti_spark.operators.extract import PRONOUNS as _PN

    _pn_list = sql_in_list(tuple(sorted(_PN)))
    # the corpus has no natural pronouns: both engines append the same
    # deterministic clause per episode (none of its words are in the
    # frozen gazetteer, so the mention chain is unperturbed)
    _pn_cte = MENTIONS_CTE.replace(
        "FROM episodes\n)",
        "FROM (SELECT uuid, group_id, valid_at,\n"
        "             content || ' then it failed and they recovered'"
        " AS content\n"
        "      FROM episodes)\n)",
        1,
    )
    q["pronoun_links"] = f"""WITH {_pn_cte},
pn_stream AS (
  SELECT episode_uuid, pos, CAST(NULL AS VARCHAR) AS pronoun, name
  FROM mention_pos
  UNION ALL
  SELECT episode_uuid, pos,
         regexp_replace(lower(tok), '[.,;:!?]+$', '') AS pronoun,
         NULL AS name
  FROM tagged
  WHERE regexp_replace(lower(tok), '[.,;:!?]+$', '') IN {_pn_list}
    AND tok NOT IN {NOUNS}
),
pn_win AS (
  SELECT *,
    last_value(name IGNORE NULLS) OVER (
      PARTITION BY episode_uuid ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS antecedent
  FROM pn_stream
),
pn_resolved AS (
  SELECT episode_uuid, pos, pronoun, antecedent
  FROM pn_win WHERE pronoun IS NOT NULL AND antecedent IS NOT NULL
)
SELECT episode_uuid,
       CAST(row_number() OVER (PARTITION BY episode_uuid ORDER BY pos)
            AS INT) AS pronoun_idx,
       pronoun, antecedent
FROM pn_resolved ORDER BY episode_uuid, pronoun_idx"""

    q["entities"] = f"""WITH {ENTITIES_CTE}
SELECT uuid, group_id, name, mention_count FROM entities ORDER BY uuid"""

    q["edges_merged"] = f"""WITH {EDGES_CTE}
SELECT uuid, group_id, source_node_uuid, target_node_uuid, name, fact,
       strftime(valid_at, '%Y-%m-%d %H:%M:%S') AS valid_at,
       episode_count, first_episode_uuid, last_episode_uuid
FROM edges ORDER BY uuid"""

    q["edges_temporal"] = f"""WITH {EDGES_TEMPORAL_CTE}
SELECT uuid, group_id, source_node_uuid, target_node_uuid, name, fact,
       strftime(valid_at, '%Y-%m-%d %H:%M:%S') AS valid_at,
       strftime(invalid_at, '%Y-%m-%d %H:%M:%S') AS invalid_at,
       strftime(expired_at, '%Y-%m-%d %H:%M:%S') AS expired_at
FROM edges_temporal ORDER BY uuid"""

    q["flagship_triples"] = f"""WITH {EDGES_TEMPORAL_CTE}
SELECT uuid, group_id, source_node_uuid, target_node_uuid,
       name AS predicate, fact,
       first_episode_uuid, episode_count,
       strftime(valid_at, '%Y-%m-%d %H:%M:%S') AS valid_at,
       strftime(invalid_at, '%Y-%m-%d %H:%M:%S') AS invalid_at,
       strftime(expired_at, '%Y-%m-%d %H:%M:%S') AS expired_at
FROM edges_temporal ORDER BY uuid"""

    # Bi-temporal as-of diff (temporal.asof_diff): live(t) = valid_at
    # <= t < invalid_at (open-ended). Same temporal chain, same CASE.
    q["graph_asof_diff"] = f"""WITH {EDGES_TEMPORAL_CTE}
SELECT uuid, source_node_uuid, target_node_uuid, name,
       strftime(valid_at, '%Y-%m-%d %H:%M:%S') AS valid_at,
       strftime(invalid_at, '%Y-%m-%d %H:%M:%S') AS invalid_at,
       status
FROM (
  SELECT e.*,
         CASE WHEN (valid_at <= TIMESTAMP '2024-01-01 06:00:00'
                    AND (invalid_at IS NULL
                         OR invalid_at > TIMESTAMP '2024-01-01 06:00:00'))
                   AND NOT (valid_at <= TIMESTAMP '2024-01-01 02:00:00'
                    AND (invalid_at IS NULL
                         OR invalid_at > TIMESTAMP '2024-01-01 02:00:00'))
              THEN 'added'
              WHEN (valid_at <= TIMESTAMP '2024-01-01 02:00:00'
                    AND (invalid_at IS NULL
                         OR invalid_at > TIMESTAMP '2024-01-01 02:00:00'))
                   AND NOT (valid_at <= TIMESTAMP '2024-01-01 06:00:00'
                    AND (invalid_at IS NULL
                         OR invalid_at > TIMESTAMP '2024-01-01 06:00:00'))
              THEN 'removed'
         END AS status
  FROM edges_temporal e
) WHERE status IS NOT NULL ORDER BY uuid"""

    q["nodes"] = f"""WITH {NODES_CTE}
SELECT uuid, name, group_id, mention_count, summary, label
FROM nodes ORDER BY uuid"""

    # E3 typed exclusion: System-typed mentions suppressed BEFORE the
    # subject/object windows (the surviving-neighbour binding rule), so
    # their entities and any fact touching them never exist.
    _sys_nouns = sql_in_list(
        tuple(sorted(n for n, t in NOUN_ENTITY_TYPES.items() if t == "System"))
    )
    q["typed_exclusion"] = f"""WITH {TOKENS_CTE},
mention_pos AS (
  SELECT episode_uuid, group_id, valid_at, pos,
         CASE WHEN prev_tok IN {ADJS} THEN prev_tok || ' ' || tok
              ELSE tok END AS name
  FROM tagged WHERE tok IN {NOUNS} AND tok NOT IN {_sys_nouns}
),
mentions AS (
  SELECT DISTINCT episode_uuid, group_id, name FROM mention_pos
),
entities AS (
  SELECT group_id, name,
         sha256(group_id || '|' || name) AS uuid,
         count(*) AS mention_count
  FROM (SELECT episode_uuid, group_id, name FROM mentions) m
  GROUP BY group_id, name
)
SELECT uuid, name, group_id, mention_count,
       {sql_entity_type("name")} AS label
FROM entities ORDER BY uuid"""

    # D19 on pipeline output: every extracted predicate is custom; a
    # name not permitted for (src_type, dst_type) resets to RELATES_TO.
    # Endpoint types derive from the subject/object head nouns (the
    # canonical node's own name — this corpus has no fuzzy merges, the
    # same identity assumption every edge oracle here makes).
    _d19_arms = []
    for (src_t, dst_t), names in sorted(EDGE_TYPE_MAP.items()):
        _d19_arms.append(
            f"(src_type = '{src_t}' AND dst_type = '{dst_t}' "
            f"AND name IN {sql_in_list(tuple(sorted(names)))})"
        )
    _d19_allowed = "\n       OR ".join(_d19_arms)
    _custom = sql_in_list(tuple(sorted(CUSTOM_EDGE_TYPES)))
    q["edges_type_enforced"] = f"""WITH {TRIPLES_CTE},
edges AS (
  SELECT
    sha256(group_id || '|' ||
           sha256(group_id || '|' || subj_name) || '|' ||
           sha256(group_id || '|' || obj_name) || '|' ||
           pred || '|' || fact) AS uuid,
    group_id,
    sha256(group_id || '|' || subj_name) AS source_node_uuid,
    sha256(group_id || '|' || obj_name) AS target_node_uuid,
    pred AS name,
    fact,
    {sql_entity_type("subj_name")} AS src_type,
    {sql_entity_type("obj_name")} AS dst_type
  FROM triples
  GROUP BY group_id, subj_name, obj_name, pred, fact
)
SELECT uuid, group_id, source_node_uuid, target_node_uuid,
       CASE WHEN name IN {_custom} AND NOT ({_d19_allowed})
            THEN 'RELATES_TO' ELSE name END AS name,
       fact
FROM edges ORDER BY uuid"""

    q["mention_edges"] = f"""WITH {MENTION_EDGES_CTE}
SELECT uuid, group_id, episode_uuid, entity_uuid
FROM mention_edges ORDER BY uuid"""

    # S3/T5: previous-episode context window (last 3 strictly-earlier
    # episodes per group, rank 1 = most recent).
    q["episode_context"] = f"""WITH {EPISODES_CTE},
ranked AS (
  SELECT uuid AS episode_uuid,
         lag(uuid, 1) OVER w AS p1,
         lag(uuid, 2) OVER w AS p2,
         lag(uuid, 3) OVER w AS p3
  FROM episodes
  WINDOW w AS (PARTITION BY group_id ORDER BY valid_at, uuid)
)
SELECT episode_uuid, prev_episode_uuid, rank FROM (
  SELECT episode_uuid, p1 AS prev_episode_uuid, 1 AS rank FROM ranked
  UNION ALL
  SELECT episode_uuid, p2, 2 FROM ranked
  UNION ALL
  SELECT episode_uuid, p3, 3 FROM ranked
) WHERE prev_episode_uuid IS NOT NULL
ORDER BY episode_uuid, rank"""

    # S5: keyset pagination over canonical nodes.
    q["nodes_paginated"] = f"""WITH {ENTITIES_CTE}
SELECT uuid, group_id, name, mention_count
FROM entities
WHERE group_id IN ('src1', 'src2') AND uuid < '8'
ORDER BY uuid DESC LIMIT 50"""

    # S9: remove_episode cascade — surviving canonical edges after
    # removing the lexicographically-first episode (creation episode =
    # min provenance episode uuid).
    q["remove_episode_edges"] = f"""WITH {EDGES_CTE},
victim AS (SELECT min(uuid) AS ep FROM (SELECT sha256(url) AS uuid FROM pages))
SELECT uuid, group_id, source_node_uuid, target_node_uuid, name, fact
FROM edges WHERE first_episode_uuid <> (SELECT ep FROM victim)
ORDER BY uuid"""

    # Q2: BM25 fulltext over the documents corpus (Lucene-style idf,
    # k1=1.2 b=0.75; score rounded to 4 dp BEFORE ranking on both sides).
    q["bm25_documents"] = """WITH
toks AS (
  SELECT doc_id AS id, unnest(string_split(lower(trim(text)), ' ')) AS term
  FROM documents
),
toks_ne AS (SELECT * FROM toks WHERE term <> ''),
postings AS (SELECT id, term, count(*) AS tf FROM toks_ne GROUP BY id, term),
doclen AS (SELECT id, count(*) AS dl FROM toks_ne GROUP BY id),
docfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
qterms AS (SELECT unnest(['fast','merge','table']) AS term),
hits AS (
  SELECT p.id, p.term, p.tf, d.df, l.dl, s.n_docs, s.avgdl
  FROM postings p
  JOIN qterms USING (term)
  JOIN docfreq d USING (term)
  JOIN doclen l USING (id)
  CROSS JOIN stats s
),
scored AS (
  SELECT id,
         round(sum(
           ln(1.0 + (n_docs - df + 0.5)/(df + 0.5))
           * (CAST(tf AS DOUBLE) * 2.2)
           / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
         ), 4) AS score
  FROM hits GROUP BY id
),
topk AS (SELECT * FROM scored ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM topk ORDER BY rank"""

    # Q3: exact cosine top-k over the embeddings table, query = vec 0.
    q["cosine_topk_embeddings"] = """WITH
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id AS id,
         round(
           list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT q FROM qv))
           / (sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
              * sqrt(list_inner_product((SELECT q FROM qv), (SELECT q FROM qv)))),
         4) AS score
  FROM embeddings
),
topk AS (SELECT * FROM scored ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM topk ORDER BY rank"""

    # Q3 ANN: hyperplane-LSH candidate blocking, then exact cosine top-k.
    # The planes are sha256 hash chains (similarity._hyperplane): component
    # i of plane (t, b) = first 13 hex chars of sha256('lsh:{t*1000+b}:{i}')
    # mapped to [-1, 1) — 52 bits fit a double exactly, so DuckDB derives
    # bit-identical planes from its own sha256 and the candidate set (any
    # table whose 8-bit sign bucket equals the query's) matches Spark's.
    q["ann_lsh_embeddings"] = """WITH
planes AS (
  SELECT t AS tbl, b AS bit,
         list_transform(range(0,64), i ->
           (('0x' || substr(sha256('lsh:' || (t*1000+b) || ':' || i), 1, 13))::UBIGINT
            / 4503599627370496.0) * 2.0 - 1.0) AS plane
  FROM range(0,16) rt(t) CROSS JOIN range(0,8) rb(b)
),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
qbuckets AS (
  SELECT tbl,
         SUM(CASE WHEN list_inner_product((SELECT q FROM qv), plane) >= 0
             THEN 1 << bit ELSE 0 END) AS bucket
  FROM planes GROUP BY tbl
),
sigs AS (
  SELECT e.vec_id, p.tbl,
         SUM(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), p.plane) >= 0
             THEN 1 << p.bit ELSE 0 END) AS bucket
  FROM embeddings e CROSS JOIN planes p GROUP BY 1, 2
),
cands AS (
  SELECT DISTINCT s.vec_id FROM sigs s JOIN qbuckets qb
  ON s.tbl = qb.tbl AND s.bucket = qb.bucket
),
scored AS (
  SELECT e.vec_id AS id,
         round(
           CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])) = 0
                  OR list_inner_product((SELECT q FROM qv),
                                        (SELECT q FROM qv)) = 0
                THEN 0.0
                ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                        (SELECT q FROM qv))
                     / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_inner_product((SELECT q FROM qv),
                                                  (SELECT q FROM qv))))
           END,
         4) AS score
  FROM embeddings e JOIN cands c ON e.vec_id = c.vec_id
),
topk AS (SELECT * FROM scored ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM topk ORDER BY rank"""

    # Multi-probe LSH (similarity.cosine_topk_lsh_multiprobe): 8
    # tables; per table probe the base bucket plus xor-flips of the 2
    # bits whose query dot is nearest 0 (ORDER BY abs(d), bit — the
    # identical tie rule; Spark folds the query dots left-to-right so
    # the doubles match list_inner_product bit-for-bit). mp_ prefix.
    q["ann_lsh_multiprobe"] = """WITH
mp_planes AS (
  SELECT t AS tbl, b AS bit,
         list_transform(range(0,64), i ->
           (('0x' || substr(sha256('lsh:' || (t*1000+b) || ':' || i), 1, 13))::UBIGINT
            / 4503599627370496.0) * 2.0 - 1.0) AS plane
  FROM range(0,8) rt(t) CROSS JOIN range(0,8) rb(b)
),
mp_qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
mp_qdots AS (
  SELECT tbl, bit,
         list_inner_product((SELECT q FROM mp_qv), plane) AS d
  FROM mp_planes
),
mp_qbase AS (
  SELECT tbl,
         SUM(CASE WHEN d >= 0 THEN 1 << bit ELSE 0 END) AS bucket
  FROM mp_qdots GROUP BY tbl
),
mp_qflip AS (
  SELECT tbl, bit FROM (
    SELECT tbl, bit,
           row_number() OVER (PARTITION BY tbl ORDER BY abs(d), bit) AS rn
    FROM mp_qdots) WHERE rn <= 2
),
mp_qprobe AS (
  SELECT tbl, CAST(bucket AS BIGINT) AS bucket FROM mp_qbase
  UNION
  SELECT f.tbl, CAST(xor(qb.bucket, 1 << f.bit) AS BIGINT) AS bucket
  FROM mp_qflip f JOIN mp_qbase qb USING (tbl)
),
mp_sigs AS (
  SELECT e.vec_id, p.tbl,
         SUM(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                          p.plane) >= 0
             THEN 1 << p.bit ELSE 0 END) AS bucket
  FROM embeddings e CROSS JOIN mp_planes p GROUP BY 1, 2
),
mp_cands AS (
  SELECT DISTINCT s.vec_id FROM mp_sigs s JOIN mp_qprobe qb
  ON s.tbl = qb.tbl AND s.bucket = qb.bucket
),
mp_scored AS (
  SELECT e.vec_id AS id,
         round(
           CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])) = 0
                  OR list_inner_product((SELECT q FROM mp_qv),
                                        (SELECT q FROM mp_qv)) = 0
                THEN 0.0
                ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                        (SELECT q FROM mp_qv))
                     / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_inner_product((SELECT q FROM mp_qv),
                                                  (SELECT q FROM mp_qv))))
           END,
         4) AS score
  FROM embeddings e JOIN mp_cands c ON e.vec_id = c.vec_id
),
mp_topk AS (SELECT * FROM mp_scored ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM mp_topk ORDER BY rank"""

    # kNN graph + mutual-NN pairs (similarity.knn_graph /
    # mutual_nn_pairs): IVF cells bound the quadratic (SemDeDup shape);
    # per-vector top-3 by (cos desc, nbr asc) after the 4 dp round;
    # reciprocal join. nn_ prefix.
    q["embeddings_knn_mutual"] = """WITH
nn_cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
nn_assign AS (
  SELECT e.vec_id, c.cid,
         CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) = 0
                OR list_inner_product(c.cvec, c.cvec) = 0
              THEN 0.0
              ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
                   / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_inner_product(c.cvec, c.cvec)))
         END + 0.0 AS s
  FROM embeddings e CROSS JOIN nn_cent c
),
nn_cells AS MATERIALIZED (
  SELECT vec_id AS id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cid ASC) AS rn
    FROM nn_assign) WHERE rn = 1
),
nn_v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
nn_scored AS MATERIALIZED (
  SELECT a.id, b.id AS nbr,
         round(CASE WHEN list_inner_product(av.v, av.v) = 0
                      OR list_inner_product(bv.v, bv.v) = 0
                    THEN 0.0
                    ELSE list_inner_product(av.v, bv.v)
                         / (sqrt(list_inner_product(av.v, av.v))
                            * sqrt(list_inner_product(bv.v, bv.v)))
               END, 4) + 0.0 AS cos
  FROM nn_cells a JOIN nn_cells b ON a.cell = b.cell AND a.id <> b.id
  JOIN nn_v av ON av.vec_id = a.id JOIN nn_v bv ON bv.vec_id = b.id
),
nn_knn AS MATERIALIZED (
  SELECT id, nbr, cos FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY cos DESC, nbr ASC) AS rn
    FROM nn_scored) WHERE rn <= 3
)
SELECT f.id AS a_id, f.nbr AS b_id, f.cos
FROM nn_knn f JOIN nn_knn r ON r.id = f.nbr AND r.nbr = f.id
WHERE f.id < f.nbr ORDER BY a_id, b_id"""

    # Reciprocal-NN clusters: the nn_ chain's mutual pairs fed through
    # the min-prop CC closure (12 rounds — components live inside IVF
    # cells, diameters are small), min-id canonical per vector.
    _rn_closure, _rn_prev = [], "rn_r0"
    for _i in range(1, 13):
        _rn_cur = f"rn_r{_i}"
        _rn_closure.append(f"""{_rn_cur} AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM {_rn_prev} v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM rn_sym s JOIN {_rn_prev} r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
)""")
        _rn_prev = _rn_cur
    q["embeddings_rnn_clusters"] = q["embeddings_knn_mutual"].replace(
        """SELECT f.id AS a_id, f.nbr AS b_id, f.cos
FROM nn_knn f JOIN nn_knn r ON r.id = f.nbr AND r.nbr = f.id
WHERE f.id < f.nbr ORDER BY a_id, b_id""",
        f""", rn_p AS MATERIALIZED (
  SELECT f.id AS a_id, f.nbr AS b_id
  FROM nn_knn f JOIN nn_knn r ON r.id = f.nbr AND r.nbr = f.id
  WHERE f.id < f.nbr
),
rn_sym AS MATERIALIZED (
  SELECT a_id AS a, b_id AS b FROM rn_p
  UNION SELECT b_id, a_id FROM rn_p
),
rn_r0 AS MATERIALIZED (SELECT vec_id AS id, vec_id AS m FROM embeddings),
{','.join(_rn_closure)}
SELECT id, m AS canonical_id FROM {_rn_prev} ORDER BY id""",
    )

    # Q3 ANN (IVF): deterministic centroids = the 16 embeddings whose
    # sha256(vec_id-as-string) is smallest (similarity.ivf_centroids);
    # every vector joins its max-cosine centroid (ties -> min cid); the
    # query probes its 4 nearest cells, then exact cosine top-k over the
    # probed candidates. Cosines stay UNROUNDED here: both engines fold
    # doubles left-to-right (F.aggregate == list_inner_product, proven by
    # the cosine_topk oracle), so the raw doubles are bit-identical and
    # `+ 0.0` only normalizes IEEE -0.0 before the DESC/cid ordering.
    q["ann_ivf_embeddings"] = """WITH
cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
assign AS (
  SELECT e.vec_id, c.cid,
         CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) = 0
                OR list_inner_product(c.cvec, c.cvec) = 0
              THEN 0.0
              ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
                   / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_inner_product(c.cvec, c.cvec)))
         END + 0.0 AS s
  FROM embeddings e CROSS JOIN cent c
),
cells AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM assign) WHERE rn = 1
),
qprobe AS (
  SELECT cid FROM (
    SELECT c.cid,
           CASE WHEN list_inner_product((SELECT q FROM qv),
                                        (SELECT q FROM qv)) = 0
                  OR list_inner_product(c.cvec, c.cvec) = 0
                THEN 0.0
                ELSE list_inner_product((SELECT q FROM qv), c.cvec)
                     / (sqrt(list_inner_product((SELECT q FROM qv),
                                                (SELECT q FROM qv)))
                        * sqrt(list_inner_product(c.cvec, c.cvec)))
           END + 0.0 AS s
    FROM cent c) ORDER BY s DESC, cid ASC LIMIT 4
),
cands AS (SELECT vec_id FROM cells JOIN qprobe USING (cid)),
scored AS (
  SELECT e.vec_id AS id,
         round(
           CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])) = 0
                  OR list_inner_product((SELECT q FROM qv),
                                        (SELECT q FROM qv)) = 0
                THEN 0.0
                ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                        (SELECT q FROM qv))
                     / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_inner_product((SELECT q FROM qv),
                                                  (SELECT q FROM qv))))
           END,
         4) AS score
  FROM embeddings e JOIN cands c ON e.vec_id = c.vec_id
),
topk AS (SELECT * FROM scored ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM topk ORDER BY rank"""

    # Q3 ANN (IVF, incremental index-add, r4): identical math to
    # ann_ivf_embeddings except centroids are hash-sampled from the
    # PRIOR corpus only (vec_id % 5 <> 0) and frozen — the Spark side
    # assigns the prior and the new batch separately against the frozen
    # centroid literal and unions the index; this oracle re-derives the
    # same frozen-centroid index over the union, so a hash match proves
    # add-then-search == build-with-same-centroids-then-search.
    q["ann_ivf_incremental"] = """WITH
aii_cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings WHERE vec_id % 5 <> 0
  ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
aii_qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
aii_assign AS (
  SELECT e.vec_id, c.cid,
         CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) = 0
                OR list_inner_product(c.cvec, c.cvec) = 0
              THEN 0.0
              ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
                   / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_inner_product(c.cvec, c.cvec)))
         END + 0.0 AS s
  FROM embeddings e CROSS JOIN aii_cent c
),
aii_cells AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM aii_assign) WHERE rn = 1
),
aii_qprobe AS (
  SELECT cid FROM (
    SELECT c.cid,
           CASE WHEN list_inner_product((SELECT q FROM aii_qv),
                                        (SELECT q FROM aii_qv)) = 0
                  OR list_inner_product(c.cvec, c.cvec) = 0
                THEN 0.0
                ELSE list_inner_product((SELECT q FROM aii_qv), c.cvec)
                     / (sqrt(list_inner_product((SELECT q FROM aii_qv),
                                                (SELECT q FROM aii_qv)))
                        * sqrt(list_inner_product(c.cvec, c.cvec)))
           END + 0.0 AS s
    FROM aii_cent c) ORDER BY s DESC, cid ASC LIMIT 4
),
aii_cands AS (SELECT vec_id FROM aii_cells JOIN aii_qprobe USING (cid)),
aii_scored AS (
  SELECT e.vec_id AS id,
         round(
           CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])) = 0
                  OR list_inner_product((SELECT q FROM aii_qv),
                                        (SELECT q FROM aii_qv)) = 0
                THEN 0.0
                ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                        (SELECT q FROM aii_qv))
                     / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_inner_product((SELECT q FROM aii_qv),
                                                  (SELECT q FROM aii_qv))))
           END,
         4) AS score
  FROM embeddings e JOIN aii_cands c ON e.vec_id = c.vec_id
),
aii_topk AS (SELECT * FROM aii_scored ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM aii_topk ORDER BY rank"""

    # Q3 ANN (IVF, int8-quantized scan): same centroids/cells/probes as
    # ann_ivf_embeddings (full precision), but candidate scoring runs
    # over the DEQUANTIZED affine int8 codes (functions/quantize.py):
    # scale = (max-min)/255 and vmin are exact IEEE doubles, the rounding
    # argument is always >= 0 (HALF_UP == half-away-from-zero), and
    # vmin + q_i*scale folds left-to-right in double on both engines —
    # so the reconstructed vectors, their cosines, and the final ranking
    # are bit-identical.
    q["ann_ivf_quantized"] = """WITH
cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
assign AS (
  SELECT e.vec_id, c.cid,
         CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) = 0
                OR list_inner_product(c.cvec, c.cvec) = 0
              THEN 0.0
              ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
                   / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_inner_product(c.cvec, c.cvec)))
         END + 0.0 AS s
  FROM embeddings e CROSS JOIN cent c
),
cells AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM assign) WHERE rn = 1
),
qprobe AS (
  SELECT cid FROM (
    SELECT c.cid,
           CASE WHEN list_inner_product((SELECT q FROM qv),
                                        (SELECT q FROM qv)) = 0
                  OR list_inner_product(c.cvec, c.cvec) = 0
                THEN 0.0
                ELSE list_inner_product((SELECT q FROM qv), c.cvec)
                     / (sqrt(list_inner_product((SELECT q FROM qv),
                                                (SELECT q FROM qv)))
                        * sqrt(list_inner_product(c.cvec, c.cvec)))
           END + 0.0 AS s
    FROM cent c) ORDER BY s DESC, cid ASC LIMIT 4
),
qz AS (
  SELECT vec_id, v, list_min(v) + 0.0 AS vmin,
         (list_max(v) - list_min(v)) / 255.0 + 0.0 AS scale
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
),
deq AS (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN list_transform(v, x -> vmin)
              ELSE list_transform(v, x ->
                vmin + CAST(round((x - vmin) / scale) AS INT) * scale)
         END AS dv
  FROM qz
),
cands AS (SELECT vec_id FROM cells JOIN qprobe USING (cid)),
scored AS (
  SELECT d.vec_id AS id,
         round(
           CASE WHEN list_inner_product(d.dv, d.dv) = 0
                  OR list_inner_product((SELECT q FROM qv),
                                        (SELECT q FROM qv)) = 0
                THEN 0.0
                ELSE list_inner_product(d.dv, (SELECT q FROM qv))
                     / (sqrt(list_inner_product(d.dv, d.dv))
                        * sqrt(list_inner_product((SELECT q FROM qv),
                                                  (SELECT q FROM qv))))
           END,
         4) AS score
  FROM deq d JOIN cands c ON d.vec_id = c.vec_id
),
topk AS (SELECT * FROM scored ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM topk ORDER BY rank"""

    # G5: BFS reachability ≤3 hops from the min edge-source node.
    q["bfs_reachable"] = f"""WITH RECURSIVE {EDGES_CTE},
adj AS (
  SELECT source_node_uuid AS s, target_node_uuid AS d FROM edges
  UNION
  SELECT target_node_uuid, source_node_uuid FROM edges
),
walk(uuid, depth) AS (
  SELECT (SELECT min(source_node_uuid) FROM edges), 0
  UNION
  SELECT a.d, w.depth + 1 FROM walk w JOIN adj a ON a.s = w.uuid
  WHERE w.depth < 3
)
SELECT uuid, CAST(min(depth) AS INT) AS depth FROM walk GROUP BY uuid
ORDER BY uuid"""

    # G6: node-distance rerank — candidates = src1 entities, center =
    # min src1 edge source; 10.0 center / 1.0 one-hop / 0.0 rest.
    q["node_distance_src1"] = f"""WITH {EDGES_CTE},
center AS (SELECT min(source_node_uuid) AS c FROM edges WHERE group_id = 'src1'),
nbrs AS (
  SELECT DISTINCT target_node_uuid AS id FROM edges
  WHERE group_id = 'src1' AND source_node_uuid = (SELECT c FROM center)
  UNION
  SELECT DISTINCT source_node_uuid FROM edges
  WHERE group_id = 'src1' AND target_node_uuid = (SELECT c FROM center)
),
cands AS (
  SELECT DISTINCT sha256(group_id || '|' || subj_name) AS id
  FROM triples WHERE group_id = 'src1'
  UNION
  SELECT DISTINCT sha256(group_id || '|' || obj_name)
  FROM triples WHERE group_id = 'src1'
),
scored AS (
  SELECT c.id,
         CAST(CASE WHEN c.id = (SELECT ctr.c FROM center ctr) THEN 10.0
              WHEN c.id IN (SELECT n.id FROM nbrs n) THEN 1.0
              ELSE 0.0 END AS DOUBLE) AS score
  FROM cands c
)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM scored ORDER BY rank"""

    # G7: episode-mentions rerank over all canonical entities.
    q["mentions_rerank"] = f"""WITH {MENTION_EDGES_CTE},
counts AS (
  SELECT entity_uuid AS id, CAST(count(*) AS DOUBLE) AS score
  FROM mention_edges GROUP BY entity_uuid
)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM counts ORDER BY rank"""

    # G1: symmetric neighbor projection with edge counts.
    q["neighbor_weights"] = f"""WITH {EDGES_CTE},
sym AS (
  SELECT source_node_uuid AS src, target_node_uuid AS dst FROM edges
  UNION ALL
  SELECT target_node_uuid, source_node_uuid FROM edges
)
SELECT src, dst, count(*) AS weight FROM sym
WHERE src <> dst GROUP BY src, dst ORDER BY src, dst"""

    # --- training-data pipeline operators over documents/embeddings ---

    # Exact dedup by normalized-content hash.
    q["docs_exact_dedup"] = """WITH
hashed AS (
  SELECT doc_id AS id,
         sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
  FROM documents
),
groups AS (
  SELECT content_hash, min(id) AS canonical_id, count(*) AS n_copies
  FROM hashed GROUP BY content_hash
)
SELECT h.id, h.content_hash, g.canonical_id, g.n_copies
FROM hashed h JOIN groups g USING (content_hash) ORDER BY h.id"""

    # MinHash-LSH near-dup pairs (word-set shingles, Jaccard ≥ 0.95).
    # Oracle is the brute-force all-pairs ground truth: equality also
    # PROVES the deterministic LSH blocking has full recall at τ=0.95
    # on this corpus.
    q["docs_near_dup"] = """WITH
s AS (
  SELECT doc_id AS id,
         list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
  FROM documents
),
pairs AS (
  SELECT a.id AS a_id, b.id AS b_id,
         round(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
               / len(list_distinct(list_concat(a.w, b.w))), 4) AS jaccard
  FROM s a JOIN s b ON a.id < b.id
)
SELECT a_id, b_id, jaccard FROM pairs WHERE jaccard >= 0.95
ORDER BY a_id, b_id"""

    # Incremental corpus dedup (r4): the Spark side joins the NEW batch
    # (doc_id % 5 = 0) against a prebuilt prior-corpus LSH index. The
    # oracle is brute-force ground truth over the UNION restricted to
    # pairs touching the batch — equality proves the index join loses
    # no recall and never emits a prior x prior pair.
    q["docs_near_dup_incremental"] = """WITH
ndi_s AS (
  SELECT doc_id AS id,
         list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
  FROM documents
),
ndi_pairs AS (
  SELECT a.id AS a_id, b.id AS b_id,
         round(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
               / len(list_distinct(list_concat(a.w, b.w))), 4) AS jaccard
  FROM ndi_s a JOIN ndi_s b ON a.id < b.id
)
SELECT a_id, b_id, jaccard FROM ndi_pairs
WHERE jaccard >= 0.95 AND (a_id % 5 = 0 OR b_id % 5 = 0)
ORDER BY a_id, b_id"""

    # Order-sensitive 3-token-gram near-dup (word3 mode, τ=0.8): the
    # brute-force all-pairs ground truth; equality also proves the LSH
    # blocking keeps full recall at this threshold on this corpus.
    q["docs_near_dup_word3"] = """WITH
t AS (
  SELECT doc_id AS id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
s AS (
  SELECT id,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         ELSE list_distinct(toks) END AS g
  FROM t
),
pairs AS (
  SELECT a.id AS a_id, b.id AS b_id,
         round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
               / len(list_distinct(list_concat(a.g, b.g))), 4) AS jaccard
  FROM s a JOIN s b ON a.id < b.id
)
SELECT a_id, b_id, jaccard FROM pairs WHERE jaccard >= 0.8
ORDER BY a_id, b_id"""

    # SimHash near-dup (hamming ≤ 3), brute-force ground truth. The
    # per-shingle 64-bit hash = first 16 hex chars of sha256(shingle)
    # (bit b in hex char 16 − b//4, position b % 4 — same nibble algebra
    # as dedup_docs._shingle_bit_signs, r3: blake2b → sha256 so this is
    # fully hash-verified). Equality also proves the chunk-PAIR blocking
    # keeps full recall (pigeonhole) on this corpus.
    q["docs_simhash"] = """WITH
sh AS (
  SELECT doc_id AS id,
         unnest(list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))) AS s
  FROM documents
),
signs AS (
  SELECT id, bb.b AS b,
         CASE WHEN ((strpos('0123456789abcdef',
                 substr(sha256(s), 16 - CAST(bb.b // 4 AS INT), 1)) - 1)
               // CAST(power(2, bb.b % 4) AS INT)) % 2 = 1
              THEN 1 ELSE -1 END AS sgn
  FROM sh, (SELECT unnest(range(0, 64)) AS b) bb
),
acc AS (SELECT id, b, sum(sgn) AS ssum FROM signs GROUP BY id, b),
sim AS MATERIALIZED (
  SELECT id,
         string_agg(CASE WHEN ssum > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS bits
  FROM acc GROUP BY id
)
SELECT a.id AS a_id, b.id AS b_id,
       bit_count(xor(a.bits::BIT, b.bits::BIT)) AS hamming
FROM sim a JOIN sim b ON a.id < b.id
WHERE bit_count(xor(a.bits::BIT, b.bits::BIT)) <= 3
ORDER BY a_id, b_id"""

    # Embedding-cosine near-dup pairs (exact baseline, τ=0.45).
    q["embeddings_near_dup"] = """WITH
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         round(list_inner_product(a.v, b.v)
               / (sqrt(list_inner_product(a.v, a.v))
                  * sqrt(list_inner_product(b.v, b.v))), 4) AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, cos FROM pairs WHERE cos >= 0.45 ORDER BY a_id, b_id"""

    # k-means Lloyd refinement (operators/kmeans.py): two unrolled
    # rounds from the hash-picked seed. Assignment = the sd_assign /
    # ivf argmax shape (s DESC, cid ASC); means = HALF_UP 1e-9 integer
    # units summed in HUGEINT (exact = order-independent, matching the
    # Spark decimal(38,0) accumulation), ONE double division chain,
    # 4 dp + IEEE −0 normalization. Empty cells keep their previous
    # centroid via the same LEFT JOIN coalesce. km_ prefix.
    _km_rounds, _km_prev = [], "km_c0"
    for _i in (1, 2):
        _km_rounds.append(f"""km_s{_i} AS (
  SELECT a.vec_id, c.cid,
         CASE WHEN list_inner_product(a.v, a.v) = 0
                OR list_inner_product(c.cvec, c.cvec) = 0
              THEN 0.0
              ELSE list_inner_product(a.v, c.cvec)
                   / (sqrt(list_inner_product(a.v, a.v))
                      * sqrt(list_inner_product(c.cvec, c.cvec)))
         END + 0.0 AS s
  FROM km_v a CROSS JOIN {_km_prev} c
),
km_a{_i} AS MATERIALIZED (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cid ASC) AS rn
    FROM km_s{_i}) WHERE rn = 1
),
km_m{_i} AS MATERIALIZED (
  SELECT cid, list(m ORDER BY pos) AS cvec, max(n) AS n_members FROM (
    SELECT cell AS cid, pos,
           round((CAST(sum(iv) AS DOUBLE) / 1000000000.0) / count(*), 4)
             + 0.0 AS m,
           count(*) AS n
    FROM (
      SELECT a.cell, r.i AS pos,
             CAST(round(v[r.i] * 1000000000.0, 0) AS HUGEINT) AS iv
      FROM km_a{_i} a JOIN km_v USING (vec_id),
           unnest(range(1, len(v) + 1)) AS r(i)
    ) GROUP BY cell, pos
  ) GROUP BY cid
),
km_c{_i} AS MATERIALIZED (
  SELECT c.cid, coalesce(m.cvec, c.cvec) AS cvec,
         coalesce(m.n_members, 0) AS n_members
  FROM {_km_prev} c LEFT JOIN km_m{_i} m USING (cid)
)""")
        _km_prev = f"km_c{_i}"
    q["embeddings_kmeans"] = f"""WITH
km_v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
km_c0 AS MATERIALIZED (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
),
{','.join(_km_rounds)}
SELECT cid, cvec, CAST(n_members AS BIGINT) AS n_members
FROM {_km_prev} ORDER BY cid"""

    # Per-label prototype embeddings (kmeans.mean_state family): the
    # Spark side folds two disjoint shard states; DuckDB computes the
    # ONE-PASS per-label mean with the identical HALF_UP 1e-9
    # integer-unit HUGEINT sums and division chain — the hash proves
    # fold == one pass. pt_ prefix.
    q["embeddings_label_prototypes"] = """WITH pt_e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
pt_comp AS (
  SELECT label, r.i AS pos,
         sum(CAST(round(v[r.i] * 1000000000.0, 0) AS HUGEINT)) AS s,
         count(*) AS n
  FROM pt_e, unnest(range(1, len(v) + 1)) AS r(i)
  GROUP BY label, r.i
)
SELECT label,
       list(round((CAST(s AS DOUBLE) / 1000000000.0) / n, 4) + 0.0
            ORDER BY pos) AS cvec,
       CAST(max(n) AS BIGINT) AS n_members
FROM pt_comp GROUP BY label ORDER BY label"""

    # Prototype-state takedown (kmeans.mean_state_subtract): the Spark
    # side subtracts the removed slice's state from the standing state;
    # DuckDB rebuilds the mean over the REMAINDER — hash equality
    # proves subtract == rebuild (exact integers, no IEEE drift).
    q["embeddings_prototype_takedown"] = q[
        "embeddings_label_prototypes"
    ].replace("FROM embeddings", "FROM embeddings WHERE vec_id % 5 <> 0")

    # Trained-centroid IVF (ann_ivf_kmeans): the km_ Lloyd chain above
    # feeds the IDENTICAL probe/scan arithmetic as ann_ivf_embeddings —
    # km_c2 replaces the hash-picked cent, n_probe 3, top-10. kq_
    # prefix for the ANN tail.
    q["ann_ivf_kmeans"] = q["embeddings_kmeans"].replace(
        """SELECT cid, cvec, CAST(n_members AS BIGINT) AS n_members
FROM km_c2 ORDER BY cid""",
        """, kq_qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q
         FROM embeddings WHERE vec_id = 0),
kq_assign AS (
  SELECT e.vec_id, c.cid,
         CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) = 0
                OR list_inner_product(c.cvec, c.cvec) = 0
              THEN 0.0
              ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
                   / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_inner_product(c.cvec, c.cvec)))
         END + 0.0 AS s
  FROM embeddings e CROSS JOIN km_c2 c
),
kq_cells AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cid ASC) AS rn
    FROM kq_assign) WHERE rn = 1
),
kq_probe AS (
  SELECT cid FROM (
    SELECT c.cid,
           CASE WHEN list_inner_product((SELECT q FROM kq_qv),
                                        (SELECT q FROM kq_qv)) = 0
                  OR list_inner_product(c.cvec, c.cvec) = 0
                THEN 0.0
                ELSE list_inner_product((SELECT q FROM kq_qv), c.cvec)
                     / (sqrt(list_inner_product((SELECT q FROM kq_qv),
                                                (SELECT q FROM kq_qv)))
                        * sqrt(list_inner_product(c.cvec, c.cvec)))
           END + 0.0 AS s
    FROM km_c2 c) ORDER BY s DESC, cid ASC LIMIT 3
),
kq_cands AS (SELECT vec_id FROM kq_cells JOIN kq_probe USING (cid)),
kq_scored AS (
  SELECT e.vec_id AS id,
         round(
           CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])) = 0
                  OR list_inner_product((SELECT q FROM kq_qv),
                                        (SELECT q FROM kq_qv)) = 0
                THEN 0.0
                ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                        (SELECT q FROM kq_qv))
                     / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_inner_product((SELECT q FROM kq_qv),
                                                  (SELECT q FROM kq_qv))))
           END,
         4) AS score
  FROM embeddings e JOIN kq_cands c ON e.vec_id = c.vec_id
),
kq_topk AS (SELECT * FROM kq_scored ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM kq_topk ORDER BY rank""",
    )

    # Semantic decontamination (curation.semantic_decontaminate):
    # label-0 vectors are the benchmark suite; every cosine recomputed
    # in double, rounded 4 dp BEFORE the max and the threshold compare
    # (identical to the Spark side). sc_ prefix.
    q["embeddings_semantic_decontam"] = """WITH
sc_b AS (SELECT CAST(embedding AS DOUBLE[]) AS bv
         FROM embeddings WHERE label = 0),
sc_a AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS av
         FROM embeddings WHERE label <> 0),
sc_cos AS (
  SELECT a.id, a.av IS NOT NULL AS av_ok,
         round(CASE WHEN list_inner_product(a.av, a.av) = 0
                      OR list_inner_product(b.bv, b.bv) = 0
                    THEN 0.0
                    ELSE list_inner_product(a.av, b.bv)
                         / (sqrt(list_inner_product(a.av, a.av))
                            * sqrt(list_inner_product(b.bv, b.bv)))
               END, 4) + 0.0 AS cos
  FROM sc_a a CROSS JOIN sc_b b
),
sc_agg AS (
  SELECT id, max(cos) + 0.0 AS mx,
         CAST(sum(CASE WHEN cos >= 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS nm,
         bool_or(av_ok) AS checked
  FROM sc_cos GROUP BY id
)
SELECT id,
       CASE WHEN checked THEN mx END AS max_benchmark_cos,
       CASE WHEN checked THEN nm END AS n_matches,
       CASE WHEN checked THEN nm > 0 END AS contaminated,
       checked
FROM sc_agg ORDER BY id"""

    # SemDeDup (dedup_docs.semantic_dedup): hash-picked IVF centroids →
    # nearest-centroid cells (identical math to ann_ivf_embeddings) →
    # within-cell cosine >= τ pairs (rounded 4 dp first) → min-prop CC
    # closure (12 generated rounds; cells bound component size, replica
    # groups are near-cliques). Same MATERIALIZED discipline as
    # docs_canonical — inlined chains expand exponentially.
    _sd_closure, _sd_prev = [], "sd_r0"
    for _i in range(1, 13):
        _sd_cur = f"sd_r{_i}"
        _sd_closure.append(f"""{_sd_cur} AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM {_sd_prev} v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sd_sym s JOIN {_sd_prev} r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
)""")
        _sd_prev = _sd_cur
    q["embeddings_semantic_dedup"] = f"""WITH
sd_cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
sd_assign AS (
  SELECT e.vec_id, c.cid,
         CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) = 0
                OR list_inner_product(c.cvec, c.cvec) = 0
              THEN 0.0
              ELSE list_inner_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
                   / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_inner_product(c.cvec, c.cvec)))
         END + 0.0 AS s
  FROM embeddings e CROSS JOIN sd_cent c
),
sd_cells AS MATERIALIZED (
  SELECT vec_id AS id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM sd_assign) WHERE rn = 1
),
sd_v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sd_pairs AS MATERIALIZED (
  SELECT a.id AS a_id, b.id AS b_id
  FROM sd_cells a JOIN sd_cells b ON a.cell = b.cell AND a.id < b.id
  JOIN sd_v av ON av.vec_id = a.id JOIN sd_v bv ON bv.vec_id = b.id
  WHERE round(list_inner_product(av.v, bv.v)
              / (sqrt(list_inner_product(av.v, av.v))
                 * sqrt(list_inner_product(bv.v, bv.v))), 4) >= 0.4
),
sd_sym AS MATERIALIZED (
  SELECT a_id AS a, b_id AS b FROM sd_pairs
  UNION SELECT b_id, a_id FROM sd_pairs
),
sd_r0 AS MATERIALIZED (SELECT vec_id AS id, vec_id AS m FROM embeddings),
{','.join(_sd_closure)}
SELECT c.id, CAST(c.cell AS BIGINT) AS cell, r.m AS canonical_id
FROM sd_cells c JOIN sd_r12 r USING (id) ORDER BY c.id"""

    # Language ID: per-language marker counts, argmax (ties → low code).
    _markers = {
        "de": "('der','die','das','und','ist','ein','eine','nicht','mit','zu')",
        "en": "('the','and','of','to','a','in','is','it','that','for')",
        "es": "('el','la','los','las','y','es','un','una','que','en')",
        "fr": "('le','la','les','et','des','un','une','est','que','dans')",
    }
    lang_arms = " UNION ALL ".join(
        f"SELECT id, '{code}' AS code, "
        f"len(list_filter(toks, t -> t IN {inlist})) AS hits FROM t"
        for code, inlist in sorted(_markers.items())
    )
    q["docs_language_id"] = f"""WITH
t AS (
  SELECT doc_id AS id,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS toks
  FROM documents
),
langs AS ({lang_arms}),
best AS (
  SELECT id, code, hits,
         row_number() OVER (PARTITION BY id ORDER BY hits DESC, code ASC) AS rn
  FROM langs
)
SELECT id, CASE WHEN hits > 0 THEN code ELSE 'und' END AS pred_lang,
       CAST(hits AS BIGINT) AS n_hits
FROM best WHERE rn = 1 ORDER BY id"""

    # Token counting: whitespace tokens, BPE-ish pre-tokens, chars.
    q["docs_token_stats"] = """SELECT
  doc_id AS id,
  CAST(len(list_filter(string_split(lower(trim(text)), ' '), x -> x <> '')) AS BIGINT)
    AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
    AS n_bpe_tokens,
  CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY id"""

    # Quality scoring: ratio features + 4-gate composite.
    q["docs_quality"] = """WITH
t AS (
  SELECT doc_id AS id, text,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS toks
  FROM documents
),
feats AS (
  SELECT id,
    CAST(len(toks) AS DOUBLE) AS n,
    CASE WHEN len(toks) > 0
         THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS mean_len,
    CASE WHEN len(toks) > 0
         THEN CAST(len(list_filter(toks, x -> x IN
           ('the','and','of','to','a','in','is','it','that','for'))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS stop_ratio,
    CASE WHEN length(text) > 0
         THEN CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
              / length(text)
         ELSE 0.0 END AS alpha_ratio,
    CASE WHEN len(toks) > 0
         THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS distinct_ratio
  FROM t
)
SELECT id, CAST(n AS BIGINT) AS n_tokens,
  round(mean_len, 4) AS mean_token_len,
  round(stop_ratio, 4) AS stopword_ratio,
  round(alpha_ratio, 4) AS alpha_ratio,
  round(distinct_ratio, 4) AS distinct_ratio,
  round(CAST(
    (CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN stop_ratio >= 0.01 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN alpha_ratio >= 0.8 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN distinct_ratio >= 0.2 THEN 0.25 ELSE 0.0 END) AS DOUBLE), 4) AS score
FROM feats ORDER BY id"""

    # Document fingerprinting: content hash + min 5-token-gram sha.
    q["docs_fingerprint"] = """WITH
t AS (
  SELECT doc_id AS id, trim(lower(text)) AS norm,
         string_split(trim(lower(text)), ' ') AS toks
  FROM documents
)
SELECT id,
  sha256(norm) AS content_sha,
  CASE WHEN len(toks) >= 5 THEN
    list_min(list_transform(range(1, len(toks) - 3),
      i -> sha256(array_to_string(toks[i:i+4], ' '))))
  ELSE sha256(array_to_string(toks, ' ')) END AS min_gram_sha
FROM t ORDER BY id"""

    # PII scan/redact: the corpus has no natural PII, so both engines
    # build the same deterministically augmented text (doc_id-derived
    # email / IPv4 / phone on every 7th/11th/13th doc — entry map
    # _pii_docs). Patterns are the Java-regex/RE2 common subset
    # (curation.PII_PATTERNS), masked progressively in the same order
    # so a span never counts under two types.
    _pii_aug = """pii_aug AS (
  SELECT doc_id AS id,
    text
    || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199' ELSE '' END
    AS t
  FROM documents
),
pii_s1 AS (
  SELECT id,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM pii_aug
),
pii_s2 AS (
  SELECT id, n_email,
         len(regexp_extract_all(t1, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4,
         regexp_replace(t1, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g') AS t2
  FROM pii_s1
),
pii_s3 AS (
  SELECT id, n_email, n_ipv4,
         len(regexp_extract_all(t2, '\\+\\d{1,3}-\\d{3}-\\d{3}-\\d{4}\\b')) AS n_phone,
         regexp_replace(t2, '\\+\\d{1,3}-\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS t3
  FROM pii_s2
)"""
    q["docs_pii"] = f"""WITH {_pii_aug}
SELECT id,
       CAST(n_email AS BIGINT) AS n_email,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(n_phone AS BIGINT) AS n_phone,
       CAST(n_email + n_ipv4 + n_phone AS BIGINT) AS n_pii
FROM pii_s3 ORDER BY id"""

    q["docs_pii_redacted"] = f"""WITH {_pii_aug}
SELECT id, t3 AS redacted,
       CAST(n_email + n_ipv4 + n_phone AS BIGINT) AS n_redacted
FROM pii_s3 ORDER BY id"""

    # Decontamination: 13-gram exact-overlap (GPT-3 rule) against the
    # in-corpus benchmark suite (every 97th doc). sha256 equality is
    # gram-text equality inside each engine, so the match sets agree
    # whenever tokenization and window bounds agree (same split/slice
    # contract as docs_fingerprint).
    q["docs_decontaminated"] = """WITH
dc_span AS (
  SELECT array_to_string(string_split(trim(lower(text)), ' ')[1:13], ' ') AS s
  FROM documents WHERE doc_id = 0
),
dc_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 41 = 0
              THEN text || ' ' || (SELECT s FROM dc_span)
              ELSE text END AS text
  FROM documents
),
dc_tok AS (
  SELECT doc_id AS id, string_split(trim(lower(text)), ' ') AS toks
  FROM dc_docs
),
dc_grams AS (
  SELECT id, unnest(list_transform(range(1, len(toks) - 11),
                    i -> sha256(array_to_string(toks[i:i+12], ' ')))) AS g
  FROM dc_tok
),
dc_bg AS (SELECT DISTINCT g FROM dc_grams WHERE id % 97 = 0),
dc_hits AS (
  SELECT d.id, COUNT(*) AS n
  FROM dc_grams d JOIN dc_bg USING (g) GROUP BY d.id
)
SELECT t.id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated_grams,
       COALESCE(h.n, 0) > 0 AS contaminated
FROM dc_tok t LEFT JOIN dc_hits h ON t.id = h.id
ORDER BY t.id"""

    # Token-window chunking: size 64, overlap 16 (stride 48); a window
    # is emitted only while it contributes a new token (starts stop at
    # n - overlap), the final window truncates at the doc end.
    q["docs_chunks"] = """WITH
ck_tok AS (
  SELECT doc_id AS id, string_split(trim(lower(text)), ' ') AS toks
  FROM documents
),
ck_starts AS (
  SELECT id, toks,
         unnest(range(1, greatest(len(toks) - 16, 1) + 1, 48)) AS s
  FROM ck_tok
)
SELECT id,
       CAST((s - 1) // 48 AS INT) AS chunk_idx,
       CAST(s AS INT) AS start_token,
       CAST(least(64, len(toks) - s + 1) AS BIGINT) AS n_tokens,
       array_to_string(toks[s:s+63], ' ') AS chunk_text
FROM ck_starts ORDER BY id, chunk_idx"""

    # Sampling / mixture: uniform draw = 52 bits of sha256('{seed}:{id}')
    # over 2^52 (exact in a double — the ANN-LSH hyperplane trick), so
    # DuckDB recomputes every keep/drop decision bit-identically.
    # Strata are the language-ID argmax (sm_-prefixed twin of the
    # docs_language_id CTEs — CTE names are global per query).
    _sm_arms = " UNION ALL ".join(
        f"SELECT id, '{code}' AS code, "
        f"len(list_filter(toks, t -> t IN {inlist})) AS hits FROM sm_t"
        for code, inlist in sorted(_markers.items())
    )
    _sm_base = f"""sm_t AS (
  SELECT doc_id AS id,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS toks
  FROM documents
),
sm_langs AS ({_sm_arms}),
sm_best AS (
  SELECT id, code, hits,
         row_number() OVER (PARTITION BY id ORDER BY hits DESC, code ASC) AS rn
  FROM sm_langs
),
sm_lang AS (
  SELECT id, CASE WHEN hits > 0 THEN code ELSE 'und' END AS pred_lang
  FROM sm_best WHERE rn = 1
)"""
    _sm_u = (
        "(('0x' || substr(sha256('{seed}:' || CAST(id AS VARCHAR)), 1, 13))"
        "::UBIGINT / 4503599627370496.0)"
    )

    q["docs_sample_stratified"] = f"""WITH {_sm_base}
SELECT l.id, l.pred_lang, {_sm_u.format(seed="r3")} AS u
FROM sm_lang l
WHERE {_sm_u.format(seed="r3")}
      < CASE l.pred_lang WHEN 'en' THEN 0.3 WHEN 'und' THEN 0.8 ELSE 0.0 END
ORDER BY l.id"""

    _sm_rates = f"""sm_tok AS (
  SELECT id, CAST(len(toks) AS BIGINT) AS n_tokens FROM sm_t
),
sm_rates AS (
  SELECT l.pred_lang AS stratum,
         COUNT(*) AS n_docs,
         SUM(k.n_tokens) AS n_tokens,
         0.5 AS target_share,
         round(least(1.0, 8000.0 * 0.5 / CAST(SUM(k.n_tokens) AS DOUBLE)), 6)
           AS rate
  FROM sm_lang l JOIN sm_tok k USING (id)
  WHERE l.pred_lang IN ('en', 'und')
  GROUP BY l.pred_lang
)"""

    q["docs_mixture_rates"] = f"""WITH {_sm_base},
{_sm_rates}
SELECT stratum, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(target_share AS DOUBLE) AS target_share, rate
FROM sm_rates ORDER BY stratum"""

    q["docs_mixture"] = f"""WITH {_sm_base},
{_sm_rates}
SELECT l.id, l.pred_lang AS stratum, k.n_tokens,
       {_sm_u.format(seed="mix")} AS u, r.rate
FROM sm_lang l
JOIN sm_tok k USING (id)
JOIN sm_rates r ON l.pred_lang = r.stratum
WHERE {_sm_u.format(seed="mix")} < r.rate
ORDER BY l.id"""

    # Quality-quantile filter: keep rows at/above the median
    # distinct_ratio (the continuous repetition-guard feature — the
    # 4-gate composite is constant per stratum on this corpus) of their
    # language stratum (ascending percent_rank >= 0.5; tied scores
    # share a rank so blocks are kept or dropped whole).
    q["docs_quality_quantile"] = f"""WITH {_sm_base},
sm_score AS (
  SELECT id,
    round(CASE WHEN len(toks) > 0
         THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         ELSE 0.0 END, 4) AS distinct_ratio
  FROM sm_t
),
sm_pr AS (
  SELECT s.id, l.pred_lang, s.distinct_ratio,
         percent_rank() OVER (PARTITION BY l.pred_lang
                              ORDER BY s.distinct_ratio ASC) AS pr
  FROM sm_score s JOIN sm_lang l USING (id)
)
SELECT id, pred_lang, distinct_ratio, pr FROM sm_pr
WHERE pr >= 0.5 ORDER BY id"""

    # Corpus-level line dedup (C4/CCNet): each distinct normalized line
    # survives only at its first (doc, position). The corpus is
    # single-line, so both engines dedup the same deterministically
    # boilerplate-augmented text (PII-augmentation precedent).
    q["docs_dedup_lines"] = """WITH
dl_docs AS (
  SELECT doc_id AS id,
    text || chr(10) || 'subscribe to our newsletter today'
    || CASE WHEN doc_id % 3 = 0
            THEN chr(10) || 'copyright example corp all rights reserved'
            ELSE '' END AS t
  FROM documents
),
dl_lines AS (
  SELECT id, unnest(range(0, len(l))) AS idx, unnest(l) AS line
  FROM (SELECT id, string_split(t, chr(10)) AS l FROM dl_docs)
),
dl_rn AS (
  SELECT id, idx, line,
         row_number() OVER (PARTITION BY trim(lower(line))
                            ORDER BY id, idx) AS rn
  FROM dl_lines
),
dl_agg AS (
  SELECT id, array_to_string(list(line ORDER BY idx), chr(10)) AS text_dedup,
         COUNT(*) AS n_kept
  FROM dl_rn WHERE rn = 1 GROUP BY id
)
SELECT d.id, COALESCE(a.text_dedup, '') AS text_dedup,
  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
  CAST(len(string_split(d.t, chr(10))) - COALESCE(a.n_kept, 0) AS BIGINT)
    AS n_dropped
FROM dl_docs d LEFT JOIN dl_agg a ON d.id = a.id
ORDER BY d.id"""

    # Composed curation funnel (curation.curation_funnel): exact dedup
    # → near-dup canonicals → line dedup → language/quality gates →
    # deterministic sample, each stage consuming the previous SURVIVORS.
    # Every stage twin is the same arithmetic as its standalone oracle
    # (docs_exact_dedup / docs_canonical / docs_dedup_lines /
    # docs_language_id / docs_quality / docs_sample_fraction); the hash
    # here proves the COMPOSITION — survivor sets, rewritten text
    # flowing into the gates, and the final content sha. cf_ prefix.
    _cf_closure, _cf_prev = [], "cf_r0"
    for _i in range(1, 17):
        _cf_cur = f"cf_r{_i}"
        _cf_closure.append(f"""{_cf_cur} AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM {_cf_prev} v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM cf_sym s JOIN {_cf_prev} r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
)""")
        _cf_prev = _cf_cur
    _cf_lang_arms = " UNION ALL ".join(
        f"SELECT doc_id, '{code}' AS code, "
        f"len(list_filter(toks, t -> t IN {inlist})) AS hits FROM cf_t"
        for code, inlist in sorted(_markers.items())
    )
    _cf_u = (
        "(('0x' || substr(sha256('curate:' || CAST(doc_id AS VARCHAR)), 1, "
        "13))::UBIGINT / 4503599627370496.0)"
    )
    q["docs_curation_funnel"] = f"""WITH
cf_ex AS MATERIALIZED (
  SELECT doc_id, text,
         sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
  FROM documents
),
cf_d1 AS MATERIALIZED (
  SELECT e.doc_id, e.text
  FROM cf_ex e JOIN (SELECT h, min(doc_id) AS keep FROM cf_ex GROUP BY h) g
    ON e.h = g.h AND e.doc_id = g.keep
),
cf_s AS MATERIALIZED (
  SELECT doc_id AS id,
         list_distinct(string_split(trim(regexp_replace(lower(text),
           '\\s+', ' ', 'g')), ' ')) AS w
  FROM cf_d1
),
cf_p AS MATERIALIZED (
  SELECT a.id AS a_id, b.id AS b_id
  FROM cf_s a JOIN cf_s b ON a.id < b.id
  WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        / len(list_distinct(list_concat(a.w, b.w))) >= 0.95
),
cf_sym AS MATERIALIZED (
  SELECT a_id AS a, b_id AS b FROM cf_p UNION SELECT b_id, a_id FROM cf_p
),
cf_r0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS m FROM cf_d1),
{','.join(_cf_closure)},
cf_d2 AS MATERIALIZED (
  SELECT d.doc_id, d.text
  FROM cf_d1 d JOIN cf_r16 r ON r.id = d.doc_id AND r.m = d.doc_id
),
cf_lines AS (
  SELECT id, unnest(range(0, len(l))) AS idx, unnest(l) AS line
  FROM (SELECT doc_id AS id, string_split(text, chr(10)) AS l FROM cf_d2)
),
cf_keep AS (
  SELECT id, idx, line,
         row_number() OVER (PARTITION BY trim(lower(line))
                            ORDER BY id, idx) AS rn
  FROM cf_lines
),
cf_d3 AS MATERIALIZED (
  SELECT id AS doc_id,
         array_to_string(list(line ORDER BY idx), chr(10)) AS text
  FROM cf_keep WHERE rn = 1 GROUP BY id
  HAVING length(array_to_string(list(line ORDER BY idx), chr(10))) > 0
),
cf_t AS MATERIALIZED (
  SELECT doc_id, text,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '')
           AS toks
  FROM cf_d3
),
cf_langs AS ({_cf_lang_arms}),
cf_lang AS (
  SELECT doc_id, CASE WHEN hits > 0 THEN code ELSE 'und' END AS pred_lang
  FROM (
    SELECT doc_id, code, hits,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY hits DESC, code ASC) AS rn
    FROM cf_langs) WHERE rn = 1
),
cf_qual AS (
  SELECT doc_id,
    round(CAST(
      (CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0
            THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN stop_ratio >= 0.01 THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN alpha_ratio >= 0.8 THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN distinct_ratio >= 0.2 THEN 0.25 ELSE 0.0 END)
      AS DOUBLE), 4) AS quality
  FROM (
    SELECT doc_id,
      CASE WHEN len(toks) > 0
           THEN CAST(list_sum(list_transform(toks, x -> length(x)))
                     AS DOUBLE) / len(toks)
           ELSE 0.0 END AS mean_len,
      CASE WHEN len(toks) > 0
           THEN CAST(len(list_filter(toks, x -> x IN
             ('the','and','of','to','a','in','is','it','that','for')))
             AS DOUBLE) / len(toks)
           ELSE 0.0 END AS stop_ratio,
      CASE WHEN length(text) > 0
           THEN CAST(length(regexp_replace(lower(text), '[^a-z ]', '',
                'g')) AS DOUBLE) / length(text)
           ELSE 0.0 END AS alpha_ratio,
      CASE WHEN len(toks) > 0
           THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
           ELSE 0.0 END AS distinct_ratio
    FROM cf_t
  )
)
SELECT d.doc_id, sha256(d.text) AS content_sha, l.pred_lang, q.quality,
       {_cf_u} AS u
FROM cf_d3 d JOIN cf_lang l USING (doc_id) JOIN cf_qual q USING (doc_id)
WHERE l.pred_lang IN ('en', 'und') AND q.quality >= 0.25
  AND {_cf_u} < 0.5
ORDER BY d.doc_id"""

    # Sequence packing (curation.pack_sequences): concat-and-chunk the
    # id-ordered corpus token stream into 128-token training sequences;
    # one row per (sequence, doc) overlap segment. DuckDB's global
    # cumsum is the independent twin of the Spark two-pass bucket
    # prefix sum. SUM() OVER returns HUGEINT — cast before range().
    q["docs_packed"] = """WITH
pk_counts AS (
  SELECT doc_id AS id,
         CAST(len(list_filter(string_split(lower(trim(text)), ' '),
                              x -> x <> '')) AS BIGINT) AS n
  FROM documents
),
pk_placed AS MATERIALIZED (
  SELECT id, n,
         CAST(SUM(n) OVER (ORDER BY id) - n AS BIGINT) AS s,
         CAST(SUM(n) OVER (ORDER BY id) AS BIGINT) AS e
  FROM pk_counts WHERE n > 0
),
pk_total AS (SELECT MAX(e) AS t FROM pk_placed),
pk_seg AS (
  SELECT id, s, e, unnest(range(s // 128, (e - 1) // 128 + 1)) AS seq_id
  FROM pk_placed
)
SELECT CAST(seq_id AS BIGINT) AS seq_id, id,
  CAST(greatest(s, seq_id * 128) - s AS BIGINT) AS doc_token_start,
  CAST(greatest(s, seq_id * 128) - seq_id * 128 AS BIGINT) AS seq_token_start,
  CAST(least(e, (seq_id + 1) * 128) - greatest(s, seq_id * 128) AS BIGINT)
    AS n_tokens,
  CAST(least(128, (SELECT t FROM pk_total) - seq_id * 128) AS BIGINT)
    AS seq_n_tokens
FROM pk_seg ORDER BY seq_id, seq_token_start"""

    # Exact-substring duplicate spans (Lee et al. 2021 suffix-array
    # dedup, k-gram relaxation; operators/dedup_docs.py dup_spans,
    # k=8 tokens): every k-token gram hashed, grams occurring > once
    # mark their start positions, per-doc gaps-and-islands merge into
    # maximal spans. The shared CTE chain feeds both the span listing
    # and the rewrite twin below.
    _dsp_chain = """
dsp_docs AS MATERIALIZED (
  SELECT doc_id AS id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
           AS toks
  FROM documents
),
dsp_pos AS (
  SELECT id, toks, unnest(range(1, len(toks) - 8 + 2)) AS i FROM dsp_docs
),
dsp_grams AS MATERIALIZED (
  SELECT id, i - 1 AS pos,
         sha256(array_to_string(list_slice(toks, i, i + 7), ' ')) AS gram
  FROM dsp_pos
),
dsp_dup AS (SELECT gram FROM dsp_grams GROUP BY gram HAVING COUNT(*) > 1),
dsp_marked AS (SELECT g.id, g.pos FROM dsp_grams g JOIN dsp_dup USING (gram)),
dsp_isl AS (
  SELECT id, pos, pos + 7 AS e,
         MAX(pos + 7) OVER (PARTITION BY id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM dsp_marked
),
dsp_isl2 AS (
  SELECT id, pos, e,
    SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY id ORDER BY pos) AS island
  FROM dsp_isl
),
dsp_spans AS MATERIALIZED (
  SELECT id, MIN(pos) AS s, MAX(e) AS e2 FROM dsp_isl2 GROUP BY id, island
)"""

    q["docs_dup_spans"] = f"""WITH {_dsp_chain}
SELECT id, CAST(s AS BIGINT) AS span_start, CAST(e2 AS BIGINT) AS span_end,
       CAST(e2 - s + 1 AS BIGINT) AS span_len
FROM dsp_spans ORDER BY id, span_start"""

    # Streamed versioned span state (operators/span_state.py): folding
    # per-batch updates over the feed must land on the same spans table
    # as one full rebuild — the identical gram+island closure again.
    q["span_state_stream"] = q["docs_dup_spans"]

    # Span takedown (span_state.remove_doc_spans): repairing the
    # standing state after deleting the doc_id % 10 == 7 slice must
    # equal a rebuild over the remaining corpus — the identical closure
    # with the documents scan filtered to the survivors.
    q["span_state_takedown"] = q["docs_dup_spans"].replace(
        "FROM documents", "FROM documents WHERE doc_id % 10 <> 7"
    )

    # Incremental span dedup (dedup_docs.dup_spans_incremental): the
    # batch (doc_id % 5 == 0) against the prior gram index. The oracle
    # recomputes the TOUCHED set independently (prior docs holding a
    # gram the batch flipped from unique to duplicated) and restricts
    # the full-corpus span rebuild to new ∪ touched — a hash match
    # proves the incremental repair set is exactly right.
    q["docs_dup_spans_incremental"] = """WITH
dsi_docs AS MATERIALIZED (
  SELECT doc_id AS id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
           AS toks
  FROM documents
),
dsi_pos AS (
  SELECT id, toks, unnest(range(1, len(toks) - 8 + 2)) AS i FROM dsi_docs
),
dsi_grams AS MATERIALIZED (
  SELECT id, i - 1 AS pos,
         sha256(array_to_string(list_slice(toks, i, i + 7), ' ')) AS gram
  FROM dsi_pos
),
dsi_dup AS (SELECT gram FROM dsi_grams GROUP BY gram HAVING COUNT(*) > 1),
dsi_flipped AS (
  SELECT gram FROM (
    SELECT gram,
      SUM(CASE WHEN id % 5 <> 0 THEN 1 ELSE 0 END) AS p_occ,
      SUM(CASE WHEN id % 5 = 0 THEN 1 ELSE 0 END) AS b_occ
    FROM dsi_grams GROUP BY gram)
  WHERE p_occ = 1 AND b_occ >= 1
),
dsi_touched AS (
  SELECT DISTINCT id FROM dsi_grams JOIN dsi_flipped USING (gram)
  WHERE id % 5 <> 0
),
dsi_target AS MATERIALIZED (
  SELECT id FROM dsi_docs WHERE id % 5 = 0
  UNION SELECT id FROM dsi_touched
),
dsi_marked AS (
  SELECT g.id, g.pos FROM dsi_grams g
  JOIN dsi_dup USING (gram) JOIN dsi_target t ON g.id = t.id
),
dsi_isl AS (
  SELECT id, pos, pos + 7 AS e,
         MAX(pos + 7) OVER (PARTITION BY id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM dsi_marked
),
dsi_isl2 AS (
  SELECT id, pos, e,
    SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY id ORDER BY pos) AS island
  FROM dsi_isl
)
SELECT id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(e) AS BIGINT) AS span_end,
       CAST(MAX(e) - MIN(pos) + 1 AS BIGINT) AS span_len
FROM dsi_isl2 GROUP BY id, island ORDER BY id, span_start"""

    # Rewrite twin (drop_dup_spans): every span token removed — spans
    # are maximal and disjoint, so the coverage join is 1:at-most-1.
    q["docs_despanned"] = f"""WITH {_dsp_chain},
dsp_tok AS (
  SELECT id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS j
  FROM dsp_docs
),
dsp_kept AS (
  SELECT t.id, t.j, t.tok
  FROM dsp_tok t LEFT JOIN dsp_spans s
    ON t.id = s.id AND t.j BETWEEN s.s AND s.e2
  WHERE s.id IS NULL
),
dsp_keptagg AS (
  SELECT id, array_to_string(list(tok ORDER BY j), ' ') AS text_dedup,
         COUNT(*) AS n_kept
  FROM dsp_kept GROUP BY id
)
SELECT d.id, COALESCE(a.text_dedup, '') AS text_dedup,
  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
  CAST(len(d.toks) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped
FROM dsp_docs d LEFT JOIN dsp_keptagg a USING (id)
ORDER BY d.id"""

    # Case-preserving rewrite (drop_dup_spans keep_case=True): spans
    # still come from the normalized stream, surviving tokens from the
    # RAW stream at the same positions (normalization is 1:1 on tokens).
    q["docs_despanned_raw"] = f"""WITH {_dsp_chain},
dsr_rawdocs AS (
  SELECT doc_id AS id,
         string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
           AS rtoks
  FROM documents
),
dsr_tok AS (
  SELECT id, unnest(rtoks) AS tok, unnest(range(0, len(rtoks))) AS j
  FROM dsr_rawdocs
),
dsr_kept AS (
  SELECT t.id, t.j, t.tok
  FROM dsr_tok t LEFT JOIN dsp_spans s
    ON t.id = s.id AND t.j BETWEEN s.s AND s.e2
  WHERE s.id IS NULL
),
dsr_keptagg AS (
  SELECT id, array_to_string(list(tok ORDER BY j), ' ') AS text_dedup,
         COUNT(*) AS n_kept
  FROM dsr_kept GROUP BY id
)
SELECT d.id, COALESCE(a.text_dedup, '') AS text_dedup,
  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
  CAST(len(d.rtoks) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped
FROM dsr_rawdocs d LEFT JOIN dsr_keptagg a USING (id)
ORDER BY d.id"""

    # Keyed backward as-of join: DuckDB's native ASOF LEFT JOIN is the
    # independent twin of the Spark union-sort-backfill plan
    # (operators/events.py asof_join) — inclusive on ts equality in
    # both.
    q["events_asof_clicks"] = """WITH
ea_err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
ea_clk AS (
  -- same deterministic (user, ts) dedup as the Spark entry: min
  -- event_id wins when two clicks share an instant
  SELECT user_id, ts, click_event_id, value FROM (
    SELECT user_id, ts, event_id AS click_event_id, value,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id) AS rn
    FROM events WHERE event_type = 'click') WHERE rn = 1
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       c.click_event_id, c.value AS click_value
FROM ea_err e ASOF LEFT JOIN ea_clk c
  ON e.user_id = c.user_id AND e.ts >= c.ts
ORDER BY e.event_id"""

    # Forward as-of with tolerance: DuckDB ASOF LEFT JOIN on c.ts <=
    # r.ts picks the NEXT error; the 24 h tolerance nulls the match
    # post-hoc (left row retained) exactly like the Spark operator.
    q["events_asof_next_error"] = """WITH
an_clk AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
an_err AS (
  SELECT user_id, ts, error_event_id FROM (
    SELECT user_id, ts, event_id AS error_event_id,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id) AS rn
    FROM events WHERE event_type = 'error') WHERE rn = 1
),
an_j AS (
  SELECT c.event_id, c.user_id, c.ts, r.ts AS mts, r.error_event_id
  FROM an_clk c ASOF LEFT JOIN an_err r
    ON c.user_id = r.user_id AND c.ts <= r.ts
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CASE WHEN mts IS NOT NULL
              AND epoch_us(mts) - epoch_us(ts) <= 86400000000
            THEN strftime(mts, '%Y-%m-%d %H:%M:%S') END AS error_ts,
       CASE WHEN mts IS NOT NULL
              AND epoch_us(mts) - epoch_us(ts) <= 86400000000
            THEN error_event_id END AS error_event_id
FROM an_j ORDER BY event_id"""

    # Gap-based sessionization (8 h gap): lag + running sum of session
    # starts, then per-session aggregates; value totals accumulate in
    # DECIMAL(18,2) on both sides so aggregation order can't produce
    # float drift.
    q["events_sessions"] = """WITH
es_prev AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
es_idx AS (
  SELECT user_id, ts, value,
         SUM(CASE WHEN prev IS NULL
                    OR epoch_us(ts) - epoch_us(prev) > 28800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM es_prev
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS t_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS t_end,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM es_idx GROUP BY user_id, session_idx
ORDER BY user_id, session_idx"""

    # Fixed-point PageRank (centrality.pagerank, 5 iterations, d=0.85)
    # over the supplier->part multigraph: all-integer arithmetic (//),
    # so the unrolled iterations reproduce Spark's fixpoint
    # bit-identically. AS MATERIALIZED per the unrolled-chain rule.
    _pr_iters = 5
    _pr_scale = 10**12
    _pr_base = f"({15 * _pr_scale} // (100 * n.n))"
    _pr_cte = [
        """pr_e AS MATERIALIZED (
  SELECT l_suppkey AS id, l_partkey + 1000000 AS dst FROM lineitem
)""",
        """pr_v AS MATERIALIZED (
  SELECT DISTINCT id
  FROM (SELECT id FROM pr_e UNION ALL SELECT dst AS id FROM pr_e)
)""",
        "pr_n AS MATERIALIZED (SELECT COUNT(*) AS n FROM pr_v)",
        """pr_l AS MATERIALIZED (
  SELECT e.id, e.dst, d.out_deg
  FROM pr_e e
  JOIN (SELECT id, COUNT(*) AS out_deg FROM pr_e GROUP BY id) d USING (id)
)""",
        f"""pr_r0 AS MATERIALIZED (
  SELECT v.id, {_pr_scale} // n.n AS rank_u FROM pr_v v CROSS JOIN pr_n n
)""",
    ]
    for _k in range(1, _pr_iters + 1):
        _pr_cte.append(f"""pr_c{_k} AS MATERIALIZED (
  SELECT l.dst AS id, SUM(r.rank_u // l.out_deg) AS s
  FROM pr_l l JOIN pr_r{_k - 1} r ON l.id = r.id GROUP BY l.dst
)""")
        _pr_cte.append(f"""pr_r{_k} AS MATERIALIZED (
  SELECT v.id,
         {_pr_base} + (85 * COALESCE(c.s, 0)) // 100 AS rank_u
  FROM pr_v v CROSS JOIN pr_n n LEFT JOIN pr_c{_k} c ON v.id = c.id
)""")
    q["parts_pagerank"] = (
        "WITH\n" + ",\n".join(_pr_cte) + f"""
SELECT id, CAST(rank_u AS BIGINT) AS rank_u,
       CAST(rank_u AS DOUBLE) / {float(_pr_scale)} AS rank
FROM pr_r{_pr_iters} ORDER BY id"""
    )

    # Personalized PageRank: restart mass confined to suppliers
    # divisible by 7 — same exact-integer fixpoint, unrolled. Node ids
    # stay in the pr_ graph; ppr_ prefixes keep CTE names globally
    # unique (composition rule).
    _ppr_cte = [
        """ppr_e AS MATERIALIZED (
  SELECT l_suppkey AS id, l_partkey + 1000000 AS dst FROM lineitem
)""",
        """ppr_v AS MATERIALIZED (
  SELECT DISTINCT id
  FROM (SELECT id FROM ppr_e UNION ALL SELECT dst AS id FROM ppr_e)
)""",
        """ppr_s AS MATERIALIZED (
  SELECT DISTINCT id FROM ppr_e WHERE id % 7 = 0
)""",
        "ppr_n AS MATERIALIZED (SELECT COUNT(*) AS ns FROM ppr_s)",
        """ppr_l AS MATERIALIZED (
  SELECT e.id, e.dst, d.out_deg
  FROM ppr_e e
  JOIN (SELECT id, COUNT(*) AS out_deg FROM ppr_e GROUP BY id) d USING (id)
)""",
        f"""ppr_r0 AS MATERIALIZED (
  SELECT v.id,
         CASE WHEN s.id IS NOT NULL THEN {_pr_scale} // n.ns ELSE 0 END
           AS rank_u
  FROM ppr_v v CROSS JOIN ppr_n n LEFT JOIN ppr_s s ON v.id = s.id
)""",
    ]
    for _k in range(1, _pr_iters + 1):
        _ppr_cte.append(f"""ppr_c{_k} AS MATERIALIZED (
  SELECT l.dst AS id, SUM(r.rank_u // l.out_deg) AS s
  FROM ppr_l l JOIN ppr_r{_k - 1} r ON l.id = r.id GROUP BY l.dst
)""")
        _ppr_cte.append(f"""ppr_r{_k} AS MATERIALIZED (
  SELECT v.id,
         CASE WHEN s.id IS NOT NULL
              THEN {15 * _pr_scale} // (100 * n.ns) ELSE 0 END
         + (85 * COALESCE(c.s, 0)) // 100 AS rank_u
  FROM ppr_v v CROSS JOIN ppr_n n
  LEFT JOIN ppr_c{_k} c ON v.id = c.id
  LEFT JOIN ppr_s s ON v.id = s.id
)""")
    q["parts_ppr"] = (
        "WITH\n" + ",\n".join(_ppr_cte) + f"""
SELECT id, CAST(rank_u AS BIGINT) AS rank_u,
       CAST(rank_u AS DOUBLE) / {float(_pr_scale)} AS rank
FROM ppr_r{_pr_iters} ORDER BY id"""
    )

    # HITS hubs & authorities, unrolled: DuckDB's SUM over BIGINT
    # returns HUGEINT (128-bit), so the L1-normalization products are
    # exact — matching Spark's decimal(38,0) accumulate + long div.
    _ht_iters = 3
    _ht_cte = [
        """ht_e AS MATERIALIZED (
  SELECT l_suppkey AS src, l_partkey + 1000000 AS dst FROM lineitem
)""",
        """ht_v AS MATERIALIZED (
  SELECT DISTINCT id
  FROM (SELECT src AS id FROM ht_e UNION ALL SELECT dst AS id FROM ht_e)
)""",
        "ht_n AS (SELECT COUNT(*) AS n FROM ht_v)",
        f"""ht_h0 AS MATERIALIZED (
  SELECT v.id, CAST({_pr_scale} // n.n AS HUGEINT) AS h
  FROM ht_v v CROSS JOIN ht_n n
)""",
    ]
    for _k in range(1, _ht_iters + 1):
        _ht_cte.append(f"""ht_ar{_k} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(h.h) AS a
  FROM ht_e e JOIN ht_h{_k - 1} h ON e.src = h.id GROUP BY e.dst
)""")
        _ht_cte.append(
            f"ht_at{_k} AS (SELECT SUM(a) AS tot FROM ht_ar{_k})"
        )
        _ht_cte.append(f"""ht_a{_k} AS MATERIALIZED (
  SELECT v.id,
         ({_pr_scale}::HUGEINT * COALESCE(r.a, 0)) // t.tot AS a
  FROM ht_v v LEFT JOIN ht_ar{_k} r ON v.id = r.id CROSS JOIN ht_at{_k} t
)""")
        _ht_cte.append(f"""ht_hr{_k} AS MATERIALIZED (
  SELECT e.src AS id, SUM(a.a) AS h
  FROM ht_e e JOIN ht_a{_k} a ON e.dst = a.id GROUP BY e.src
)""")
        _ht_cte.append(
            f"ht_ht{_k} AS (SELECT SUM(h) AS tot FROM ht_hr{_k})"
        )
        _ht_cte.append(f"""ht_h{_k} AS MATERIALIZED (
  SELECT v.id,
         ({_pr_scale}::HUGEINT * COALESCE(r.h, 0)) // t.tot AS h
  FROM ht_v v LEFT JOIN ht_hr{_k} r ON v.id = r.id CROSS JOIN ht_ht{_k} t
)""")
    q["parts_hits"] = (
        "WITH\n" + ",\n".join(_ht_cte) + f"""
SELECT h.id, CAST(h.h AS BIGINT) AS hub_u, CAST(a.a AS BIGINT) AS auth_u,
       CAST(h.h AS DOUBLE) / {float(_pr_scale)} AS hub,
       CAST(a.a AS DOUBLE) / {float(_pr_scale)} AS auth
FROM ht_h{_ht_iters} h JOIN ht_a{_ht_iters} a ON h.id = a.id
ORDER BY h.id"""
    )

    # Degree stats over the same supplier->part multigraph (multigraph
    # counts, full outer join of the two directions).
    q["parts_degree"] = """WITH
dg_e AS (SELECT l_suppkey AS src, l_partkey + 1000000 AS dst FROM lineitem),
dg_o AS (SELECT src AS id, COUNT(*) AS out_deg FROM dg_e GROUP BY src),
dg_i AS (SELECT dst AS id, COUNT(*) AS in_deg FROM dg_e GROUP BY dst)
SELECT COALESCE(o.id, i.id) AS id,
       CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg
FROM dg_o o FULL JOIN dg_i i ON o.id = i.id
ORDER BY id"""

    # Bernoulli sample at 0.4: the 52-bit sha-uniform draw recomputed
    # exactly (13 hex chars = 52 bits; both the UBIGINT and the 2^52
    # denominator are exact in a double, so the keep/drop comparison is
    # bit-identical to Spark's conv()/cast path).
    _sf_u = (
        "(('0x' || substr(sha256('frac:' || CAST(doc_id AS VARCHAR)), 1, 13))"
        "::UBIGINT / 4503599627370496.0)"
    )
    q["docs_sample_fraction"] = f"""SELECT doc_id, {_sf_u} AS u
FROM documents WHERE {_sf_u} < 0.4 ORDER BY doc_id"""

    # Co-occurrence lift over (order, part): exact integer counts, one
    # IEEE double division (bit-identical both engines; PMI = ln(lift)
    # is left to consumers — log parity is not ulp-guaranteed, ratios
    # are).
    q["parts_cooccur_lift"] = """WITH
co_gi AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
co_pairs AS (
  SELECT a.i AS a, b.i AS b, COUNT(*) AS c_ab
  FROM co_gi a JOIN co_gi b ON a.g = b.g AND a.i < b.i
  GROUP BY a.i, b.i HAVING COUNT(*) >= 2
),
co_marg AS (SELECT i, COUNT(*) AS c FROM co_gi GROUP BY i),
co_n AS (SELECT COUNT(DISTINCT g) AS n FROM co_gi)
SELECT p.a, p.b, CAST(p.c_ab AS BIGINT) AS c_ab,
       CAST(ma.c AS BIGINT) AS c_a, CAST(mb.c AS BIGINT) AS c_b,
       CAST(p.c_ab * n.n AS DOUBLE) / CAST(ma.c * mb.c AS DOUBLE) AS lift
FROM co_pairs p
JOIN co_marg ma ON ma.i = p.a
JOIN co_marg mb ON mb.i = p.b
CROSS JOIN co_n n
ORDER BY p.a, p.b"""

    # Triangle counts via the SAME degree-ordered orientation as the
    # Spark operator (cooccur.triangle_count) — exact integers.
    q["parts_triangles"] = """WITH
tr_gi AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
tr_e AS (
  SELECT a.i AS u, b.i AS v
  FROM tr_gi a JOIN tr_gi b ON a.g = b.g AND a.i < b.i
  GROUP BY a.i, b.i HAVING COUNT(*) >= 2
),
tr_deg AS (
  SELECT id, COUNT(*) AS d
  FROM (SELECT u AS id FROM tr_e UNION ALL SELECT v FROM tr_e)
  GROUP BY id
),
tr_o AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS x,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS y
  FROM tr_e e
  JOIN tr_deg du ON du.id = e.u
  JOIN tr_deg dv ON dv.id = e.v
),
tr_w AS (
  SELECT o1.x, o1.y AS y1, o2.y AS y2
  FROM tr_o o1 JOIN tr_o o2 ON o1.x = o2.x AND o1.y < o2.y
),
tr_t AS (
  SELECT w.x, w.y1, w.y2
  FROM tr_w w JOIN tr_e e ON e.u = w.y1 AND e.v = w.y2
)
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT x AS id FROM tr_t
      UNION ALL SELECT y1 FROM tr_t
      UNION ALL SELECT y2 FROM tr_t)
GROUP BY id ORDER BY id"""

    # Local clustering coefficient (cooccur.local_clustering): the
    # parts_triangles chain re-prefixed (lc_ — global CTE namespace),
    # per-node corner counts LEFT-joined onto the degree table, one
    # IEEE division of exact integers, 4 dp. Built programmatically
    # from the triangles oracle so the two can't drift.
    _lc_base = (
        q["parts_triangles"]
        .replace("tr_", "lc_")
        .rsplit("SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles", 1)[0]
        .rstrip()
    )
    q["parts_clustering"] = (
        _lc_base
        + """,
lc_n AS (
  SELECT id, COUNT(*) AS t
  FROM (SELECT x AS id FROM lc_t
        UNION ALL SELECT y1 FROM lc_t
        UNION ALL SELECT y2 FROM lc_t)
  GROUP BY id
)
SELECT d.id, CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(n.t, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.d >= 2
            THEN round(2.0 * COALESCE(n.t, 0) / (d.d * (d.d - 1)), 4) + 0.0
            ELSE 0.0 END AS lcc
FROM lc_deg d LEFT JOIN lc_n n USING (id) ORDER BY d.id"""
    )

    # Affine int8 quantization: scale/rounding arguments are always
    # >= 0, so Spark HALF_UP and DuckDB round-half-away agree; the RMSE
    # fold reuses the list_inner_product ≡ F.aggregate equivalence the
    # cosine oracles prove. CAST(round(..) AS INT) is exact (integral
    # double), so DuckDB's half-even int cast can't diverge.
    q["embeddings_quantized"] = """WITH
qz_v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz_p AS (
  SELECT vec_id, v, list_min(v) AS vmin,
         (list_max(v) - list_min(v)) / 255.0 AS scale
  FROM qz_v
),
qz_q AS (
  SELECT vec_id, v, vmin + 0.0 AS vmin, scale + 0.0 AS scale,
         CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(round((x - vmin) / scale) AS INT))
         END AS q
  FROM qz_p
),
qz_e AS (
  SELECT vec_id, q, vmin, scale, len(v) AS n,
         list_transform(range(1, len(v) + 1),
                        i -> v[i] - (vmin + q[i] * scale)) AS err
  FROM qz_q
)
SELECT vec_id, q, vmin, scale,
       round(sqrt(list_inner_product(err, err) / n), 4) AS rmse
FROM qz_e ORDER BY vec_id"""

    # 2-core by unrolled peeling rounds (converges in 4 on this
    # corpus; rounds 5-8 are identities, matching the Spark operator's
    # early exit). AS MATERIALIZED per the unrolled-chain rule.
    _kc_rounds = 8
    _kc_cte = [
        """kc_gi AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem
)""",
        """kc_e0 AS MATERIALIZED (
  SELECT a.i AS u, b.i AS v
  FROM kc_gi a JOIN kc_gi b ON a.g = b.g AND a.i < b.i
  GROUP BY a.i, b.i HAVING COUNT(*) >= 2
)""",
    ]
    for _r in range(1, _kc_rounds + 1):
        _kc_cte.append(f"""kc_k{_r} AS MATERIALIZED (
  SELECT id FROM (
    SELECT id, COUNT(*) AS d
    FROM (SELECT u AS id FROM kc_e{_r - 1}
          UNION ALL SELECT v FROM kc_e{_r - 1})
    GROUP BY id) WHERE d >= 2
)""")
        _kc_cte.append(f"""kc_e{_r} AS MATERIALIZED (
  SELECT e.u, e.v FROM kc_e{_r - 1} e
  JOIN kc_k{_r} ka ON ka.id = e.u
  JOIN kc_k{_r} kb ON kb.id = e.v
)""")
    q["parts_kcore"] = (
        "WITH\n" + ",\n".join(_kc_cte) + f"""
SELECT id, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM (SELECT u AS id FROM kc_e{_kc_rounds}
      UNION ALL SELECT v FROM kc_e{_kc_rounds})
GROUP BY id HAVING COUNT(*) >= 2 ORDER BY id"""
    )

    # Gopher repetition gates: regexp \s+ tokenization (the augmented
    # text embeds a newline, so plain string_split(' ') would glue two
    # tokens); gram windows via 1-based inclusive list slices.
    q["docs_repetition"] = r"""WITH
rp_docs AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || text
              ELSE text END AS t
  FROM documents
),
rp_lc AS (
  SELECT id, line, COUNT(*) AS c
  FROM rp_docs, unnest(string_split(t, chr(10))) AS u(line)
  GROUP BY id, line
),
rp_ls AS (
  SELECT id, SUM(c) AS n_lines, COUNT(*) AS n_distinct,
         SUM((c - 1) * len(line)) AS dup_chars,
         SUM(c * len(line)) AS line_chars
  FROM rp_lc GROUP BY id
),
rp_tok AS (
  SELECT id, regexp_split_to_array(trim(lower(t)), '\s+') AS toks FROM rp_docs
),
rp_norm AS (
  SELECT id, len(array_to_string(toks, ' ')) AS norm_len FROM rp_tok
),
rp_grams AS (
  SELECT k.id, nn.n, array_to_string(k.toks[ii.i:ii.i + nn.n - 1], ' ') AS g
  FROM rp_tok k,
       unnest([2, 3, 4]) AS nn(n),
       unnest(range(1, len(k.toks) - nn.n + 2)) AS ii(i)
  WHERE len(k.toks) >= nn.n
),
rp_gc AS (SELECT id, n, g, COUNT(*) AS c FROM rp_grams GROUP BY id, n, g),
rp_top AS (
  SELECT id, n, c, g FROM (
    SELECT id, n, c, g,
           row_number() OVER (PARTITION BY id, n ORDER BY c DESC, g ASC)
             AS rn
    FROM rp_gc) WHERE rn = 1
)
SELECT d.id,
  round((ls.n_lines - ls.n_distinct) / CAST(ls.n_lines AS DOUBLE), 4)
    AS dup_line_frac,
  round(CASE WHEN ls.line_chars > 0
             THEN ls.dup_chars / CAST(ls.line_chars AS DOUBLE)
             ELSE 0.0 END, 4) AS dup_line_char_frac,
  round(CASE WHEN nm.norm_len > 0 AND t2.c IS NOT NULL
             THEN least(1.0, t2.c * len(t2.g) / CAST(nm.norm_len AS DOUBLE))
             ELSE 0.0 END, 4) AS top2_char_frac,
  round(CASE WHEN nm.norm_len > 0 AND t3.c IS NOT NULL
             THEN least(1.0, t3.c * len(t3.g) / CAST(nm.norm_len AS DOUBLE))
             ELSE 0.0 END, 4) AS top3_char_frac,
  round(CASE WHEN nm.norm_len > 0 AND t4.c IS NOT NULL
             THEN least(1.0, t4.c * len(t4.g) / CAST(nm.norm_len AS DOUBLE))
             ELSE 0.0 END, 4) AS top4_char_frac
FROM rp_docs d
JOIN rp_ls ls ON ls.id = d.id
JOIN rp_norm nm ON nm.id = d.id
LEFT JOIN rp_top t2 ON t2.id = d.id AND t2.n = 2
LEFT JOIN rp_top t3 ON t3.id = d.id AND t3.n = 3
LEFT JOIN rp_top t4 ON t4.id = d.id AND t4.n = 4
ORDER BY d.id"""

    # Multimodal metadata: fake-decode over the binary html payload.
    # The oracle reconstructs the deterministic page markup from
    # documents.text (FIXTURES.md §1) — equality proves the Spark side's
    # binary Arrow plumbing reproduces the same bytes.
    _html = (
        "'<html><head><title>doc ' || CAST(p.doc_id AS VARCHAR) || "
        "'</title></head><body><nav>site navigation</nav><p>' || p.text || "
        "'</p><footer>crawl footer</footer></body></html>'"
    )
    q["media_metadata"] = f"""WITH {PAGES_CTE},
payload AS (
  SELECT p.url AS id, {_html} AS html
  FROM pages p
)
SELECT id,
  CAST(length(html) AS BIGINT) AS n_bytes,
  sha256(html) AS sha256,
  'fake' AS format,
  CAST(length(html) % 640 + 1 AS INT) AS width,
  CAST((length(html) // 640) % 480 + 1 AS INT) AS height,
  CAST(3 AS INT) AS channels
FROM payload ORDER BY id"""

    # Frame-sampling stub: evenly-spaced byte offsets per payload.
    q["frame_offsets"] = f"""WITH {PAGES_CTE},
payload AS (
  SELECT p.url AS id, CAST(length({_html}) AS BIGINT) AS n
  FROM pages p
)
SELECT id, CAST(i AS INT) AS frame_idx,
       CAST((i * n) // 4 AS BIGINT) AS byte_offset
FROM payload, range(0, 4) r(i) ORDER BY id, frame_idx"""

    # E7: typed attribute extraction — first match (earliest episode,
    # then episode uuid) per (entity, attribute) across mention contexts.
    q["node_attributes"] = f"""WITH {MENTION_EDGES_CTE},
ep AS (
  SELECT sha256(url) AS episode_uuid, text AS content, warc_ts AS valid_at
  FROM pages
),
ctx AS (
  SELECT m.entity_uuid, m.episode_uuid, e.content, e.valid_at
  FROM mention_edges m JOIN ep e USING (episode_uuid)
),
per_attr AS (
  SELECT entity_uuid, episode_uuid, valid_at, 'after_fast' AS attr,
         regexp_extract(content, 'fast (\\w+)', 1) AS value
  FROM ctx
  UNION ALL
  SELECT entity_uuid, episode_uuid, valid_at, 'after_merge',
         regexp_extract(content, 'merge (\\w+)', 1)
  FROM ctx
),
ranked AS (
  SELECT entity_uuid, attr, value,
         row_number() OVER (
           PARTITION BY entity_uuid, attr
           ORDER BY valid_at, episode_uuid) AS rn
  FROM per_attr WHERE value <> ''
)
SELECT entity_uuid, attr, value FROM ranked WHERE rn = 1
ORDER BY entity_uuid, attr"""

    # EpisodeType variants: the oracle builds each type's TOKEN STREAM
    # directly — 'userN: ' prefix for messages, the sorted-key traversal
    # string for json ("body <text> channel chN", exactly what the Spark
    # flattener emits for the constructed object) — runs the grammar,
    # and unions the speaker-first mentions.
    q["episodes_typed_mentions"] = f"""WITH
typed AS (
  SELECT doc_id, source AS group_id,
         CASE WHEN doc_id % 3 = 0
              THEN 'user' || CAST(doc_id % 5 AS VARCHAR) || ': ' || text
              WHEN doc_id % 3 = 1
              THEN 'body ' || text || ' channel ch' || CAST(doc_id % 7 AS VARCHAR)
              ELSE text END AS content,
         CASE WHEN doc_id % 3 = 0 THEN 'message'
              WHEN doc_id % 3 = 1 THEN 'json' ELSE 'text' END AS src
  FROM documents
),
eps AS (
  SELECT sha256('https://ex.test/' || CAST(doc_id AS VARCHAR)) AS uuid,
         group_id, content, src
  FROM typed
),
toks3 AS (
  SELECT uuid AS episode_uuid, group_id,
         unnest(string_split(content, ' ')) AS tok,
         generate_subscripts(string_split(content, ' '), 1) - 1 AS pos
  FROM eps
),
tagged3 AS (
  SELECT *, lag(tok) OVER (PARTITION BY episode_uuid ORDER BY pos) AS prev_tok
  FROM toks3 WHERE tok <> ''
),
grammar_mentions AS (
  SELECT DISTINCT episode_uuid, group_id,
         CASE WHEN prev_tok IN {ADJS} THEN prev_tok || ' ' || tok
              ELSE tok END AS name
  FROM tagged3 WHERE tok IN {NOUNS}
),
speakers AS (
  SELECT DISTINCT uuid AS episode_uuid, group_id,
         trim(regexp_extract(line, '^\\s*([^:\\n]+):\\s', 1)) AS name
  FROM (
    SELECT uuid, group_id, unnest(string_split(content, chr(10))) AS line
    FROM eps WHERE src = 'message'
  )
  WHERE trim(regexp_extract(line, '^\\s*([^:\\n]+):\\s', 1)) <> ''
)
SELECT DISTINCT episode_uuid, group_id, name
FROM (SELECT * FROM grammar_mentions UNION ALL SELECT * FROM speakers)
ORDER BY episode_uuid, name"""

    # T4→T1: either-endpoint contradiction candidates close edges across
    # predicates; earliest later-valid_at candidate wins; expired_at :=
    # run_ts where closed (reference edge_operations.py:406-441 truth
    # table — the disjointness guard is vacuous here because merged
    # edges start with null invalid_at; the guard branch is pinned by
    # tests/test_temporal_t4.py on pre-closed fixtures).
    q["edges_temporal_t4"] = f"""WITH {EDGES_CTE},
closing AS (
  SELECT e.uuid, min(n.valid_at) AS closing_at
  FROM edges e
  JOIN edges n
    ON e.uuid <> n.uuid
   AND (e.source_node_uuid = n.source_node_uuid
        OR e.source_node_uuid = n.target_node_uuid
        OR e.target_node_uuid = n.source_node_uuid
        OR e.target_node_uuid = n.target_node_uuid)
  WHERE e.valid_at < n.valid_at
  GROUP BY e.uuid
)
SELECT e.uuid, e.group_id, e.source_node_uuid, e.target_node_uuid,
       e.name, e.fact,
       strftime(e.valid_at, '%Y-%m-%d %H:%M:%S') AS valid_at,
       strftime(c.closing_at, '%Y-%m-%d %H:%M:%S') AS invalid_at,
       CASE WHEN c.closing_at IS NOT NULL
            THEN strftime({RUN_TS_SQL}, '%Y-%m-%d %H:%M:%S') END AS expired_at
FROM edges e LEFT JOIN closing c USING (uuid)
ORDER BY e.uuid"""

    # E6 in-text dates: deterministic date augmentation (mirrors the
    # Spark query) + the DATETIME RULES (ISO date → midnight; year →
    # Jan 1; none → reference time = warc_ts).
    q["edges_dated"] = f"""WITH
docs2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' since ' || CAST(2015 + doc_id % 8 AS VARCHAR)
              WHEN doc_id % 3 = 1
              THEN text || ' on 2020-' ||
                   lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '-' ||
                   lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
              ELSE text END AS content,
         source AS group_id,
         TIMESTAMP '2024-01-01 00:00:00'
           + CAST(doc_id AS INT) * INTERVAL 1 MINUTE AS warc_ts
  FROM documents
),
episodes2 AS (
  SELECT sha256('https://ex.test/' || CAST(doc_id AS VARCHAR)) AS uuid,
         group_id, content,
         CASE
           WHEN regexp_extract(content, '\\b(\\d{{4}}-\\d{{2}}-\\d{{2}})\\b', 1) <> ''
           THEN CAST(regexp_extract(content, '\\b(\\d{{4}}-\\d{{2}}-\\d{{2}})\\b', 1) AS TIMESTAMP)
           WHEN regexp_extract(content, '\\b((?:19|20)\\d{{2}})\\b', 1) <> ''
           THEN CAST(regexp_extract(content, '\\b((?:19|20)\\d{{2}})\\b', 1) || '-01-01' AS TIMESTAMP)
           ELSE warc_ts END AS valid_at
  FROM docs2
),
toks2 AS (
  SELECT uuid AS episode_uuid, group_id, valid_at,
         unnest(string_split(content, ' ')) AS tok,
         generate_subscripts(string_split(content, ' '), 1) - 1 AS pos
  FROM episodes2
),
tagged2 AS (
  SELECT *, lag(tok) OVER (PARTITION BY episode_uuid ORDER BY pos) AS prev_tok
  FROM toks2 WHERE tok <> ''
),
mention_pos2 AS (
  SELECT episode_uuid, group_id, valid_at, pos,
         CASE WHEN prev_tok IN {ADJS} THEN prev_tok || ' ' || tok
              ELSE tok END AS name
  FROM tagged2 WHERE tok IN {NOUNS}
),
stream2 AS (
  SELECT episode_uuid, group_id, valid_at, pos, name,
         CAST(NULL AS VARCHAR) AS verb
  FROM mention_pos2
  UNION ALL
  SELECT episode_uuid, group_id, valid_at, pos, NULL, tok
  FROM tagged2 WHERE tok IN {VERBS}
),
win2 AS (
  SELECT *,
    last_value(name IGNORE NULLS) OVER (
      PARTITION BY episode_uuid ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS subj_name,
    first_value(name IGNORE NULLS) OVER (
      PARTITION BY episode_uuid ORDER BY pos
      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS obj_name
  FROM stream2
)
SELECT DISTINCT episode_uuid, group_id, subj_name,
       upper(verb) AS pred, obj_name,
       subj_name || ' ' || verb || ' ' || obj_name AS fact,
       strftime(valid_at, '%Y-%m-%d %H:%M:%S') AS valid_at
FROM win2
WHERE verb IS NOT NULL AND subj_name IS NOT NULL
  AND obj_name IS NOT NULL AND subj_name <> obj_name
ORDER BY episode_uuid, subj_name, pred, obj_name"""

    # D9/Q7/Q8 incremental ingest: the Spark side runs batch A then
    # merges batch B incrementally against A's graph; the oracle is the
    # ONE-BATCH pipeline over the full corpus. A value-hash match proves
    # incremental ≡ batch (the associativity contract of
    # operators/incremental.py).
    q["incremental_merge"] = q["flagship_triples"]
    # streaming micro-batch drains commit through the same incremental
    # merge; the final state must equal the one-batch pipeline
    q["streaming_merge"] = q["flagship_triples"]
    # snapshot + per-table delta dir reconstructed merge-on-read must
    # also equal the one-batch pipeline (the MERGE-commit path)
    q["delta_commit_merge"] = q["flagship_triples"]

    # G2/G3 communities: label propagation UNROLLED to the Spark
    # implementation's max_iterations (synchronous rounds; plurality of
    # neighbor weight, ties toward the larger label). Post-fixpoint
    # rounds are identity, so unrolling past convergence is safe; if LP
    # never converges, both sides stop at exactly the same round count.
    from graphiti_spark.operators.communities import MAX_LP_ITERATIONS

    lp_rounds = []
    for i in range(1, MAX_LP_ITERATIONS + 1):
        lp_rounds.append(
            f"""l{i} AS MATERIALIZED (
  SELECT v.src AS uuid, max(struct_pack(w := v.w, c := v.nbr_comm))['c'] AS community
  FROM (
    SELECT n.src, l.community AS nbr_comm, sum(n.weight) AS w
    FROM nbrs n JOIN l{i - 1} l ON l.uuid = n.dst
    GROUP BY n.src, l.community
  ) v GROUP BY v.src
)"""
        )
    lp_chain = ",\n".join(lp_rounds)
    # shared LP chain: q["communities"] reads `agg` directly;
    # q["communities_cosine"] extends it with the uuid→parquet-vector
    # map + cosine top-k (the community similarity channel, r5)
    comm_chain = f"""{EDGES_CTE},
sym AS (
  SELECT source_node_uuid AS src, target_node_uuid AS dst FROM edges
  UNION ALL
  SELECT target_node_uuid, source_node_uuid FROM edges
),
nbrs AS MATERIALIZED (
  SELECT src, dst, count(*) AS weight FROM sym
  WHERE src <> dst GROUP BY src, dst
),
entities2 AS (
  SELECT group_id, name, sha256(group_id || '|' || name) AS uuid
  FROM (SELECT DISTINCT group_id, subj_name AS name FROM triples
        UNION SELECT DISTINCT group_id, obj_name FROM triples) n
),
l0 AS (SELECT DISTINCT src AS uuid, src AS community FROM nbrs),
{lp_chain},
members AS (
  SELECT e.group_id, l.community, e.uuid, e.name
  FROM entities2 e JOIN l{MAX_LP_ITERATIONS} l USING (uuid)
),
agg AS (
  SELECT group_id, community, count(*) AS member_count,
         min(uuid) AS min_member_uuid, min(name) AS min_member_name
  FROM members GROUP BY group_id, community
)"""
    q["communities"] = f"""WITH {comm_chain}
SELECT sha256(group_id || '|' || 'community|' || min_member_uuid) AS uuid,
       'community ' || min_member_name AS name,
       group_id, member_count
FROM agg ORDER BY uuid"""

    # Community similarity channel (r5 — reference
    # community_similarity_search, search_utils.py:1022-1129): cosine
    # top-k over community name embeddings. The Spark query swaps the
    # hash name_embedding for a parquet vector keyed by the first 4 hex
    # chars of the community uuid (the _map_edge_embeddings device), so
    # DuckDB reproduces score AND ranking exactly.
    q["communities_cosine"] = f"""WITH {comm_chain},
cm AS (
  SELECT sha256(group_id || '|' || 'community|' || min_member_uuid) AS uuid
  FROM agg
),
cm_map AS (
  SELECT uuid,
         (
           (strpos('0123456789abcdef', substr(uuid, 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(uuid, 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(uuid, 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(uuid, 4, 1)) - 1)
         ) % (SELECT count(*) FROM embeddings) AS vec_id
  FROM cm
),
cm_qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
cm_scored AS (
  SELECT m.uuid AS id,
         round(
           list_inner_product(CAST(e.embedding AS DOUBLE[]), (SELECT q FROM cm_qv))
           / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_inner_product((SELECT q FROM cm_qv), (SELECT q FROM cm_qv)))),
         4) AS score
  FROM cm_map m JOIN embeddings e ON e.vec_id = m.vec_id
),
cm_topk AS (SELECT * FROM cm_scored ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM cm_topk ORDER BY rank"""

    # G4 INCREMENTAL community maintenance (communities.update_communities
    # wired into ingest_incremental): prior graph = the first 20-doc
    # block of every 40 with its LP communities; batch = the other
    # block. The split is WITHIN groups on purpose: group_id = source =
    # src(doc_id % 20), so a doc_id-parity split would put the halves in
    # DISJOINT graph partitions (entity uuid embeds group_id) and both
    # placement arms would be vacuously empty. Every batch-resolved
    # canonical is placed direct-or-neighbor-mode against the PRIOR
    # memberships over the MERGED adjacency (reference update_community,
    # community_operations.py:246-331). The oracle re-derives all three
    # graphs (prior/batch/merged) in prefixed CTE chains. NOTE: on this
    # gazetteer corpus the uuid_map is the identity (no fuzzy-name
    # merges, same simplification every node/edge oracle relies on), so
    # the canonical-re-point remap arm never fires here — that arm is
    # pinned by tests/test_incremental_communities.py instead.
    def _prior_chain(prefix: str, half_pred: str, with_triples: bool) -> str:
        p = prefix
        chain = f"""
{p}pages AS (
  SELECT {SQL_URL} AS url, text, source AS group_id, doc_id
  FROM documents WHERE {half_pred}
),
{p}episodes AS (
  SELECT sha256(url) AS uuid, group_id, text AS content FROM {p}pages
),
{p}toks AS (
  SELECT uuid AS episode_uuid, group_id,
         unnest(string_split(content, ' ')) AS tok,
         generate_subscripts(string_split(content, ' '), 1) - 1 AS pos
  FROM {p}episodes
),
{p}tagged AS (
  SELECT *, lag(tok) OVER (PARTITION BY episode_uuid ORDER BY pos) AS prev_tok
  FROM {p}toks WHERE tok <> ''
),
{p}mention_pos AS (
  SELECT episode_uuid, group_id, pos,
         CASE WHEN prev_tok IN {ADJS} THEN prev_tok || ' ' || tok
              ELSE tok END AS name
  FROM {p}tagged WHERE tok IN {NOUNS}
)"""
        if not with_triples:
            return chain
        return chain + f""",
{p}stream AS (
  SELECT episode_uuid, group_id, pos, name, CAST(NULL AS VARCHAR) AS verb
  FROM {p}mention_pos
  UNION ALL
  SELECT episode_uuid, group_id, pos, NULL, tok
  FROM {p}tagged WHERE tok IN {VERBS}
),
{p}win AS (
  SELECT *,
    last_value(name IGNORE NULLS) OVER (
      PARTITION BY episode_uuid ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS subj_name,
    first_value(name IGNORE NULLS) OVER (
      PARTITION BY episode_uuid ORDER BY pos
      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS obj_name
  FROM {p}stream
),
{p}triples AS (
  SELECT DISTINCT group_id, subj_name, upper(verb) AS pred, obj_name,
         subj_name || ' ' || verb || ' ' || obj_name AS fact
  FROM {p}win
  WHERE verb IS NOT NULL AND subj_name IS NOT NULL
    AND obj_name IS NOT NULL AND subj_name <> obj_name
)"""

    p_lp_rounds = []
    for i in range(1, MAX_LP_ITERATIONS + 1):
        p_lp_rounds.append(
            f"""p_l{i} AS MATERIALIZED (
  SELECT v.src AS uuid, max(struct_pack(w := v.w, c := v.nbr_comm))['c'] AS community
  FROM (
    SELECT n.src, l.community AS nbr_comm, sum(n.weight) AS w
    FROM p_nbrs n JOIN p_l{i - 1} l ON l.uuid = n.dst
    GROUP BY n.src, l.community
  ) v GROUP BY v.src
)"""
        )
    _COMM_INCR_CTES = f"""WITH {EDGES_CTE},
m_sym AS (
  SELECT source_node_uuid AS src, target_node_uuid AS dst FROM edges
  UNION ALL
  SELECT target_node_uuid, source_node_uuid FROM edges
),
m_nbrs AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM m_sym WHERE src <> dst
),
{_prior_chain('p_', COMM_INCR_PRIOR_PRED, True)},
p_edges AS (
  SELECT DISTINCT group_id,
         sha256(group_id || '|' || subj_name) AS source_node_uuid,
         sha256(group_id || '|' || obj_name) AS target_node_uuid,
         pred, fact
  FROM p_triples
),
p_sym AS (
  SELECT source_node_uuid AS src, target_node_uuid AS dst FROM p_edges
  UNION ALL
  SELECT target_node_uuid, source_node_uuid FROM p_edges
),
p_nbrs AS MATERIALIZED (
  SELECT src, dst, count(*) AS weight FROM p_sym
  WHERE src <> dst GROUP BY src, dst
),
p_l0 AS (SELECT DISTINCT src AS uuid, src AS community FROM p_nbrs),
{','.join(p_lp_rounds)},
p_ents AS (
  SELECT group_id, name, sha256(group_id || '|' || name) AS uuid
  FROM (SELECT DISTINCT group_id, subj_name AS name FROM p_triples
        UNION SELECT DISTINCT group_id, obj_name FROM p_triples) t
),
p_members AS (
  SELECT e.group_id, l.community, e.uuid, e.name
  FROM p_ents e JOIN p_l{MAX_LP_ITERATIONS} l USING (uuid)
),
p_agg AS (
  SELECT group_id, community, count(*) AS member_count,
         min(uuid) AS min_member_uuid, min(name) AS min_member_name
  FROM p_members GROUP BY group_id, community
),
p_comms AS MATERIALIZED (
  SELECT sha256(group_id || '|' || 'community|' || min_member_uuid) AS uuid,
         'community ' || min_member_name AS name,
         group_id, member_count, community
  FROM p_agg
),
p_hm AS MATERIALIZED (
  SELECT c.uuid AS community_uuid, m.uuid AS entity_uuid
  FROM p_members m
  JOIN p_comms c ON c.community = m.community AND c.group_id = m.group_id
),
{_prior_chain('b_', COMM_INCR_BATCH_PRED, False)},
b_ents AS (
  SELECT DISTINCT group_id, name, sha256(group_id || '|' || name) AS uuid
  FROM b_mention_pos
),
ci_direct AS (
  SELECT b.uuid, h.community_uuid, FALSE AS is_new
  FROM b_ents b JOIN p_hm h ON h.entity_uuid = b.uuid
),
ci_votes AS (
  SELECT u.uuid, h.community_uuid, count(*) AS n
  FROM (SELECT uuid FROM b_ents
        WHERE uuid NOT IN (SELECT uuid FROM ci_direct)) u
  JOIN m_nbrs nb ON nb.src = u.uuid
  JOIN p_hm h ON h.entity_uuid = nb.dst
  GROUP BY u.uuid, h.community_uuid
),
ci_by_nbr AS (
  SELECT uuid,
         min(struct_pack(negn := -n, c := community_uuid))['c']
           AS community_uuid,
         TRUE AS is_new
  FROM ci_votes GROUP BY uuid
),
ci_assigned AS MATERIALIZED (
  SELECT * FROM ci_direct UNION ALL SELECT * FROM ci_by_nbr
),
ci_added AS (
  SELECT community_uuid, count(*) AS n_added
  FROM ci_assigned WHERE is_new GROUP BY community_uuid
)"""
    q["communities_incremental"] = f"""{_COMM_INCR_CTES}
SELECT c.uuid, c.name, c.group_id,
       c.member_count + coalesce(a.n_added, 0) AS member_count
FROM p_comms c LEFT JOIN ci_added a ON a.community_uuid = c.uuid
ORDER BY c.uuid"""
    q["has_member_incremental"] = f"""{_COMM_INCR_CTES}
SELECT community_uuid, entity_uuid FROM p_hm
UNION ALL
SELECT community_uuid, uuid AS entity_uuid FROM ci_assigned WHERE is_new
ORDER BY community_uuid, entity_uuid"""

    # Q5 MMR: the greedy selection UNROLLED to limit steps (argmax of
    # λ·sim_q − (1−λ)·max-sim-to-picked over the unpicked top-20
    # candidates; ties → lowest id; score = selection-time MMR value).
    mmr_steps = []
    for i in range(2, 11):
        mmr_steps.append(
            f"""pick{i} AS MATERIALIZED (
  SELECT c.id, c.u, c.sq,
         round(0.5 * c.sq - 0.5 * (
           SELECT max(list_inner_product(c.u, p.u)) FROM sel{i - 1} p
         ), 4) + 0.0 AS mmr, {i} AS rank
  FROM simq c WHERE c.id NOT IN (SELECT id FROM sel{i - 1})
  ORDER BY mmr DESC, c.id ASC LIMIT 1
),
sel{i} AS MATERIALIZED (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM pick{i})"""
        )
    mmr_chain = ",\n".join(mmr_steps)
    q["mmr_embeddings"] = f"""WITH
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         round(
           list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT q FROM qv))
           / (sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
              * sqrt(list_inner_product((SELECT q FROM qv), (SELECT q FROM qv)))),
         4) AS s
  FROM embeddings
),
cands AS (SELECT id, v FROM scored ORDER BY s DESC, id ASC LIMIT 20),
unitq AS (
  SELECT list_transform(q, x -> x / sqrt(list_inner_product(q, q))) AS uq
  FROM qv
),
unitc AS (
  SELECT id,
         list_transform(v, x -> x / (CASE WHEN sqrt(list_inner_product(v, v)) = 0
                                          THEN 1.0
                                          ELSE sqrt(list_inner_product(v, v)) END)) AS u
  FROM cands
),
simq AS MATERIALIZED (
  SELECT id, u, list_inner_product(u, (SELECT uq FROM unitq)) AS sq
  FROM unitc
),
sel1 AS MATERIALIZED (
  SELECT id, u, sq, round(0.5 * sq, 4) + 0.0 AS mmr, 1 AS rank
  FROM simq ORDER BY round(0.5 * sq, 4) DESC, id ASC LIMIT 1
),
{mmr_chain}
SELECT id, mmr AS score, CAST(rank AS INT) AS rank
FROM sel10 ORDER BY rank"""

    # D16 edge duplicate pairs (src1): same endpoints + (word overlap OR
    # fact cosine ≥ 0.6). The SQL encodes the overlap half exactly; on
    # this corpus facts sharing endpoints always share words (verified:
    # 0 cosine-only pairs), so overlap-only IS the full prediction — any
    # Spark-side drift in the cosine branch breaks the row/hash match,
    # and the cosine branch itself is pinned by test_edge_dedup.py.
    q["edge_dup_pairs_src1"] = f"""WITH {EDGES_CTE},
e1 AS (SELECT * FROM edges WHERE group_id = 'src1'),
pairs AS (
  SELECT a.uuid AS src, b.uuid AS dst
  FROM e1 a JOIN e1 b
    ON a.source_node_uuid = b.source_node_uuid
   AND a.target_node_uuid = b.target_node_uuid
   AND a.uuid < b.uuid
  WHERE len(list_intersect(
          list_distinct(string_split(lower(a.fact), ' ')),
          list_distinct(string_split(lower(b.fact), ' ')))) > 0
)
SELECT DISTINCT src, dst FROM pairs ORDER BY src, dst"""

    # T4 candidate generation (fully oracled from r3 — was rows-only):
    # the Spark query maps each src1 edge to a parquet embedding by the
    # first 4 hex chars of its uuid mod |embeddings| (the
    # hybrid_search_edges device), so every stage of
    # invalidation_candidates is reproducible: per-endpoint top-64 cap
    # (valid_at DESC NULLS LAST, uuid), either-endpoint join, exact
    # cosine ≥ 0.1 gate, DISTINCT, per-new-edge top-10 (cos DESC, uuid).
    q["invalidation_candidates"] = f"""WITH {EDGES_CTE},
ic_edges AS MATERIALIZED (
  SELECT uuid, source_node_uuid, target_node_uuid, valid_at,
         (
           (strpos('0123456789abcdef', substr(uuid, 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(uuid, 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(uuid, 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(uuid, 4, 1)) - 1)
         ) % (SELECT count(*) FROM embeddings) AS vec_id
  FROM edges WHERE group_id = 'src1'
),
ic_vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ic_mapped AS MATERIALIZED (
  SELECT e.uuid, e.source_node_uuid, e.target_node_uuid, e.valid_at, v.v
  FROM ic_edges e JOIN ic_vecs v USING (vec_id)
),
ic_new AS (SELECT * FROM ic_mapped ORDER BY uuid LIMIT 5),
ic_new_sides AS (
  SELECT uuid AS new_uuid,
         unnest([source_node_uuid, target_node_uuid]) AS endpoint,
         v AS new_v
  FROM ic_new
),
ic_old_exp AS (
  SELECT uuid AS candidate_uuid,
         unnest([source_node_uuid, target_node_uuid]) AS endpoint,
         v AS old_v, valid_at
  FROM ic_mapped
),
ic_old_capped AS (
  SELECT candidate_uuid, endpoint, old_v FROM (
    SELECT *, row_number() OVER (PARTITION BY endpoint
        ORDER BY valid_at DESC NULLS LAST, candidate_uuid) AS ep_rn
    FROM ic_old_exp
  ) WHERE ep_rn <= 64
),
ic_gated AS (
  SELECT DISTINCT new_uuid, candidate_uuid, cos FROM (
    SELECT n.new_uuid, o.candidate_uuid,
           round(list_inner_product(n.new_v, o.old_v)
                 / (sqrt(list_inner_product(n.new_v, n.new_v))
                    * sqrt(list_inner_product(o.old_v, o.old_v))), 4) AS cos
    FROM ic_new_sides n JOIN ic_old_capped o USING (endpoint)
    WHERE n.new_uuid <> o.candidate_uuid
  ) WHERE cos >= 0.1
)
SELECT new_uuid, candidate_uuid, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY new_uuid
      ORDER BY cos DESC NULLS LAST, candidate_uuid) AS rn
  FROM ic_gated
) WHERE rn <= 10 ORDER BY new_uuid, candidate_uuid"""

    # Canonical docs: near-dup pairs (word Jaccard ≥ 0.95, the
    # docs_near_dup ground truth) → connected components as 16 unrolled
    # MIN-PROPAGATION rounds (each node adopts the min label within one
    # hop; after k rounds it holds the min within distance k — the same
    # fixpoint family as the Spark CC, implemented independently). 16
    # rounds cover any cluster radius this corpus can produce (replica
    # clusters are near-cliques, radius 1-2); a recursive-CTE transitive
    # closure gives identical output 7× slower (measured).
    q["docs_canonical"] = """WITH
s AS MATERIALIZED (
  SELECT doc_id AS id,
         list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
  FROM documents
),
p AS MATERIALIZED (
  SELECT a.id AS a_id, b.id AS b_id
  FROM s a JOIN s b ON a.id < b.id
  WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        / len(list_distinct(list_concat(a.w, b.w))) >= 0.95
),
sym AS MATERIALIZED (
  SELECT a_id AS a, b_id AS b FROM p
  UNION SELECT b_id, a_id FROM p
),
r0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS m FROM documents),
r1 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r0 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r0 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r2 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r1 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r1 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r3 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r2 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r2 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r4 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r3 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r3 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r5 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r4 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r4 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r6 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r5 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r5 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r7 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r6 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r6 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r8 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r7 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r7 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r9 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r8 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r8 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r10 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r9 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r9 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r11 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r10 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r10 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r12 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r11 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r11 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r13 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r12 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r12 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r14 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r13 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r13 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r15 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r14 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r14 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
),
r16 AS MATERIALIZED (
  SELECT v.id, least(v.m, coalesce(n.m, v.m)) AS m
  FROM r15 v
  LEFT JOIN (
    SELECT s.a AS id, min(r.m) AS m
    FROM sym s JOIN r15 r ON r.id = s.b
    GROUP BY s.a
  ) n USING (id)
)
SELECT id, m AS canonical_id FROM r16 ORDER BY id"""

    # Incremental canonical maintenance (r4): the ground truth for the
    # touched-components-only update IS the full rebuild over the union —
    # the Spark side recomputes only components the batch's pairs touch
    # and passes every other prior row through, so hash equality with the
    # identical docs_canonical closure proves incremental ≡ rebuild
    # (including new docs bridging two prior components).
    q["docs_canonical_incremental"] = q["docs_canonical"]

    # Contrastive triples (dedup_docs.contrastive_pairs): positives by
    # brute-force Jaccard ≥ 0.95 (no LSH), negatives re-derived by the
    # DIRECT rank join (Spark uses the bucketed-interval equi-join —
    # different formulation, identical draws; unit weights make the
    # inverse-CDF the doc-id rank). cp_ prefix.
    _cp_u = (
        "(('0x' || substr(sha256('cneg:' || CAST(anchor AS VARCHAR) || ':'"
        " || CAST(pos AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 13))"
        "::UBIGINT / 4503599627370496.0)"
    )
    q["docs_contrastive_pairs"] = f"""WITH
cp_s AS MATERIALIZED (
  SELECT doc_id AS id,
         list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
  FROM documents
),
cp_p AS MATERIALIZED (
  SELECT a.id AS a_id, b.id AS b_id
  FROM cp_s a JOIN cp_s b ON a.id < b.id
  WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        / len(list_distinct(list_concat(a.w, b.w))) >= 0.95
),
cp_sym AS (
  SELECT a_id AS anchor, b_id AS pos FROM cp_p
  UNION ALL SELECT b_id, a_id FROM cp_p
),
cp_rank AS MATERIALIZED (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS r
  FROM documents
),
cp_tot AS (SELECT COUNT(*) AS total FROM documents),
cp_draws AS (
  SELECT anchor, pos, j,
         CAST(floor({_cp_u} * t.total) AS BIGINT) AS t
  FROM cp_sym, (SELECT unnest(range(0, 3)) AS j), cp_tot t
)
SELECT d.anchor, d.pos, CAST(d.j AS INT) AS neg_idx,
       r.doc_id AS negative
FROM cp_draws d JOIN cp_rank r ON r.r = d.t
ORDER BY d.anchor, d.pos, neg_idx"""

    # Per-host near-dup rate (dedup_docs.dup_rate_by_group): the same
    # canonical closure, grouped by the closed-form host, 1 − C/N in
    # one exact-integer IEEE division.
    from graphiti_spark.sources.links import CANON_MOD, _SQL_HOSTS

    q["docs_dup_rate_by_host"] = q["docs_canonical"].replace(
        "SELECT id, m AS canonical_id FROM r16 ORDER BY id",
        f"""SELECT h.host, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT r.m) AS BIGINT) AS n_clusters,
       round(1.0 - CAST(COUNT(DISTINCT r.m) AS DOUBLE) / COUNT(*), 4)
         + 0.0 AS dup_rate
FROM r16 r
JOIN (SELECT doc_id AS id,
             ({_SQL_HOSTS})[CAST((doc_id % {CANON_MOD}) % 7 AS INT) + 1]
               AS host
      FROM documents) h USING (id)
GROUP BY h.host ORDER BY h.host""",
    )

    # Edit-distance-1 similarity join (dedup_docs.edit_distance_pairs):
    # brute-force all-pairs Levenshtein ground truth — the hash match
    # also proves the half-segment pigeonhole blocking has FULL RECALL
    # on this corpus (the docs_near_dup adjudication style). ed_ prefix.
    q["docs_edit_distance_pairs"] = """WITH ed_s AS (
  SELECT doc_id AS id,
         substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                1, 32) AS s
  FROM documents
)
SELECT a.id AS a_id, b.id AS b_id,
       CAST(levenshtein(a.s, b.s) AS INT) AS dist
FROM ed_s a JOIN ed_s b ON a.id < b.id
WHERE levenshtein(a.s, b.s) <= 1
ORDER BY a_id, b_id"""

    # Near-dup cluster-size histogram: the identical canonical closure,
    # then two exact-integer aggregations.
    q["docs_cluster_sizes"] = q["docs_canonical"].replace(
        "SELECT id, m AS canonical_id FROM r16 ORDER BY id",
        """SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(cluster_size) AS BIGINT) AS n_docs
FROM (SELECT m, COUNT(*) AS cluster_size FROM r16 GROUP BY m)
GROUP BY cluster_size ORDER BY cluster_size""",
    )

    # Quality-based cluster representatives (dedup_docs.
    # representative_docs): the identical canonical closure joined to
    # the identical quality arithmetic (docs_quality's gates), winner =
    # (score desc, id asc) — DuckDB uses a window where Spark uses the
    # combinable min(struct); same result by construction.
    q["docs_representatives"] = q["docs_canonical"].replace(
        "SELECT id, m AS canonical_id FROM r16 ORDER BY id",
        """SELECT canonical_id, id AS rep_id,
       round(score, 4) + 0.0 AS rep_score,
       CAST(nm AS BIGINT) AS n_members
FROM (
  SELECT r.m AS canonical_id, r.id, sc.score,
         row_number() OVER (PARTITION BY r.m
                            ORDER BY sc.score DESC, r.id) AS rk,
         COUNT(*) OVER (PARTITION BY r.m) AS nm
  FROM r16 r
  JOIN (
    SELECT id,
      round(CAST(
        (CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0
              THEN 0.25 ELSE 0.0 END)
        + (CASE WHEN stop_ratio >= 0.01 THEN 0.25 ELSE 0.0 END)
        + (CASE WHEN alpha_ratio >= 0.8 THEN 0.25 ELSE 0.0 END)
        + (CASE WHEN distinct_ratio >= 0.2 THEN 0.25 ELSE 0.0 END)
        AS DOUBLE), 4) AS score
    FROM (
      SELECT doc_id AS id,
        CASE WHEN len(toks) > 0
             THEN CAST(list_sum(list_transform(toks, x -> length(x)))
                       AS DOUBLE) / len(toks)
             ELSE 0.0 END AS mean_len,
        CASE WHEN len(toks) > 0
             THEN CAST(len(list_filter(toks, x -> x IN
               ('the','and','of','to','a','in','is','it','that','for')))
               AS DOUBLE) / len(toks)
             ELSE 0.0 END AS stop_ratio,
        CASE WHEN length(text) > 0
             THEN CAST(length(regexp_replace(lower(text), '[^a-z ]', '',
                  'g')) AS DOUBLE) / length(text)
             ELSE 0.0 END AS alpha_ratio,
        CASE WHEN len(toks) > 0
             THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             ELSE 0.0 END AS distinct_ratio
      FROM (
        SELECT doc_id, text,
               list_filter(string_split(lower(trim(text)), ' '),
                           x -> x <> '') AS toks
        FROM documents
      )
    )
  ) sc ON sc.id = r.id
) WHERE rk = 1 ORDER BY canonical_id""",
    )

    # Leakage-safe split (operators/sampling.py split_by_cluster): the
    # identical canonical closure, then the 52-bit sha-uniform drawn on
    # the CLUSTER id and the same IEEE running-sum boundaries
    # (0.9, 0.9 + 0.05) — bit-identical CASE arms both engines.
    _sp_u = (
        "(('0x' || substr(sha256('split:' || CAST(m AS VARCHAR)), 1, 13))"
        "::UBIGINT / 4503599627370496.0)"
    )
    q["docs_split_clusters"] = q["docs_canonical"].replace(
        "SELECT id, m AS canonical_id FROM r16 ORDER BY id",
        f"""SELECT id, m AS canonical_id, {_sp_u} AS u,
       CASE WHEN {_sp_u} < 0.9 THEN 'train'
            WHEN {_sp_u} < 0.9 + 0.05 THEN 'val'
            ELSE 'test' END AS split
FROM r16 ORDER BY id""",
    )

    # Streamed versioned dedup state (operators/dedup_state.py): folding
    # per-batch updates over the feed must land on the same canonical
    # mapping as one full rebuild — the identical closure again.
    q["dedup_state_stream"] = q["docs_canonical"]

    # Takedown (operators/dedup_state.py remove_docs): repairing the
    # standing state after deleting the doc_id % 10 == 7 slice must land
    # on the same canonical mapping as a rebuild over the remaining
    # corpus — the identical closure with both `documents` scans
    # (shingle source + CC seed) filtered to the survivors.
    q["dedup_state_takedown"] = q["docs_canonical"].replace(
        "FROM documents", "FROM documents WHERE doc_id % 10 <> 7"
    )

    # Q1 composition, fully oracle-able twin: BM25 + cosine channels over
    # the documents/embeddings corpus fused with RRF (1/(rank-1+1)
    # contributions, round 4dp, ties → id asc). The edge-channel hybrid
    # stays rows-only because fact embeddings are engine-side hashes.
    q["hybrid_search_docs"] = """WITH
toks AS (
  SELECT doc_id AS id, unnest(string_split(lower(trim(text)), ' ')) AS term
  FROM documents
),
toks_ne AS (SELECT * FROM toks WHERE term <> ''),
postings AS (SELECT id, term, count(*) AS tf FROM toks_ne GROUP BY id, term),
doclen AS (SELECT id, count(*) AS dl FROM toks_ne GROUP BY id),
docfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
qterms AS (SELECT unnest(['fast','merge','table']) AS term),
bm25_scored AS (
  SELECT p.id,
         round(sum(
           ln(1.0 + (s.n_docs - d.df + 0.5)/(d.df + 0.5))
           * (CAST(p.tf AS DOUBLE) * 2.2)
           / (CAST(p.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))
         ), 4) AS score
  FROM postings p
  JOIN qterms USING (term) JOIN docfreq d USING (term)
  JOIN doclen l USING (id) CROSS JOIN stats s
  GROUP BY p.id
),
bm25_ranked AS (
  SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS rank
  FROM bm25_scored ORDER BY rank LIMIT 20
),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
cos_scored AS (
  SELECT vec_id AS id,
         round(
           list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT q FROM qv))
           / (sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
              * sqrt(list_inner_product((SELECT q FROM qv), (SELECT q FROM qv)))),
         4) AS score
  FROM embeddings
),
cos_ranked AS (
  SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS rank
  FROM cos_scored ORDER BY rank LIMIT 20
),
fused AS (
  SELECT id, round(sum(1.0 / CAST(rank AS DOUBLE)), 4) AS score
  FROM (SELECT * FROM bm25_ranked UNION ALL SELECT * FROM cos_ranked)
  GROUP BY id
),
topk AS (SELECT * FROM fused ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM topk ORDER BY rank"""

    # Q1 over GRAPH edges (fully oracled from r3 — was rows-only): the
    # Spark query maps each edge to a parquet embedding by the first 4
    # hex chars of its uuid mod |embeddings| and uses embeddings row 0
    # as the query vector, so both channels + RRF are reproducible.
    q["hybrid_search_edges"] = f"""WITH {EDGES_TEMPORAL_CTE},
hs_corpus AS MATERIALIZED (
  SELECT uuid AS id, lower(name || ' ' || fact) AS text,
         (
           (strpos('0123456789abcdef', substr(uuid, 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(uuid, 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(uuid, 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(uuid, 4, 1)) - 1)
         ) % (SELECT count(*) FROM embeddings) AS vec_id
  FROM edges_temporal
),
hs_toks AS (SELECT id, unnest(string_split(trim(text), ' ')) AS term FROM hs_corpus),
hs_toks_ne AS (SELECT * FROM hs_toks WHERE term <> ''),
hs_postings AS (SELECT id, term, count(*) AS tf FROM hs_toks_ne GROUP BY id, term),
hs_doclen AS (SELECT id, count(*) AS dl FROM hs_toks_ne GROUP BY id),
hs_docfreq AS (SELECT term, count(*) AS df FROM hs_postings GROUP BY term),
hs_stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM hs_doclen),
hs_qterms AS (SELECT unnest(['fast','merge','table']) AS term),
hs_bm25_scored AS (
  SELECT p.id,
         round(sum(
           ln(1.0 + (s.n_docs - d.df + 0.5)/(d.df + 0.5))
           * (CAST(p.tf AS DOUBLE) * 2.2)
           / (CAST(p.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))
         ), 4) AS score
  FROM hs_postings p
  JOIN hs_qterms USING (term) JOIN hs_docfreq d USING (term)
  JOIN hs_doclen l USING (id) CROSS JOIN hs_stats s
  GROUP BY p.id
),
hs_bm25_ranked AS (
  SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS rank
  FROM hs_bm25_scored ORDER BY rank LIMIT 20
),
hs_qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
hs_vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
hs_cos_scored AS (
  SELECT c.id,
         round(
           list_inner_product(v.v, (SELECT q FROM hs_qv))
           / (sqrt(list_inner_product(v.v, v.v))
              * sqrt(list_inner_product((SELECT q FROM hs_qv), (SELECT q FROM hs_qv)))),
         4) AS score
  FROM hs_corpus c JOIN hs_vecs v USING (vec_id)
),
hs_cos_ranked AS (
  SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS rank
  FROM hs_cos_scored ORDER BY rank LIMIT 20
),
hs_fused AS (
  SELECT id, round(sum(1.0 / CAST(rank AS DOUBLE)), 4) AS score
  FROM (SELECT * FROM hs_bm25_ranked UNION ALL SELECT * FROM hs_cos_ranked)
  GROUP BY id
),
hs_topk AS (SELECT * FROM hs_fused ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM hs_topk ORDER BY rank"""

    # Q9: AND-of-OR datetime filter tree over temporal edges.
    q["filtered_edges"] = f"""WITH {EDGES_TEMPORAL_CTE}
SELECT uuid, group_id, name,
       strftime(valid_at, '%Y-%m-%d %H:%M:%S') AS valid_at,
       strftime(invalid_at, '%Y-%m-%d %H:%M:%S') AS invalid_at
FROM edges_temporal
WHERE group_id IN ('src1', 'src3')
  AND (valid_at < TIMESTAMP '2024-01-02 00:00:00' OR invalid_at IS NOT NULL)
ORDER BY uuid"""

    # D2/D3/D4 kernels over raw text heads (fuzzy normalization, Shannon
    # entropy gate, 3-gram shingle cardinality — dedup_text.py twins of
    # reference dedup_helpers.py:45-94). Entropy via DuckDB list
    # comprehensions; the gate is boolean so no float renders/hashes.
    q["docs_name_kernels"] = r"""WITH base AS (
  SELECT doc_id, substr(text, 1, 80) AS s FROM documents
), norm AS (
  SELECT doc_id,
    regexp_replace(trim(regexp_replace(
      regexp_replace(lower(s), '\s+', ' ', 'g'),
      '[^a-z0-9'' ]', ' ', 'g')), '\s+', ' ', 'g') AS fuzzy_name
  FROM base
), stripped AS (
  SELECT doc_id, fuzzy_name, replace(fuzzy_name, ' ', '') AS sp,
         length(replace(fuzzy_name, ' ', '')) AS n
  FROM norm
), scored AS (
  SELECT doc_id, fuzzy_name, n,
    CASE WHEN n = 0 THEN 0.0 ELSE
      -list_sum([(c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE))
        FOR c IN [CAST(len(list_filter([sp[i] FOR i IN range(1, n + 1)],
                                       x -> x = ch)) AS DOUBLE)
                  FOR ch IN list_distinct([sp[i] FOR i IN range(1, n + 1)])]])
    END AS entropy,
    len(string_split(fuzzy_name, ' ')) AS tokens,
    CASE WHEN n = 0 THEN 0 WHEN n = 1 THEN 1 WHEN n = 2 THEN 0
         ELSE len(list_distinct([sp[i:i+2] FOR i IN range(1, n - 1)]))
    END AS n_shingles
  FROM stripped
)
SELECT doc_id, fuzzy_name,
       ((length(fuzzy_name) >= 6 OR tokens >= 2) AND entropy >= 1.5)
         AS entropy_ok,
       CAST(n_shingles AS BIGINT) AS n_shingles
FROM scored ORDER BY doc_id"""

    # G8: nodes mentioned by the 5 lexicographically-first episodes.
    q["mentioned_nodes"] = f"""WITH {NODES_CTE},
probe_eps AS (SELECT uuid FROM episodes ORDER BY uuid LIMIT 5),
hit AS (
  SELECT DISTINCT sha256(group_id || '|' || name) AS uuid
  FROM mentions
  WHERE episode_uuid IN (SELECT uuid FROM probe_eps)
)
SELECT n.uuid, n.name, n.group_id, n.mention_count, n.summary, n.label
FROM nodes n JOIN hit USING (uuid) ORDER BY n.uuid"""

    # The episode→subgraph fetch (reference graphiti.py:1155-1167
    # get_nodes_and_edges_by_episode): mentioned canonical nodes + every
    # edge carrying a probe episode in its provenance, for the 5
    # lexicographically-first episodes. Edge membership re-derives from
    # the triples relation (edge uuid is a pure function of the merge
    # key, so no provenance array is needed SQL-side).
    q["episode_subgraph"] = f"""WITH {NODES_CTE},
probe_eps AS (SELECT uuid FROM episodes ORDER BY uuid LIMIT 5),
hit AS (
  SELECT DISTINCT sha256(group_id || '|' || name) AS uuid
  FROM mentions WHERE episode_uuid IN (SELECT uuid FROM probe_eps)
),
node_rows AS (
  SELECT 'node' AS kind, n.uuid, n.name, n.group_id
  FROM nodes n JOIN hit USING (uuid)
),
edge_rows AS (
  SELECT DISTINCT 'edge' AS kind,
         sha256(group_id || '|' ||
                sha256(group_id || '|' || subj_name) || '|' ||
                sha256(group_id || '|' || obj_name) || '|' ||
                pred || '|' || fact) AS uuid,
         pred AS name, group_id
  FROM triples WHERE episode_uuid IN (SELECT uuid FROM probe_eps)
)
SELECT * FROM node_rows UNION ALL SELECT * FROM edge_rows
ORDER BY kind, uuid"""

    # Reverse provenance (r5 — reference get_episodes_by_mentions,
    # search_utils.py:113-125): episodes cited by the 5 lexicographically
    # first merged edges. The citation set re-derives from triples (edge
    # uuid is a pure function of the merge key), independently of the
    # Spark provenance arrays it proves.
    q["episodes_by_mentions"] = f"""WITH {EDGES_CTE},
ebm_probe AS (SELECT uuid FROM edges ORDER BY uuid LIMIT 5),
ebm_cited AS (
  SELECT DISTINCT t.episode_uuid AS uuid
  FROM triples t
  JOIN ebm_probe p ON p.uuid = sha256(t.group_id || '|' ||
        sha256(t.group_id || '|' || t.subj_name) || '|' ||
        sha256(t.group_id || '|' || t.obj_name) || '|' ||
        t.pred || '|' || t.fact)
)
SELECT e.uuid, e.name, e.group_id, e.content,
       strftime(e.valid_at, '%Y-%m-%d %H:%M:%S') AS valid_at
FROM episodes e JOIN ebm_cited c USING (uuid)
ORDER BY e.uuid LIMIT 10"""

    # Q6 deterministic cross-encoder stand-in: token overlap |q∩d|/|q|.
    q["cross_encoder_docs"] = r"""WITH toks AS (
  SELECT doc_id AS id,
         list_distinct(string_split_regex(lower(text), '\s+')) AS terms
  FROM documents
), scored AS (
  SELECT id,
         round(CAST(len(list_intersect(terms,
                ['fast', 'merge', 'table', 'window'])) AS DOUBLE) / 4.0, 4)
           AS score
  FROM toks
), topk AS (SELECT * FROM scored ORDER BY score DESC, id ASC LIMIT 10)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT) AS rank
FROM topk ORDER BY rank"""

    # ---- crawl front door: URL canonicalization / dedup / domains ----
    from graphiti_spark.operators.weblinks import MULTI_SUFFIXES
    from graphiti_spark.sources.links import SQL_CANON_CTE, SQL_LINKS_CTE

    # The Spark side canonicalizes the messy surface forms; the twin
    # asserts the closed-form EXPECTED canonical, so a hash match proves
    # the canonicalizer, not that two copies of the same regex agree.
    q["urls_canonical"] = f"""WITH {SQL_LINKS_CTE}, {SQL_CANON_CTE}
SELECT l.doc_id, l.url, c.url_canon
FROM links l JOIN canon_links c USING (doc_id)
ORDER BY l.doc_id"""

    # fetch_ts is strictly monotone in doc_id by construction, so the
    # min-struct(ts, id) winner is exactly (min ts, min id) per URL.
    q["urls_dedup"] = f"""WITH {SQL_CANON_CTE}
SELECT url_canon,
       strftime(min(fetch_ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       min(doc_id) AS winner_id,
       CAST(count(*) AS BIGINT) AS n_fetches
FROM canon_links GROUP BY url_canon ORDER BY url_canon"""

    _multi_sql = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    # Independent recomputation of the registered-domain rule from the
    # label list (last 2 labels, or last 3 over a known multi suffix).
    _rd_sql = f"""CASE
  WHEN len(string_split(host, '.')) <= 2 THEN host
  WHEN array_to_string(string_split(host, '.')[-2:], '.') IN ({_multi_sql})
       AND len(string_split(host, '.')) >= 3
    THEN array_to_string(string_split(host, '.')[-3:], '.')
  ELSE array_to_string(string_split(host, '.')[-2:], '.')
END"""
    _dom_links = f"""{SQL_CANON_CTE},
dom_hosts AS (
  SELECT doc_id, url_canon,
         regexp_extract(url_canon, '^[a-z0-9+.-]+://([^/]+)', 1) AS host
  FROM canon_links
),
dom_links AS (
  SELECT doc_id, url_canon, {_rd_sql} AS domain
  FROM dom_hosts
)"""

    q["domains_stats"] = f"""WITH {_dom_links}
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_fetches,
       CAST(count(DISTINCT url_canon) AS BIGINT) AS n_urls,
       round(avg(CAST(n_chars AS DOUBLE)), 4) + 0.0 AS avg_chars
FROM dom_links JOIN documents USING (doc_id)
GROUP BY domain ORDER BY domain"""

    q["urls_domain_filter"] = f"""WITH {_dom_links}
SELECT doc_id, domain, url_canon
FROM dom_links
WHERE domain NOT IN ('site4.net', 'site5.ac.uk')
ORDER BY doc_id"""

    # ---- CCNet-style bigram-LM perplexity (model: lang='en' slice) ----
    q["docs_perplexity"] = """WITH ppl_toks AS (
  SELECT doc_id AS id, lang,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS t
  FROM documents
),
ppl_pos AS (
  SELECT id, lang, t, unnest(range(1, len(t))) AS i FROM ppl_toks
),
ppl_doc_big AS MATERIALIZED (
  SELECT id, lang, t[i] AS w1, t[i + 1] AS w2 FROM ppl_pos
),
ppl_bigc AS MATERIALIZED (
  SELECT w1, w2, count(*) AS c12 FROM ppl_doc_big WHERE lang = 'en'
  GROUP BY 1, 2
),
ppl_pref AS MATERIALIZED (
  SELECT w1, sum(c12) AS c1 FROM ppl_bigc GROUP BY 1
),
ppl_voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM ppl_toks WHERE lang = 'en')
),
ppl_scored AS (
  SELECT d.id, count(*) AS n,
         sum(ln((coalesce(b.c12, 0) + 0.1)
                / (coalesce(p.c1, 0) + 0.1 * v.v))) AS lps
  FROM ppl_doc_big d
  LEFT JOIN ppl_bigc b ON d.w1 = b.w1 AND d.w2 = b.w2
  LEFT JOIN ppl_pref p ON d.w1 = p.w1
  CROSS JOIN ppl_voc v
  GROUP BY d.id
)
SELECT t.id, CAST(coalesce(s.n, 0) AS BIGINT) AS n_bigrams,
       round(exp(-s.lps / s.n), 4) + 0.0 AS ppl
FROM ppl_toks t LEFT JOIN ppl_scored s USING (id)
ORDER BY t.id"""

    # ---- DSIR hashed-n-gram importance weights (target: lang='en') ----
    q["docs_dsir_weights"] = """WITH ds_toks AS (
  SELECT doc_id AS id, lang,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS t
  FROM documents
),
ds_uni AS (SELECT id, lang, unnest(t) AS f FROM ds_toks),
ds_pos AS (
  SELECT id, lang, t, unnest(range(1, len(t))) AS i FROM ds_toks
),
ds_big AS (SELECT id, lang, t[i] || ' ' || t[i + 1] AS f FROM ds_pos),
ds_feat AS MATERIALIZED (
  SELECT id, lang,
         CAST(('0x' || substr(sha256('dsir:' || f), 1, 13))::UBIGINT % 64
              AS BIGINT) AS bucket
  FROM (SELECT * FROM ds_uni UNION ALL SELECT * FROM ds_big)
),
ds_tc AS (SELECT bucket, count(*) AS c FROM ds_feat WHERE lang = 'en' GROUP BY 1),
ds_rc AS (SELECT bucket, count(*) AS c FROM ds_feat GROUP BY 1),
ds_buckets AS (SELECT unnest(range(0, 64)) AS bucket),
ds_ratio AS MATERIALIZED (
  SELECT b.bucket,
         ln((coalesce(t.c, 0) + 1.0)
            / ((SELECT count(*) FROM ds_feat WHERE lang = 'en') + 64.0))
       - ln((coalesce(r.c, 0) + 1.0)
            / ((SELECT count(*) FROM ds_feat) + 64.0)) AS lr
  FROM ds_buckets b
  LEFT JOIN ds_tc t USING (bucket)
  LEFT JOIN ds_rc r USING (bucket)
),
ds_scored AS (
  SELECT f.id, count(*) AS n, sum(r.lr) AS lw
  FROM ds_feat f JOIN ds_ratio r USING (bucket) GROUP BY f.id
)
SELECT t.id, CAST(coalesce(s.n, 0) AS BIGINT) AS n_feats,
       round(coalesce(s.lw, 0.0), 4) + 0.0 AS logw
FROM ds_toks t LEFT JOIN ds_scored s USING (id)
ORDER BY t.id"""

    # ---- top-k TF-IDF keywords per document ----
    q["docs_tfidf_keywords"] = """WITH tk_terms AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split(lower(trim(text)), ' '),
                            x -> x <> '')) AS term
  FROM documents
),
tk_tf AS (SELECT id, term, count(*) AS tf FROM tk_terms GROUP BY 1, 2),
tk_df AS (SELECT term, count(*) AS df FROM tk_tf GROUP BY 1),
tk_n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
tk_scored AS (
  SELECT id, term,
         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) + 0.0 AS score
  FROM tk_tf JOIN tk_df USING (term) CROSS JOIN tk_n
),
tk_ranked AS (
  SELECT id, term, score,
         CAST(row_number() OVER (
           PARTITION BY id ORDER BY score DESC, term ASC) AS INT) AS rank
  FROM tk_scored
)
SELECT id, term, score, rank FROM tk_ranked WHERE rank <= 5
ORDER BY id, rank"""

    # ---- DeepWalk-style random walks (unrolled step chain) ----
    _wk_u = (
        "(('0x' || substr(sha256('walk:' || CAST(w.start AS VARCHAR) "
        "|| ':' || w.widx || ':' || {s}), 1, 13))::UBIGINT "
        "/ 4503599627370496.0)"
    )
    _wk_step = """wk_w{s} AS MATERIALIZED (
  SELECT w.start, w.widx, a.dst AS cur,
         CASE WHEN a.dst IS NULL THEN w.path
              ELSE list_append(w.path, a.dst) END AS path
  FROM wk_w{prev} w
  LEFT JOIN wk_deg d ON d.src = w.cur
  LEFT JOIN wk_adj a ON a.src = w.cur
    AND a.rank = CAST(floor({u} * d.deg) AS BIGINT)
)"""
    _wk_steps = ",\n".join(
        _wk_step.format(s=s, prev=s - 1, u=_wk_u.format(s=s))
        for s in (1, 2, 3)
    )
    _wk_base = """wk_edges AS (
  SELECT DISTINCT l_suppkey AS src, l_partkey + 1000000 AS dst
  FROM lineitem
  UNION
  SELECT DISTINCT l_partkey + 1000000 AS src, l_suppkey AS dst
  FROM lineitem
),
wk_adj AS MATERIALIZED (
  SELECT src, dst,
         CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
              AS BIGINT) AS rank
  FROM wk_edges
),
wk_deg AS MATERIALIZED (
  SELECT src, count(*) AS deg FROM wk_edges GROUP BY 1
)"""
    _wk_chain = f"""{_wk_base},
wk_w0 AS (
  SELECT src AS start, CAST(widx AS INT) AS widx, src AS cur,
         [src] AS path
  FROM wk_deg, (SELECT unnest(range(0, 2)) AS widx)
),
{_wk_steps}"""

    q["parts_walks"] = f"""WITH {_wk_chain}
SELECT start, widx, array_to_string(path, '-') AS path_str
FROM wk_w3 ORDER BY start, widx"""

    # skip-gram pairs: per position, the ±window slice minus self
    # (identical slice algebra to walks.skipgram_pairs, 1-based here).
    q["parts_skipgrams"] = f"""WITH {_wk_chain}
SELECT start, widx, CAST(i - 1 AS INT) AS pos, path[i] AS center,
       unnest(list_concat(
         path[greatest(1, i - 2):i - 1],
         path[i + 1:least(len(path), i + 2)])) AS context
FROM wk_w3, unnest(range(1, len(path) + 1)) AS r(i)
ORDER BY start, widx, pos, context"""

    # negative sampling: same integer inverse-CDF arithmetic, but via
    # the DIRECT interval join (the Spark side uses the bucketed
    # equi-join) — two formulations must produce identical draws.
    q["parts_skipgram_negatives"] = f"""WITH {_wk_chain},
sg_pairs AS MATERIALIZED (
  SELECT start, widx, CAST(i - 1 AS INT) AS pos, path[i] AS center,
         unnest(list_concat(
           path[greatest(1, i - 2):i - 1],
           path[i + 1:least(len(path), i + 2)])) AS context
  FROM wk_w3, unnest(range(1, len(path) + 1)) AS r(i)
),
ng_freq AS (SELECT center AS node, count(*) AS cnt FROM sg_pairs GROUP BY 1),
ng_cum AS MATERIALIZED (
  SELECT node, cnt,
         CAST(sum(cnt) OVER (ORDER BY node) - cnt AS BIGINT) AS lo,
         CAST(sum(cnt) OVER (ORDER BY node) AS BIGINT) AS hi
  FROM ng_freq
),
ng_tot AS (SELECT max(hi) AS total, count(*) AS n_vocab FROM ng_cum),
ng_draws AS MATERIALIZED (
  SELECT p.*, CAST(nidx.neg_idx AS INT) AS neg_idx,
         CAST(floor(
           (('0x' || substr(sha256('neg:' || CAST(p.start AS VARCHAR)
              || ':' || p.widx || ':' || p.pos || ':' || p.context
              || ':' || nidx.neg_idx), 1, 13))::UBIGINT
            / 4503599627370496.0) * t.total) AS BIGINT) AS t
  FROM sg_pairs p, (SELECT unnest(range(0, 2)) AS neg_idx) nidx, ng_tot t
)
SELECT d.start, d.widx, d.pos, d.center, d.context, d.neg_idx,
       c.node AS negative
FROM ng_draws d JOIN ng_cum c ON d.t >= c.lo AND d.t < c.hi
ORDER BY d.start, d.widx, d.pos, d.context, d.neg_idx"""

    # Salted two-phase top-k (operators/topk.py): DuckDB runs the PLAIN
    # unsalted window — equality proves the salt never changes the
    # answer. st_ prefix.
    q["parts_salted_topk"] = """WITH st_li AS (
  SELECT l_suppkey AS suppkey, l_partkey AS partkey,
         l_orderkey AS orderkey, CAST(l_quantity AS DOUBLE) AS quantity
  FROM lineitem
)
SELECT suppkey, partkey, orderkey, quantity, CAST(rn AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY suppkey
    ORDER BY quantity DESC, partkey ASC, orderkey ASC) AS rn
  FROM st_li
) WHERE rn <= 3 ORDER BY suppkey, rn"""

    # Composed walk-corpus export (jobs/export_walk_corpus.py shape):
    # the same draw chain as parts_skipgram_negatives, folded into
    # per-pair ORDERED negative lists on the DISTINCT pair key and
    # joined back — duplicate pair rows (path a-b-a windows) each keep
    # their own k negatives, exactly the job's rule.
    q["parts_walk_corpus"] = q["parts_skipgram_negatives"].replace(
        """SELECT d.start, d.widx, d.pos, d.center, d.context, d.neg_idx,
       c.node AS negative
FROM ng_draws d JOIN ng_cum c ON d.t >= c.lo AND d.t < c.hi
ORDER BY d.start, d.widx, d.pos, d.context, d.neg_idx""",
        """SELECT p.start, p.widx, p.pos, p.center, p.context, n.negatives
FROM sg_pairs p JOIN (
  SELECT d.start, d.widx, d.pos, d.center, d.context,
         list(c.node ORDER BY d.neg_idx) AS negatives
  FROM (SELECT DISTINCT * FROM ng_draws) d
  JOIN ng_cum c ON d.t >= c.lo AND d.t < c.hi
  GROUP BY d.start, d.widx, d.pos, d.center, d.context
) n USING (start, widx, pos, center, context)
ORDER BY p.start, p.widx, p.pos, p.context""",
    )

    # ---- node2vec second-order biased walks (unrolled step chain) ----
    # same base graph; step >= 2 scores every neighbor of cur against
    # prev with INTEGER weights (ret/near/far = 4/2/1 i.e. p=0.5, q=2)
    # and picks by exact weighted inverse-CDF over the rank-ordered
    # cumsum — bit-identical to walks.biased_walks.
    _n2v_u = (
        "(('0x' || substr(sha256('n2v:' || CAST({a}.start AS VARCHAR) "
        "|| ':' || {a}.widx || ':' || {s}), 1, 13))::UBIGINT "
        "/ 4503599627370496.0)"
    )
    _n2v_step = """n2v_c{s} AS MATERIALIZED (
  SELECT w.start, w.widx, w.prev, w.cur, w.path, a.dst AS cand, a.rank,
         CASE WHEN a.dst IS NULL THEN 1
              WHEN a.dst = w.prev THEN 4
              WHEN e.src IS NOT NULL THEN 2
              ELSE 1 END AS wt
  FROM n2v_w{prev} w
  LEFT JOIN wk_adj a ON a.src = w.cur
  LEFT JOIN wk_adj e ON e.src = w.prev AND e.dst = a.dst
),
n2v_w{s} AS MATERIALIZED (
  SELECT start, widx, cur AS prev, cand AS cur,
         CASE WHEN cand IS NULL THEN path
              ELSE list_append(path, cand) END AS path
  FROM (
    SELECT c.*,
           sum(wt) OVER (PARTITION BY c.start, c.widx
                         ORDER BY c.rank) AS cum,
           sum(wt) OVER (PARTITION BY c.start, c.widx) AS tot
    FROM n2v_c{s} c
  ) c
  WHERE CAST(floor({u} * tot) AS BIGINT) >= cum - wt
    AND CAST(floor({u} * tot) AS BIGINT) < cum
)"""
    _n2v_steps = ",\n".join(
        _n2v_step.format(s=s, prev=s - 1, u=_n2v_u.format(s=s, a="c"))
        for s in (2, 3)
    )
    q["parts_biased_walks"] = f"""WITH {_wk_base},
n2v_w0 AS (
  SELECT src AS start, CAST(widx AS INT) AS widx, src AS cur,
         [src] AS path
  FROM wk_deg, (SELECT unnest(range(0, 2)) AS widx)
),
n2v_w1 AS MATERIALIZED (
  SELECT w.start, w.widx, w.cur AS prev, a.dst AS cur,
         CASE WHEN a.dst IS NULL THEN w.path
              ELSE list_append(w.path, a.dst) END AS path
  FROM n2v_w0 w
  LEFT JOIN wk_deg d ON d.src = w.cur
  LEFT JOIN wk_adj a ON a.src = w.cur
    AND a.rank = CAST(floor({_n2v_u.format(s=1, a="w")} * d.deg) AS BIGINT)
),
{_n2v_steps}
SELECT start, widx, array_to_string(path, '-') AS path_str
FROM n2v_w3 ORDER BY start, widx"""

    # ---- KMV distinct sketch (k=64 over token bigrams per lang) ----
    # The sketch result is a pure function of the distinct value set:
    # DuckDB recomputes the k smallest DISTINCT 52-bit hashes directly
    # (no bucketing needed — the Spark two-level build is provably
    # invariant to it) and applies the same (k-1)/u_(k) estimator.
    q["docs_distinct_kmv"] = """WITH kv_toks AS (
  SELECT lang,
         list_filter(string_split(lower(trim(text)), ' '),
                     x -> x <> '') AS t
  FROM documents
),
kv_bg AS (
  SELECT lang, t[i] || ' ' || t[i + 1] AS bg
  FROM kv_toks, unnest(range(1, len(t))) AS r(i)
),
kv_u AS (
  SELECT DISTINCT lang,
         (('0x' || substr(sha256('kmv:' || bg), 1, 13))::UBIGINT
          / 4503599627370496.0) AS u
  FROM kv_bg
),
kv_rk AS (
  SELECT lang, u,
         row_number() OVER (PARTITION BY lang ORDER BY u) AS rk
  FROM kv_u
),
kv_agg AS (
  SELECT lang, count(*) AS n_kept, max(u) AS kth
  FROM kv_rk WHERE rk <= 64 GROUP BY lang
)
SELECT lang, CAST(n_kept AS BIGINT) AS n_kept,
       round(CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
                  ELSE 63.0 / kth END, 4) + 0.0 AS est_distinct
FROM kv_agg ORDER BY lang"""

    # KMV cross-corpus Jaccard (sketch.kmv_jaccard): exact k-minima of
    # each half, then the identical Beyer-et-al union-minima estimator
    # (unrounded intermediates inside the products, 4 dp + IEEE −0
    # normalization at the edges — same house rules). kj_ prefix.
    q["docs_kmv_jaccard"] = """WITH kj_toks AS (
  SELECT doc_id % 2 AS side,
         list_filter(string_split(lower(trim(text)), ' '),
                     x -> x <> '') AS t
  FROM documents
),
kj_u AS (
  SELECT DISTINCT side,
         (('0x' || substr(sha256('kmv:' || t[i] || ' ' || t[i + 1]), 1, 13))
          ::UBIGINT / 4503599627370496.0) AS u
  FROM kj_toks, unnest(range(1, len(t))) AS r(i)
),
kj_rk AS (
  SELECT side, u, row_number() OVER (PARTITION BY side ORDER BY u) AS rk
  FROM kj_u
),
kj_a AS (SELECT u FROM kj_rk WHERE side = 0 AND rk <= 64),
kj_b AS (SELECT u FROM kj_rk WHERE side = 1 AND rk <= 64),
kj_m AS (
  SELECT u FROM (
    SELECT u, row_number() OVER (ORDER BY u) AS rk
    FROM (SELECT u FROM kj_a UNION SELECT u FROM kj_b)
  ) WHERE rk <= 64
),
kj_stats AS (
  SELECT (SELECT COUNT(*) FROM kj_m m
          WHERE EXISTS (SELECT 1 FROM kj_a a WHERE a.u = m.u)
            AND EXISTS (SELECT 1 FROM kj_b b WHERE b.u = m.u)) AS n_common,
         (SELECT COUNT(*) FROM kj_m) AS n_m,
         (SELECT max(u) FROM kj_m) AS kth
)
SELECT CAST(n_common AS BIGINT) AS n_common,
       CAST(n_m AS BIGINT) AS n_m,
       round(CAST(n_common AS DOUBLE) / n_m, 4) + 0.0 AS jaccard_est,
       round(CASE WHEN n_m < 64 THEN CAST(n_m AS DOUBLE)
                  ELSE 63.0 / kth END, 4) + 0.0 AS est_union,
       round((CAST(n_common AS DOUBLE) / n_m)
             * CASE WHEN n_m < 64 THEN CAST(n_m AS DOUBLE)
                    ELSE 63.0 / kth END, 4) + 0.0 AS est_intersection
FROM kj_stats"""

    # ---- heavy hitters (exact, threshold share >= 1/100) ----
    # The MG candidate pass is a bounded-shuffle implementation detail;
    # the final answer is the exact threshold query, which DuckDB runs
    # with no sketch at all. Integer threshold arithmetic on both sides.
    q["docs_heavy_hitters"] = """WITH hh_toks AS (
  SELECT unnest(list_filter(string_split(lower(trim(text)), ' '),
                x -> x <> '')) AS tok
  FROM documents
),
hh_n AS (SELECT count(*) AS n FROM hh_toks),
hh_c AS (SELECT tok, count(*) AS cnt FROM hh_toks GROUP BY 1)
SELECT tok AS value, CAST(cnt AS BIGINT) AS cnt,
       round(CAST(cnt AS DOUBLE) / n, 4) + 0.0 AS share
FROM hh_c CROSS JOIN hh_n
WHERE cnt * 100 >= n ORDER BY value"""

    # ---- bottom-k sample quantile sketch (sketch.bottomk_quantiles):
    # DuckDB recomputes the exact bottom-k-by-u sample (u = the same
    # 52-bit sha draw on the doc id, ties broken by value as in the
    # Spark struct sort) and the identical ceil(q·n)-rank estimator.
    # qs_ prefix. ----
    q["docs_token_quantile_sketch"] = """WITH qs_tok AS (
  SELECT lang, doc_id,
         len(list_filter(string_split(lower(trim(text)), ' '),
             x -> x <> '')) AS n_tok
  FROM documents
),
qs_u AS (
  SELECT lang, CAST(n_tok AS DOUBLE) AS v,
         (('0x' || substr(sha256('qsk:' || CAST(doc_id AS VARCHAR)), 1, 13))
          ::UBIGINT / 4503599627370496.0) AS u
  FROM qs_tok
),
qs_rk AS (
  SELECT lang, u, v,
         row_number() OVER (PARTITION BY lang ORDER BY u, v) AS rk,
         count(*) OVER (PARTITION BY lang) AS n_rows
  FROM qs_u
),
qs_samp AS (
  SELECT lang, v, n_rows,
         count(*) OVER (PARTITION BY lang) AS n_sample,
         row_number() OVER (PARTITION BY lang ORDER BY v, u) AS vrk
  FROM qs_rk WHERE rk <= 64
),
qs_q AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                        CAST(0.9 AS DOUBLE)]) AS q),
qs_est AS (
  SELECT s.lang, q.q, s.v, s.n_sample, s.n_rows
  FROM qs_samp s CROSS JOIN qs_q q
  WHERE s.vrk = greatest(1, CAST(ceil(q.q * s.n_sample) AS INT))
)
SELECT lang, q, round(v, 4) + 0.0 AS est,
       CAST(n_sample AS BIGINT) AS n_sample,
       CAST(n_rows AS BIGINT) AS n_rows,
       n_rows <= n_sample AS exact
FROM qs_est ORDER BY lang, q"""

    # ---- crawl link graph (closed-form expected edges, urls_canonical
    # adjudication style: DuckDB asserts what extraction + resolution +
    # canonicalization MUST produce, it never runs the regexes) ----
    from graphiti_spark.sources.links import (
        CANON_MOD,
        SQL_ANCHOR_EDGES_CTE,
        SQL_ANCHOR_HOSTS_CTE,
        SQL_ANCHOR_TEXT_CTE,
        _SQL_HOSTS,
    )

    q["page_links"] = f"""WITH {SQL_ANCHOR_EDGES_CTE}
SELECT doc_id AS id, src, dst FROM anchor_edges ORDER BY id, dst"""

    q["hosts_graph"] = f"""WITH {SQL_ANCHOR_HOSTS_CTE}
SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
FROM anchor_host_edges GROUP BY 1, 2 ORDER BY 1, 2"""

    # Host-scoped boilerplate removal (curation.strip_host_boilerplate):
    # the identical augmented column (nav line on every page of the
    # host; cookie line on even doc_ids ≈ the 0.5 threshold boundary),
    # the identical per-(host, normalized line) doc-frequency rule, and
    # the identical ordered reassembly. hb_ prefix — global CTE rule.
    q["docs_host_boilerplate"] = f"""WITH
hb_aug AS MATERIALIZED (
  SELECT doc_id AS id,
         ({_SQL_HOSTS})[CAST((doc_id % {CANON_MOD}) % 7 AS INT) + 1] AS host,
         'nav: ' || ({_SQL_HOSTS})[CAST((doc_id % {CANON_MOD}) % 7 AS INT) + 1]
           || ' home about' || chr(10)
           || CASE WHEN doc_id % 2 = 0
                   THEN 'cookie notice accept' || chr(10) ELSE '' END
           || text AS text
  FROM documents
),
hb_lines AS MATERIALIZED (
  SELECT id, host, unnest(generate_series(1, len(ls))) AS i, ls
  FROM (SELECT id, host, string_split(text, chr(10)) AS ls FROM hb_aug)
),
hb_l AS MATERIALIZED (
  SELECT id, host, i - 1 AS idx, ls[i] AS line,
         trim(lower(ls[i])) AS norm
  FROM hb_lines
),
hb_pages AS MATERIALIZED (
  SELECT host, COUNT(*) AS n_pages FROM hb_aug GROUP BY host
),
hb_boiler AS MATERIALIZED (
  SELECT f.host, f.norm
  FROM (SELECT host, norm, COUNT(DISTINCT id) AS n_docs
        FROM hb_l GROUP BY 1, 2) f
  JOIN hb_pages p USING (host)
  WHERE p.n_pages >= 3 AND f.n_docs >= 0.5 * p.n_pages
),
hb_kept AS MATERIALIZED (
  SELECT l.* FROM hb_l l
  WHERE NOT EXISTS (SELECT 1 FROM hb_boiler b
                    WHERE b.host = l.host AND b.norm = l.norm)
),
hb_agg AS MATERIALIZED (
  SELECT id, string_agg(line, chr(10) ORDER BY idx) AS text_clean,
         COUNT(*) AS n_kept
  FROM hb_kept GROUP BY id
)
SELECT t.id, t.host,
       COALESCE(a.text_clean, '') AS text_clean,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_total - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped
FROM (SELECT id, host, len(string_split(text, chr(10))) AS n_total
      FROM hb_aug) t
LEFT JOIN hb_agg a USING (id)
ORDER BY t.id"""

    # Z-order keys (functions/zorder.py): DuckDB reconstructs the
    # Morton interleave BIT BY BIT — a different formulation than the
    # Spark magic-mask spread, so equality checks the arithmetic.
    q["docs_zorder_keys"] = """WITH zo AS (
  SELECT doc_id AS id,
         CAST(doc_id % 1048576 AS BIGINT) AS x,
         CAST(n_chars AS BIGINT) AS y
  FROM documents
)
SELECT id, x, y,
       CAST(
         list_sum(list_transform(range(0, 31),
           i -> (((x >> i) & 1) << (2 * i))
                + (((y >> i) & 1) << (2 * i + 1))))
       AS BIGINT) AS zkey
FROM zo ORDER BY id"""

    # Homoglyph folding (textnorm.fold_homoglyphs_col): translate()
    # has IDENTICAL semantics in both engines (chars beyond the
    # replacement string are deleted); src/dst/sample are the same
    # imported constants — zero manual duplication to drift. hg_ prefix.
    from graphiti_spark.textnorm import (
        HOMOGLYPH_DST,
        HOMOGLYPH_SAMPLE,
        HOMOGLYPH_SRC,
    )

    _hg_src = HOMOGLYPH_SRC.replace("'", "''")
    _hg_dst = HOMOGLYPH_DST.replace("'", "''")
    _hg_sample = (" " + HOMOGLYPH_SAMPLE).replace("'", "''")
    q["docs_fold_homoglyphs"] = f"""WITH hg_aug AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 2 = 0 THEN text || '{_hg_sample}'
              ELSE text END AS aug
  FROM documents
),
hg_f AS (
  SELECT id, aug, translate(aug, '{_hg_src}', '{_hg_dst}') AS folded
  FROM hg_aug
)
SELECT id, sha256(folded) AS folded_sha,
       CAST(length(aug) - length(folded) AS INT) AS n_deleted,
       folded <> aug AS changed
FROM hg_f ORDER BY id"""

    # Mojibake repair (textnorm.fix_mojibake_col): the chain is BUILT
    # from the same MOJIBAKE_TABLE in the same order, and the damaged
    # augmentation phrase is the same imported literal — zero manual
    # duplication to drift.
    from graphiti_spark.textnorm import MOJIBAKE_SAMPLE, MOJIBAKE_TABLE

    _mj = "text"
    for _bad, _good in MOJIBAKE_TABLE:
        _mj = f"replace({_mj}, '{_bad}', '{_good}')"
    q["docs_fix_mojibake"] = f"""WITH
mj_aug AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' {MOJIBAKE_SAMPLE}' ELSE text END AS text
  FROM documents
)
SELECT id, {_mj} AS text_fixed, ({_mj} <> text) AS changed
FROM mj_aug ORDER BY id"""

    # Per-domain quota (sampling.cap_per_group): identical draws,
    # identical window — QUALIFY row_number over (host, u, id).
    _dc_u = (
        "(('0x' || substr(sha256('cap:' || CAST(doc_id AS VARCHAR)), 1, 13))"
        "::UBIGINT / 4503599627370496.0)"
    )
    q["docs_domain_cap"] = f"""
SELECT doc_id AS id,
       ({_SQL_HOSTS})[CAST((doc_id % {CANON_MOD}) % 7 AS INT) + 1] AS host,
       {_dc_u} AS u
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY host ORDER BY u ASC, id ASC) <= 40
ORDER BY id"""

    # Training-order sharding (sampling.epoch_order): shard = floor of
    # the exact 52-bit uniform × 8 (power-of-two scale — exact in a
    # double), position = row_number over an independent draw.
    _eo_su = (
        "(('0x' || substr(sha256('epoch0:shard:' || CAST(doc_id AS VARCHAR)),"
        " 1, 13))::UBIGINT / 4503599627370496.0)"
    )
    _eo_pu = (
        "(('0x' || substr(sha256('epoch0:pos:' || CAST(doc_id AS VARCHAR)),"
        " 1, 13))::UBIGINT / 4503599627370496.0)"
    )
    q["docs_epoch_order"] = f"""
SELECT doc_id AS id,
       CAST(floor({_eo_su} * 8) AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY CAST(floor({_eo_su} * 8) AS INT)
         ORDER BY {_eo_pu} ASC, doc_id ASC) - 1 AS BIGINT) AS pos
FROM documents ORDER BY id"""

    # Anchor-text profile per link target (weblinks.anchor_text_profile):
    # the closed-form (src, dst, text) edges aggregated identically —
    # ref count, distinct-source count, '|'-joined sorted distinct texts
    # (the Spark side's max_texts=8 cap cannot bind: ≤3 distinct texts
    # per dst by construction).
    q["anchor_texts"] = f"""WITH {SQL_ANCHOR_TEXT_CTE}
SELECT dst, CAST(COUNT(*) AS BIGINT) AS n_refs,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS n_srcs,
       array_to_string(list_sort(list_distinct(list(t))), '|') AS texts
FROM anchor_text_edges GROUP BY dst ORDER BY dst"""

    # host PageRank: same unrolled exact-integer fixpoint as
    # parts_pagerank, over VARCHAR host ids (hp_ prefix — global CTE
    # namespace rule).
    _hp_iters = 4
    _hp_base = f"({15 * _pr_scale} // (100 * n.n))"
    _hp_cte = [
        SQL_ANCHOR_HOSTS_CTE.strip(),
        """hp_e AS MATERIALIZED (
  SELECT src_host AS id, dst_host AS dst FROM anchor_host_edges
)""",
        """hp_v AS MATERIALIZED (
  SELECT DISTINCT id
  FROM (SELECT id FROM hp_e UNION ALL SELECT dst AS id FROM hp_e)
)""",
        "hp_n AS MATERIALIZED (SELECT COUNT(*) AS n FROM hp_v)",
        """hp_l AS MATERIALIZED (
  SELECT e.id, e.dst, d.out_deg
  FROM hp_e e
  JOIN (SELECT id, COUNT(*) AS out_deg FROM hp_e GROUP BY id) d USING (id)
)""",
        f"""hp_r0 AS MATERIALIZED (
  SELECT v.id, {_pr_scale} // n.n AS rank_u FROM hp_v v CROSS JOIN hp_n n
)""",
    ]
    for _k in range(1, _hp_iters + 1):
        _hp_cte.append(f"""hp_c{_k} AS MATERIALIZED (
  SELECT l.dst AS id, SUM(r.rank_u // l.out_deg) AS s
  FROM hp_l l JOIN hp_r{_k - 1} r ON l.id = r.id GROUP BY l.dst
)""")
        _hp_cte.append(f"""hp_r{_k} AS MATERIALIZED (
  SELECT v.id,
         {_hp_base} + (85 * COALESCE(c.s, 0)) // 100 AS rank_u
  FROM hp_v v CROSS JOIN hp_n n LEFT JOIN hp_c{_k} c ON v.id = c.id
)""")
    q["hosts_pagerank"] = (
        "WITH\n" + ",\n".join(_hp_cte) + f"""
SELECT id, CAST(rank_u AS BIGINT) AS rank_u,
       CAST(rank_u AS DOUBLE) / {float(_pr_scale)} AS rank
FROM hp_r{_hp_iters} ORDER BY id"""
    )

    # BPE merge training (bp_ prefix — global CTE namespace rule):
    # unrolled 12 rounds over the top-512 word table. Merge application
    # is the same greedy left-to-right fold as Spark's F.aggregate,
    # realised here as list_reduce over a chr(31)-delimited string (the
    # ^[a-z0-9]+$ word filter guarantees the separator never collides).
    _bp_merges = 12
    _bp_cap = 512
    _bp_cte = [
        """bp_tok AS MATERIALIZED (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents
)""",
        f"""bp_wc AS MATERIALIZED (
  SELECT word, COUNT(*) AS cnt FROM bp_tok
  WHERE regexp_matches(word, '^[a-z0-9]+$')
  GROUP BY word ORDER BY cnt DESC, word LIMIT {_bp_cap}
)""",
        """bp_w0 AS MATERIALIZED (
  SELECT word, cnt,
         list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
  FROM bp_wc
)""",
    ]
    for _k in range(1, _bp_merges + 1):
        _bp_cte.append(f"""bp_p{_k} AS MATERIALIZED (
  SELECT syms[i] AS l, syms[i+1] AS r, SUM(cnt) AS c
  FROM (SELECT cnt, syms, unnest(generate_series(1, len(syms)-1)) AS i
        FROM bp_w{_k - 1})
  GROUP BY 1, 2
)""")
        _bp_cte.append(f"""bp_b{_k} AS MATERIALIZED (
  SELECT {_k} AS merge_rank, l, r, c FROM bp_p{_k} ORDER BY c DESC, l, r LIMIT 1
)""")
        _bp_cte.append(f"""bp_w{_k} AS MATERIALIZED (
  SELECT word, cnt, string_split(list_reduce(syms, (acc, x) ->
    CASE WHEN x = b.r AND ((length(acc) = length(b.l) AND acc = b.l)
                           OR right(acc, length(b.l) + 1) = chr(31) || b.l)
      THEN left(acc, length(acc) - length(b.l)) || b.l || b.r
      ELSE acc || chr(31) || x END), chr(31)) AS syms
  FROM bp_w{_k - 1} CROSS JOIN bp_b{_k} b
)""")
    _bp_union = " UNION ALL ".join(
        f"SELECT * FROM bp_b{_k}" for _k in range(1, _bp_merges + 1)
    )
    q["bpe_merges"] = (
        "WITH\n" + ",\n".join(_bp_cte) + f"""
SELECT CAST(merge_rank AS INTEGER) AS merge_rank, l AS left_sym,
       r AS right_sym, CAST(c AS BIGINT) AS pair_count
FROM ({_bp_union}) ORDER BY merge_rank"""
    )
    q["docs_bpe_tokens"] = (
        "WITH\n" + ",\n".join(_bp_cte) + f""",
bp_dw AS MATERIALIZED (
  SELECT doc_id AS id,
         unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents
)
SELECT d.id, COUNT(*) AS n_words,
       CAST(SUM(COALESCE(len(s.syms), length(d.word))) AS BIGINT) AS n_bpe_tokens
FROM bp_dw d LEFT JOIN bp_w{_bp_merges} s USING (word)
WHERE d.word <> ''
GROUP BY d.id ORDER BY d.id"""
    )
    q["bpe_fertility_by_lang"] = (
        "WITH\n" + ",\n".join(_bp_cte) + f""",
bf_dw AS MATERIALIZED (
  SELECT lang,
         unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(COALESCE(len(s.syms), length(d.word))) AS BIGINT) AS n_bpe_tokens,
       round(CAST(SUM(COALESCE(len(s.syms), length(d.word))) AS DOUBLE)
             / COUNT(*), 4) + 0.0 AS fertility
FROM bf_dw d LEFT JOIN bp_w{_bp_merges} s USING (word)
WHERE d.word <> ''
GROUP BY lang ORDER BY lang"""
    )

    # Incremental-crawl snapshot diff (r4): rebuild both derived
    # snapshots with the identical arithmetic and FULL OUTER JOIN them.
    q["crawl_snapshot_diff"] = """WITH
csd_prev AS (
  SELECT 'https://site' || CAST(doc_id % 7 AS VARCHAR)
           || '.com/art/' || CAST(doc_id AS VARCHAR) AS url_canon,
         sha256(text) AS prev_sha
  FROM documents WHERE doc_id % 11 <> 3
),
csd_curr AS (
  SELECT 'https://site' || CAST(doc_id % 7 AS VARCHAR)
           || '.com/art/' || CAST(doc_id AS VARCHAR) AS url_canon,
         sha256(CASE WHEN doc_id % 13 = 5 THEN text || ' updated'
                     ELSE text END) AS curr_sha
  FROM documents WHERE doc_id % 11 <> 7
)
SELECT COALESCE(p.url_canon, c.url_canon) AS url_canon,
       CASE WHEN p.prev_sha IS NULL THEN 'new'
            WHEN c.curr_sha IS NULL THEN 'gone'
            WHEN p.prev_sha = c.curr_sha THEN 'unchanged'
            ELSE 'changed' END AS status,
       p.prev_sha, c.curr_sha
FROM csd_prev p FULL OUTER JOIN csd_curr c ON p.url_canon = c.url_canon
ORDER BY url_canon"""

    # Recrawl work list: the new+changed subset of the same diff.
    q["crawl_refetch_set"] = """WITH
crs_prev AS (
  SELECT 'https://site' || CAST(doc_id % 7 AS VARCHAR)
           || '.com/art/' || CAST(doc_id AS VARCHAR) AS url_canon,
         sha256(text) AS prev_sha
  FROM documents WHERE doc_id % 11 <> 3
),
crs_curr AS (
  SELECT 'https://site' || CAST(doc_id % 7 AS VARCHAR)
           || '.com/art/' || CAST(doc_id AS VARCHAR) AS url_canon,
         sha256(CASE WHEN doc_id % 13 = 5 THEN text || ' updated'
                     ELSE text END) AS curr_sha
  FROM documents WHERE doc_id % 11 <> 7
),
crs_diff AS (
  SELECT COALESCE(p.url_canon, c.url_canon) AS url_canon,
         CASE WHEN p.prev_sha IS NULL THEN 'new'
              WHEN c.curr_sha IS NULL THEN 'gone'
              WHEN p.prev_sha = c.curr_sha THEN 'unchanged'
              ELSE 'changed' END AS status,
         p.prev_sha, c.curr_sha
  FROM crs_prev p FULL OUTER JOIN crs_curr c ON p.url_canon = c.url_canon
)
SELECT * FROM crs_diff WHERE status IN ('new', 'changed')
ORDER BY url_canon"""

    return q
