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
    ENTITY_NOUNS_SORTED,
    RELATION_VERBS_SORTED,
    sql_in_list,
)
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
    min(episode_uuid) AS first_episode_uuid,
    max(episode_uuid) AS last_episode_uuid
  FROM triples
  GROUP BY group_id, subj_name, obj_name, pred, fact
)"""

# Temporal invalidation: next distinct valid_at within (group, subject,
# predicate); expired_at = run_ts where set (T1–T3 as window functions).
EDGES_TEMPORAL_CTE = f"""{EDGES_CTE},
skyline AS (
  SELECT DISTINCT group_id, source_node_uuid, name, valid_at FROM edges
),
successor AS (
  SELECT group_id, source_node_uuid, name, valid_at,
         lead(valid_at) OVER (
           PARTITION BY group_id, source_node_uuid, name
           ORDER BY valid_at) AS invalid_at
  FROM skyline
),
edges_temporal AS (
  SELECT e.*, s.invalid_at,
         CASE WHEN s.invalid_at IS NOT NULL THEN {RUN_TS_SQL}
              ELSE NULL END AS expired_at
  FROM edges e
  JOIN successor s USING (group_id, source_node_uuid, name, valid_at)
)"""

ENTITIES_CTE = f"""{MENTIONS_CTE},
entities AS (
  SELECT group_id, name,
         sha256(group_id || '|' || name) AS uuid,
         count(*) AS mention_count
  FROM (SELECT episode_uuid, group_id, name FROM mentions) m
  GROUP BY group_id, name
)"""
