"""Result fusion + reranking (SURVEY.md Q4 RRF, Q5 MMR, Q6 stub).

Reference:
  - rrf: score[uuid] += 1/(rank + rank_const) across ranked lists
    (/root/reference/graphiti_core/search/search_utils.py:1733-1748,
    rank_const = 1).
  - maximal_marginal_relevance: greedy λ·sim(q,c) − (1−λ)·max sim to
    already-picked (search_utils.py:1838-1876, λ=0.5 at :65). Candidate
    sets are ≤ a few hundred rows post-over-fetch, so the greedy loop
    runs vectorized inside ONE Arrow batch via applyInPandas — the
    distributed part is producing the candidates, not reranking them.
  - cross-encoder rerank (Q6): deterministic token-overlap stub (the
    reference calls an external model, cross_encoder/client.py:20-41).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_MMR_LAMBDA

RRF_RANK_CONST = 1  # reference search_utils.py:1736


def rrf(
    ranked_lists: list[DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    limit: int = 10,
    rank_const: int = RRF_RANK_CONST,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked DataFrames → (id, score, rank).

    Each input carries (id, rank); union + groupBy(id) sum(1/(rank+c)).
    Reference ranks are 0-based list positions; inputs here use 1-based
    ``row_number`` ranks, so the contribution is 1/(rank-1+c)."""
    unioned = ranked_lists[0].select(id_col, rank_col)
    for df in ranked_lists[1:]:
        unioned = unioned.unionByName(df.select(id_col, rank_col))
    scored = (
        unioned.withColumn(
            "contrib",
            F.lit(1.0) / (F.col(rank_col).cast("double") - 1.0 + rank_const),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 4).alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(limit)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.select(
        F.col(id_col).alias("id"), "score", F.row_number().over(w).alias("rank")
    )


def mmr_rerank(
    candidates: DataFrame,
    query_vec: list[float],
    id_col: str = "id",
    vec_col: str = "vec",
    mmr_lambda: float = DEFAULT_MMR_LAMBDA,
    limit: int = 10,
) -> DataFrame:
    """Greedy MMR over a (small) candidate set. Output (id, score, rank)
    where score is the candidate's MMR value AT SELECTION TIME (matches
    the reference's returned ordering semantics).

    Runs as applyInPandas over one synthetic group: candidates are
    already top-(2×limit) of a search channel, so a single Arrow batch
    holds them; numpy does the pairwise matrix exactly like the
    reference (search_utils.py:1852-1872)."""
    import numpy as np

    lam = float(mmr_lambda)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    k = limit

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        sim_q = unit @ qn
        sim_cc = unit @ unit.T
        ids = pdf[id_col].to_numpy()
        # deterministic candidate order: ids ascending
        order = np.argsort(ids, kind="stable")
        ids, sim_q, sim_cc, picked = ids[order], sim_q[order], sim_cc[order][:, order], []
        scores = []
        n = len(ids)
        chosen_mask = np.zeros(n, dtype=bool)
        while len(picked) < min(k, n):
            max_to_picked = (
                sim_cc[:, chosen_mask].max(axis=1)
                if chosen_mask.any()
                else np.zeros(n)
            )
            # Round BEFORE ranking (repo-wide score rule): raw MMR values
            # that tie at presentation precision would otherwise be
            # ordered by BLAS summation noise — not reproducible across
            # platforms (or against the DuckDB oracle).
            # (+0.0 normalizes IEEE -0.0 so renderings agree everywhere)
            mmr = np.round(lam * sim_q - (1.0 - lam) * max_to_picked, 4) + 0.0
            mmr[chosen_mask] = -np.inf
            best = int(np.argmin(-mmr))  # first max (ties → lowest id)
            picked.append(best)
            scores.append(float(mmr[best]))
            chosen_mask[best] = True
        return pd.DataFrame(
            {
                "id": ids[picked],
                "score": scores,
                "rank": list(range(1, len(picked) + 1)),
            }
        )

    out_schema = "id long, score double, rank int"
    if dict(candidates.dtypes).get(id_col) == "string":
        out_schema = "id string, score double, rank int"
    return (
        candidates.select(F.lit(1).alias("g"), id_col, vec_col)
        .groupBy("g")
        .applyInPandas(lambda pdf: _mmr(pdf), out_schema)
    )


def token_overlap_rerank(
    candidates: DataFrame,
    query: str,
    id_col: str = "id",
    text_col: str = "text",
    limit: int = 10,
) -> DataFrame:
    """Deterministic cross-encoder stand-in (Q6): normalized token
    overlap |q ∩ d| / |q| — native columns, no model."""
    qterms = sorted({t for t in query.lower().split() if t})
    qarr = F.array(*[F.lit(t) for t in qterms])
    overlap = F.size(
        F.array_intersect(F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+")), qarr)
    )
    scored = candidates.select(
        F.col(id_col).alias("id"),
        F.round(overlap.cast("double") / F.lit(float(len(qterms) or 1)), 4).alias(
            "score"
        ),
    )
    top = scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(limit)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return top.select("id", "score", F.row_number().over(w).alias("rank"))
