"""Connected-components canonicalization (SURVEY.md D13/D14): ported
union-find vectors from the reference tests
(tests/utils/maintenance/test_bulk_utils.py:189-214) + convergence."""

from __future__ import annotations

from graphiti_spark.functions.smalldf import literal_df
from graphiti_spark.operators.cc import (
    build_directed_uuid_map,
    connected_components,
)


def _pairs(spark, pairs):
    return literal_df(spark, pairs, [("src", "string"), ("dst", "string")])


def test_directed_chain_collapses(spark):
    # reference vector: a→b, b→c ⇒ map a→c, b→c … with min-uuid root the
    # canonical is 'a' (deterministic-id convention, cc.py docstring)
    out = {
        r.uuid: r.canonical_uuid
        for r in build_directed_uuid_map(_pairs(spark, [("a", "b"), ("b", "c")])).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a"}


def test_two_components_min_root(spark):
    pairs = [("n4", "n2"), ("n2", "n9"), ("x2", "x1")]
    out = {
        r.uuid: r.canonical_uuid
        for r in build_directed_uuid_map(_pairs(spark, pairs)).collect()
    }
    assert out["n4"] == out["n2"] == out["n9"] == "n2"
    assert out["x1"] == out["x2"] == "x1"


def test_long_path_converges(spark):
    # path of 40 nodes exercises the logarithmic star iterations
    nodes = [f"v{i:02d}" for i in range(40)]
    pairs = list(zip(nodes[:-1], nodes[1:]))
    mapping = {
        r.uuid: r.canonical_uuid
        for r in connected_components(_pairs(spark, pairs)).collect()
    }
    assert set(mapping.values()) == {"v00"}
    assert len(mapping) == 40


def test_empty_pairs(spark):
    assert connected_components(_pairs(spark, [])).count() == 0


def test_dup_rate_by_group_arithmetic(spark):
    """Host with 4 docs in 2 clusters → dup_rate 0.5; singleton-only
    host → 0.0."""
    from graphiti_spark.functions.smalldf import literal_df
    from graphiti_spark.operators.dedup_docs import dup_rate_by_group

    canon = literal_df(
        spark,
        [
            (1, 1, "farm.com"), (2, 1, "farm.com"),
            (3, 3, "farm.com"), (4, 3, "farm.com"),
            (5, 5, "fresh.org"), (6, 6, "fresh.org"),
        ],
        [("id", "bigint"), ("canonical_id", "bigint"), ("host", "string")],
    )
    got = {
        r["host"]: (r["n_docs"], r["n_clusters"], r["dup_rate"])
        for r in dup_rate_by_group(canon).collect()
    }
    assert got == {"farm.com": (4, 2, 0.5), "fresh.org": (2, 2, 0.0)}
