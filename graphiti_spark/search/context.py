"""Search-result context formatting (SURVEY.md Q11).

Reference: `search_helpers.py:22-72` formats SearchResults into an LLM
context block with fact date ranges. Driver-side string assembly over
already-collected (small, top-k) results — the one place collect() is
correct by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _fmt_ts(ts) -> str:
    return ts.strftime("%Y-%m-%d %H:%M:%S") if ts is not None else "present"


def format_edge_context(edges: DataFrame, limit: int = 20) -> str:
    """Edge rows → 'FACTS' block with validity ranges (reference
    search_helpers.py format: fact + date range)."""
    rows = edges.limit(limit).collect()
    lines = ["# FACTS"]
    for r in rows:
        valid = _fmt_ts(getattr(r, "valid_at", None))
        invalid = _fmt_ts(getattr(r, "invalid_at", None))
        lines.append(f"  - {r.fact} ({valid} - {invalid})")
    return "\n".join(lines)


def format_node_context(nodes: DataFrame, limit: int = 20) -> str:
    rows = nodes.limit(limit).collect()
    lines = ["# ENTITIES"]
    for r in rows:
        summary = getattr(r, "summary", "") or ""
        lines.append(f"  - {r.name}: {summary}")
    return "\n".join(lines)


def format_context(results: dict[str, DataFrame]) -> str:
    """SearchResults dict → one context block."""
    parts = []
    if "edges" in results:
        parts.append(format_edge_context(results["edges"]))
    if "nodes" in results:
        parts.append(format_node_context(results["nodes"]))
    return "\n\n".join(parts)
