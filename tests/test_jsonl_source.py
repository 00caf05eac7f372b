"""JSONL corpus source (sources/jsonl.py): declared-schema scan,
quarantine of malformed rows, pages-contract parity with load_pages."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from graphiti_spark.sources.jsonl import load_pages_jsonl, read_pages_jsonl, split_corrupt


def _write(tmp_path, lines):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_valid_rows_reach_pages_contract(spark, tmp_path):
    path = _write(
        tmp_path,
        [
            json.dumps(
                {
                    "url": "https://a.test/1",
                    "warc_ts": "2024-02-01T10:00:00",
                    "text": "alpha & beta <tag> 'quoted'",
                    "lang": "en",
                    "group_id": "g1",
                }
            ),
            json.dumps(
                {  # optional fields absent -> defaults
                    "url": "https://a.test/2",
                    "warc_ts": "2024-02-01 11:00:00",
                    "text": "plain prose here",
                }
            ),
        ],
    )
    sink: list = []
    pages = load_pages_jsonl(spark, path, quarantine_sink=sink)
    got = {r.url: r for r in pages.collect()}
    assert set(got) == {"https://a.test/1", "https://a.test/2"}
    # E10 round-trip invariant: extract_text(html) == original text,
    # including the five escaped entities
    assert got["https://a.test/1"].text == "alpha & beta <tag> 'quoted'"
    assert got["https://a.test/2"].text == "plain prose here"
    assert got["https://a.test/2"].lang == "und"
    assert got["https://a.test/2"].group_id == "jsonl"
    assert got["https://a.test/1"].warc_ts.hour == 10
    assert isinstance(got["https://a.test/1"].html, (bytes, bytearray))
    assert sink[0].count() == 0


def test_jsonl_malformed_rows_quarantined_not_dropped(spark, tmp_path):
    path = _write(
        tmp_path,
        [
            json.dumps(
                {
                    "url": "https://a.test/ok",
                    "warc_ts": "2024-02-01T10:00:00",
                    "text": "fine",
                }
            ),
            '{"url": "https://a.test/broken", "warc_ts":',  # parse error
            json.dumps({"url": "https://a.test/no-text",
                        "warc_ts": "2024-02-01T10:00:00"}),
            json.dumps({"url": "https://a.test/bad-ts",
                        "warc_ts": "not a time", "text": "x"}),
        ],
    )
    valid, quarantine = split_corrupt(read_pages_jsonl(spark, path))
    assert valid.count() == 1
    q = quarantine.collect()
    assert len(q) == 3  # parse error + missing text + bad timestamp
    # the raw offending line is preserved for inspection
    corrupt_lines = [r["_corrupt"] for r in q if r["_corrupt"] is not None]
    assert any("broken" in c for c in corrupt_lines)


def test_jsonl_pages_compose_into_the_dag(spark, tmp_path):
    from graphiti_spark.config import RunConfig
    from graphiti_spark.sources.pages import pages_to_episodes

    path = _write(
        tmp_path,
        [
            json.dumps(
                {
                    "url": f"https://a.test/{i}",
                    "warc_ts": f"2024-02-01T10:{i:02d}:00",
                    "text": "alice follows bob",
                }
            )
            for i in range(3)
        ],
    )
    pages = load_pages_jsonl(spark, path)
    eps = pages_to_episodes(pages, RunConfig().run_ts)
    rows = eps.collect()
    assert len(rows) == 3
    assert all(r.content == "alice follows bob" for r in rows)
    assert len({r.uuid for r in rows}) == 3  # content ids from url
