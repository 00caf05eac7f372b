"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row-count + column names + order-insensitive value hash.

Usage: python scripts/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from graphiti_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="verify-oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows-only check rows={len(srows)} ({time.time()-t0:.1f}s)")
            continue
        ocur = con.execute(oracles[name])
        ocols = [d[0] for d in ocur.description]
        orows = ocur.fetchall()
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh, oh = frame_hash(scols, srows), frame_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK" if (ok_count and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"  {name}: {status} rows={len(srows)}/{len(orows)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"hash={'=' if ok_hash else f'{sh[:8]} vs {oh[:8]}'} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL" and ok_cols:
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = {"\x01".join(norm_cell(r[i]) for i in order) for r in srows}
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            oset = {"\x01".join(norm_cell(r[i]) for i in oorder) for r in orows}
            for ln in list(sset - oset)[:3]:
                print("    spark-only:", ln[:200].replace("\x01", " | "))
            for ln in list(oset - sset)[:3]:
                print("    oracle-only:", ln[:200].replace("\x01", " | "))
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
