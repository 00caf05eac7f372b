"""Combine scaling-leg draws (bench.py --cores N --fast JSON lines) into
the BENCH/BENCH_scaling.json shape: min-of-draws per leg, efficiency =
throughput(4N) / (4 * throughput(N)) computed from the min walls.

Usage: python scripts/combine_scaling.py out.json leg1.json leg2.json ...
Legs are grouped by their recorded "cores"; exactly two core counts with
a 4x ratio must be present. Draws on different corpora (triple counts)
are rejected — min-of-draws is only honest on identical input.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *leg_paths = sys.argv[1:]
    by_cores: dict[int, list[dict]] = {}
    for p in leg_paths:
        with open(p) as fh:
            txt = fh.read().strip()
        if not txt:
            continue
        run = json.loads(txt.splitlines()[-1])
        by_cores.setdefault(run["cores"], []).append(run)

    cores = sorted(by_cores)
    if len(cores) != 2 or cores[1] != 4 * cores[0]:
        raise SystemExit(f"need N and 4N legs, got {cores}")
    triples = {r["triples"] for runs in by_cores.values() for r in runs}
    if len(triples) != 1:
        raise SystemExit(f"draws span different corpora: triples={triples}")

    best = {c: min(runs, key=lambda r: r["wall_sec"]) for c, runs in by_cores.items()}
    n, n4 = cores
    eff = best[n]["wall_sec"] / (4 * best[n4]["wall_sec"])
    phase_eff = {}
    for ph in ("build_cc", "edges_dag"):
        a = best[n]["queries"].get(ph)
        b = best[n4]["queries"].get(ph)
        if a and b:
            phase_eff[ph] = round(a / (4 * b), 3)
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"throughput({n4})/( 4 * throughput({n}) )",
        "sf": best[n4]["sf"],
        "phase_efficiency": phase_eff,
        "draws_per_leg": {str(c): len(rs) for c, rs in by_cores.items()},
        "runs": {str(c): best[c] for c in cores},
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
